"""morph_seq CLI — mirrors the recovered pyc's argparse interface:
``python -m tpuimage.cli.morphseq <input> --out outputs``."""
from __future__ import annotations

import argparse

from tpuimage.pipelines.morphseq import process_morph_seq


def main(argv=None) -> None:
    from tpuimage.runtime.cache import maybe_enable_compile_cache
    maybe_enable_compile_cache()   # TPUIMAGE_XLA_CACHE opt-in
    import os as _os
    _dt = float(_os.environ.get("TPUIMAGE_DEVICE_TIMEOUT", "600"))
    if _dt > 0:
        from tpuimage.runtime.health import require_device
        require_device(_dt, what="the %s CLI" % __name__)
    p = argparse.ArgumentParser(
        description="4-step document morphology pipeline (ksize=3)")
    p.add_argument("input")
    p.add_argument("--out", default="outputs")
    p.add_argument("--no-intermediate", dest="save_intermediate",
                   action="store_false", default=True)
    args = p.parse_args(argv)
    process_morph_seq(args.input, out_dir=args.out,
                      save_intermediate=args.save_intermediate)
    print(f"Done. Outputs in {args.out}")


if __name__ == "__main__":
    main()
