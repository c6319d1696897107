"""Night-enhancement CLI — the NightLandscapeEnhancement.py / asm.py
workloads (gray and RGB variants) with stage dumps + histogram CSVs in
place of the reference's matplotlib windows."""
from __future__ import annotations

import argparse
import os

import numpy as np

from tpuimage.io.imageio import load_image_rgb, save_image, ensure_dir
from tpuimage.pipelines import night
from tpuimage.ops.histogram import hist256
from tpuimage.ops.color import rgb_to_gray

import jax.numpy as jnp


def main(argv=None) -> None:
    from tpuimage.runtime.cache import maybe_enable_compile_cache
    maybe_enable_compile_cache()   # TPUIMAGE_XLA_CACHE opt-in
    import os as _os
    _dt = float(_os.environ.get("TPUIMAGE_DEVICE_TIMEOUT", "600"))
    if _dt > 0:
        from tpuimage.runtime.health import require_device
        require_device(_dt, what="the %s CLI" % __name__)
    p = argparse.ArgumentParser(description="Low-light enhancement "
                                "(median3 + CLAHE), gray or RGB variant")
    p.add_argument("input")
    p.add_argument("--out", default="outputs")
    p.add_argument("--mode", choices=["gray", "rgb"], default="rgb")
    p.add_argument("--histograms", action="store_true",
                   help="write per-stage 256-bin histograms as CSV "
                        "(replaces the matplotlib panels)")
    p.add_argument("--report", action="store_true",
                   help="render the asm.py:32-51 image+histogram panels "
                        "per stage (saved, not shown)")
    p.add_argument("--compare", action="store_true",
                   help="write a side-by-side before/after composite "
                        "(compare-viewer replacement)")
    args = p.parse_args(argv)
    rgb = load_image_rgb(args.input)
    ensure_dir(args.out)
    if args.mode == "gray":
        gray = np.asarray(rgb_to_gray(jnp.asarray(rgb)))
        stages = night.night_gray(jnp.asarray(gray))
    else:
        stages = night.night_rgb(jnp.asarray(rgb))
    for name, img in stages.items():
        save_image(os.path.join(args.out, f"night_{name}.png"), np.asarray(img))
        if args.histograms:
            g = img if img.ndim == 2 else rgb_to_gray(img)
            h = np.asarray(hist256(jnp.asarray(g)))
            np.savetxt(os.path.join(args.out, f"night_{name}_hist.csv"), h,
                       fmt="%d")
        if args.report:
            from tpuimage.io.report import night_panel
            night_panel(os.path.join(args.out, f"night_{name}_panel.png"),
                        np.asarray(img), name)
    if args.compare:
        from tpuimage.io.report import write_compare
        write_compare(os.path.join(args.out, "night_compare.png"),
                      np.asarray(stages["original"]),
                      np.asarray(stages["enhanced"]))
    print(f"Done. Outputs in {args.out}")


if __name__ == "__main__":
    main()
