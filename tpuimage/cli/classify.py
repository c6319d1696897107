"""Classify-and-enhance CLI — the headless equivalent of the
AI_classification GUI flow: classify each input (CLIP if a converted
checkpoint is given, else the weighted heuristic), route to the matching
enhancement pipeline, save with a compression preset."""
from __future__ import annotations

import argparse
import os


from tpuimage.io.imageio import load_image_rgb, save_image, ensure_dir
from tpuimage.classify.router import classify_and_enhance


def main(argv=None) -> None:
    from tpuimage.runtime.cache import maybe_enable_compile_cache
    maybe_enable_compile_cache()   # TPUIMAGE_XLA_CACHE opt-in
    import os as _os
    _dt = float(_os.environ.get("TPUIMAGE_DEVICE_TIMEOUT", "600"))
    if _dt > 0:
        from tpuimage.runtime.health import require_device
        require_device(_dt, what="the %s CLI" % __name__)
    p = argparse.ArgumentParser(description="Scene classification + routed "
                                "enhancement (AI_classification workload, headless)")
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", default="outputs")
    p.add_argument("--classifier", choices=["weighted", "priority"],
                   default="weighted")
    p.add_argument("--clip-checkpoint", default=None,
                   help="converted ViT-B/32 .npz (see classify.clip); "
                        "falls back to the heuristic when absent, like the "
                        "reference's ensure_model")
    p.add_argument("--compression",
                   choices=["FAST", "BALANCED", "HIGH", "MAXIMUM"],
                   default="BALANCED")
    args = p.parse_args(argv)
    ensure_dir(args.out)

    clip_model = None
    if args.clip_checkpoint:
        from tpuimage.classify.clip import load_from_checkpoint
        clip_model = load_from_checkpoint(args.clip_checkpoint)

    for f in args.inputs:
        rgb = load_image_rgb(f)
        label, probs, out = classify_and_enhance(rgb, classifier=args.classifier,
                                                 clip_model=clip_model)
        stem = os.path.splitext(os.path.basename(f))[0]
        dst = os.path.join(args.out, f"{stem}_{label}_enhanced.png")
        save_image(dst, out, compression=args.compression)
        # the reference's audit line (AI_classification.py:896)
        print(f"CONFIRMED: path={f} type={label} probs={probs} -> {dst}")


if __name__ == "__main__":
    main()
