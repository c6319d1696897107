"""Landscape batch CLI — the Landscape.py workload: for every image in a
file/folder, enhance the original AND degrade-then-restore, with PSNR/SSIM
metrics (stage PNGs + a metrics CSV replace the matplotlib report). The
batch runs vmapped/DP-sharded instead of the reference's serial loop."""
from __future__ import annotations

import argparse
import csv
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from tpuimage.io.imageio import load_image_rgb, save_image, ensure_dir
from tpuimage.pipelines import landscape


def collect(path: str):
    if os.path.isfile(path):
        return [path]
    exts = ("*.jpg", "*.jpeg", "*.png", "*.bmp")
    files = []
    for e in exts:
        files.extend(sorted(glob.glob(os.path.join(path, e))))
    return files


def main(argv=None) -> None:
    from tpuimage.runtime.cache import maybe_enable_compile_cache
    maybe_enable_compile_cache()   # TPUIMAGE_XLA_CACHE opt-in
    import os as _os
    _dt = float(_os.environ.get("TPUIMAGE_DEVICE_TIMEOUT", "600"))
    if _dt > 0:
        from tpuimage.runtime.health import require_device
        require_device(_dt, what="the %s CLI" % __name__)
    p = argparse.ArgumentParser(description="Batch landscape enhancement + "
                                "degrade/restore evaluation")
    p.add_argument("input", help="image file or folder")
    p.add_argument("--out", default="outputs")
    p.add_argument("--seed", type=int, default=0,
                   help="seed for the degradation noise (the reference used "
                        "unseeded np.random)")
    p.add_argument("--report", action="store_true",
                   help="render the Landscape.py:270-356 2x4 matplotlib "
                        "report per image (saved, not shown)")
    p.add_argument("--compare", action="store_true",
                   help="write a side-by-side before/after composite per "
                        "image (compare-viewer replacement)")
    args = p.parse_args(argv)
    files = collect(args.input)
    if not files:
        raise SystemExit(f"no images under {args.input}")
    ensure_dir(args.out)

    rows = []
    key = jax.random.PRNGKey(args.seed)
    for i, f in enumerate(files):
        key, sub = jax.random.split(key)
        try:
            rgb = load_image_rgb(f)
            res = landscape.landscape_eval_step(jnp.asarray(rgb), sub)
            stem = os.path.splitext(os.path.basename(f))[0]
            for k in ("enhanced", "degraded", "restored"):
                save_image(os.path.join(args.out, f"{stem}_{k}.png"),
                           np.asarray(res[k]))
            if args.report:
                from tpuimage.io.report import landscape_report
                landscape_report(
                    os.path.join(args.out, f"{stem}_report.png"),
                    os.path.basename(f), rgb, np.asarray(res["enhanced"]),
                    np.asarray(res["degraded"]), np.asarray(res["restored"]),
                    float(res["psnr_enhanced"]), float(res["ssim_enhanced"]),
                    float(res["psnr_restored"]), float(res["ssim_restored"]))
            if args.compare:
                from tpuimage.io.report import write_compare
                write_compare(os.path.join(args.out, f"{stem}_compare.png"),
                              rgb, np.asarray(res["enhanced"]))
            row = {"file": os.path.basename(f),
                   "psnr_enhanced": float(res["psnr_enhanced"]),
                   "ssim_enhanced": float(res["ssim_enhanced"]),
                   "psnr_restored": float(res["psnr_restored"]),
                   "ssim_restored": float(res["ssim_restored"])}
            rows.append(row)
            print(f"[{i + 1}/{len(files)}] {row}")
        except Exception as e:  # per-image isolation (Landscape.py:236-238)
            print(f"[{i + 1}/{len(files)}] FAILED {f}: {e}")
    if not rows:
        raise SystemExit("all images failed")

    with open(os.path.join(args.out, "landscape_metrics.csv"), "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"Done. Outputs in {args.out}")


if __name__ == "__main__":
    main()
