"""Face-enhancement CLI — the FaceEnhancement.py script workload
(noise-adaptive portrait pipeline) with stage dumps."""
from __future__ import annotations

import argparse
import os

import numpy as np

from tpuimage.io.imageio import load_image_rgb, save_image, ensure_dir
from tpuimage.pipelines.face import enhance_face


def main(argv=None) -> None:
    from tpuimage.runtime.cache import maybe_enable_compile_cache
    maybe_enable_compile_cache()   # TPUIMAGE_XLA_CACHE opt-in
    import os as _os
    _dt = float(_os.environ.get("TPUIMAGE_DEVICE_TIMEOUT", "600"))
    if _dt > 0:
        from tpuimage.runtime.health import require_device
        require_device(_dt, what="the %s CLI" % __name__)
    p = argparse.ArgumentParser(description="Noise-adaptive portrait "
                                "enhancement (FaceEnhancement workload)")
    p.add_argument("input", nargs="?",
                   default="/root/reference/public/facewithnoise.jpg")
    p.add_argument("--out", default="outputs")
    p.add_argument("--noise-type", choices=["gaussian", "impulse", "legacy"],
                   default=None, help="override the kurtosis classifier")
    p.add_argument("--variant", choices=["script", "gui"], default="script")
    p.add_argument("--no-eyes", action="store_true", help="skip the eye pop")
    p.add_argument("--compare", action="store_true",
                   help="write a side-by-side before/after composite "
                        "(compare-viewer replacement)")
    args = p.parse_args(argv)
    rgb = load_image_rgb(args.input)
    res = enhance_face(rgb, noise_type=args.noise_type,
                       eyes=[] if args.no_eyes else None,
                       variant=args.variant)
    ensure_dir(args.out)
    save_image(os.path.join(args.out, "enhanced_face.jpg"), res["final"])
    if args.compare:
        from tpuimage.io.report import write_compare
        write_compare(os.path.join(args.out, "face_compare.png"),
                      rgb, np.asarray(res["final"]))
    for k in ("skin_mask", "skin_enhanced", "features_popped"):
        save_image(os.path.join(args.out, f"face_{k}.png"), res[k])
    print(f"noise={res['noise_type']} eyes={res['eyes']}. Outputs in {args.out}")


if __name__ == "__main__":
    main()
