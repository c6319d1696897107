"""Batched document-scanning service loop.

Feeds a directory of photos through scan_batch (one batched localize
dispatch, grouped warps, one fused post-warp program), with per-item
failure isolation — a broken image yields an {"error": ...} entry
instead of poisoning the batch.

    python examples/batch_serving.py "/root/reference/public/DIP test"/*.jpeg
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout use
import sys

import numpy as np

from tpuimage.io.imageio import load_image_rgb, save_image
from tpuimage.pipelines import docscan
from tpuimage.runtime.health import require_device

require_device(600, what="batch serving")  # fail fast if the chip is down

paths = sys.argv[1:]
images = [load_image_rgb(p) for p in paths]
results = docscan.scan_batch(images, docscan.GUI_DOCUMENT_CONFIG)
for path, res in zip(paths, results):
    if "binary" in res:
        out = path.rsplit("/", 1)[-1] + ".scan.png"
        save_image(out, np.asarray(res["binary"]))
        print(f"{path}: OK -> {out}")
    else:
        print(f"{path}: FAILED ({res['error']})")
