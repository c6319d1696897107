"""Haar cascade: the round-2 serial per-(image, scale) evaluator vs the
current batched one-cascade-pass evaluator on the classify sweep
(every public/ image, detect_faces parameters).

Round-2 VERDICT item 7's done-bar: >= 5x on this sweep, pinned fixtures
unchanged (tests/test_haar.py). Both paths are host numpy — no TPU
needed; run alone on this 1-core host.

The round-2 implementation is checked out from git history (commit
c80072a) into /tmp so the comparison is against the real old code, not a
degraded proxy. Three timings are printed:
  r2 serial    — old evaluator, Python loop over images (the round-2
                 classify sweep's actual cost)
  now serial   — current evaluator via the per-image API (batch of 1)
  now batched  — current evaluator, all images in ONE cascade pass

Usage: python benchmarks/micro_haar.py
"""
from __future__ import annotations

import glob
import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image

from tpuimage.detect.haar import detect_faces, detect_faces_batch

PUB = "/root/reference/public"
R2_COMMIT = "c80072a"


def load_r2_haar():
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"{R2_COMMIT}:tpuimage/detect/haar.py"],
        check=True, capture_output=True, text=True).stdout
    path = "/tmp/haar_r2.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("haar_r2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def classify_sweep_grays():
    paths = sorted(glob.glob(os.path.join(PUB, "*.jpg"))
                   + glob.glob(os.path.join(PUB, "*.jpeg"))
                   + glob.glob(os.path.join(PUB, "*.png")))
    grays = []
    for p in paths:
        with Image.open(p) as im:
            grays.append(np.asarray(im.convert("L"), dtype=np.uint8))
    return paths, grays


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    paths, grays = classify_sweep_grays()
    print(f"{len(grays)} images: "
          + ", ".join(f"{os.path.basename(p)}{g.shape}"
                      for p, g in zip(paths, grays)))
    r2 = load_r2_haar()

    # warm + result parity across all three paths
    out_r2 = [r2.detect_faces(g) for g in grays]
    out_serial = [detect_faces(g) for g in grays]
    out_batch = detect_faces_batch(grays)
    key = lambda rects: [sorted(map(tuple, r)) for r in rects]
    assert key(out_r2) == key(out_serial) == key(out_batch), \
        "face sets diverge between implementations"
    print("face counts:", [len(r) for r in out_batch])

    t_r2 = timeit(lambda: [r2.detect_faces(g) for g in grays])
    t_serial = timeit(lambda: [detect_faces(g) for g in grays])
    t_batch = timeit(lambda: detect_faces_batch(grays))
    print(f"r2 serial evaluator:   {t_r2*1e3:8.1f} ms")
    print(f"now, per-image calls:  {t_serial*1e3:8.1f} ms")
    print(f"now, one batched pass: {t_batch*1e3:8.1f} ms")
    print(f"speedup vs r2: {t_r2 / t_batch:.2f}x "
          f"(VERDICT r2 item 7 bar: >= 5x); "
          f"batch amortization alone: {t_serial / t_batch:.2f}x")


if __name__ == "__main__":
    main()
