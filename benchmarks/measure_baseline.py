"""Measure the BASELINE.md table: reference CPU (cv2) MP/s vs tpuimage TPU
MP/s/chip for the five BASELINE.json configs.

Run on the TPU host:  python benchmarks/measure_baseline.py
Prints a markdown table and a JSON line per config.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from PIL import Image


def load(path, size=None):
    with Image.open(path) as im:
        im = im.convert("RGB")
        if size:
            im = im.resize(size, Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def timeit_host(fn, n=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def timeit_tpu(jfn, arg, reps=8, rounds=3):
    """jfn must return an int32 scalar depending on EVERY output element
    (full-array sums, not sampled slices — XLA pushes a sampling slice
    through elementwise tails and computes only the sampled pixels).
    Timing: the program is repeated reps times inside one jit with a data
    dependency chained through each iteration, so the ~30 ms tunnel RTT
    and its variance cancel; per-iter = (best_dispatch - rtt) / reps."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(x):
        def body(i, carry):
            x_, acc = carry
            tok = jfn(x_).astype(jnp.int32)
            upd = (tok % 251).astype(x_.dtype)
            # indexed point update in EVERY batch element — reshape(-1)
            # on a tiled TPU layout forces a full relayout copy
            # (+14 ms/iter on a 24 MB batch), and perturbing only
            # element 0 lets XLA hoist the other elements' loop-invariant
            # work out of the fori_loop (classify cues measured a
            # phantom 88k MP/s that way)
            x_ = x_.at[(slice(None),) + (0,) * (x_.ndim - 1)].set(upd)
            return x_, acc + tok
        return lax.fori_loop(0, reps, body, (x, jnp.int32(0)))[1]

    g = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.int32))
    int(np.asarray(g(arg)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(g(arg)))
    rtt = (time.perf_counter() - t0) / 5
    int(np.asarray(chained(arg)))  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        int(np.asarray(chained(arg)))
        best = min(best, time.perf_counter() - t0)
    return max((best - rtt) / reps, 1e-9)


def main():
    import cv2
    import jax.numpy as jnp
    import jax

    results = []
    B = 8  # batch for the TPU side

    # --- 1. morph_seq on sample.jpg ---
    rgb = load("/root/reference/public/sample.jpg")
    mp = rgb.shape[0] * rgb.shape[1] / 1e6

    def cpu_morph():
        g = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
        er = cv2.erode(g, cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3)))
        _, ot = cv2.threshold(er, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        cv2.morphologyEx(ot, cv2.MORPH_CLOSE,
                         cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3)))

    from tpuimage.pipelines.morphseq import morphseq_batch
    batch = jnp.asarray(np.broadcast_to(rgb, (B,) + rgb.shape).copy())
    tpu_t = timeit_tpu(lambda b: morphseq_batch(b)["step4_closed"]
                       .astype(jnp.int32).sum(), batch, reps=24)
    results.append(("morph_seq", mp / timeit_host(cpu_morph), B * mp / tpu_t))

    # --- 2. FaceEnhancement denoise core (gaussian branch pre-eye stages) ---
    face = load("/root/reference/public/facewithnoise.jpg")
    mp = face.shape[0] * face.shape[1] / 1e6

    def cpu_face():
        bgr = face[..., ::-1].copy()
        light = cv2.GaussianBlur(bgr, (5, 5), 0)
        strong = cv2.GaussianBlur(bgr, (9, 9), 0)
        ycrcb = cv2.cvtColor(light, cv2.COLOR_BGR2YCrCb)
        mask = cv2.inRange(ycrcb, (0, 133, 77), (255, 173, 127))
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, k)
        mask = cv2.dilate(mask, k, iterations=2)
        mask = cv2.GaussianBlur(mask, (21, 21), 0)
        m = mask.astype(np.float32)[..., None] / 255.0
        comb = (light * m + strong * (1 - m)).astype(np.uint8)
        cv2.bilateralFilter(comb, -1, 30, 10)

    from tpuimage.pipelines.face import face_pre_eyes
    fb = jnp.asarray(np.broadcast_to(face, (B,) + face.shape).copy())
    tpu_t = timeit_tpu(lambda b: jax.vmap(
        lambda im: face_pre_eyes(im, noise_type="gaussian")["skin_enhanced"])(b)
        .astype(jnp.int32).sum(), fb)
    results.append(("face_denoise", mp / timeit_host(cpu_face), B * mp / tpu_t))

    # --- 3. Night pipeline on nightview.png ---
    night_img = load("/root/reference/public/nightview.png")
    mp = night_img.shape[0] * night_img.shape[1] / 1e6

    def cpu_night():
        bgr = night_img[..., ::-1].copy()
        den = cv2.medianBlur(bgr, 3)
        lab = cv2.cvtColor(den, cv2.COLOR_BGR2LAB)
        l2 = cv2.createCLAHE(2.0, (8, 8)).apply(lab[..., 0])
        cv2.cvtColor(np.concatenate([l2[..., None], lab[..., 1:]], -1),
                     cv2.COLOR_LAB2BGR)

    from tpuimage.pipelines.night import night_rgb_batch
    nb = jnp.asarray(np.broadcast_to(night_img, (B,) + night_img.shape).copy())
    tpu_t = timeit_tpu(lambda b: night_rgb_batch(b)["enhanced"]
                       .astype(jnp.int32).sum(), nb)
    results.append(("night", mp / timeit_host(cpu_night), B * mp / tpu_t))

    # --- 4. Fused DocScanner post-warp (A4@1200) ---
    page = load("/root/reference/public/DIP test/document1.jpeg", size=(849, 1200))
    mp = page.shape[0] * page.shape[1] / 1e6
    from bench import bench_cpu_reference
    cpu_mps = bench_cpu_reference(page)
    from tpuimage.pipelines import docscan
    pb = jnp.asarray(np.broadcast_to(page, (B,) + page.shape).copy())
    cfg = docscan.GUI_DOCUMENT_CONFIG
    tpu_t = timeit_tpu(lambda b: docscan.docscan_post_warp_batch(b, cfg)["clean"]
                       .astype(jnp.int32).sum(), pb)
    results.append(("docscan_fused", cpu_mps, B * mp / tpu_t))

    # --- 5. Batched classification cues + preset application over public/ ---
    import glob
    files = sorted(glob.glob("/root/reference/public/*.jpg")
                   + glob.glob("/root/reference/public/*.png"))
    imgs = [load(f, size=(256, 256)) for f in files]
    stack = np.stack(imgs)
    mp = stack.size / 3 / 1e6

    def cpu_classify():
        for im in imgs:
            g = cv2.cvtColor(im[..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
            _, b = cv2.threshold(g, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
            e = cv2.Canny(g, 50, 150)
            cv2.HoughLines(e, 1, np.pi / 180, 150)
            g.mean()

    from tpuimage.classify.heuristic import _device_cues
    sj = jnp.asarray(stack)
    # tiny per-iter workload (0.8 MP): needs many reps so the chained
    # time clears the tunnel-RTT variance. The token consumes EVERY cue
    # (selecting a subset let XLA dead-code the Canny+Hough cues and
    # report a phantom 74k MP/s).
    def cue_tok(s):
        def one(im):
            wr, lc, br, binary, ovf, gray = _device_cues(im)
            return ((wr + lc + br).astype(jnp.float32)
                    + binary.astype(jnp.float32).sum()
                    + ovf.astype(jnp.float32)
                    + gray.astype(jnp.float32).sum())
        return jax.vmap(one)(s).sum()
    tpu_t = timeit_tpu(cue_tok, sj, reps=96)
    results.append(("classify_cues", mp / timeit_host(cpu_classify), mp / tpu_t))

    print("| Config | Reference CPU MP/s | TPU MP/s/chip | Speedup |")
    print("|---|---|---|---|")
    for name, cpu, tpu in results:
        print(f"| {name} | {cpu:.2f} | {tpu:.1f} | {tpu / cpu:.1f}x |")
    for name, cpu, tpu in results:
        print(json.dumps({"config": name, "cpu_mp_s": round(cpu, 3),
                          "tpu_mp_s": round(tpu, 3),
                          "speedup": round(tpu / cpu, 2)}))


if __name__ == "__main__":
    main()
