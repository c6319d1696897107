"""Incremental-prefix attribution of the fused docscan post-warp program.

Times progressively longer prefixes of the real pipeline in the chained-rep
harness; successive deltas attribute per-stage cost IN CONTEXT (same
fusion environment), unlike isolated per-stage programs whose XLA fusions
differ. Usage: python benchmarks/ablate_docscan.py [batch]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPS = 10


def main():
    from tpuimage.pipelines import docscan
    from tpuimage.ops import color as colorops
    from tpuimage.ops.filters import gaussian_blur_u8
    from tpuimage.ops.arith import divide_u8, subtract_u8, normalize_minmax, max_u8
    from tpuimage.ops.morphology import structuring_element, morph_blackhat
    from tpuimage.ops.histogram import hist256, otsu_from_hist
    from tpuimage.ops.threshold import adaptive_threshold, threshold_binary
    from tpuimage.ops.edges import canny
    from tpuimage.ops.hough import band_compact_coords, hough_fold_median_angle
    from PIL import Image

    cfg = docscan.GUI_DOCUMENT_CONFIG
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200), Image.BILINEAR),
                          dtype=np.uint8)
    batch = jnp.asarray(np.broadcast_to(page, (BATCH,) + page.shape).copy())
    mp = BATCH * page.shape[0] * page.shape[1] / 1e6

    c = cfg
    h, w = page.shape[0], page.shape[1]
    base = max(15, int(round(min(h, w) * c.illum_blur_frac)))
    base += (base % 2 == 0)
    mk = c.mask_blur_ksize + (c.mask_blur_ksize % 2 == 0)
    bk = max(c.blackhat_ksize, 3)
    bk += (bk % 2 == 0)
    bh_h = max(3, int(round(bk * c.blackhat_vertical_ratio)))
    bh_h += (bh_h % 2 == 0)
    se_vert = structuring_element("rect", (bk, bh_h))
    bs = c.block_size + (c.block_size % 2 == 0)

    def upto(stage):
        def one(rgb):
            gray = colorops.rgb_to_gray(rgb)
            if stage == "gray":
                return gray
            bg = gaussian_blur_u8(gray, ksize=base)
            if stage == "gauss43":
                return bg
            tmp = divide_u8(gray, bg, scale=255)
            stretched = normalize_minmax(tmp)
            if stage == "illum":
                return stretched
            ink_bg = gaussian_blur_u8(stretched, ksize=mk)
            ink_sub = normalize_minmax(subtract_u8(ink_bg, stretched))
            if stage == "inksub":
                return ink_sub
            bh = normalize_minmax(morph_blackhat(stretched, se_vert))
            if stage == "blackhat":
                return ink_sub ^ bh
            hists = jax.vmap(hist256)(jnp.stack([ink_sub, bh]))
            t_sub, t_bh = (jnp.maximum(jnp.round(otsu_from_hist(hists[i]))
                                       - c.mask_thresh_offset, 0)
                           for i in range(2))
            ink_mask = max_u8(threshold_binary(ink_sub, t_sub),
                              threshold_binary(bh, t_bh))
            if stage == "otsu_mask":
                return ink_mask
            base_bin = adaptive_threshold(stretched, 255, c.thresh_method,
                                          bs, c.C)
            weighted = jnp.where(ink_mask == 0, jnp.uint8(255), base_bin)
            if stage == "weighted":
                return weighted
            edges = canny(weighted, c.canny_low, c.canny_high)
            if stage == "canny":
                return edges
            k = min(max(131072, (h * w * 3) // 16), 524288)
            xs_t, ys_t, counts = band_compact_coords(edges, k)
            if stage == "compact":
                return (xs_t.astype(jnp.int32).sum()
                        + ys_t.astype(jnp.int32).sum()
                        + counts.sum()).astype(jnp.uint8).reshape(1, 1)
            ang = hough_fold_median_angle(edges, threshold=150)
            if stage == "fold":
                return ang.reshape(1, 1).astype(jnp.int32)
            raise ValueError(stage)
        return one

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0, 0])
    int(np.asarray(triv(batch)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(batch)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.2f} ms   {mp:.2f} MP/dispatch")

    def chained(stage):
        one = upto(stage)

        @jax.jit
        def f(b):
            def body(i, carry):
                b_, acc = carry
                out = jax.vmap(one)(b_)
                tok = out.astype(jnp.int32).sum()
                return (b_.at[:, 0, 0, :].set((tok % 251).astype(jnp.uint8)),
                        acc + tok)
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
        int(np.asarray(f(batch)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(batch)))
            best = min(best, time.perf_counter() - t0)
        return (best - rtt) / REPS

    prev = 0.0
    for stage in ("gray", "gauss43", "illum", "inksub", "blackhat",
                  "otsu_mask", "weighted", "canny", "compact", "fold"):
        dt = chained(stage) * 1e3
        print(f"{stage:10s} cum {dt:7.2f} ms   delta {dt - prev:7.2f} ms")
        prev = dt


if __name__ == "__main__":
    main()
