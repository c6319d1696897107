"""Per-stage time breakdown of the fused docscan post-warp program on the
current default JAX device (TPU under the driver; VERDICT round-1 item 1a).

Each stage group is compiled as its own jit program over the same batch and
timed with the RTT-subtracted scalar-fetch sync (bench.py pattern). Prints a
JSON dict of per-stage ms and MP/s. Stage timings overlap (XLA fuses
differently per program), so treat them as attribution, not an exact sum.

Usage: python benchmarks/profile_stages.py [batch]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
WARM = 2
ITERS = 5


def _load_page() -> np.ndarray:
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        return np.asarray(im.convert("RGB").resize((849, 1200), Image.BILINEAR),
                          dtype=np.uint8)


def timed(fn, batch, rtt):
    out = fn(batch)
    for _ in range(WARM - 1):
        fn(batch)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        fn(batch)
    return max((time.perf_counter() - t0) / ITERS - rtt, 1e-9)


def main():
    from tpuimage.pipelines import docscan
    from tpuimage.ops import color as colorops
    from tpuimage.ops.filters import gaussian_blur_u8
    from tpuimage.ops.arith import divide_u8, normalize_minmax, subtract_u8, max_u8
    from tpuimage.ops.threshold import adaptive_threshold, threshold_binary
    from tpuimage.ops.histogram import otsu_threshold
    from tpuimage.ops.morphology import structuring_element, dilate, morph_blackhat
    from tpuimage.ops.edges import canny
    from tpuimage.ops.hough import hough_accumulator, hough_fold_median_angle
    from tpuimage.ops import geometry

    cfg = docscan.GUI_DOCUMENT_CONFIG
    page = _load_page()
    batch = jnp.asarray(np.broadcast_to(page, (BATCH,) + page.shape).copy())
    mp = BATCH * page.shape[0] * page.shape[1] / 1e6

    def scalar(x):
        return x.astype(jnp.int32).reshape(-1)[::997].sum()

    # fetch-RTT floor
    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0, 0])
    int(np.asarray(triv(batch)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        int(np.asarray(triv(batch)))
    rtt = (time.perf_counter() - t0) / ITERS

    c = cfg
    h, w = page.shape[:2]
    base = max(15, int(round(min(h, w) * c.illum_blur_frac)))
    base += base % 2 == 0
    mk = c.mask_blur_ksize + (c.mask_blur_ksize % 2 == 0)
    bk = max(c.blackhat_ksize, 3)
    bk += bk % 2 == 0
    bh_h = max(3, int(round(bk * c.blackhat_vertical_ratio)))
    bh_h += bh_h % 2 == 0
    se_vert = structuring_element("rect", (bk, bh_h))
    se_dil = structuring_element("rect", (2, 2))
    bs = c.block_size + (c.block_size % 2 == 0)

    def gray_fn(b):
        return jax.vmap(colorops.rgb_to_gray)(b)

    def illum_fn(b):
        def one(rgb):
            g = colorops.rgb_to_gray(rgb)
            bg = gaussian_blur_u8(g, ksize=base)
            return normalize_minmax(divide_u8(g, bg, scale=255))
        return jax.vmap(one)(b)

    def inkmask_fn(b):
        def one(stretched):
            ink_bg = gaussian_blur_u8(stretched, ksize=mk)
            ink_sub = normalize_minmax(subtract_u8(ink_bg, stretched))
            t_sub = jnp.maximum(jnp.round(otsu_threshold(ink_sub)) - c.mask_thresh_offset, 0)
            mask_sub = threshold_binary(ink_sub, t_sub)
            bh = normalize_minmax(morph_blackhat(stretched, se_vert))
            t_bh = jnp.maximum(jnp.round(otsu_threshold(bh)) - c.mask_thresh_offset, 0)
            mask_bh = threshold_binary(bh, t_bh)
            return dilate(max_u8(mask_sub, mask_bh), se_dil, iterations=1)
        return jax.vmap(one)(b)

    def adapt_fn(b):
        return jax.vmap(lambda g: adaptive_threshold(g, 255, c.thresh_method, bs, c.C))(b)

    def canny_fn(b):
        return jax.vmap(lambda g: canny(g, c.canny_low, c.canny_high))(b)

    def hough_acc_fn(b):
        return jax.vmap(hough_accumulator)(b)

    def deskew_fn(b):
        return jax.vmap(lambda e: hough_fold_median_angle(e, threshold=150))(b)

    def rot_fn(b):
        ang = jnp.full((b.shape[0],), 2.0, jnp.float32)
        return jax.vmap(lambda im, a: geometry.rotate_traced_tiled(im, a, max_angle=10.0))(b, ang)

    # precompute inputs for downstream stages on device
    gray = jax.jit(gray_fn)(batch)
    illum = jax.jit(illum_fn)(batch)
    weighted = jax.jit(lambda b: docscan.docscan_post_warp_batch(b, cfg)["weighted"])(batch)
    edges = jax.jit(canny_fn)(weighted)

    stages = {}

    def measure(name, fn, inp):
        f = jax.jit(lambda b: scalar(fn(b)))
        dt = timed(lambda b: int(np.asarray(f(b))), inp, rtt)
        stages[name] = {"ms": round(dt * 1e3, 2), "mp_per_s": round(mp / dt, 1)}
        print(name, stages[name], flush=True)

    measure("full_fused", lambda b: docscan.docscan_post_warp_batch(b, cfg)["clean"], batch)
    measure("gray", gray_fn, batch)
    measure("illum(gauss%d+div+minmax)" % base, illum_fn, batch)
    measure("inkmask(gauss%d+blackhat+2otsu)" % mk, inkmask_fn, illum)
    measure("adaptive_thresh%d" % bs, adapt_fn, illum)
    measure("canny", canny_fn, weighted)
    measure("hough_accumulator", hough_acc_fn, edges)
    measure("deskew_angle(acc+foldmedian)", deskew_fn, edges)
    measure("rotate_tiled(angle=2)", rot_fn, weighted)

    print(json.dumps({"batch": BATCH, "mp_per_dispatch": mp, "rtt_ms": round(rtt * 1e3, 2),
                      "stages": stages}))


if __name__ == "__main__":
    main()
