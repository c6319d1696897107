"""Micro-benchmark of the docscan ink-mask sub-stages on the current device.

Usage: python benchmarks/micro_inkmask.py [batch]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = 5


def main():
    from tpuimage.pipelines import docscan
    from tpuimage.ops.filters import gaussian_blur_u8
    from tpuimage.ops.arith import subtract_u8, normalize_minmax, max_u8
    from tpuimage.ops.threshold import threshold_binary, adaptive_threshold
    from tpuimage.ops.histogram import hist256, otsu_from_hist
    from tpuimage.ops.morphology import structuring_element, morph_blackhat, dilate
    from PIL import Image

    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200), Image.BILINEAR),
                          dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    batch = jnp.asarray(np.broadcast_to(page, (BATCH,) + page.shape).copy())
    stretched = jnp.asarray(np.asarray(jax.jit(
        lambda b: docscan.docscan_post_warp_batch(b, cfg)["stretch"])(batch)))
    mp = BATCH * page.shape[0] * page.shape[1] / 1e6

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0])
    int(np.asarray(triv(stretched)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        int(np.asarray(triv(stretched)))
    rtt = (time.perf_counter() - t0) / ITERS
    print(f"rtt {rtt*1e3:.2f} ms")

    def scalar(x):
        return x.astype(jnp.int32).reshape(-1)[::997].sum()

    def measure(name, fn):
        f = jax.jit(lambda b: scalar(fn(b)))
        int(np.asarray(f(stretched)))
        int(np.asarray(f(stretched)))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            int(np.asarray(f(stretched)))
        dt = max((time.perf_counter() - t0) / ITERS - rtt, 1e-9)
        print(f"{name:28s} {dt*1e3:7.2f} ms   {mp/dt:9.1f} MP/s")

    se_vert = structuring_element("rect", (9, 19))
    se_dil = structuring_element("rect", (2, 2))

    measure("gauss51", jax.vmap(lambda g: gaussian_blur_u8(g, ksize=51)))
    measure("gauss51_bs1[0:1]", lambda b: gaussian_blur_u8(b[0], ksize=51))
    measure("blackhat9x19", jax.vmap(lambda g: morph_blackhat(g, se_vert)))
    measure("sub+minmax", jax.vmap(lambda g: normalize_minmax(subtract_u8(g, g))))
    measure("hist256x2+otsu", jax.vmap(lambda g: otsu_from_hist(
        hist256(g)) + otsu_from_hist(hist256(g[::-1])))),
    measure("thresh+max+dilate", jax.vmap(lambda g: dilate(
        max_u8(threshold_binary(g, 100.0), threshold_binary(g, 50.0)), se_dil)))
    measure("adaptive31", jax.vmap(lambda g: adaptive_threshold(g, 255, "gaussian", 31, 3)))
    measure("gauss43", jax.vmap(lambda g: gaussian_blur_u8(g, ksize=43)))


if __name__ == "__main__":
    main()
