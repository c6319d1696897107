"""Micro-benchmark: night_rgb stage budget on the current device.

Chained-rep timing (data dependency threaded through each iteration, full
sum tokens, all-batch perturbation) — the only reliable method over the
axon tunnel; see BASELINE.md round-2 pitfalls.

Usage: python benchmarks/micro_night.py [batch]
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
    from tpuimage.pipelines.night import night_rgb_batch
    from tpuimage.ops.median import median_blur
    from tpuimage.ops.histogram import clahe
    from tpuimage.ops import color as colorops
    from PIL import Image

    with Image.open("/root/reference/public/nightview.png") as im:
        img = np.asarray(im.convert("RGB"), dtype=np.uint8)
    batch = jnp.asarray(np.broadcast_to(img, (BATCH,) + img.shape).copy())
    mp = BATCH * img.shape[0] * img.shape[1] / 1e6

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0, 0])
    int(np.asarray(triv(batch)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(batch)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.2f} ms   batch {BATCH}  {mp:.2f} MP/dispatch")

    def chained(op, inp):
        @jax.jit
        def f(b):
            def body(i, carry):
                b_, acc = carry
                tok = op(b_)
                return (b_.at[(slice(None),) + (0,) * (b_.ndim - 1)]
                        .set((tok % 251).astype(b_.dtype)), acc + tok)
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
        int(np.asarray(f(inp)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(inp)))
            best = min(best, time.perf_counter() - t0)
        return (best - rtt) / REPS

    def tok(x):
        return x.astype(jnp.int32).sum()

    stages = [
        ("median3_rgb", lambda b: tok(jax.vmap(lambda im: median_blur(im, 3))(b))),
        ("rgb_to_lab", lambda b: tok(jax.vmap(colorops.rgb_to_lab)(b))),
        ("clahe_L", None),  # filled below (needs lab input)
        ("lab_to_rgb", None),
        ("full_night_rgb", lambda b: tok(night_rgb_batch(b)["enhanced"])),
    ]

    # precompute a LAB batch for the isolated clahe/lab_to_rgb stages
    lab = jax.jit(jax.vmap(lambda im: colorops.rgb_to_lab(median_blur(im, 3))))(batch)
    lab = jnp.asarray(np.asarray(lab))

    def clahe_tok(lb):
        return tok(jax.vmap(lambda l: clahe(l[..., 0], 2.0, 8, 8))(lb))

    def lab2rgb_tok(lb):
        return tok(jax.vmap(colorops.lab_to_rgb)(lb))

    for name, fn in stages:
        if name == "clahe_L":
            dt = chained(clahe_tok, lab)
        elif name == "lab_to_rgb":
            dt = chained(lab2rgb_tok, lab)
        else:
            dt = chained(fn, batch)
        print(f"{name:18s} {dt*1e3:7.2f} ms   {mp/dt:8.1f} MP/s")


if __name__ == "__main__":
    main()
