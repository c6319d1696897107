"""Breakdown of the classify-cue Hough cost (11x 256x256 cue images):
compaction vs vote kernel vs peak/top_k extraction.

Usage: python benchmarks/micro_classify_hough.py
"""
from __future__ import annotations

import glob
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPS = 10


def main():
    from tpuimage.ops import color as colorops
    from tpuimage.ops.edges import canny
    from tpuimage.ops.hough import (band_compact_coords, hough_accumulator,
                                    hough_lines, _is_peak)
    from PIL import Image

    files = sorted(glob.glob("/root/reference/public/*.jpg")
                   + glob.glob("/root/reference/public/*.png"))
    imgs = []
    for f in files:
        with Image.open(f) as im:
            imgs.append(np.asarray(im.convert("RGB").resize((256, 256)),
                                   dtype=np.uint8))
    stack = jnp.asarray(np.stack(imgs))
    grays = jax.jit(jax.vmap(colorops.rgb_to_gray))(stack)
    edges = jax.jit(jax.vmap(lambda g: canny(g, 50, 150)))(grays)
    edges = jnp.asarray(np.asarray(edges))
    b, h, w = edges.shape
    mp = b * h * w / 1e6
    max_edges = (h * w) // 4
    print(f"{b} images  {mp:.2f} MP  density "
          f"{float(np.asarray(edges[0] > 0).mean()):.3f}")

    triv = jax.jit(lambda e: e.astype(jnp.int32)[0, 0, 0])
    int(np.asarray(triv(edges)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(edges)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.2f} ms")

    def chained(op):
        @jax.jit
        def f(e):
            def body(i, carry):
                e_, acc = carry
                tok = op(e_)
                return (e_.at[:, 0, :].set((tok % 2).astype(e_.dtype)),
                        acc + tok)
            return lax.fori_loop(0, REPS, body, (e, jnp.int32(0)))[1]
        int(np.asarray(f(edges)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(edges)))
            best = min(best, time.perf_counter() - t0)
        return (best - rtt) / REPS

    def t_compact(e):
        xs, ys, cts = jax.vmap(
            lambda x: band_compact_coords(x, max_edges))(e)
        return (xs.astype(jnp.int32).sum() + cts.sum())

    def t_acc(e):
        acc = jax.vmap(lambda x: hough_accumulator(
            x, max_edges=max_edges))(e)
        return acc.sum()

    def t_lines(e):
        lines, valid = jax.vmap(lambda x: hough_lines(
            x, threshold=80, max_edges=max_edges))(e)
        return valid.astype(jnp.int32).sum()

    def t_peak_only(e):
        acc = jax.vmap(lambda x: hough_accumulator(
            x, max_edges=max_edges))(e)
        return jax.vmap(lambda a: _is_peak(a, 80).astype(jnp.int32).sum()
                        )(acc).sum()

    for name, op in (("compact", t_compact), ("accumulator", t_acc),
                     ("acc+peak", t_peak_only), ("hough_lines", t_lines)):
        dt = chained(op)
        print(f"{name:12s} {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
