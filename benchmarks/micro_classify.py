"""Micro-benchmark: batched classification device cues (12x 256x256, the
measure_baseline config) with stage attribution on the current device.

Chained-rep timing (full-sum tokens, all-batch perturbation) — see
BASELINE.md round-2 pitfalls.

Usage: python benchmarks/micro_classify.py
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
    from tpuimage.classify.heuristic import _device_cues
    from tpuimage.ops import color as colorops
    from tpuimage.ops.threshold import threshold_otsu
    from tpuimage.ops.edges import canny
    from tpuimage.ops.hough import hough_lines
    from PIL import Image

    files = sorted(glob.glob("/root/reference/public/*.jpg")
                   + glob.glob("/root/reference/public/*.png"))
    imgs = []
    for f in files:
        with Image.open(f) as im:
            imgs.append(np.asarray(im.convert("RGB").resize((256, 256)),
                                   dtype=np.uint8))
    stack = jnp.asarray(np.stack(imgs))
    mp = stack.size / 3 / 1e6
    print(f"{len(imgs)} images  {mp:.2f} MP/dispatch")

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0, 0])
    int(np.asarray(triv(stack)))
    # min-of-7, NOT mean: one slow tunnel round trip inflates a mean RTT
    # and every (t - rtt)/REPS below goes negative/undercounted (the
    # 2026-08-19 12:07 sweep measured rtt 48.5 vs a true ~30 ms that way).
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        int(np.asarray(triv(stack)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"rtt {rtt*1e3:.2f} ms")

    def chained(op):
        @jax.jit
        def f(b):
            def body(i, carry):
                b_, acc = carry
                tok = op(b_)
                return (b_.at[:, 0, 0, :].set((tok % 251).astype(jnp.uint8)),
                        acc + tok)
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
        int(np.asarray(f(stack)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(stack)))
            best = min(best, time.perf_counter() - t0)
        return (best - rtt) / REPS

    grays = jax.jit(jax.vmap(colorops.rgb_to_gray))(stack)

    def tok(x):
        return x.astype(jnp.int32).sum()

    def cues_tok(out):
        return (sum(tok(t) for t in out[:3]) + tok(out[3]) + tok(out[5])
                + tok(out[4].astype(jnp.int32)))

    # Round-4 cue-schedule sweep (VERDICT r3 Next #4): every variant is
    # bit-exact (tests pin them); this sweep crowns the production
    # CUE_SCHEDULE defaults in classify/heuristic.py.
    from tpuimage.classify.heuristic import _device_cues_batch
    from tpuimage.ops.edges import canny_batch

    def sched(**kw):
        return lambda b: cues_tok(_device_cues_batch(b, **kw))

    stages = [
        ("gray+otsu", lambda b: tok(jax.vmap(
            lambda im: threshold_otsu(colorops.rgb_to_gray(im))[1])(b))),
        ("canny", lambda b: tok(jax.vmap(
            lambda im: canny(colorops.rgb_to_gray(im), 50, 150))(b))),
        ("canny_stacked", lambda b: tok(canny_batch(
            jax.vmap(colorops.rgb_to_gray)(b), 50, 150))),
        ("canny_st_lscan", lambda b: tok(canny_batch(
            jax.vmap(colorops.rgb_to_gray)(b), 50, 150, impl="linescan"))),
        ("canny_st_hybrid", lambda b: tok(canny_batch(
            jax.vmap(colorops.rgb_to_gray)(b), 50, 150, impl="hybrid"))),
        ("canny+hough", lambda b: tok(jax.vmap(
            lambda im: hough_lines(canny(colorops.rgb_to_gray(im), 50, 150),
                                   threshold=150, max_lines=256,
                                   max_edges=256 * 256 // 4)[1]
            .astype(jnp.int32))(b))),
        ("full_cues", lambda b: cues_tok(jax.vmap(_device_cues)(b))),
        ("cues_batch", sched()),
        ("cues_stacked", sched(canny_impl="stacked")),
        ("cues_pack2", sched(theta_pack=2)),
        ("cues_pack2lo32", sched(theta_pack=2, vote_lo=32)),
        ("cues_pack4lo32", sched(theta_pack=4, vote_lo=32)),
        ("cues_st_pack2", sched(canny_impl="stacked", theta_pack=2)),
        ("cues_st_p4l32", sched(canny_impl="stacked", theta_pack=4,
                                vote_lo=32)),
        ("cues_ls_p4l32", sched(canny_impl="stacked_linescan", theta_pack=4,
                                vote_lo=32)),
        ("cues_hy_p4l32", sched(canny_impl="stacked_hybrid", theta_pack=4,
                                vote_lo=32)),
    ]
    for name, fn in stages:
        dt = chained(fn)
        print(f"{name:14s} {dt*1e3:7.2f} ms   {mp/dt:8.1f} MP/s")


if __name__ == "__main__":
    main()
