"""Internal breakdown of band_compact_coords on the device: key build +
sort vs slicing/counts vs coordinate computation/transpose/pad.

Usage: python benchmarks/micro_compact.py [batch]          # flat breakdown
       python benchmarks/micro_compact.py sweep [batch] [density]
         # impl / (group, cap) schedule sweep of the FULL compaction:
         # stage-2 merge width is n_groups*cap, so cap 48/32 shrink the
         # bitonic network 25/50% below the production (128, 64)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BATCH = (int(sys.argv[1])
         if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8)
REPS = 10
H, W = 1200, 849


def main():
    from tpuimage.ops.pallas_kernels import (HOUGH_POISON_X, HOUGH_POISON_Y,
                                             _HOUGH_BANDS, _HOUGH_ROWS)

    rng = np.random.default_rng(0)
    edges = (rng.random((BATCH, H, W)) < 0.05).astype(np.uint8) * 255
    batch = jnp.asarray(edges)

    n = H * W
    n_over_b = -(-n // _HOUGH_BANDS)
    max_edges = min(max(131072, (n * 3) // 16), 524288)
    kk = min(max(1, max_edges // _HOUGH_BANDS), n_over_b)
    kb = kk + (-kk) % 128
    n_bits = max((n_over_b - 1).bit_length(), 1)
    flag_mask = (1 << n_bits) - 1
    key_dtype = jnp.int16 if n_bits + 1 <= 15 else jnp.int32

    def upto(stage):
        def one(eimg):
            e = (eimg.reshape(-1) > 0).astype(key_dtype)
            m = jnp.pad(e, (0, n_over_b * _HOUGH_BANDS - n)
                        ).reshape(n_over_b, _HOUGH_BANDS).T
            rev = ((n_over_b - 1)
                   - jnp.arange(n_over_b, dtype=jnp.int32)[None, :]
                   ).astype(key_dtype)
            key = (m << n_bits) | rev
            s = lax.sort(key, dimension=1, is_stable=False)
            if stage == "sort":
                return s.astype(jnp.int32).sum().reshape(1, 1)
            top = s[:, n_over_b - kk:][:, ::-1].astype(jnp.int32)
            validb = top >> n_bits
            counts = validb.sum(axis=1)
            if stage == "counts":
                return (top.sum() + counts.sum()).reshape(1, 1)
            ci = (n_over_b - 1) - (top & flag_mask)
            band = jnp.arange(_HOUGH_BANDS, dtype=jnp.int32)[:, None]
            gi = ci * _HOUGH_BANDS + band
            ok = validb > 0
            xs = jnp.where(ok, (gi % W).astype(jnp.float32), HOUGH_POISON_X)
            ys = jnp.where(ok, (gi // W).astype(jnp.float32), HOUGH_POISON_Y)
            xs_t, ys_t = xs.T, ys.T
            if kb > kk:
                xs_t = jnp.pad(xs_t, ((0, kb - kk), (0, 0)),
                               constant_values=HOUGH_POISON_X)
                ys_t = jnp.pad(ys_t, ((0, kb - kk), (0, 0)),
                               constant_values=HOUGH_POISON_Y)
            if stage == "full":
                return (xs_t.astype(jnp.int32).sum()
                        + ys_t.astype(jnp.int32).sum()
                        + counts.sum()).reshape(1, 1)
            raise ValueError(stage)
        return one

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0])
    int(np.asarray(triv(batch)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(batch)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.2f} ms   kk={kk} kb={kb} n_over_b={n_over_b} "
          f"dtype={key_dtype.__name__}")

    for stage in ("sort", "counts", "full"):
        one = upto(stage)

        @jax.jit
        def f(b, one=one):
            def body(i, carry):
                b_, acc = carry
                out = jax.vmap(one)(b_)
                tok = out.astype(jnp.int32).sum()
                return (b_.at[:, 0, 0].set((tok % 251).astype(jnp.uint8)),
                        acc + tok)
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
        int(np.asarray(f(batch)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(batch)))
            best = min(best, time.perf_counter() - t0)
        print(f"{stage:8s} {(best - rtt)/REPS*1e3:7.2f} ms")


def sweep():
    """Chained-rep timing of the full band_compact_coords under vmap at
    the fused program's shape, across impl and (group, cap) schedules.
    All three outputs feed the token (no dead-coding) and every batch
    element is perturbed per rep (no hoisting) — BASELINE.md pitfalls."""
    from tpuimage.ops import hough as hough_mod

    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    density = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    rng = np.random.default_rng(0)
    edges = (rng.random((batch_n, H, W)) < density).astype(np.uint8) * 255
    batch = jnp.asarray(edges)
    k = min(max(131072, (H * W * 3) // 16), 524288)

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0])
    int(np.asarray(triv(batch)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(batch)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.2f} ms   batch={batch_n} density={density} k={k}")

    # stage-1-only probe (local int8 sort + front slice, no merge/coords):
    # attributes the twostage total between its two sorts
    from tpuimage.ops.hough import _HOUGH_BANDS as BANDS

    def stage1_only(eimg, group=128, cap=64):
        n = H * W
        n_over_b = -(-n // BANDS)
        n_groups = -(-n_over_b // group)
        e = (eimg.reshape(-1) > 0)
        m = jnp.pad(e, (0, n_over_b * BANDS - n)).reshape(n_over_b, BANDS).T
        mg = jnp.pad(m, ((0, 0), (0, n_groups * group - n_over_b))
                     ).reshape(BANDS, n_groups, group)
        lidx = jnp.arange(group, dtype=jnp.int32).astype(jnp.int8)
        lkey = jnp.where(mg, jnp.int8(-128) | lidx, lidx)
        ls = lax.sort(lkey.reshape(BANDS * n_groups, group),
                      dimension=1, is_stable=False)
        front = ls.reshape(BANDS, n_groups, group)[:, :, :cap]
        return front.astype(jnp.int32).sum()

    @jax.jit
    def f1(b):
        def body(i, carry):
            b_, acc = carry
            tok = jax.vmap(stage1_only)(b_).sum()
            return (b_.at[:, 0, 0].set((tok % 251).astype(jnp.uint8)),
                    acc + tok)
        return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
    int(np.asarray(f1(batch)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(np.asarray(f1(batch)))
        best = min(best, time.perf_counter() - t0)
    print(f"{'twostage stage1 only':26s} {(best - rtt)/REPS*1e3:7.2f} ms")

    configs = [
        ("flat", dict(impl="flat")),
        ("rank", dict(impl="rank")),
        ("twostage g128 c64 (prod)", dict(impl="twostage")),
        ("twostage g128 c48", dict(impl="twostage", cap=48)),
        ("twostage g128 c32", dict(impl="twostage", cap=32)),
        ("twostage g64  c48", dict(impl="twostage", group=64, cap=48)),
        ("twostage g64  c32", dict(impl="twostage", group=64, cap=32)),
    ]
    for name, kw in configs:
        def one(eimg, kw=kw):
            xs_t, ys_t, counts = hough_mod.band_compact_coords(eimg, k, **kw)
            return (xs_t.astype(jnp.int32).sum()
                    + ys_t.astype(jnp.int32).sum() + counts.sum())

        @jax.jit
        def f(b, one=one):
            def body(i, carry):
                b_, acc = carry
                tok = jax.vmap(one)(b_).sum()
                return (b_.at[:, 0, 0].set((tok % 251).astype(jnp.uint8)),
                        acc + tok)
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]

        int(np.asarray(f(batch)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(batch)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:26s} {(best - rtt)/REPS*1e3:7.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    else:
        main()
