"""How does lax.top_k cost scale with k (and dtype) on this chip?
In-jit chained reps for precise timing. Usage: python benchmarks/micro_topk.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPS = 10


def main():
    rng = np.random.default_rng(0)
    # the docscan compaction shape: batch 8, 128 bands x 7960, ~5% edges
    m = (rng.random((8, 128, 7960)) < 0.05).astype(np.int32) * 255
    x = jnp.asarray(m)

    triv = jax.jit(lambda b: b[0, 0, 0])
    int(np.asarray(triv(x)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(x)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms")

    def timed(f):
        g = jax.jit(f)
        int(np.asarray(g(x)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(g(x)))
            best = min(best, time.perf_counter() - t0)
        return (best - rtt) / REPS

    def chain(op):
        def f(b):
            def body(i, carry):
                b_, acc = carry
                s = op(b_)
                return b_.at[0, 0, 0].set(s % 251), acc + s
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
        return f

    for k in (128, 256, 512, 1024, 2048):
        dt = timed(chain(lambda b, k=k: lax.top_k(b, k)[1].astype(jnp.int32)[
            :, :, :8].sum() & 0x7fffffff))
        print(f"top_k k={k:5d}: {dt*1e3:7.2f} ms")

    # sort whole thing (descending keys only)
    dt = timed(chain(lambda b: lax.sort(b, dimension=2)[:, :, :8].sum()
                     & 0x7fffffff))
    print(f"sort full   : {dt*1e3:7.2f} ms")

    # variadic sort (key + index payload) — what top_k lowers to
    idx = jnp.broadcast_to(jnp.arange(7960, dtype=jnp.int32), (8, 128, 7960))

    def vsort(b):
        _, ix = lax.sort((-b, idx), dimension=2, num_keys=1)
        return ix[:, :, :8].sum() & 0x7fffffff
    dt = timed(chain(vsort))
    print(f"vsort full  : {dt*1e3:7.2f} ms")

    # u16 packed single-key sort: (edge<<13) | (8191 - idx); descending order
    # puts edges first with idx ascending. Half the bytes of an i32 sort,
    # quarter of the co-sort. Index recovery is pure elementwise afterwards.
    iu = jnp.broadcast_to(
        (8191 - jnp.arange(7960)).astype(jnp.uint16), (8, 128, 7960))

    def u16sort(b):
        keys = (jnp.where(b > 0, jnp.uint16(0x2000), jnp.uint16(0)) | iu)
        s = lax.sort(keys, dimension=2, is_stable=False)  # ascending
        top = s[:, :, -2048:]                             # edges at the tail
        ci = (8191 - (top & jnp.uint16(0x1fff))).astype(jnp.int32)
        cnt = jnp.sum((top >= 0x2000).astype(jnp.int32), axis=2)
        return ci[:, :, :8].sum() + cnt.sum() & 0x7fffffff
    dt = timed(chain(u16sort))
    print(f"u16 packed  : {dt*1e3:7.2f} ms")

    # i32 packed single-key (prior session: measured slower than co-sort;
    # re-check alongside u16)
    ii = jnp.broadcast_to((8191 - jnp.arange(7960)), (8, 128, 7960)
                          ).astype(jnp.int32)

    def i32packed(b):
        keys = jnp.where(b > 0, 0x2000, 0) | ii
        s = lax.sort(keys, dimension=2, is_stable=False)
        top = s[:, :, -2048:]
        ci = 8191 - (top & 0x1fff)
        cnt = jnp.sum((top >= 0x2000).astype(jnp.int32), axis=2)
        return ci[:, :, :8].sum() + cnt.sum() & 0x7fffffff
    dt = timed(chain(i32packed))
    print(f"i32 packed  : {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
