"""Micro-benchmark of lut_lookup formulations on the current device.

The one-hot MXU lookup underlies rgb<->lab/hsv, equalize, and CLAHE's
table applications; night-pipeline profiling put rgb_to_lab at ~2 ms/MP,
~7x above its VPU op-count floor. Variants probed here: chunk size,
lax.map vs one flat op, lo-width, bf16 indicators, and stacked channels.

Usage: python benchmarks/micro_lut.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPS = 50


def variant(table, lo, chunk, ind_dtype, flat):
    n = int(table.shape[0])
    n_hi = (n + lo - 1) // lo
    pad = n_hi * lo - n
    t2d = jnp.pad(table.astype(jnp.float32), (0, pad)).reshape(n_hi, lo)
    hi_iota = jnp.arange(n_hi, dtype=jnp.int32)
    lo_iota = jnp.arange(lo, dtype=jnp.int32)

    def lookup(idx):
        shape = idx.shape
        v = idx.reshape(-1).astype(jnp.int32)
        total = v.shape[0]
        cpad = (-total) % chunk
        vp = jnp.pad(v, (0, cpad)).reshape(-1, chunk)

        def one_chunk(cvec):
            hi = cvec // lo
            lo_ = cvec % lo
            if ind_dtype == jnp.bfloat16:
                # bf16 indicators with a byte-split table: every part <=255
                # is bf16-exact, partial sums < 2^24 stay exact in f32
                oh_hi = (hi[:, None] == hi_iota[None, :]).astype(jnp.bfloat16)
                parts = []
                for shift in (16, 8, 0):
                    tp = ((t2d.astype(jnp.int32) >> shift) & 255
                          ).astype(jnp.bfloat16)
                    parts.append(jnp.matmul(oh_hi, tp,
                                            preferred_element_type=jnp.float32))
                rows = parts[0] * 65536.0 + parts[1] * 256.0 + parts[2]
                oh_lo = (lo_[:, None] == lo_iota[None, :]).astype(jnp.bfloat16)
                return jnp.sum(rows * oh_lo.astype(jnp.float32), axis=-1)
            oh_hi = (hi[:, None] == hi_iota[None, :]).astype(jnp.float32)
            rows = jnp.matmul(oh_hi, t2d, preferred_element_type=jnp.float32)
            oh_lo = (lo_[:, None] == lo_iota[None, :]).astype(jnp.float32)
            return jnp.sum(rows * oh_lo, axis=-1)

        if flat:
            out = one_chunk(jnp.pad(v, (0, cpad)))
            return out[:total].reshape(shape)
        out = lax.map(one_chunk, vp).reshape(-1)[:total]
        return out.reshape(shape)

    return lookup


def main():
    rng = np.random.default_rng(0)
    # cbrt-table-like: 4408 entries of 17-bit ints; 8x 1MP index planes
    table = jnp.asarray(rng.integers(0, 1 << 17, 4408).astype(np.int64))
    idx = jnp.asarray(rng.integers(0, 4408, (2, 1092, 1000)).astype(np.int32))
    mp = idx.size / 1e6

    triv = jax.jit(lambda b: b[0, 0, 0])
    int(np.asarray(triv(idx)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(idx)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms; {mp:.1f} MP of lookups per iter")

    def bench(name, lookup):
        @jax.jit
        def f(b):
            def body(i, carry):
                b_, acc = carry
                # FULL reduction: a sampling slice lets XLA compute only
                # the sampled pixels of an elementwise lookup (measured
                # 180k "MP/s" phantom numbers)
                tok = lookup(b_).astype(jnp.int32).sum()
                return b_.at[(0,) * b_.ndim].set(tok % 251), acc + tok
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
        int(np.asarray(f(idx)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(idx)))
            best = min(best, time.perf_counter() - t0)
        dt = (best - rtt) / REPS
        print(f"{name:34s} {dt*1e3:7.2f} ms  {mp/dt:7.0f} MP/s", flush=True)

    from tpuimage.ops.lut import lut_lookup
    bench("current lut_lookup", lambda b: lut_lookup(table, b))
    bench("map lo=64 chunk=64k f32", variant(table, 64, 65536, jnp.float32, False))
    bench("flat lo=64 f32", variant(table, 64, 65536, jnp.float32, True))
    bench("flat lo=128 f32", variant(table, 128, 65536, jnp.float32, True))


if __name__ == "__main__":
    main()
