"""LAB Pallas-kernel formulation experiments (kernel-only, prefab planes).

Variants of the fused RGB->Lab LUT kernel, chained-rep timed on the
current device, each checked bit-identical to ops.color.rgb_to_lab's
XLA path first. Usage: python benchmarks/micro_lab_kernel.py [batch]
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from PIL import Image

from tpuimage.ops import color as colorops

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPS = 10
L_SCALE = (116 * 255 + 50) // 100
L_SHIFT = -((16 * 255 * (1 << 15) + 50) // 100)
C = [[int(colorops._LAB_COEFFS[r][c]) for c in range(3)] for r in range(3)]


def descale_i(x, n):
    return lax.shift_right_arithmetic(x + (1 << (n - 1)), n)


def split_tab(tab_np, lo, hi, vbits):
    """Index-radix (lo, hi) reshape of a table + value byte-split at vbits."""
    t = np.asarray(tab_np, np.int64).reshape(hi, lo).T       # (lo, hi)
    return (jnp.asarray(t >> vbits, jnp.bfloat16),
            jnp.asarray(t & ((1 << vbits) - 1), jnp.bfloat16))


def make_kernel_stacked(rows, gamma_lo, gamma_hi, cbrt_lo, cbrt_hi,
                        fuse_channels):
    """Stacked hi/lo value-split -> ONE dot per lookup; optional 3-channel
    concat -> one dot per table per step."""
    chunk = rows * 128
    glog = gamma_lo.bit_length() - 1
    clog = cbrt_lo.bit_length() - 1

    def lut(a_st, idx, n_hi, lo_n, lo_log, mul_hi):
        # a_st: (2*lo_n, n_hi) stacked [hi_v; lo_v]
        hi = lax.shift_right_logical(idx, lo_log)
        lo = lax.bitwise_and(idx, lo_n - 1)
        n = idx.shape[1]
        ohT = (hi == lax.broadcasted_iota(jnp.int32, (n_hi, n), 0)
               ).astype(jnp.bfloat16)
        r = lax.dot_general(a_st, ohT,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        sel = (lax.broadcasted_iota(jnp.int32, (lo_n, n), 0) == lo)
        v = r[:lo_n] * mul_hi + r[lo_n:]
        return jnp.sum(jnp.where(sel, v, 0.0), axis=0,
                       keepdims=True).astype(jnp.int32)

    def kernel(ag_ref, ac_ref, r_ref, g_ref, b_ref, l_ref, a_ref, b2_ref):
        ag, ac = ag_ref[:], ac_ref[:]
        if fuse_channels:
            rgb = jnp.concatenate([r_ref[:].reshape(1, chunk),
                                   g_ref[:].reshape(1, chunk),
                                   b_ref[:].reshape(1, chunk)], axis=1)
            gv = lut(ag, rgb, gamma_hi, gamma_lo, glog, float(1 << 5))
            r, g, b = (gv[:, :chunk], gv[:, chunk:2 * chunk],
                       gv[:, 2 * chunk:])
            ixs = [jnp.clip(descale_i(r * C[k][0] + g * C[k][1]
                                      + b * C[k][2], 12), 0, 3071)
                   for k in range(3)]
            fv = lut(ac, jnp.concatenate(ixs, axis=1), cbrt_hi, cbrt_lo,
                     clog, float(1 << 7))
            fx, fy, fz = (fv[:, :chunk], fv[:, chunk:2 * chunk],
                          fv[:, 2 * chunk:])
        else:
            r = lut(ag, r_ref[:].reshape(1, chunk), gamma_hi, gamma_lo,
                    glog, float(1 << 5))
            g = lut(ag, g_ref[:].reshape(1, chunk), gamma_hi, gamma_lo,
                    glog, float(1 << 5))
            b = lut(ag, b_ref[:].reshape(1, chunk), gamma_hi, gamma_lo,
                    glog, float(1 << 5))
            fx, fy, fz = [lut(ac, jnp.clip(descale_i(
                r * C[k][0] + g * C[k][1] + b * C[k][2], 12), 0, 3071),
                cbrt_hi, cbrt_lo, clog, float(1 << 7)) for k in range(3)]
        shift2 = 15
        l_val = descale_i(L_SCALE * fy + L_SHIFT, shift2)
        a_val = descale_i(500 * (fx - fy) + (128 << shift2), shift2)
        b_val = descale_i(200 * (fy - fz) + (128 << shift2), shift2)
        l_ref[:] = jnp.clip(l_val, 0, 255).reshape(rows, 128)
        a_ref[:] = jnp.clip(a_val, 0, 255).reshape(rows, 128)
        b2_ref[:] = jnp.clip(b_val, 0, 255).reshape(rows, 128)

    return kernel


def build(rows, gamma_lo, cbrt_lo, fuse_channels, rows_total):
    gamma_hi, cbrt_hi = 256 // gamma_lo, 3072 // cbrt_lo
    agh, agl = split_tab(colorops._GAMMA_TAB_NP, gamma_lo, gamma_hi, 5)
    ach, acl = split_tab(colorops._CBRT_TAB_NP, cbrt_lo, cbrt_hi, 7)
    ag = jnp.concatenate([agh, agl], axis=0)
    ac = jnp.concatenate([ach, acl], axis=0)
    kernel = make_kernel_stacked(rows, gamma_lo, gamma_hi, cbrt_lo,
                                 cbrt_hi, fuse_channels)
    tab = pl.BlockSpec(memory_space=pltpu.VMEM)
    band = lambda t: (t, 0)

    def run(ps):
        return pl.pallas_call(
            kernel, grid=(rows_total // rows,),
            out_shape=tuple(jax.ShapeDtypeStruct((rows_total, 128),
                                                 jnp.int32)
                            for _ in range(3)),
            in_specs=[tab] * 2 + [pl.BlockSpec((rows, 128), band,
                                               memory_space=pltpu.VMEM)] * 3,
            out_specs=tuple(pl.BlockSpec((rows, 128), band,
                                         memory_space=pltpu.VMEM)
                            for _ in range(3)),
        )(ag, ac, *ps)

    return run


def main():
    with Image.open("/root/reference/public/nightview.png") as im:
        img = np.asarray(im.convert("RGB"), dtype=np.uint8)
    B = BATCH
    h, w, _ = img.shape
    batch = jnp.asarray(np.broadcast_to(img, (B,) + img.shape).copy())
    mp = B * h * w / 1e6
    n = B * h * w

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0])
    rows_all = 64
    rt_for = lambda rows: ((-(-n // 128)) + rows - 1) // rows * rows

    plane_cache = {}

    def planes(rows_total):
        if rows_total not in plane_cache:
            pad = rows_total * 128 - n
            f = jax.jit(lambda b: tuple(
                jnp.pad(b.reshape(B * h, w, 3)[..., c].reshape(-1)
                        .astype(jnp.int32), (0, pad)).reshape(rows_total, 128)
                for c in range(3)))
            plane_cache[rows_total] = tuple(
                jnp.asarray(np.asarray(p)) for p in f(batch))
        return plane_cache[rows_total]

    # reference output (XLA path)
    ref = np.asarray(jax.jit(lambda b: jax.vmap(
        lambda im_: colorops.rgb_to_lab(im_, impl="xla"))(b))(batch))

    p0 = planes(rt_for(64))[0]
    int(np.asarray(triv(p0)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(p0)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.2f} ms  {mp:.2f} MP/dispatch")

    def chained(op, inp):
        @jax.jit
        def f(ps):
            def body(i, carry):
                ps_, acc = carry
                outs = op(ps_)
                tok = sum(o.astype(jnp.int32).sum() for o in outs)
                ps2 = tuple(p.at[:, 0].set((tok % 251)) for p in ps_)
                return (ps2, acc + tok)
            return lax.fori_loop(0, REPS, body, (ps, jnp.int32(0)))[1]
        int(np.asarray(f(inp)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(inp)))
            best = min(best, time.perf_counter() - t0)
        return (best - rtt) / REPS

    variants = [
        ("B rows64 g64/c64 ch-sep", 64, 64, 64, False),
        ("C rows64 g64/c64 ch-fused", 64, 64, 64, True),
        ("D rows64 g16/c32 ch-fused", 64, 16, 32, True),
        ("E rows128 g16/c32 ch-fused", 128, 16, 32, True),
        ("F rows64 g16/c16 ch-fused", 64, 16, 16, True),
    ]
    for name, rows, glo, clo, fused in variants:
        rows_total = rt_for(rows)
        ps = planes(rows_total)
        run = build(rows, glo, clo, fused, rows_total)
        outs = jax.jit(run)(ps)
        got = np.stack([np.asarray(o).reshape(-1)[:n] for o in outs],
                       axis=-1).reshape(B, h, w, 3).astype(np.uint8)
        ok = np.array_equal(got, ref)
        dt = chained(run, ps)
        print(f"{name:28s} exact={ok}  {dt*1e3:7.2f} ms  "
              f"{mp/dt:8.1f} MP/s")


if __name__ == "__main__":
    main()
