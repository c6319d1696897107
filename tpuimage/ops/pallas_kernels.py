"""Pallas TPU kernels for stencil-heavy ops.

Bilateral filter (cv2.bilateralFilter 8u gray path — DocScanner.py:42
preprocess): the XLA scan version re-materializes the (num, den) carry per
tap to HBM; here the padded image lives in VMEM for the whole tap loop
(one HBM read + one write total) and the kernel iterates a row-band grid.

Hardware-viability lessons (round 1 -> round 2):
- An unrolled Python tap loop over misaligned STATIC slices of a
  VMEM-resident image makes Mosaic materialize every slice at once
  (61 taps x ~1 MB blew the 16 MB scoped-VMEM limit). The kernel now
  runs a fori_loop over a tap table in SMEM: one live slice at a time.
- Dynamic LANE offsets force relayouts (10x slowdowns measured on the
  Hough kernel); column shifts are done with pltpu.roll (native lane
  rotation) on a lane-aligned padded width, with the wrapped lanes
  falling outside the cropped output region.
- The grid walks row bands so scratch accumulators stay small and the
  kernel scales to any image height at fixed VMEM cost.

Numerics are identical to ops.bilateral (same tap ORDER, same space/color
weight expressions, same f32 accumulation, cvRound output), so it inherits
the same ±1 LSB contract vs cv2. Falls back to the scan implementation for
color images or images whose padded f32 copy would not fit VMEM.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# whole padded f32 image must fit in VMEM alongside the band scratch
_VMEM_PADDED_BYTES = 12 * 1024 * 1024
_BAND_ROWS = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_bilateral_band_kernel(th: int, wp: int, gauss_color: float,
                                ntaps: int):
    """One grid step computes output rows [t*th, (t+1)*th): fori_loop over
    the SMEM tap table; each tap is a dynamic-SUBLANE slice of the padded
    image plus a lane rotation (see module docstring)."""

    def kernel(dy_ref, dx_ref, sw_ref, padded_ref, center_ref, out_ref,
               num_ref, den_ref):
        t = pl.program_id(0)
        num_ref[:] = jnp.zeros((th, wp), jnp.float32)
        den_ref[:] = jnp.zeros((th, wp), jnp.float32)
        c = center_ref[:]

        def body(i, _):
            dy = dy_ref[i, 0]
            dx = dx_ref[i, 0]
            sw = sw_ref[i, 0]
            # Mosaic requires dynamic sublane offsets provably 8-aligned:
            # load an 8-aligned slab one stripe taller, then rotate the
            # sub-stripe remainder in with a sublane roll
            base = (dy // 8) * 8
            rem = dy - base
            slab = padded_ref[pl.ds(t * th + base, th + 8), :]
            slab = pltpu.roll(slab, (th + 8) - rem, axis=0)
            view = slab[:th, :]
            # rolled[:, x] = view[:, x + dx]; wrapped lanes land at
            # x >= wp - dx >= w (cropped by the caller)
            view = pltpu.roll(view, wp - dx, axis=1)
            diff = jnp.abs(view - c)
            wgt = jnp.exp(diff * diff * gauss_color) * sw
            num_ref[:] = num_ref[:] + view * wgt
            den_ref[:] = den_ref[:] + wgt
            return 0

        jax.lax.fori_loop(0, ntaps, body, 0)
        # Mosaic can't cast f32->u8 directly; emit int32, caller casts
        out_ref[:] = jnp.clip(jnp.rint(num_ref[:] / den_ref[:]), 0, 255
                              ).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("d", "sigma_color", "sigma_space",
                                             "interpret"))
def bilateral_gray_pallas(img: jnp.ndarray, d: int, sigma_color: float,
                          sigma_space: float, interpret: bool = False) -> jnp.ndarray:
    """cv2.bilateralFilter on uint8 HW via one fused VMEM tap loop."""
    from tpuimage.ops.bilateral import _params, _tap_offsets
    from tpuimage.core.borders import pad2d, BORDER_REFLECT_101

    radius, sc, ss = _params(d, sigma_color, sigma_space)
    taps = _tap_offsets(radius)
    gc = np.float32(-0.5 / (sc * sc))
    gs = -0.5 / (ss * ss)

    h, w = int(img.shape[0]), int(img.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    wp = _round_up(w + 2 * radius, 128)
    # reflect-101 halo around the REAL image first (exact border), then
    # edge-pad to the lane/band-aligned shape (cropped afterwards)
    pf = pad2d(img.astype(jnp.float32), radius, radius, radius, radius,
               mode=BORDER_REFLECT_101)
    # +8 bottom rows: the kernel reads an 8-aligned slab one stripe taller
    # than the band to realize misaligned sublane offsets via roll
    p = pad2d(pf, 0, hp - h + 8, 0, wp - (w + 2 * radius), mode="edge")
    center = pad2d(img.astype(jnp.float32), 0, hp - h, 0, wp - w, mode="edge")

    dy = np.asarray([[radius + t[0]] for t in taps], np.int32)
    dx = np.asarray([[radius + t[1]] for t in taps], np.int32)
    sw = np.asarray([[np.float32(np.exp(t[2] * t[2] * gs))] for t in taps],
                    np.float32)
    kernel = _make_bilateral_band_kernel(th, wp, float(gc), len(taps))

    out = pl.pallas_call(
        kernel,
        grid=(hp // th,),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tap dy table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tap dx table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # space weights
            # whole padded image stays VMEM-resident across all bands
            pl.BlockSpec((hp + 2 * radius + 8, wp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wp), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),   # center band
        ],
        out_specs=pl.BlockSpec((th, wp), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th, wp), jnp.float32),
            pltpu.VMEM((th, wp), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(dy), jnp.asarray(dx), jnp.asarray(sw), p, center)
    return out[:h, :w].astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Separable fixed-point convolution (the cv2.GaussianBlur 8u Q8.8 path)
# ---------------------------------------------------------------------------


def _make_sepconv_band_kernel(th: int, wp: int, n: int):
    """Separable conv over one row band: vertical pass via slab+sublane-roll
    taps (same alignment trick as the bilateral kernel), horizontal pass via
    lane rolls of the vertical result. Tap weights arrive in SMEM; the Q8.8
    integer-valued f32 accumulation is order-independent (exact integers
    < 2^24), so the simple 0..n-1 order reproduces ops.filters bit-for-bit."""

    def kernel(kv_ref, kh_ref, padded_ref, out_ref, vacc_ref, hacc_ref):
        t = pl.program_id(0)
        vacc_ref[:] = jnp.zeros((th, wp), jnp.float32)

        def vbody(i, _):
            base = (i // 8) * 8
            rem = i - base
            slab = padded_ref[pl.ds(t * th + base, th + 8), :]
            slab = pltpu.roll(slab, (th + 8) - rem, axis=0)
            vacc_ref[:] = vacc_ref[:] + slab[:th, :] * kv_ref[i, 0]
            return 0

        jax.lax.fori_loop(0, n, vbody, 0)

        hacc_ref[:] = jnp.zeros((th, wp), jnp.float32)

        def hbody(j, _):
            view = pltpu.roll(vacc_ref[:], wp - j, axis=1)
            hacc_ref[:] = hacc_ref[:] + view * kh_ref[j, 0]
            return 0

        jax.lax.fori_loop(0, n, hbody, 0)
        # cv2 8u fixed point: Q16.16 result, round half up; int32 out
        # (Mosaic can't cast f32->u8), caller casts
        out_ref[:] = jnp.floor((hacc_ref[:] + 32768.0) * (1.0 / 65536.0)
                               ).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("ksize", "sigma", "interpret"))
def gaussian_blur_u8_pallas(img: jnp.ndarray, ksize: int, sigma: float = 0.0,
                            interpret: bool = False) -> jnp.ndarray:
    """cv2.GaussianBlur 8u (BORDER_REFLECT_101) as one fused VMEM kernel:
    one HBM read + one write instead of 2*ksize shifted full-image MACs.
    Bit-exact vs ops.filters.gaussian_blur_u8 (same Q8.8 kernel, exact
    integer-valued f32 accumulation)."""
    from tpuimage.ops.filters import gaussian_kernel_q8
    from tpuimage.core.borders import pad2d, BORDER_REFLECT_101

    k = gaussian_kernel_q8(ksize, sigma).astype(np.float32)
    r = ksize // 2
    h, w = int(img.shape[0]), int(img.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    wp = _round_up(w + 2 * r, 128)
    pf = pad2d(img.astype(jnp.float32), r, r, r, r, mode=BORDER_REFLECT_101)
    p = pad2d(pf, 0, hp - h + 8, 0, wp - (w + 2 * r), mode="edge")

    kcol = jnp.asarray(k.reshape(-1, 1))
    kernel = _make_sepconv_band_kernel(th, wp, ksize)
    out = pl.pallas_call(
        kernel,
        grid=(hp // th,),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # vertical taps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # horizontal taps
            pl.BlockSpec((hp + 2 * r + 8, wp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, wp), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th, wp), jnp.float32),
            pltpu.VMEM((th, wp), jnp.float32),
        ],
        interpret=interpret,
    )(kcol, kcol, p)
    return jnp.clip(out[:h, :w], 0, 255).astype(jnp.uint8)


def gaussian_pallas_applicable(img, ksize: int) -> bool:
    """Hardware dispatch gate for the fused separable gaussian: always
    False — measured on the chip (1200x849 u8, chained-rep timing), XLA's
    unrolled shifted-MAC form wins at every kernel size (k=51: 0.0 vs
    0.3 ms single image, 2.7 vs 4.1 ms vmapped batch 8; k=101: 0.2 vs
    0.8 ms) because XLA fuses the conv into surrounding elementwise ops
    and keeps taps in registers, while a separate pallas_call breaks that
    fusion and pays slab loads + rolls per tap. The kernel stays
    correctness-validated (tests/test_pallas.py) and forceable via
    gaussian_blur_u8(impl="pallas") for stencils too large for XLA's
    unrolled form; separable convs are one case where the compiler's
    fusion beats a hand-written kernel."""
    return False


# ---------------------------------------------------------------------------
# Hough vote accumulation
# ---------------------------------------------------------------------------

_HOUGH_LO = 64       # lo-bin width: 64 measured fastest on v5e for A4-page
                     # rho ranges (vote kernel 6.8 ms vs 8.7 at 128 and
                     # 10.2 at 32, batch 8) — fewer one-hot lo rows beats
                     # full-lane alignment
_HOUGH_BANDS = 128   # compaction bands (edge e lives in band flat_idx % 128)
_HOUGH_ROWS = 64     # rows per in-kernel chunk (chunk = ROWS * BANDS edges)


def _make_hough_kernel(n_hi: int, nbins: int,
                       mxu_dtype, acc_dtype, rows: int = _HOUGH_ROWS,
                       swap_mn: bool = False, lo_bins: int = _HOUGH_LO,
                       n_chunks: int = 1, pipelined: bool = False,
                       unroll: int = 1, cmp_bf16: bool = False,
                       schedule: str = "serial"):
    """votes[theta] = sum_e onehot_hi(r_e)^T @ onehot_lo(r_e) for one theta.

    Performance notes (measured on the axon chip, 8x 849x1200 pages):
    - The XLA scan formulation materializes the (edges, n_hi + LO) one-hots
      to HBM every theta step (~390 MB/step at batch 8): 33-53 ms total.
      Here they are built chunk-by-chunk in VMEM and die inside the loop.
    - One-hots are built LANE-MAJOR ((bins, edges), iota on sublanes): the
      natural (edges, bins) orientation needs an 8k-lane->sublane relayout
      per chunk that made the kernel 10x SLOWER than XLA (345 ms).
    - Edges arrive band-compacted (band b = flat_idx %% 128 at lane b, each
      band's edges packed to the front), so the chunk loop's trip count is
      dynamic: ceil(max_band_count / ROWS) — padding beyond the true edge
      count costs nothing.
    - The caller clips the rho axis to the REACHABLE bins (r in
      [-(w-1), hypot(w-1, h-1)] by construction, ~57%% of cv2's numrho for
      A4 pages): r_shift re-bases the bin index, n_hi shrinks accordingly.
    - bf16 0/1 one-hots with f32 accumulation are EXACT for counts < 2^24
      and measured FASTER than s8/s32 on v5e Mosaic (7.4 vs 10.7 ms at
      batch 8 — the s8 dot does not hit the chip's 2x int8 rate), so bf16
      is the default; the int8 path is kept selectable (mxu_dtype).
    - No range test on r: out-of-range and poisoned slots produce hi < 0
      or hi >= n_hi, which match NO row of the hi one-hot, so the edge
      contributes nothing — exactly what the old ``where(ok, r,
      invalid_bin)`` + spare-row arrangement achieved, minus two compares
      and a select per element. (lo = r & 63 of a negative r is still in
      [0, 64), but a lo-only match multiplies a zero hi column.)
    - Software-pipelining the chunk loop by CARRYING the next chunk's
      one-hot pair through fori_loop (build c+1 beside the dot of c) was
      measured 2.3x SLOWER (19.0 vs 8.1 ms at batch 8): Mosaic
      materializes the 1.6 MB carried pair to VMEM scratch and copies it
      every iteration, which costs more than the overlap recovers. The
      serial body lets the one-hots stream from vregs into the MXU.
      Selectable via pipelined=True for re-measurement.
    - unroll=U (serial path only) processes U chunks per fori_loop body —
      the SAME instruction sequence as serial, but grouped into one basic
      block so Mosaic's in-block scheduler can overlap chunk j+1's VPU
      one-hot build with chunk j's MXU dot WITHOUT carrying arrays across
      iterations (the failure mode of pipelined=True). Callers must pad
      the coordinate planes to a multiple of rows*unroll (poisoned slots
      vote nothing, so the over-run chunks of the rounded-up trip count
      are free); hough_votes_pallas does this.
    - cmp_bf16=True runs the one-hot iota compares in bfloat16 instead of
      int32 (r5 experiment). EXACT: hi < n_hi <= 128 and lo < lo_bins <=
      128 are integers < 256, all exactly representable in bf16; poisoned
      or out-of-window slots give hi/lo outside [0, 256) whose bf16
      rounding is to even integers still outside the iota range, so no
      false match is possible. The VPU's native lane is 32-bit, but if
      Mosaic packs bf16 compares 2/lane this halves the dominant VPU
      cost; if not it is a wash — the measurement discriminates.
    - schedule="dual" (grid path, unroll >= 2): even/odd chunks of each
      unrolled body accumulate into SEPARATE halves of a doubled VMEM
      accumulator, summed once in the epilogue — the serial schedule's
      acc read-modify-write chains consecutive dots, so chunk j+1's dot
      cannot issue until chunk j's retires even when its one-hot is
      ready; two independent accumulators break that chain (r5
      experiment). schedule="buildahead" additionally emits ALL U builds
      of a body before its U dots (classic modulo-schedule order), so
      the builds can run while the previous body's dots drain.
    """
    chunk = rows * _HOUGH_BANDS
    shift = lo_bins.bit_length() - 1 if lo_bins & (lo_bins - 1) == 0 else None

    acc_shape = (lo_bins, n_hi) if swap_mn else (n_hi, lo_bins)

    def build(c, ct, st, rs, xs_ref, ys_ref):
        # x/y arrive precomputed (poisoned for invalid slots — see
        # hough_votes_pallas docstring): 2 FMAs + round per edge, then
        # the two iota compares (the dominant VPU cost). rs is the
        # (possibly per-theta, see theta_wins) bin re-base shift.
        x = xs_ref[pl.ds(c * rows, rows), :]
        y = ys_ref[pl.ds(c * rows, rows), :]
        r = (jnp.round(x * ct + y * st).astype(jnp.int32) + rs
             ).reshape(1, chunk)
        if shift is not None:
            hi = jax.lax.shift_right_arithmetic(r, shift)
            lo = jax.lax.bitwise_and(r, lo_bins - 1)
        else:
            hi = r // lo_bins
            lo = r % lo_bins
        if cmp_bf16:
            # Mosaic's tpu.iota is integer-only: build the iota in i32 and
            # cast — the cast is loop-invariant (constant operand), so it
            # hoists out of the chunk loop; only the hi/lo casts are per
            # chunk. Exactness: see the cmp_bf16 note in the docstring.
            hi = hi.astype(jnp.bfloat16)
            lo = lo.astype(jnp.bfloat16)
            iota_hi = jax.lax.broadcasted_iota(
                jnp.int32, (n_hi, chunk), 0).astype(jnp.bfloat16)
            iota_lo = jax.lax.broadcasted_iota(
                jnp.int32, (lo_bins, chunk), 0).astype(jnp.bfloat16)
        else:
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hi, chunk), 0)
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (lo_bins, chunk), 0)
        ohT_hi = (hi == iota_hi).astype(mxu_dtype)
        ohT_lo = (lo == iota_lo).astype(mxu_dtype)
        return ohT_hi, ohT_lo

    def make_accumulate_theta(pipelined: bool):
        def dot_acc(acc_ref, ohT_hi, ohT_lo):
            a, b = (ohT_lo, ohT_hi) if swap_mn else (ohT_hi, ohT_lo)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype)

        def accumulate_serial(ct, st, rs, nt_ref, xs_ref, ys_ref, acc_ref):
            acc_ref[:] = jnp.zeros(acc_shape, acc_dtype)

            if unroll == 1:
                def body(c, _):
                    dot_acc(acc_ref, *build(c, ct, st, rs, xs_ref, ys_ref))
                    return 0

                jax.lax.fori_loop(0, nt_ref[0, 0], body, 0)
            else:
                # U independent (build, dot) pairs per body: build j+1 has
                # no dependency on dot j, so the scheduler may run it
                # during the dot. Over-run chunks (trip count rounded up
                # to a multiple of U) read only poisoned slots — in-bounds
                # by the caller's rows*unroll padding, contributing zero.
                def body(u, _):
                    for j in range(unroll):
                        dot_acc(acc_ref, *build(u * unroll + j, ct, st, rs,
                                                xs_ref, ys_ref))
                    return 0

                jax.lax.fori_loop(
                    0, (nt_ref[0, 0] + unroll - 1) // unroll, body, 0)

        def accumulate_pipelined(ct, st, rs, nt_ref, xs_ref, ys_ref,
                                 acc_ref):
            acc_ref[:] = jnp.zeros(acc_shape, acc_dtype)

            def body(c, carry):
                nxt = build(jnp.minimum(c + 1, n_chunks - 1), ct, st, rs,
                            xs_ref, ys_ref)
                dot_acc(acc_ref, *carry)
                return nxt

            jax.lax.fori_loop(0, nt_ref[0, 0], body,
                              build(0, ct, st, rs, xs_ref, ys_ref))

        return accumulate_pipelined if pipelined else accumulate_serial

    accumulate_theta = make_accumulate_theta(pipelined)

    if schedule == "serial":
        def kernel(nt_ref, ct_ref, st_ref, rs_ref, xs_ref, ys_ref, out_ref,
                   acc_ref):
            t = pl.program_id(0)
            accumulate_theta(ct_ref[t, 0], st_ref[t, 0], rs_ref[t, 0],
                             nt_ref, xs_ref, ys_ref, acc_ref)
            out_ref[:] = acc_ref[:].reshape((1,) + acc_shape)
    else:
        # dual-accumulator schedules (grid path, default orientation,
        # unroll >= 2; see factory docstring): acc_ref is (2*n_hi, lo),
        # even/odd chunks of each body land in separate halves so the acc
        # RMW never chains consecutive dots; "buildahead" also reorders
        # each body to U builds then U dots.
        assert not swap_mn and unroll >= 2 and not pipelined

        def accumulate_dual(ct, st, rs, nt_ref, xs_ref, ys_ref, acc_ref):
            acc_ref[:] = jnp.zeros((2 * n_hi, lo_bins), acc_dtype)

            def dot_half(j, ohT_hi, ohT_lo):
                h0 = (j % 2) * n_hi
                acc_ref[h0:h0 + n_hi, :] = (
                    acc_ref[h0:h0 + n_hi, :] + jax.lax.dot_general(
                        ohT_hi, ohT_lo,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=acc_dtype))

            if schedule == "buildahead":
                def body(u, _):
                    pairs = [build(u * unroll + j, ct, st, rs, xs_ref,
                                   ys_ref) for j in range(unroll)]
                    for j, (hh, ll) in enumerate(pairs):
                        dot_half(j, hh, ll)
                    return 0
            else:
                def body(u, _):
                    for j in range(unroll):
                        dot_half(j, *build(u * unroll + j, ct, st, rs,
                                           xs_ref, ys_ref))
                    return 0

            jax.lax.fori_loop(
                0, (nt_ref[0, 0] + unroll - 1) // unroll, body, 0)

        def kernel(nt_ref, ct_ref, st_ref, rs_ref, xs_ref, ys_ref, out_ref,
                   acc_ref):
            t = pl.program_id(0)
            accumulate_dual(ct_ref[t, 0], st_ref[t, 0], rs_ref[t, 0],
                            nt_ref, xs_ref, ys_ref, acc_ref)
            out_ref[:] = (acc_ref[:n_hi, :] + acc_ref[n_hi:, :]
                          ).reshape((1,) + acc_shape)

    def make_kernel_pack(pk: int):
        # pk thetas per dot: stack the thetas' hi one-hots in M (pk*n_hi
        # rows) and lo one-hots in N (pk*lo_bins cols). The MXU streams K
        # cycles per 128x128 output tile regardless of how few cells are
        # useful, so one (pk*n_hi, pk*lo) dot costs the tile passes of ONE
        # (n_hi, lo) dot while covering pk thetas — the off-diagonal
        # blocks (theta_i hi x theta_j lo, i != j) are garbage cross
        # counts and are never read. Requires pk*n_hi <= 128 and
        # pk*lo_bins <= 128 (asserted by caller); A4 pages fit pk=2 at
        # lo=64, small cue images fit pk=4 at lo=32.
        def kernel_pack(nt_ref, ct_ref, st_ref, rs_ref, xs_ref, ys_ref,
                        out_ref, acc_ref):
            t = pl.program_id(0)
            acc_ref[:] = jnp.zeros((pk * n_hi, pk * lo_bins), acc_dtype)

            def one_chunk(c):
                hs, ls = [], []
                for j in range(pk):
                    hj, lj = build(c, ct_ref[pk * t + j, 0],
                                   st_ref[pk * t + j, 0],
                                   rs_ref[pk * t + j, 0], xs_ref, ys_ref)
                    hs.append(hj)
                    ls.append(lj)
                acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                    jnp.concatenate(hs, axis=0), jnp.concatenate(ls, axis=0),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype)

            if unroll == 1:
                def body(c, _):
                    one_chunk(c)
                    return 0

                jax.lax.fori_loop(0, nt_ref[0, 0], body, 0)
            else:
                def body(u, _):
                    for i in range(unroll):
                        one_chunk(u * unroll + i)
                    return 0

                jax.lax.fori_loop(
                    0, (nt_ref[0, 0] + unroll - 1) // unroll, body, 0)
            a = acc_ref[:]
            for j in range(pk):
                out_ref[j] = a[j * n_hi:(j + 1) * n_hi,
                               j * lo_bins:(j + 1) * lo_bins]

        return kernel_pack

    def kernel_inner(nt_ref, ct_ref, st_ref, rs_ref, xs_ref, ys_ref,
                     out_ref, acc_ref):
        # all theta bins in ONE grid step (fori inside): for small edge
        # sets the per-grid-step machinery dominates (measured on 256x256
        # classifier-cue images: 2160 vmapped (image, theta) steps cost
        # more than the voting itself)
        n_t = ct_ref.shape[0]

        def tloop(t, _):
            accumulate_theta(ct_ref[t, 0], st_ref[t, 0], rs_ref[t, 0],
                             nt_ref, xs_ref, ys_ref, acc_ref)
            out_ref[pl.ds(t, 1)] = acc_ref[:].reshape((1,) + acc_shape)
            return 0

        jax.lax.fori_loop(0, n_t, tloop, 0)

    def make_kernel_inner_pack(pk: int):
        # theta_pack on the INNER schedule: pk thetas share each chunk's
        # MXU dot (block-diagonal acc, off-diagonal cross counts never
        # read — same trick as make_kernel_pack) AND the theta fori runs
        # theta_bins/pk iterations. On tiny cue images the per-iteration
        # scalar machinery (SMEM reads, acc zeroing, out writes) dominates
        # the voting work, so fewer+fatter iterations is the lever the
        # classify-cue bar needs (round-3 VERDICT Next #4).
        def kernel_inner_pack(nt_ref, ct_ref, st_ref, rs_ref, xs_ref,
                              ys_ref, out_ref, acc_ref):
            n_t = ct_ref.shape[0]

            def one_chunk(t, c):
                hs, ls = [], []
                for j in range(pk):
                    hj, lj = build(c, ct_ref[pk * t + j, 0],
                                   st_ref[pk * t + j, 0],
                                   rs_ref[pk * t + j, 0], xs_ref, ys_ref)
                    hs.append(hj)
                    ls.append(lj)
                acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                    jnp.concatenate(hs, axis=0), jnp.concatenate(ls, axis=0),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype)

            def tloop(t, _):
                acc_ref[:] = jnp.zeros((pk * n_hi, pk * lo_bins), acc_dtype)

                def body(c, _):
                    one_chunk(t, c)
                    return 0

                jax.lax.fori_loop(0, nt_ref[0, 0], body, 0)
                a = acc_ref[:]
                for j in range(pk):
                    out_ref[pl.ds(pk * t + j, 1)] = a[
                        j * n_hi:(j + 1) * n_hi,
                        j * lo_bins:(j + 1) * lo_bins].reshape(
                            (1,) + acc_shape)
                return 0

            jax.lax.fori_loop(0, n_t // pk, tloop, 0)

        return kernel_inner_pack

    return kernel, kernel_inner, make_kernel_pack, make_kernel_inner_pack


# Poison coordinates for invalid edge slots: r = x cos(t) + y sin(t) lands
# far outside any reachable rho bin for EVERY theta grid point. Near t=0
# (sin ~ 0) r ~ POISON_X; elsewhere sin(t) >= sin(pi/theta_bins) so
# r >= POISON_Y*sin(pi/3600) - POISON_X ~ 7.7e5. Valid for numrho < 9e4
# and theta_bins <= 3600 (asserted by hough_votes_pallas).
HOUGH_POISON_X = 1.0e5
HOUGH_POISON_Y = 1.0e9


# kb row-count threshold below which the theta loop runs INSIDE one grid
# step: for small edge sets (tiny classifier-cue images) the per-grid-step
# machinery dominates the voting work (measured: 12x 256x256 cue images
# 6.5 ms as 2160 grid steps). 384 so the classifier's cue budget
# (kb = 288-320 on 256x256 images after the noise-density bump) stays on
# this path — the in-kernel trip count is dynamic
# (ceil(max_band_count / rows)), so the wider budget costs nothing when
# real band counts are small.
_THETA_INNER_MAX_KB = 384


@functools.partial(jax.jit, static_argnames=("numrho", "theta_bins",
                                             "interpret", "rho_base",
                                             "rho_bins", "mxu", "rows",
                                             "swap_mn", "lo_bins",
                                             "theta_inner", "pipelined",
                                             "theta_wins", "win_hi",
                                             "theta_pack", "unroll",
                                             "cmp_bf16", "schedule"))
def hough_votes_pallas(xs_t: jnp.ndarray, ys_t: jnp.ndarray,
                       counts: jnp.ndarray, numrho: int,
                       theta_bins: int = 180,
                       interpret: bool = False, rho_base: int = 0,
                       rho_bins: int = 0, mxu: str = "bf16",
                       rows: int = _HOUGH_ROWS,
                       swap_mn: bool = False,
                       lo_bins: int = _HOUGH_LO,
                       theta_inner: str = "auto",
                       pipelined: bool = False,
                       theta_wins=None, win_hi: int = 0,
                       theta_pack: int = 1,
                       unroll: int = 1, cmp_bf16: bool = False,
                       schedule: str = "serial") -> jnp.ndarray:
    """(numrho, theta_bins) int32 vote accumulator over a band-compacted
    edge list — the Pallas production path of ops.hough.hough_accumulator
    (identical counts: same f32 round, same one-hot matmul contraction).

    xs_t/ys_t: (kb, 128) float32 — edge x/y coordinates from the banded
    sort compaction, transposed so valid edges are row-dense; INVALID slots
    must carry (HOUGH_POISON_X, HOUGH_POISON_Y), which maps outside every
    reachable rho bin for every theta (see note above), replacing a
    per-(theta, trip) count-mask compare in the kernel. counts: (128,)
    int32 edges per band (drives the dynamic trip count only).

    rho_base/rho_bins clip the vote matrix to bins
    [rho_base, rho_base + rho_bins) — callers pass the statically reachable
    rho range (ops.hough computes it from h, w); bins outside are provably
    zero and are padded back, so the returned accumulator is identical to
    the unclipped one. mxu: "int8" (s8 one-hots, int32 accumulation — 2x
    MXU rate, exact) or "bf16" (0/1 bf16, f32 accumulation — exact < 2^24).

    swap_mn=True computes the dot as (lo, chunk) x (chunk, hi) — full-M
    orientation; measured SLOWER on v5e (15.6 vs 9.2 ms at batch 8: the
    wide lo matrix becomes the stationary operand and its staging
    dominates), kept selectable to document the measurement. The default
    orientation is within ~4x of the formulation's floor: every
    (edge, theta) increment inherently costs n_hi*128 MACs because 2341
    reachable rho bins occupy 14%% of the 128x128 outer-product tile.
    """
    assert unroll >= 1 and not (unroll > 1 and pipelined), \
        "unroll applies to the serial schedule only"
    assert schedule in ("serial", "dual", "buildahead")
    if schedule != "serial":
        assert (not swap_mn and not pipelined and theta_pack == 1
                and unroll >= 2), \
            "dual/buildahead need the default grid orientation, unroll>=2"
    kb = int(xs_t.shape[0])
    # pad to rows*unroll so the unrolled body's over-run chunk reads stay
    # in-bounds (poisoned slots vote nothing)
    if kb % (rows * unroll):
        padn = _round_up(kb, rows * unroll) - kb
        xs_t = jnp.pad(xs_t, ((0, padn), (0, 0)),
                       constant_values=HOUGH_POISON_X)
        ys_t = jnp.pad(ys_t, ((0, padn), (0, 0)),
                       constant_values=HOUGH_POISON_Y)
        kb += padn
    assert numrho < 90000 and theta_bins <= 3600  # poison-coordinate bound
    if rho_bins <= 0:
        rho_base, rho_bins = 0, numrho
    glob_shift = (numrho - 1) // 2 - rho_base
    if theta_wins is not None:
        # per-theta rho WINDOW: theta_wins[t] is the hi-block (lo_bins-
        # aligned) offset of theta t's reachable rho range within the
        # clipped [rho_base, rho_base+rho_bins) space, win_hi its static
        # block span. The vote matrix shrinks from ceil(rho_bins/64) hi
        # rows (every theta pays the union of all ranges) to win_hi
        # (~1.5x fewer for A4 pages: the union spans w-1 + hypot bins but
        # any single theta reaches at most hypot). Votes are re-based per
        # theta via the SMEM rs table and shifted back exactly below.
        assert len(theta_wins) == theta_bins and win_hi > 0
        n_hi = win_hi + 1  # +1 spare row
        wins_np = np.asarray(theta_wins, np.int64)
        rs_np = glob_shift - wins_np * lo_bins
    else:
        n_hi = (rho_bins + lo_bins - 1) // lo_bins + 1  # +1 spare row
        rs_np = np.full(theta_bins, glob_shift, np.int64)
    rs_t = jnp.asarray(rs_np.reshape(theta_bins, 1), jnp.int32)
    mxu_dtype = jnp.int8 if mxu == "int8" else jnp.bfloat16
    acc_dtype = jnp.int32 if mxu == "int8" else jnp.float32

    thetas = np.arange(theta_bins) * (np.pi / theta_bins)
    cos_t = jnp.asarray(np.cos(thetas), jnp.float32).reshape(theta_bins, 1)
    sin_t = jnp.asarray(np.sin(thetas), jnp.float32).reshape(theta_bins, 1)
    n_trips = ((jnp.max(counts) + rows - 1) // rows
               ).astype(jnp.int32).reshape(1, 1)

    (kernel, kernel_inner, make_kernel_pack,
     make_kernel_inner_pack) = _make_hough_kernel(
        n_hi, rho_bins, mxu_dtype, acc_dtype, rows, swap_mn, lo_bins,
        n_chunks=kb // rows, pipelined=pipelined, unroll=unroll,
        cmp_bf16=cmp_bf16, schedule=schedule)
    acc_shape = (lo_bins, n_hi) if swap_mn else (n_hi, lo_bins)

    def unpack(votes):
        """(theta, n_hi, lo) local windows -> (numrho, theta) global."""
        if swap_mn:
            votes = votes.transpose(0, 2, 1)
        if theta_wins is None:
            v = votes.reshape(theta_bins, n_hi * lo_bins)[:, :rho_bins
                                                          ].astype(jnp.int32)
        else:
            # exact shift-back: per-theta one-hot block placement (counts
            # are ints < 2^24: bf16 one-hot x f32 accumulation is exact)
            gb = (rho_bins + lo_bins - 1) // lo_bins
            sh = (wins_np[:, None] + np.arange(win_hi)[None, :])  # (T, win)
            oh = (sh[:, None, :] == np.arange(gb)[None, :, None])
            ohj = jnp.asarray(oh, jnp.float32)                  # (T, gb, win)
            # counts can exceed bf16's integer range: f32 x f32 at HIGHEST
            # precision keeps every product/sum an exact integer < 2^24
            loc = votes[:, :win_hi, :].astype(jnp.float32)
            glob = jnp.einsum("tgw,twl->tgl", ohj, loc,
                              precision=jax.lax.Precision.HIGHEST)
            v = glob.reshape(theta_bins, gb * lo_bins)[:, :rho_bins
                                                       ].astype(jnp.int32)
        if rho_bins < numrho:
            v = jnp.pad(v, ((0, 0),
                            (rho_base, numrho - rho_base - rho_bins)))
        return v.T
    if theta_inner == "auto":
        theta_inner = "inner" if kb <= _THETA_INNER_MAX_KB else "grid"
    if schedule != "serial":
        assert theta_inner == "grid", \
            "dual/buildahead schedules exist on the grid path only"
    if theta_pack > 1 and theta_inner == "grid":
        pk = theta_pack
        assert not swap_mn and not pipelined, \
            "theta_pack supports only the default serial orientation"
        assert (theta_bins % pk == 0 and pk * n_hi <= 128
                and pk * lo_bins <= 128)
        votes = pl.pallas_call(
            make_kernel_pack(pk),
            grid=(theta_bins // pk,),
            out_shape=jax.ShapeDtypeStruct((theta_bins,) + acc_shape,
                                           acc_dtype),
            in_specs=[
                pl.BlockSpec((1, 1), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((theta_bins, 1), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((theta_bins, 1), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((theta_bins, 1), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((kb, _HOUGH_BANDS), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kb, _HOUGH_BANDS), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((pk,) + acc_shape, lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((pk * n_hi, pk * lo_bins),
                                       acc_dtype)],
            interpret=interpret,
        )(n_trips, cos_t, sin_t, rs_t, xs_t, ys_t)
        return unpack(votes)
    if theta_inner == "inner":
        if theta_pack > 1:
            pk = theta_pack
            assert not swap_mn and not pipelined and unroll == 1, \
                "inner theta_pack supports only the default serial schedule"
            assert (theta_bins % pk == 0 and pk * n_hi <= 128
                    and pk * lo_bins <= 128)
            inner_kernel = make_kernel_inner_pack(pk)
            scratch = pltpu.VMEM((pk * n_hi, pk * lo_bins), acc_dtype)
        else:
            inner_kernel = kernel_inner
            scratch = pltpu.VMEM(acc_shape, acc_dtype)
        votes = pl.pallas_call(
            inner_kernel,
            out_shape=jax.ShapeDtypeStruct((theta_bins,) + acc_shape,
                                           acc_dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[scratch],
            interpret=interpret,
        )(n_trips, cos_t, sin_t, rs_t, xs_t, ys_t)
        return unpack(votes)
    votes = pl.pallas_call(
        kernel,
        grid=(theta_bins,),
        out_shape=jax.ShapeDtypeStruct((theta_bins,) + acc_shape, acc_dtype),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            # full trig/shift tables in SMEM, indexed by program_id (per-
            # step (1,1) SMEM blocks fail Mosaic's block-shape divisibility
            # check)
            pl.BlockSpec((theta_bins, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((theta_bins, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((theta_bins, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            # whole coordinate planes stay VMEM-resident across theta steps
            pl.BlockSpec((kb, _HOUGH_BANDS), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, _HOUGH_BANDS), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,) + acc_shape, lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(
            acc_shape if schedule == "serial" else (2 * n_hi, lo_bins),
            acc_dtype)],
        interpret=interpret,
    )(n_trips, cos_t, sin_t, rs_t, xs_t, ys_t)
    # drop the spare row's lane range, shift windows back (theta_wins), pad
    # the clipped (provably zero-vote) rho range, return (numrho, theta)
    return unpack(votes)


# ---------------------------------------------------------------------------
# Rank-extraction edge compaction (sort-free)
# ---------------------------------------------------------------------------

_RANK_PSLAB = 512    # in-band positions per VMEM slab
_RANK_KCHUNK = 64    # output slots per pruning granule


@functools.partial(jax.jit, static_argnames=("kk", "interpret"))
def rank_extract_pallas(rank: jnp.ndarray, mask: jnp.ndarray, kk: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Sort-free banded compaction: extract each band's edge positions in
    ascending-index order straight from their per-band RANK.

    Votes are order-invariant sums, so compaction needs a stable PARTITION
    (edges packed to the front by in-band index), not a sort — and the
    exclusive cumsum of the edge mask already assigns each edge its output
    slot. Extraction is then ci[k, b] = sum_p p * [rank[p, b] == k & mask]:
    a masked sum the VPU runs in slabs, with (position-slab, rank-chunk)
    pairs pruned by rank monotonicity (a slab's edge ranks span
    [min, max]; chunks outside never match). Replaces BOTH bitonic sorts
    of the flat/twostage paths (the measured 2.7-3.2 ms of the fused A4
    program) with one cumsum + ~N*actual_density/PRUNE masked sums.

    rank: (N, 128) int32 exclusive per-band edge rank (cumsum - mask),
    position-major (plane[p, b] = flat index p * 128 + b). mask: (N, 128)
    bool edge presence. N must be a multiple of _RANK_PSLAB (pad mask
    False). Edges with rank >= kk are dropped (lowest-index kept) —
    identical semantics to band_compact_coords impl="flat".

    Returns ci: (kk, 128) int32 in-band position of the k-th edge of band
    b; 0 where k >= that band's count (callers poison via counts).
    """
    n, nb = rank.shape
    assert nb == _HOUGH_BANDS and n % _RANK_PSLAB == 0
    kk_pad = _round_up(kk, _RANK_KCHUNK)
    n_slabs = n // _RANK_PSLAB
    n_kch = kk_pad // _RANK_KCHUNK

    sentinel = jnp.int32(kk_pad)  # never matches any extracted k
    key = jnp.where(mask, rank, sentinel).astype(jnp.int32)
    # (n_slabs, 1) 2-D SMEM tables: the proven layout (the vote kernel's
    # trig/shift tables — 1-D/per-step SMEM shapes have failed Mosaic's
    # block checks before)
    ks = jnp.where(mask, rank, 2 ** 30).reshape(n_slabs, _RANK_PSLAB, nb)
    smin = jnp.min(ks, axis=(1, 2)).astype(jnp.int32).reshape(n_slabs, 1)
    smax = jnp.max(jnp.where(mask, rank, -1).reshape(n_slabs, _RANK_PSLAB,
                                                     nb),
                   axis=(1, 2)).astype(jnp.int32).reshape(n_slabs, 1)

    def kernel(smin_ref, smax_ref, key_ref, out_ref):
        out_ref[:] = jnp.zeros((kk_pad, _HOUGH_BANDS), jnp.int32)

        def pair(i, _):
            s = i // n_kch
            kc = i % n_kch
            k0 = kc * _RANK_KCHUNK

            @pl.when((smin_ref[s, 0] < k0 + _RANK_KCHUNK)
                     & (smax_ref[s, 0] >= k0))
            def _():
                slab = key_ref[pl.ds(s * _RANK_PSLAB, _RANK_PSLAB), :]
                piota = (jax.lax.broadcasted_iota(
                    jnp.int32, (_RANK_PSLAB, _HOUGH_BANDS), 0)
                    + s * _RANK_PSLAB)

                def kbody(j, _):
                    k = k0 + j
                    val = jnp.sum(jnp.where(slab == k, piota, 0), axis=0)
                    out_ref[pl.ds(k, 1), :] = (out_ref[pl.ds(k, 1), :]
                                               + val.reshape(1, nb))
                    return 0

                jax.lax.fori_loop(0, _RANK_KCHUNK, kbody, 0)

            return 0

        jax.lax.fori_loop(0, n_slabs * n_kch, pair, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kk_pad, _HOUGH_BANDS), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(smin, smax, key)
    return out[:kk]


# ---------------------------------------------------------------------------
# RGB -> Lab (8-bit fixed-point) — fused LUT kernel
# ---------------------------------------------------------------------------

_LAB_ROWS = 64   # pixel rows per grid step (chunk = rows * 128 pixels)
_LAB_GLO = 16    # gamma-table index radix: 16 lo rows x 16 hi cols
_LAB_CLO = 16    # cbrt-table index radix: 16 lo rows x 192 hi cols


def _make_lab_kernel(rows: int, coeffs, l_scale: int, l_shift: int):
    """One grid step converts rows*128 pixels: two table lookups per value
    (sRGB gamma 256-entry, Lab cube-root 3072-entry) as one-hot MXU dots
    that live entirely in VMEM.

    Why a kernel: the XLA one-hot formulation of the same lookups
    (ops.lut.lut_lookup) materializes the (pixels, bins) indicators to HBM
    for the 3072-entry cbrt table (fusion breaks on the skinny matmul) —
    measured 17.1 ms for a batch-8 nightview rgb_to_lab. Here the one-hots
    are built lane-major in vregs and die inside the chunk (same lesson as
    the Hough vote kernel above): HBM traffic is 3 i32 planes in, 3 i32
    planes out.

    Formulation (measured over radix/packing variants,
    benchmarks/micro_lab_kernel.py; 9.6 -> 3.7 ms for batch-8 nightview):
    - value byte-split hi/lo tables are STACKED into one (2*lo_n, hi_n)
      operand so each lookup is ONE dot, not two;
    - the three channels of each lookup level are CONCATENATED along the
      pixel axis so each table costs one dot per grid step (2 dots total);
    - index radix puts only 16 rows in the lo dimension (idx & 15), making
      the per-pixel lo-select a 16-row where/sum; the hi one-hot
      (idx >> 4) carries the table width (16 gamma / 192 cbrt columns) on
      the MXU where it is nearly free.

    Exactness: table values are byte-split (gamma = 32*hi + lo with
    hi <= 63, lo <= 31; cbrt = 128*hi + lo with hi <= 256, lo <= 127) so
    every matmul operand is a small integer exactly representable in bf16;
    f32 accumulation of 0/1-selected small ints is exact. Results are
    bit-identical to ops.color.rgb_to_lab's gather path (asserted by
    tests/test_pallas.py on real images and on hardware by
    benchmarks/hw_check_kernels.py)."""
    chunk = rows * 128
    C = [[int(coeffs[r][c]) for c in range(3)] for r in range(3)]
    glo, clo = _LAB_GLO, _LAB_CLO
    glog, clog = glo.bit_length() - 1, clo.bit_length() - 1

    def lut(a_st, idx, n_hi, lo_n, lo_log, mul_hi):
        """table[idx] for idx (1, n) i32: hi one-hot dot against the
        stacked byte-split (2*lo_n, n_hi) table, then a lo_n-row select."""
        hi = jax.lax.shift_right_logical(idx, lo_log)
        lo = jax.lax.bitwise_and(idx, lo_n - 1)
        n = idx.shape[1]
        ohT = (hi == jax.lax.broadcasted_iota(jnp.int32, (n_hi, n), 0)
               ).astype(jnp.bfloat16)
        r = jax.lax.dot_general(a_st, ohT,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (lo_n, n), 0) == lo)
        v = r[:lo_n] * mul_hi + r[lo_n:]
        return jnp.sum(jnp.where(sel, v, 0.0), axis=0,
                       keepdims=True).astype(jnp.int32)

    def descale_i(x, n):
        return jax.lax.shift_right_arithmetic(x + (1 << (n - 1)), n)

    def kernel(ag_ref, ac_ref, r_ref, g_ref, b_ref, l_ref, a_ref, b2_ref):
        ag, ac = ag_ref[:], ac_ref[:]
        rgb = jnp.concatenate([r_ref[:].reshape(1, chunk),
                               g_ref[:].reshape(1, chunk),
                               b_ref[:].reshape(1, chunk)], axis=1)
        gv = lut(ag, rgb, 256 // glo, glo, glog, float(1 << 5))
        r, g, b = (gv[:, :chunk], gv[:, chunk:2 * chunk], gv[:, 2 * chunk:])
        ixs = [jnp.clip(descale_i(r * C[k][0] + g * C[k][1] + b * C[k][2],
                                  12), 0, 3071) for k in range(3)]
        fv = lut(ac, jnp.concatenate(ixs, axis=1), 3072 // clo, clo, clog,
                 float(1 << 7))
        fx, fy, fz = (fv[:, :chunk], fv[:, chunk:2 * chunk],
                      fv[:, 2 * chunk:])
        shift2 = 15  # _LAB_SHIFT2
        l_val = descale_i(l_scale * fy + l_shift, shift2)
        a_val = descale_i(500 * (fx - fy) + (128 << shift2), shift2)
        b_val = descale_i(200 * (fy - fz) + (128 << shift2), shift2)
        l_ref[:] = jnp.clip(l_val, 0, 255).reshape(rows, 128)
        a_ref[:] = jnp.clip(a_val, 0, 255).reshape(rows, 128)
        b2_ref[:] = jnp.clip(b_val, 0, 255).reshape(rows, 128)

    return kernel


def _lab_split_tab(tab_np, lo_n, vbits):
    """Index-radix (lo_n rows) reshape + value byte-split at vbits, hi and
    lo halves stacked into one (2*lo_n, N//lo_n) bf16 operand."""
    n = len(tab_np)
    t = np.asarray(tab_np, np.int64).reshape(n // lo_n, lo_n).T
    return jnp.asarray(np.concatenate([t >> vbits, t & ((1 << vbits) - 1)],
                                      axis=0), jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret", "rows"))
def rgb_to_lab_pallas(img: jnp.ndarray, interpret: bool = False,
                      rows: int = _LAB_ROWS) -> jnp.ndarray:
    """ops.color.rgb_to_lab (OpenCV 8-bit fixed-point Lab) as a fused
    Pallas kernel — the TPU production path for LAB-heavy pipelines (the
    night pipeline's wall: 17.1 -> 3.7 ms at batch 8, see
    _make_lab_kernel).

    img: uint8 (H, W, 3) RGB. Returns uint8 (H, W, 3) Lab, bit-identical
    to the gather/one-hot paths."""
    from tpuimage.ops import color as colorops

    h, w = int(img.shape[0]), int(img.shape[1])
    n = h * w
    rows_total = _round_up(-(-n // 128), rows)
    pad = rows_total * 128 - n

    def plane(c):
        v = img[..., c].reshape(-1).astype(jnp.int32)
        return jnp.pad(v, (0, pad)).reshape(rows_total, 128)

    ag = _lab_split_tab(colorops._GAMMA_TAB_NP, _LAB_GLO, 5)  # <= 2040
    ac = _lab_split_tab(colorops._CBRT_TAB_NP, _LAB_CLO, 7)   # <= 32768

    l_scale = (116 * 255 + 50) // 100
    l_shift = -((16 * 255 * (1 << 15) + 50) // 100)
    kernel = _make_lab_kernel(rows, colorops._LAB_COEFFS, l_scale,
                              l_shift)

    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    band = lambda t: (t, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(rows_total // rows,),
        out_shape=tuple(jax.ShapeDtypeStruct((rows_total, 128), jnp.int32)
                        for _ in range(3)),
        in_specs=[tab_spec] * 2 + [
            pl.BlockSpec((rows, 128), band, memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=tuple(pl.BlockSpec((rows, 128), band,
                                     memory_space=pltpu.VMEM)
                        for _ in range(3)),
        interpret=interpret,
    )(ag, ac, plane(0), plane(1), plane(2))
    lab = jnp.stack([o.reshape(-1)[:n].reshape(h, w) for o in outs], axis=-1)
    return lab.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# CLAHE apply (per-pixel 4-tile-LUT bilinear blend) — fused LUT kernel
# ---------------------------------------------------------------------------

_CLAHE_ROWS = 64


def _clahe_slab_starts(n_pix: int, tile: int, n_tiles: int, block: int):
    """Static per-block tile-slab starts for the CLAHE apply kernel.

    Each output pixel blends tiles {t1c(p), t2c(p)} (clahe_blend_matrix's
    clipped floor(p/tile - 0.5) pair). For the block of pixels
    [b*block, (b+1)*block) those indices span a contiguous run; return
    (starts (n_blocks,), span) so slab [start, start+span) covers every
    nonzero blend-matrix column of the block. All arguments are static —
    this runs in numpy at trace time."""
    n_blocks = -(-n_pix // block)
    starts = np.zeros(n_blocks, np.int64)
    span = 1
    for b in range(n_blocks):
        lo = b * block
        hi = min((b + 1) * block, n_pix) - 1
        pf_lo = np.float32(lo) * (np.float32(1.0) / np.float32(tile)) - np.float32(0.5)
        pf_hi = np.float32(hi) * (np.float32(1.0) / np.float32(tile)) - np.float32(0.5)
        tmin = int(np.clip(np.floor(pf_lo), 0, n_tiles - 1))
        tmax = int(np.clip(np.floor(pf_hi) + 1, 0, n_tiles - 1))
        starts[b] = tmin
        span = max(span, tmax - tmin + 1)
    starts = np.minimum(starts, n_tiles - span)
    return starts, span


def _make_clahe_slab_kernel(rows: int, ts_n: int, us_n: int):
    """One grid step blends a (rows, 128) block against ONLY the tile slab
    whose blend weights are nonzero there (<= (rows/th+2) x (128/tw+2)
    tiles instead of all ty*tx): the 256-entry one-hot selects each
    pixel's value row from the slab LUTs in one MXU dot (LUT values are
    u8 — bf16-exact, f32 accumulation), then the per-block slices of the
    static bilinear blend matrices contract t-then-u exactly like
    ops.histogram.clahe_apply_matrix.

    Exactness vs the matrix path: each pixel has <= 2 nonzero blend
    weights per axis and the slab contains every nonzero column, so the
    restricted sum has the same nonzero terms in the same nesting; only
    FMA contraction differences (uncontrollable, CLAUDE.md) move isolated
    cvRound-boundary pixels ±1 LSB (measured 2/36503 on random data) —
    within the documented CLAHE contract vs cv2.

    Why a kernel: the XLA form materializes the (pixels, 256) bf16
    one-hot and the (pixels, ty*tx) f32 W to HBM (measured 10.6 ms for a
    batch-8 nightview); the earlier full-contraction kernel kept them in
    VMEM but paid ty*tx*256 MACs/pixel (3.55 ms); the slab cuts that to
    ts*us*256 (typically 9x fewer)."""
    chunk = rows * 128

    def kernel(lut_ref, r_ref, c_ref, v_ref, out_ref):
        v = v_ref[:].reshape(1, chunk)
        ohT = (v == jax.lax.broadcasted_iota(jnp.int32, (256, chunk), 0)
               ).astype(jnp.bfloat16)
        W = jax.lax.dot_general(lut_ref[0], ohT,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        r = r_ref[0]                                   # (rows, ts_n)
        c = c_ref[0]                                   # (us_n, 128)
        res = jnp.zeros((rows, 128), jnp.float32)
        for b in range(us_n):
            inner = jnp.zeros((rows, 128), jnp.float32)
            for a in range(ts_n):
                Wa = W[b * ts_n + a].reshape(rows, 128)
                inner = inner + Wa * r[:, a][:, None]
            res = res + inner * c[b][None, :]
        out_ref[:] = jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret",
                                             "rows"))
def clahe_apply_pallas(gray: jnp.ndarray, luts: jnp.ndarray,
                       R: jnp.ndarray, C: jnp.ndarray,
                       th: int, tw: int,
                       interpret: bool = False,
                       rows: int = _CLAHE_ROWS) -> jnp.ndarray:
    """ops.histogram.clahe_apply_matrix as a fused tile-slab Pallas kernel.

    gray: uint8 (H, W); luts: (ty, tx, 256) tile LUTs (u8-valued);
    R: (H, ty) row blend matrix; C: (tx, W) column blend matrix
    (clahe_blend_matrix); th/tw: static tile height/width the matrices
    were built with. Returns uint8 (H, W), bit-identical to
    clahe_apply_matrix (see _make_clahe_slab_kernel)."""
    h, w = int(gray.shape[0]), int(gray.shape[1])
    ty, tx = int(luts.shape[0]), int(luts.shape[1])
    hp = _round_up(h, rows)
    wp = _round_up(w, 128)
    ni, nj = hp // rows, wp // 128

    tstarts, ts_n = _clahe_slab_starts(h, th, ty, rows)
    ustarts, us_n = _clahe_slab_starts(w, tw, tx, 128)

    v = jnp.pad(gray.astype(jnp.int32), ((0, hp - h), (0, wp - w)))
    # LUT slabs (ni*nj, us_n*ts_n, 256): rows ordered b*ts_n + a so the
    # kernel's t-then-u nesting walks contiguous sublane groups. All
    # indices are static numpy — XLA lowers the gather to slices.
    t_idx = tstarts[:, None] + np.arange(ts_n)             # (ni, ts_n)
    u_idx = ustarts[:, None] + np.arange(us_n)             # (nj, us_n)
    lut_slab = (luts.astype(jnp.bfloat16)
                [t_idx[:, None, None, :], u_idx[None, :, :, None]]
                .reshape(ni * nj, us_n * ts_n, 256))
    # per-block blend-matrix slices (zero rows/cols for pad pixels)
    Rp = jnp.pad(R.astype(jnp.float32), ((0, hp - h), (0, 0)))
    r_slab = Rp.reshape(ni, rows, ty)[
        np.arange(ni)[:, None, None],
        np.arange(rows)[None, :, None],
        t_idx[:, None, :]]                                 # (ni, rows, ts_n)
    Cp = jnp.pad(C.astype(jnp.float32), ((0, 0), (0, wp - w)))
    c_slab = Cp.T.reshape(nj, 128, tx)[
        np.arange(nj)[:, None, None],
        np.arange(128)[None, :, None],
        u_idx[:, None, :]].transpose(0, 2, 1)              # (nj, us_n, 128)

    kernel = _make_clahe_slab_kernel(rows, ts_n, us_n)
    out = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, us_n * ts_n, 256),
                         lambda i, j, _nj=nj: (i * _nj + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ts_n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, us_n, 128), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lut_slab, r_slab, c_slab, v)
    return out[:h, :w].astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Separable-conv chain kernels (docscan illumination / ink / adaptive)
# ---------------------------------------------------------------------------


def _tap_slab(ref, t: int, th: int, dy):
    """(th, wp) view of ``ref`` rows [t*th + dy, t*th + dy + th) for a
    TRACED dy: 8-aligned dynamic-sublane load one stripe taller, remainder
    rotated in (the bilateral/sepconv kernels' proven Mosaic pattern)."""
    base = (dy // 8) * 8
    rem = dy - base
    slab = ref[pl.ds(t * th + base, th + 8), :]
    return pltpu.roll(slab, (th + 8) - rem, axis=0)[:th, :]


def _vert_simple(ref, t, th, wp, kv_ref, n, acc_ref):
    """acc[i] = sum_dy ref[t*th + i + dy] * kv[dy], order 0..n-1 (exact for
    integer-valued f32 taps — order-free)."""
    acc_ref[:] = jnp.zeros((th, wp), jnp.float32)

    def body(i, _):
        acc_ref[:] = acc_ref[:] + _tap_slab(ref, t, th, i) * kv_ref[i, 0]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _horz_simple(vacc, wp, kh_ref, n, acc_ref):
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(j, _):
        acc_ref[:] = (acc_ref[:]
                      + pltpu.roll(vacc, wp - j, axis=1) * kh_ref[j, 0])
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _vert_symmetric(ref, t, th, wp, kv_ref, n, acc_ref):
    """OpenCV's symmetric column-filter accumulation order (float paths):
    acc = x[r]*k[r]; acc += (x[r-i] + x[r+i]) * k[r+i] for i = 1..r —
    reproducing ops.filters._sepconv_valid_f32's f32 rounding sequence."""
    r = n // 2
    acc_ref[:] = _tap_slab(ref, t, th, r) * kv_ref[r, 0]

    def body(i, _):
        acc_ref[:] = acc_ref[:] + (
            _tap_slab(ref, t, th, r - i) + _tap_slab(ref, t, th, r + i)
        ) * kv_ref[r + i, 0]
        return 0

    jax.lax.fori_loop(1, r + 1, body, 0)


def _horz_symmetric(vacc, wp, kh_ref, n, acc_ref):
    r = n // 2
    acc_ref[:] = pltpu.roll(vacc, wp - r, axis=1) * kh_ref[r, 0]

    def body(i, _):
        acc_ref[:] = acc_ref[:] + (
            pltpu.roll(vacc, wp - (r - i), axis=1)
            + pltpu.roll(vacc, wp - (r + i), axis=1)) * kh_ref[r + i, 0]
        return 0

    jax.lax.fori_loop(1, r + 1, body, 0)


def _div255_round_half_even(num_u8, den):
    """cv2.divide(num, den, scale=255) on int32 values: exact integer
    round-half-to-even, den == 0 -> 0 (ops.arith.divide_u8 semantics).
    Mosaic has no vector integer divide, so the quotient candidate comes
    from an f32 divide and is corrected with exact int32 arithmetic (the
    f32 estimate is within 1 of the true floor)."""
    n = num_u8 * 255
    d = jnp.maximum(den, 1)
    q0 = jnp.floor(n.astype(jnp.float32) / d.astype(jnp.float32)
                   ).astype(jnp.int32)
    r0 = n - q0 * d
    q0 = q0 + jnp.where(r0 < 0, -1, 0) + jnp.where(r0 >= d, 1, 0)
    r0 = n - q0 * d
    q = (q0 + (2 * r0 > d).astype(jnp.int32)
         + ((2 * r0 == d) & (q0 % 2 == 1)).astype(jnp.int32))
    q = jnp.where(den > 0, q, 0)
    return jnp.clip(q, 0, 255)


def _make_gauss_chain_kernel(th: int, wp: int, n: int, mode: str,
                             idelta: int = 0, maxval: int = 255):
    """Separable gaussian over one row band fused with the docscan stage
    that consumes it (mode):
      - "sub":    clip(blur_u8 - center, 0, 255)      (ink bg-subtract,
                  DocScanner.py:184-186; Q8.8 integer taps)
      - "divide": divide(center, blur_u8, scale=255)  (illumination divide,
                  :154-156; Q8.8 integer taps)
      - "subtract": clip(center - blur_u8, 0, 255)    (illum subtract :158)
      - "adaptive": center - sat_u8(blur_f32) > -idelta ? maxval : 0
                  (cv2.adaptiveThreshold GAUSSIAN_C, :167; float taps with
                  OpenCV's symmetric accumulation order)
    Q8.8 modes round (acc + 2^15) >> 16 exactly like ops.filters; all
    integer paths are bit-exact, the adaptive float path reproduces the
    XLA op order (hardware FMA parity checked by hw_check_kernels.py)."""

    sym = mode == "adaptive"

    def kernel(kv_ref, kh_ref, padded_ref, center_ref, out_ref,
               vacc_ref, hacc_ref):
        t = pl.program_id(0)
        if sym:
            _vert_symmetric(padded_ref, t, th, wp, kv_ref, n, vacc_ref)
            _horz_symmetric(vacc_ref[:], wp, kh_ref, n, hacc_ref)
        else:
            _vert_simple(padded_ref, t, th, wp, kv_ref, n, vacc_ref)
            _horz_simple(vacc_ref[:], wp, kh_ref, n, hacc_ref)
        c = center_ref[:].astype(jnp.int32)
        if mode == "adaptive":
            mean = jnp.clip(jnp.rint(hacc_ref[:]), 0, 255).astype(jnp.int32)
            out_ref[:] = jnp.where(c - mean > -idelta, maxval, 0)
            return
        blur = jnp.clip(jnp.floor((hacc_ref[:] + 32768.0) * (1.0 / 65536.0)),
                        0, 255).astype(jnp.int32)
        if mode == "sub":
            out_ref[:] = jnp.clip(blur - c, 0, 255)
        elif mode == "subtract":
            out_ref[:] = jnp.clip(c - blur, 0, 255)
        else:  # divide
            out_ref[:] = _div255_round_half_even(c, blur)

    return kernel


@functools.partial(jax.jit, static_argnames=("ksize", "mode", "C",
                                             "inverse", "maxval",
                                             "interpret"))
def gauss_chain_pallas(img: jnp.ndarray, ksize: int, mode: str,
                       C: float = 0.0, inverse: bool = False,
                       maxval: int = 255,
                       interpret: bool = False) -> jnp.ndarray:
    """Gaussian blur of ``img`` fused with its consuming docscan stage —
    see _make_gauss_chain_kernel for the modes. img: uint8 HW. Bit-exact
    vs the corresponding ops composition for the integer modes
    (tests/test_fused_chain.py); the adaptive mode reproduces
    ops.threshold.adaptive_threshold's op order."""
    import math
    from tpuimage.ops.filters import gaussian_kernel_q8, get_gaussian_kernel
    from tpuimage.core.borders import pad2d, BORDER_REFLECT_101, \
        BORDER_REPLICATE

    if mode == "adaptive":
        k = get_gaussian_kernel(ksize).astype(np.float32)
        border = BORDER_REPLICATE
        idelta = math.ceil(C) if not inverse else math.floor(C)
        if inverse:
            raise NotImplementedError("inverse adaptive not fused")
    else:
        k = gaussian_kernel_q8(ksize).astype(np.float32)
        border = BORDER_REFLECT_101
        idelta = 0
    r = ksize // 2
    h, w = int(img.shape[0]), int(img.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    wp = _round_up(w + 2 * r, 128)
    pf = pad2d(img.astype(jnp.float32), r, r, r, r, mode=border)
    p = pad2d(pf, 0, hp - h + 8, 0, wp - (w + 2 * r), mode="edge")
    center = pad2d(img.astype(jnp.int32), 0, hp - h, 0, wp - w, mode="edge")

    kcol = jnp.asarray(k.reshape(-1, 1))
    kernel = _make_gauss_chain_kernel(th, wp, ksize, mode, idelta, maxval)
    out = pl.pallas_call(
        kernel,
        grid=(hp // th,),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((hp + 2 * r + 8, wp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wp), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, wp), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th, wp), jnp.float32),
            pltpu.VMEM((th, wp), jnp.float32),
        ],
        interpret=interpret,
    )(kcol, kcol, p, center)
    return out[:h, :w].astype(jnp.uint8)


def gauss_chain_pallas_applicable(img, ksize: int) -> bool:
    """VMEM-residency gate (same budget as the other band kernels)."""
    if getattr(img, "ndim", 0) != 2:
        return False
    r = ksize // 2
    h, w = int(img.shape[0]), int(img.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    wp = _round_up(w + 2 * r, 128)
    return (hp + 2 * r + 8) * wp * 4 <= _VMEM_PADDED_BYTES


# ---------------------------------------------------------------------------
# Rect blackhat (close - src) — fused sliding-extreme kernel
# ---------------------------------------------------------------------------


def _sliding_extreme(g, n: int, size: int, axis: int, is_max: bool):
    """Forward sliding max/min over a window of ``n`` along ``axis`` via
    van Herk doubling on a VMEM-resident value: f[i] = ext(g[i..i+n-1]).
    All shifts are static pltpu.roll rotations; callers guarantee the rows/
    lanes the output is read from never reach wrapped positions."""
    fn = jnp.maximum if is_max else jnp.minimum
    if n == 1:
        return g
    m = 1
    while m * 2 <= n:
        g = fn(g, pltpu.roll(g, size - m, axis=axis))
        m *= 2
    if m < n:
        g = fn(g, pltpu.roll(g, size - (n - m), axis=axis))
    return g


def _make_blackhat_kernel(th: int, slab: int, wp: int, kw: int, kh: int,
                          h: int, w: int, cl: int):
    """One grid step computes blackhat output rows [t*th, (t+1)*th).

    cv2 MORPH_BLACKHAT border semantics: dilate treats out-of-image as 0,
    erode as 255 (ops.morphology pads constants). Here the whole padded
    image stays VMEM-resident; each band loads one (slab, wp) window and
    runs both sliding-extreme passes in vregs — one HBM read + one write
    replaces the ~2*(log kh + log kw) shifted full-image passes of the XLA
    log-step form (measured ~1 ms of the batch-8 fused docscan program).
    Out-of-image positions are realized with iota validity masks instead of
    padding: d0 = where(valid, x, 0) before the dilate, and the dilated
    slab's invalid positions are overwritten with 255 before the erode —
    exactly the constant-pad values ops.morphology uses."""
    ry, rx = kh // 2, kw // 2

    def kernel(img_ref, out_ref):
        t = pl.program_id(0)
        x = img_ref[pl.ds(t * th, slab), :]
        grow = (jax.lax.broadcasted_iota(jnp.int32, (slab, wp), 0)
                + t * th - (kh - 1))
        gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, wp), 1) - cl
        valid = ((grow >= 0) & (grow < h)) & ((gcol >= 0) & (gcol < w))

        d = _sliding_extreme(jnp.where(valid, x, 0), kh, slab, 0, True)
        d = pltpu.roll(d, ry, axis=0)
        d = _sliding_extreme(d, kw, wp, 1, True)
        d = pltpu.roll(d, rx, axis=1)

        e = _sliding_extreme(jnp.where(valid, d, 255), kh, slab, 0, False)
        e = pltpu.roll(e, ry, axis=0)
        e = _sliding_extreme(e, kw, wp, 1, False)
        closed = pltpu.roll(e, rx, axis=1)

        bh = jnp.clip(closed - x, 0, 255)
        # band rows sit at slab-local [kh-1, kh-1+th): rotate to 0, slice
        # aligned (a static misaligned value slice would relayout)
        out_ref[:] = pltpu.roll(bh, slab - (kh - 1), axis=0)[:th, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("kw", "kh", "interpret"))
def blackhat_rect_pallas(img: jnp.ndarray, kw: int, kh: int,
                         interpret: bool = False) -> jnp.ndarray:
    """cv2.morphologyEx(..., MORPH_BLACKHAT, rect (kw, kh)) on uint8 HW as
    one fused Pallas pass — bit-identical to ops.morphology.morph_blackhat
    (integer sliding extremes, same constant-border semantics; asserted by
    tests/test_pallas.py and on hardware by benchmarks/hw_check_kernels.py).

    The docscan ink-mask stage (DocScanner.py:196-204, vertical 9x19 rect)
    is the production caller. Odd kw/kh only (the pipeline forces odd)."""
    assert kw % 2 == 1 and kh % 2 == 1, "rect blackhat kernel wants odd dims"
    h, w = int(img.shape[0]), int(img.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    # vertical reach: dilate then erode each look kh//2 both ways; the slab
    # covers [t*th - (kh-1), t*th + th + (kh-1)] in image rows, stored with
    # the image at padded row kh-1 so slab reads start 8-aligned at t*th
    slab = _round_up(th + 2 * (kh - 1), 8)
    cl = kw - 1  # horizontal margin >= max erode/dilate shift: no wrap hits
    wp = _round_up(w + 2 * cl, 128)
    p = jnp.pad(img.astype(jnp.int32),
                ((kh - 1, (hp - h) + (slab - th) - (kh - 1) + 8),
                 (cl, wp - w - cl)))

    out = pl.pallas_call(
        _make_blackhat_kernel(th, slab, wp, kw, kh, h, w, cl),
        grid=(hp // th,),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        in_specs=[pl.BlockSpec((hp + slab - th + 8, wp), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, wp), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p)
    return out[:h, cl:cl + w].astype(jnp.uint8)


def blackhat_pallas_applicable(img, se) -> bool:
    """Hardware gate: 2-D uint8, full odd-dimension rect SE, padded image
    within the VMEM residency budget."""
    import numpy as np
    if getattr(img, "ndim", 0) != 2:
        return False
    se = np.asarray(se)
    kh, kw = se.shape
    if not (se.all() and kh % 2 == 1 and kw % 2 == 1 and (kh > 1 or kw > 1)):
        return False
    h, w = int(img.shape[0]), int(img.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    slab = _round_up(th + 2 * (kh - 1), 8)
    wp = _round_up(w + 2 * (kw - 1), 128)
    return (hp + slab - th + 8) * wp * 4 <= _VMEM_PADDED_BYTES


# ---------------------------------------------------------------------------
# Docscan ink-mask epilogue — fused threshold/dilate/weighting kernel
# ---------------------------------------------------------------------------


def _make_inkmask_kernel(th: int, wp: int, iters: int, h: int, w: int):
    """One grid step computes ink-mask + weighted-binary rows
    [t*th, (t+1)*th): the two raw-plane threshold compares
    (pipelines.docscan._raw_otsu_threshold pullbacks), their max (= OR of
    0/255 masks, DocScanner.py:207), ``iters`` iterations of the 2x2
    anchor-(1,1) dilate (:211-212 — window [y-k..y, x-k..x] after k
    iterations), and the mask-weighted binary (:338-339) in one VMEM pass.
    The slab carries an 8-row/8-col halo (iters <= 8 asserted by the
    caller); out-of-image mask positions are forced 0 (the dilate's
    constant-pad semantics) via iota validity masks."""

    def kernel(ts_ref, tb_ref, sub_ref, bh_ref, adapt_ref, mask_ref,
               wgt_ref):
        t = pl.program_id(0)
        sub = sub_ref[pl.ds(t * th, th + 8), :]
        bh = bh_ref[pl.ds(t * th, th + 8), :]
        grow = (jax.lax.broadcasted_iota(jnp.int32, (th + 8, wp), 0)
                + t * th - 8)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (th + 8, wp), 1) - 8
        valid = ((grow >= 0) & (grow < h)) & ((gcol >= 0) & (gcol < w))

        m = ((sub > ts_ref[0, 0]) | (bh > tb_ref[0, 0])) & valid
        m = m.astype(jnp.int32) * 255
        if iters > 0:
            m = _sliding_extreme(m, iters + 1, th + 8, 0, True)
            m = pltpu.roll(m, iters, axis=0)
            m = _sliding_extreme(m, iters + 1, wp, 1, True)
            m = pltpu.roll(m, iters, axis=1)
        m = pltpu.roll(m, th, axis=0)[:th, :]   # slab-local rows [8, 8+th)
        mask_ref[:] = m
        wgt_ref[:] = jnp.where(m == 0, 255, adapt_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def inkmask_weighted_pallas(sub_raw: jnp.ndarray, bh_raw: jnp.ndarray,
                            adapt: jnp.ndarray, t_sub: jnp.ndarray,
                            t_bh: jnp.ndarray, iters: int = 1,
                            interpret: bool = False):
    """(ink_mask, weighted) uint8 planes from the raw ink/blackhat planes,
    their pulled-back Otsu thresholds, and the adaptive binary — the fused
    docscan stage-06b epilogue (DocScanner.py:207-212,338-339). Integer
    compares and sliding maxes only: bit-identical to the ops sequence
    (threshold_binary + max_u8 + dilate(2x2) + where).

    t_sub/t_bh: integer-valued thresholds (strict ``>`` compare), scalars.
    iters: ink_dilate_iters, 0..8 (halo budget)."""
    assert 0 <= iters <= 8
    h, w = int(sub_raw.shape[0]), int(sub_raw.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    wp = _round_up(w + 16, 128)

    def prep(x):
        return jnp.pad(x.astype(jnp.int32), ((8, hp - h + 8), (8, wp - w - 8)))

    ts = jnp.asarray(t_sub, jnp.int32).reshape(1, 1)
    tb = jnp.asarray(t_bh, jnp.int32).reshape(1, 1)
    full = pl.BlockSpec((hp + 16, wp), lambda t: (0, 0),
                        memory_space=pltpu.VMEM)
    band = pl.BlockSpec((th, wp), lambda t: (t, 0), memory_space=pltpu.VMEM)
    mask, wgt = pl.pallas_call(
        _make_inkmask_kernel(th, wp, iters, h, w),
        grid=(hp // th,),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.int32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full, full, band,
        ],
        out_specs=(band, band),
        interpret=interpret,
    )(ts, tb, prep(sub_raw), prep(bh_raw),
      jnp.pad(adapt.astype(jnp.int32), ((0, hp - h), (8, wp - w - 8))))
    sl = (slice(None, h), slice(8, 8 + w))
    return mask[sl].astype(jnp.uint8), wgt[sl].astype(jnp.uint8)


def inkmask_pallas_applicable(img, iters: int) -> bool:
    """Hardware gate for the fused ink-mask epilogue."""
    if getattr(img, "ndim", 0) != 2 or not (0 <= iters <= 8):
        return False
    h, w = int(img.shape[0]), int(img.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    wp = _round_up(w + 16, 128)
    # two full planes resident + banded adapt/outputs
    return 2 * (hp + 16) * wp * 4 <= _VMEM_PADDED_BYTES


# ---------------------------------------------------------------------------
# 256-bin histograms — fused hi/lo one-hot kernel
# ---------------------------------------------------------------------------

_HIST_ROWS = 256  # pixel rows per grid step


def _make_hist_kernel(rows: int, n_chunks: int):
    """Accumulates a (4, 64) hi/lo count matrix over row-chunks of one
    image: counts[hi, lo] = #pixels with value hi*64+lo, exactly the
    ops.histogram.hist256 MXU formulation — but the (chunk, 4) and
    (chunk, 64) one-hots are built lane-major in vregs and die inside the
    chunk instead of round-tripping HBM (the XLA form moves ~68 pixel-
    bytes of indicators per pixel: ~2.2 GB for a batch-8 docscan Otsu
    pair). Padding slots carry -1: hi = -1 matches no hi row, so they
    contribute nothing (vote-kernel poison trick)."""
    chunk = rows * 128

    def kernel(v_ref, out_ref, acc_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros((8, 64), jnp.float32)

        v = v_ref[:].reshape(1, chunk)
        hi = jax.lax.shift_right_arithmetic(v, 6)
        lo = jax.lax.bitwise_and(v, 63)
        oh_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0)
                 ).astype(jnp.bfloat16)
        oh_lo = (lo == jax.lax.broadcasted_iota(jnp.int32, (64, chunk), 0)
                 ).astype(jnp.bfloat16)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            oh_hi, oh_lo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(c == n_chunks - 1)
        def _():
            out_ref[:] = acc_ref[:].reshape(1, 8, 64)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "rows"))
def hist256_batch_pallas(vals: jnp.ndarray, interpret: bool = False,
                         rows: int = _HIST_ROWS) -> jnp.ndarray:
    """(B, ...) uint8 -> (B, 256) int32 histograms, identical counts to
    ops.histogram.hist256 (tests/test_pallas.py). The TPU production path
    for full-image histograms (Otsu pairs, CLAHE tile LUT builds, report
    panels)."""
    b = int(vals.shape[0])
    n = int(np.prod(vals.shape[1:]))
    rows_total = _round_up(-(-n // 128), rows)
    pad = rows_total * 128 - n
    v = vals.reshape(b, n).astype(jnp.int32)
    v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=-1)
    v = v.reshape(b, rows_total, 128)
    n_chunks = rows_total // rows

    kernel = _make_hist_kernel(rows, n_chunks)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        out_shape=jax.ShapeDtypeStruct((b, 8, 64), jnp.float32),
        in_specs=[pl.BlockSpec((1, rows, 128), lambda i, c: (i, c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 64), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 64), jnp.float32)],
        interpret=interpret,
    )(v)
    return out.reshape(b, 512)[:, :256].astype(jnp.int32)


# ---------------------------------------------------------------------------
# morph_seq fused chain — gray+erode3 and binary+close3 band kernels
# ---------------------------------------------------------------------------


def _make_gray_erode3_kernel(th: int, slab: int, wp: int, h: int, w: int):
    """One grid step computes morph_seq steps 1-2 for output rows
    [t*th, (t+1)*th): OpenCV fixed-point RGB->gray (color.py rgb_to_gray's
    exact descale) and the 3x3 rect erosion (constant-255 borders, like
    ops.morphology) in ONE VMEM pass. The RGB input arrives byte-packed
    into one int32 plane (r | g<<8 | b<<16) so a single full plane stays
    VMEM-resident (three separate planes would triple the residency
    budget); the unpack is three VPU mask/shift ops per value. The XLA
    form materializes gray to HBM, then runs 4 shifted min passes over it
    — here the band's gray lives in vregs and the erode reads it there."""

    def kernel(px_ref, gray_ref, erod_ref):
        t = pl.program_id(0)
        v = px_ref[pl.ds(t * th, slab), :]
        r = jax.lax.bitwise_and(v, 255)
        g = jax.lax.bitwise_and(jax.lax.shift_right_logical(v, 8), 255)
        b = jax.lax.shift_right_logical(v, 16)
        gray = jax.lax.shift_right_arithmetic(
            r * 9798 + g * 19235 + b * 3735 + 16384, 15)
        grow = (jax.lax.broadcasted_iota(jnp.int32, (slab, wp), 0)
                + t * th - 2)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, wp), 1) - 2
        valid = ((grow >= 0) & (grow < h)) & ((gcol >= 0) & (gcol < w))

        e = _sliding_extreme(jnp.where(valid, gray, 255), 3, slab, 0, False)
        e = pltpu.roll(e, 1, axis=0)
        e = _sliding_extreme(e, 3, wp, 1, False)
        e = pltpu.roll(e, 1, axis=1)

        # band rows sit at slab-local [2, 2+th): rotate to 0, slice aligned
        gray_ref[:] = pltpu.roll(gray, slab - 2, axis=0)[:th, :]
        erod_ref[:] = pltpu.roll(e, slab - 2, axis=0)[:th, :]

    return kernel


def _make_binary_close3_kernel(th: int, slab: int, wp: int, h: int, w: int):
    """One grid step computes morph_seq steps 3-4 for output rows
    [t*th, (t+1)*th): the Otsu binary (strict ``>`` compare against the
    SMEM threshold, cv2.THRESH_BINARY) and the 3x3 rect closing
    (dilate pad-0 then erode pad-255, ops.morphology's exact constant
    borders via iota validity masks — the blackhat kernel's scheme)."""

    def kernel(t_ref, er_ref, bin_ref, clo_ref):
        t = pl.program_id(0)
        x = er_ref[pl.ds(t * th, slab), :]
        grow = (jax.lax.broadcasted_iota(jnp.int32, (slab, wp), 0)
                + t * th - 2)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, wp), 1) - 2
        valid = ((grow >= 0) & (grow < h)) & ((gcol >= 0) & (gcol < w))

        binv = jnp.where(x > t_ref[0, 0], 255, 0)

        d = _sliding_extreme(jnp.where(valid, binv, 0), 3, slab, 0, True)
        d = pltpu.roll(d, 1, axis=0)
        d = _sliding_extreme(d, 3, wp, 1, True)
        d = pltpu.roll(d, 1, axis=1)

        e = _sliding_extreme(jnp.where(valid, d, 255), 3, slab, 0, False)
        e = pltpu.roll(e, 1, axis=0)
        e = _sliding_extreme(e, 3, wp, 1, False)
        e = pltpu.roll(e, 1, axis=1)

        bin_ref[:] = pltpu.roll(binv, slab - 2, axis=0)[:th, :]
        clo_ref[:] = pltpu.roll(e, slab - 2, axis=0)[:th, :]

    return kernel


def _morphseq_geom(h: int, w: int):
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    slab = _round_up(th + 4, 8)     # 2-row reach per side (close = 2 ops)
    wp = _round_up(w + 4, 128)      # 2-col margin per side
    return th, hp, slab, wp


def _morphseq_pad(plane_i32, h: int, w: int, hp: int, slab: int, th: int,
                  wp: int):
    """Pad layout shared by both kernels: image at padded row 2 / col 2 so
    slab reads start 8-aligned at t*th (the blackhat kernel's scheme)."""
    return jnp.pad(plane_i32,
                   ((2, (hp - h) + (slab - th) - 2 + 8), (2, wp - w - 2)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gray_erode3_pallas(rgb: jnp.ndarray, interpret: bool = False):
    """(gray, eroded) uint8 planes from uint8 HWC RGB — morph_seq steps
    1-2 (pyc to_grayscale + grayscale_erosion, SURVEY §3.5) as one fused
    band kernel. Bit-identical to rgb_to_gray + erode(rect3):
    tests/test_morphseq.py cross-checks, hardware parity via
    benchmarks/hw_check_kernels.py morphseq."""
    h, w = int(rgb.shape[0]), int(rgb.shape[1])
    th, hp, slab, wp = _morphseq_geom(h, w)
    packed = (rgb[..., 0].astype(jnp.int32)
              | (rgb[..., 1].astype(jnp.int32) << 8)
              | (rgb[..., 2].astype(jnp.int32) << 16))
    p = _morphseq_pad(packed, h, w, hp, slab, th, wp)
    band = pl.BlockSpec((th, wp), lambda t: (t, 0), memory_space=pltpu.VMEM)
    gray, erod = pl.pallas_call(
        _make_gray_erode3_kernel(th, slab, wp, h, w),
        grid=(hp // th,),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.int32)),
        in_specs=[pl.BlockSpec((hp + slab - th + 8, wp), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(band, band),
        interpret=interpret,
    )(p)
    sl = (slice(None, h), slice(2, 2 + w))
    return gray[sl].astype(jnp.uint8), erod[sl].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def binary_close3_pallas(eroded: jnp.ndarray, t,
                         interpret: bool = False):
    """(binary, closed) uint8 planes from the eroded plane and its Otsu
    threshold — morph_seq steps 3-4 (otsu_binarize + binary_closing) as
    one fused band kernel. Bit-identical to threshold_binary +
    morph_close(rect3). ``t`` is the integer-valued Otsu threshold (the
    compare is strict ``>``, cv2.THRESH_BINARY semantics)."""
    h, w = int(eroded.shape[0]), int(eroded.shape[1])
    th, hp, slab, wp = _morphseq_geom(h, w)
    p = _morphseq_pad(eroded.astype(jnp.int32), h, w, hp, slab, th, wp)
    ts = jnp.asarray(t, jnp.float32).astype(jnp.int32).reshape(1, 1)
    band = pl.BlockSpec((th, wp), lambda t_: (t_, 0),
                        memory_space=pltpu.VMEM)
    binv, clo = pl.pallas_call(
        _make_binary_close3_kernel(th, slab, wp, h, w),
        grid=(hp // th,),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.int32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((hp + slab - th + 8, wp), lambda t_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(band, band),
        interpret=interpret,
    )(ts, p)
    sl = (slice(None, h), slice(2, 2 + w))
    return binv[sl].astype(jnp.uint8), clo[sl].astype(jnp.uint8)


def morphseq_pallas_applicable(rgb) -> bool:
    """Hardware gate for the fused morph_seq chain: uint8 HWC RGB whose
    padded int32 plane fits the VMEM residency budget (both kernels keep
    one full plane resident, same budget as the blackhat kernel)."""
    if getattr(rgb, "ndim", 0) != 3 or rgb.shape[-1] != 3:
        return False
    h, w = int(rgb.shape[0]), int(rgb.shape[1])
    th, hp, slab, wp = _morphseq_geom(h, w)
    return (hp + slab - th + 8) * wp * 4 <= _VMEM_PADDED_BYTES


def bilateral_pallas_applicable(img, d: int = 9,
                                sigma_space: float = 75.0) -> bool:
    """True when the row-band kernel handles this input on hardware:
    grayscale 2-D, and the whole padded f32 image fits the VMEM budget
    (color images and oversize inputs use the ops.bilateral scan path)."""
    if getattr(img, "ndim", 0) != 2:
        return False
    from tpuimage.ops.bilateral import _params
    radius, _, _ = _params(d, 1.0, sigma_space)
    h, w = int(img.shape[0]), int(img.shape[1])
    th = min(_BAND_ROWS, _round_up(h, 8))
    hp = _round_up(h, th)
    wp = _round_up(w + 2 * radius, 128)
    return (hp + 2 * radius) * wp * 4 <= _VMEM_PADDED_BYTES
