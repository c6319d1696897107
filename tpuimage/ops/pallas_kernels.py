"""Pallas TPU kernels for stencil-heavy ops.

First kernel: the bilateral filter's tap loop (cv2.bilateralFilter 8u gray
path — DocScanner.py:42 preprocess). The XLA scan version re-materializes
the (num, den) carry per tap; here the padded image and both accumulators
live in VMEM for the whole tap loop (one HBM read + one write total), with
tap offsets scalar-prefetched from SMEM driving dynamic slices.

Numerics are identical to ops.bilateral (same tap set, same space/color
weight expressions, cvRound output), so it inherits the same ±1 LSB
contract vs cv2. Falls back to the scan implementation for color images
or images whose padded f32 copy would not fit VMEM.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimage.core.dtypes import saturate_u8

# padded f32 image + 2 f32 accumulators + u8 out must fit in ~16 MB VMEM
_VMEM_BUDGET_PIXELS = 1_100_000


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_bilateral_kernel(taps, space_weights, gauss_color):
    """Kernel factory with the tap set baked in statically (Mosaic needs
    statically-analyzable slice offsets; the tap set is already a static
    function of (d, sigma_space))."""

    def kernel(padded_ref, center_ref, out_ref, num_ref, den_ref):
        h, w = center_ref.shape
        # accumulate through the scratch refs so each tap's temporaries die
        # immediately (a functional accumulation kept all taps live and blew
        # the VMEM stack)
        num_ref[:] = jnp.zeros((h, w), jnp.float32)
        den_ref[:] = jnp.zeros((h, w), jnp.float32)
        for (oy, ox), sw in zip(taps, space_weights):
            view = padded_ref[oy:oy + h, ox:ox + w]
            diff = jnp.abs(view - center_ref[:])
            wgt = jnp.exp(diff * diff * gauss_color) * sw
            num_ref[:] = num_ref[:] + view * wgt
            den_ref[:] = den_ref[:] + wgt
        # Mosaic can't cast f32->u8 directly; emit int32, caller casts
        out_ref[:] = jnp.clip(jnp.rint(num_ref[:] / den_ref[:]), 0, 255
                              ).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("d", "sigma_color", "sigma_space",
                                             "interpret"))
def bilateral_gray_pallas(img: jnp.ndarray, d: int, sigma_color: float,
                          sigma_space: float, interpret: bool = False) -> jnp.ndarray:
    """cv2.bilateralFilter on uint8 HW via one fused VMEM kernel."""
    from tpuimage.ops.bilateral import _params, _tap_offsets
    from tpuimage.core.borders import pad2d, BORDER_REFLECT_101

    radius, sc, ss = _params(d, sigma_color, sigma_space)
    taps = _tap_offsets(radius)
    gc = np.float32(-0.5 / (sc * sc))
    gs = -0.5 / (ss * ss)

    h, w = int(img.shape[0]), int(img.shape[1])
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    # pad to lane-aligned shape; stencil border stays reflect-101 around the
    # REAL image, extra alignment rows/cols replicate (cropped afterwards)
    x = pad2d(img, 0, hp - h, 0, wp - w, mode="edge")
    xf = x.astype(jnp.float32)
    p = pad2d(xf, radius, radius, radius, radius, mode=BORDER_REFLECT_101)
    # re-fix the reflect border to reference the real image, not the
    # alignment padding: reflect-101 of the padded copy equals reflect of
    # the original for the top/left; bottom/right alignment area is cropped
    # before it can influence real output pixels only if radius <= pad...
    # (alignment pad >= 0; for exactness we pad the ORIGINAL reflect first)
    p_exact = pad2d(img.astype(jnp.float32), radius, radius, radius, radius,
                    mode=BORDER_REFLECT_101)
    p = jax.lax.dynamic_update_slice(p, p_exact, (0, 0))

    tap_list = tuple((radius + dy, radius + dx) for (dy, dx, _) in taps)
    sw_list = tuple(float(np.float32(np.exp(r * r * gs))) for (_, _, r) in taps)
    kernel = _make_bilateral_kernel(tap_list, sw_list, float(gc))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # padded image
            pl.BlockSpec(memory_space=pltpu.VMEM),   # center
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(p, xf)
    return out[:h, :w].astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Hough vote accumulation
# ---------------------------------------------------------------------------

_HOUGH_LO = 128      # lane-aligned lo-bin width
_HOUGH_BANDS = 128   # compaction bands (edge e lives in band flat_idx % 128)
_HOUGH_ROWS = 64     # rows per in-kernel chunk (chunk = ROWS * BANDS edges)


def _make_hough_kernel(numrho: int, n_hi: int, w: int):
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
      count costs nothing. Total: ~8 ms voting + ~7 ms banded top_k.
    """
    invalid_bin = n_hi * _HOUGH_LO - 1  # spare hi row, dropped by caller
    chunk = _HOUGH_ROWS * _HOUGH_BANDS

    def kernel(nt_ref, ct_ref, st_ref, ci_ref, cnt_ref, out_ref, acc_ref):
        t = pl.program_id(0)
        ct = ct_ref[t, 0]
        st = st_ref[t, 0]
        acc_ref[:] = jnp.zeros((n_hi, _HOUGH_LO), jnp.float32)
        band = jax.lax.broadcasted_iota(jnp.int32, (_HOUGH_ROWS, _HOUGH_BANDS), 1)

        def body(c, _):
            ci = ci_ref[pl.ds(c * _HOUGH_ROWS, _HOUGH_ROWS), :]
            rowj = c * _HOUGH_ROWS + jax.lax.broadcasted_iota(
                jnp.int32, (_HOUGH_ROWS, _HOUGH_BANDS), 0)
            ok = rowj < cnt_ref[0, :]
            gi = ci * _HOUGH_BANDS + band           # flat image index
            y = (gi // w).astype(jnp.float32)
            x = (gi % w).astype(jnp.float32)
            r = jnp.round(x * ct + y * st).astype(jnp.int32) + (numrho - 1) // 2
            r = jnp.where(ok, jnp.clip(r, 0, invalid_bin), invalid_bin
                          ).reshape(1, chunk)
            hi = r // _HOUGH_LO
            lo = r % _HOUGH_LO
            ohT_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (n_hi, chunk), 0)
                      ).astype(jnp.bfloat16)
            ohT_lo = (lo == jax.lax.broadcasted_iota(jnp.int32, (_HOUGH_LO, chunk), 0)
                      ).astype(jnp.bfloat16)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                ohT_hi, ohT_lo, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nt_ref[0, 0], body, 0)
        out_ref[:] = acc_ref[:].reshape(1, n_hi, _HOUGH_LO)

    return kernel


@functools.partial(jax.jit, static_argnames=("numrho", "w", "theta_bins",
                                             "interpret"))
def hough_votes_pallas(ci_t: jnp.ndarray, counts: jnp.ndarray, numrho: int,
                       w: int, theta_bins: int = 180,
                       interpret: bool = False) -> jnp.ndarray:
    """(numrho, theta_bins) int32 vote accumulator over a band-compacted
    edge list — the Pallas production path of ops.hough.hough_accumulator
    (identical counts: same f32 round, same bf16 one-hot / f32-accumulate
    contraction).

    ci_t: (kb, 128) int32 — per-band in-band indices from a banded top_k,
    transposed so valid edges are row-dense; counts: (128,) int32 edges per
    band; w: image width (flat index = in_band_idx * 128 + band)."""
    kb = int(ci_t.shape[0])
    assert kb % _HOUGH_ROWS == 0
    n_hi = (numrho + _HOUGH_LO - 1) // _HOUGH_LO + 1  # +1 spare row

    thetas = np.arange(theta_bins) * (np.pi / theta_bins)
    cos_t = jnp.asarray(np.cos(thetas), jnp.float32).reshape(theta_bins, 1)
    sin_t = jnp.asarray(np.sin(thetas), jnp.float32).reshape(theta_bins, 1)
    n_trips = ((jnp.max(counts) + _HOUGH_ROWS - 1) // _HOUGH_ROWS
               ).astype(jnp.int32).reshape(1, 1)

    kernel = _make_hough_kernel(numrho, n_hi, w)
    votes = pl.pallas_call(
        kernel,
        grid=(theta_bins,),
        out_shape=jax.ShapeDtypeStruct((theta_bins, n_hi, _HOUGH_LO), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            # full trig tables in SMEM, indexed by program_id (per-step
            # (1,1) SMEM blocks fail Mosaic's block-shape divisibility check)
            pl.BlockSpec((theta_bins, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((theta_bins, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            # whole edge list stays VMEM-resident across all theta steps
            pl.BlockSpec((kb, _HOUGH_BANDS), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HOUGH_BANDS), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_hi, _HOUGH_LO), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_hi, _HOUGH_LO), jnp.float32)],
        interpret=interpret,
    )(n_trips, cos_t, sin_t, ci_t, counts.reshape(1, _HOUGH_BANDS))
    # drop the spare row's lane range and return in (numrho, theta) layout
    return votes.reshape(theta_bins, n_hi * _HOUGH_LO)[:, :numrho].astype(jnp.int32).T


def bilateral_pallas_applicable(img) -> bool:
    # DISABLED on hardware for now: Mosaic lowers each misaligned static
    # slice of the VMEM-resident padded image as a separate stack
    # materialization (61 taps x ~1 MB blew the 16 MB scoped-VMEM limit).
    # The kernel is numerically validated in interpret mode
    # (tests/test_pallas.py); enabling it on hardware needs the
    # manual-DMA halo-tiling pattern (grid over aligned output tiles, halo
    # bands DMAd HBM->VMEM per tile) — tracked for the next round. The
    # lax.scan formulation in ops.bilateral is the production path.
    return False
