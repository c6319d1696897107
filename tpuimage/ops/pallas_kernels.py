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
