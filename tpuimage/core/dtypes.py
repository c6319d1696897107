"""Dtype policy and OpenCV-compatible rounding/saturation helpers.

The whole framework stores images as uint8 (HW grayscale, HWC color,
NHWC batched) and computes in float32 / int32 inside jit. Every cast back
to uint8 goes through :func:`saturate_u8`, which reproduces OpenCV's
``saturate_cast<uchar>``: round-half-to-even (cvRound) then clamp.

Replaces the implicit semantics of every ``cv2.*`` call in the reference
(e.g. DocScanner.py:156 ``cv2.normalize``, FaceEnhancement.py:144
``.astype(np.uint8)`` after float blends).
"""
from __future__ import annotations

import jax.numpy as jnp


def f32(x) -> jnp.ndarray:
    return jnp.asarray(x).astype(jnp.float32)


def i32(x) -> jnp.ndarray:
    return jnp.asarray(x).astype(jnp.int32)


def round_half_even(x: jnp.ndarray) -> jnp.ndarray:
    """cvRound: round half to even (banker's rounding), like jnp.rint."""
    return jnp.rint(x)


def saturate_u8(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV saturate_cast<uchar>: cvRound for floats, clamp to [0,255]."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        x = jnp.rint(x)
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def lerp2(v11, v12, v21, v22, xa, ya):
    """Bilinear blend ``(v11*(1-xa)+v12*xa)*(1-ya) + (v21*(1-xa)+v22*xa)*ya``.

    Rounding note: OpenCV's scalar/SSE baseline computes this with per-op
    f32 rounding; XLA freely FMA-contracts the products (and folds any
    user-level attempt to force per-op rounding — optimization_barrier and
    lossy f64<->f32 round-trips are both folded by the CPU backend), which
    keeps more precision and can land exactly on a cvRound .5 boundary.
    Result: a rare ±1 LSB vs one particular cv2 build on boundary pixels
    (~1 in 10^4). OpenCV's own SSE/AVX2/AVX512 dispatches disagree with
    each other at the same pixels, so ±1 LSB *is* the parity target here.
    """
    xa1 = 1.0 - xa
    ya1 = 1.0 - ya
    return (v11 * xa1 + v12 * xa) * ya1 + (v21 * xa1 + v22 * xa) * ya


def trunc_u8(x: jnp.ndarray) -> jnp.ndarray:
    """``np.clip(x, 0, 255).astype(np.uint8)`` — TRUNCATION, not cvRound.

    This is the reference scripts' float->uint8 cast (e.g.
    FaceEnhancement.py:144 mask blends, Landscape.py:95 sky blend, the
    notebook's stretch/blend casts); distinct from :func:`saturate_u8`
    which reproduces cv2's round-half-to-even."""
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def descale(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """OpenCV CV_DESCALE(x, n) = (x + (1 << (n-1))) >> n on int32.

    This is the rounding primitive of every fixed-point cvtColor path
    (opencv color.hpp). Works on negative values exactly like the C
    arithmetic right shift.
    """
    x = i32(x)
    return (x + (1 << (n - 1))) >> n
