"""Saturating uint8 arithmetic and range ops matching OpenCV semantics.

Replaces: cv2.subtract / cv2.divide(scale=255) / cv2.max / cv2.bitwise_or
(DocScanner.py:158,155,207,88), cv2.addWeighted (Landscape.py:145,
FaceEnhancement.py:162), cv2.normalize NORM_MINMAX (DocScanner.py:156,172,
FaceEnhancement.py:275), cv2.inRange (FaceEnhancement.py:112).

OpenCV saturates uint8 arithmetic (numpy wraps), so every op here routes
through int32/float32 intermediates and :func:`saturate_u8`.
"""
from __future__ import annotations

import jax.numpy as jnp

from tpuimage.core.dtypes import saturate_u8, i32, f32


def add_u8(a: jnp.ndarray, b) -> jnp.ndarray:
    return saturate_u8(i32(a) + i32(b))


def subtract_u8(a: jnp.ndarray, b) -> jnp.ndarray:
    return saturate_u8(i32(a) - i32(b))


def divide_u8(a: jnp.ndarray, b: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """cv2.divide: dst = saturate(round(a*scale/b)); b == 0 -> 0.

    For integer scales the quotient is computed in exact integer arithmetic
    with round-half-to-even — verified equal to cv2.divide on the FULL
    256x256 (a, b) domain — because a traced f32 division inside a fused
    TPU program gets reciprocal/FMA-contracted by XLA (measured ±1 LSB on
    0.12% of pixels in the docscan illumination stage); the integer form is
    bit-exact on every backend. Non-integer scales keep the f32 path.
    """
    if (a.dtype == jnp.uint8 and b.dtype == jnp.uint8
            and float(scale) == int(scale) and 0 <= int(scale) < (1 << 23)):
        n = i32(a) * int(scale)
        d = i32(b)
        safe = jnp.maximum(d, 1)
        q0 = n // safe
        r0 = n - q0 * safe
        q = (q0 + (2 * r0 > safe).astype(jnp.int32)
             + ((2 * r0 == safe) & (q0 % 2 == 1)).astype(jnp.int32))
        q = jnp.where(d > 0, q, 0)
        return jnp.clip(q, 0, 255).astype(jnp.uint8)
    bf = f32(b)
    out = jnp.where(bf != 0, f32(a) * scale / jnp.where(bf != 0, bf, 1.0), 0.0)
    return saturate_u8(out)


def multiply_u8(a: jnp.ndarray, b: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    return saturate_u8(f32(a) * f32(b) * scale)


def max_u8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(a, b)


def min_u8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(a, b)


def bitwise_or(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a | b


def bitwise_and(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a & b


def bitwise_not(a: jnp.ndarray) -> jnp.ndarray:
    return ~a


def absdiff_u8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return saturate_u8(jnp.abs(i32(a) - i32(b)))


def add_weighted(a: jnp.ndarray, alpha: float, b: jnp.ndarray, beta: float,
                 gamma: float = 0.0) -> jnp.ndarray:
    """cv2.addWeighted: saturate(a*alpha + b*beta + gamma)."""
    return saturate_u8(f32(a) * alpha + f32(b) * beta + gamma)


def _minmax_scale(smin, smax, alpha: float, beta: float):
    """The NORM_MINMAX affine coefficients, shared by the per-pixel and the
    LUT forms so both compute the identical f32 expression."""
    rng = smax - smin
    scale = jnp.where(rng > 0, (beta - alpha) / jnp.where(rng > 0, rng, 1.0), 0.0)
    return scale, alpha - smin * scale


def normalize_minmax(img: jnp.ndarray, alpha: float = 0.0, beta: float = 255.0) -> jnp.ndarray:
    """cv2.normalize(..., alpha, beta, NORM_MINMAX) on uint8.

    scale = (beta-alpha)/(max-min); dst = saturate(round((x-min)*scale+alpha)).
    Constant images map to alpha (scale becomes 0), matching OpenCV.
    """
    x = f32(img)
    smin = jnp.min(x)
    smax = jnp.max(x)
    scale, offset = _minmax_scale(smin, smax, alpha, beta)
    return saturate_u8(x * scale + offset)


def normalize_minmax_lut(smin, smax, alpha: float = 0.0,
                         beta: float = 255.0) -> jnp.ndarray:
    """The NORM_MINMAX map as a 256-entry uint8 LUT: for a uint8 image with
    the given min/max, ``lut[v] == normalize_minmax(img)[p]`` wherever
    ``img[p] == v`` — the per-pixel result depends only on the pixel VALUE,
    so the identical f32 expression over an iota reproduces it exactly.

    The LUT is monotone non-decreasing (scale >= 0, rint/clip monotone),
    which is what lets callers pull threshold tests and histograms back to
    the raw plane (see pipelines/docscan._pre_deskew_stages): the
    normalized plane itself never needs materializing.
    """
    scale, offset = _minmax_scale(f32(smin), f32(smax), alpha, beta)
    v = jnp.arange(256, dtype=jnp.float32)
    return saturate_u8(v * scale + offset)


def in_range(img: jnp.ndarray, lower, upper) -> jnp.ndarray:
    """cv2.inRange: 255 where lower <= img <= upper across all channels."""
    lo = jnp.asarray(lower, dtype=img.dtype)
    hi = jnp.asarray(upper, dtype=img.dtype)
    ok = (img >= lo) & (img <= hi)
    if img.ndim == 3:
        ok = jnp.all(ok, axis=-1)
    return jnp.where(ok, jnp.uint8(255), jnp.uint8(0))


def blend_mask(a: jnp.ndarray, b: jnp.ndarray, mask01: jnp.ndarray) -> jnp.ndarray:
    """(a * mask) + (b * (1 - mask)) with truncation-to-uint8.

    The reference blends with ``.astype(np.uint8)`` (truncation, not
    rounding) at FaceEnhancement.py:143,371 and AI_classification.py:739 —
    reproduced here for parity.
    """
    m = f32(mask01)
    if a.ndim == 3 and m.ndim == 2:
        m = m[..., None]
    out = f32(a) * m + f32(b) * (1.0 - m)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
