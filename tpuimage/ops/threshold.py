"""Thresholding: global binary, Otsu composite, adaptive (gaussian/mean).

Replaces cv2.threshold at DocScanner.py:187-189,202-204 and
cv2.adaptiveThreshold at DocScanner.py:167, ipynb cell 15.
"""
from __future__ import annotations

import jax.numpy as jnp

from tpuimage.core.dtypes import f32, saturate_u8
from tpuimage.core.borders import BORDER_REPLICATE
from tpuimage.ops.histogram import otsu_threshold
from tpuimage.ops.filters import gaussian_blur_f32, box_filter_u8


def threshold_binary(gray: jnp.ndarray, thresh, maxval: int = 255) -> jnp.ndarray:
    """cv2.THRESH_BINARY: dst = src > thresh ? maxval : 0 (strict >)."""
    return jnp.where(f32(gray) > thresh, jnp.uint8(maxval), jnp.uint8(0))


def threshold_binary_inv(gray: jnp.ndarray, thresh, maxval: int = 255) -> jnp.ndarray:
    return jnp.where(f32(gray) > thresh, jnp.uint8(0), jnp.uint8(maxval))


def threshold_otsu(gray: jnp.ndarray, maxval: int = 255):
    """cv2.threshold(..., THRESH_BINARY + THRESH_OTSU) -> (t, binary)."""
    t = otsu_threshold(gray)
    return t, threshold_binary(gray, t, maxval)


def adaptive_threshold(gray: jnp.ndarray, max_value: int = 255,
                       method: str = "gaussian", block_size: int = 35,
                       C: float = 10.0, inverse: bool = False) -> jnp.ndarray:
    """cv2.adaptiveThreshold THRESH_BINARY.

    GAUSSIAN_C converts src to CV_32F, GaussianBlurs in float32 with a
    CV_32F kernel and BORDER_REPLICATE, then rounds the mean back to uint8
    (cvRound); MEAN_C box-filters in integers. The binary test is
    ``src - mean > -idelta`` with idelta = ceil(C) (floor for INV).
    """
    if block_size % 2 == 0:
        block_size += 1
    if method == "gaussian":
        mean_f = gaussian_blur_f32(f32(gray), ksize=block_size, border=BORDER_REPLICATE)
        mean = saturate_u8(mean_f)
    else:
        mean = box_filter_u8(gray, block_size, border=BORDER_REPLICATE)
    import math
    idelta = math.ceil(C) if not inverse else math.floor(C)
    diff = gray.astype(jnp.int32) - mean.astype(jnp.int32)
    if not inverse:
        return jnp.where(diff > -idelta, jnp.uint8(max_value), jnp.uint8(0))
    return jnp.where(diff <= -idelta, jnp.uint8(max_value), jnp.uint8(0))
