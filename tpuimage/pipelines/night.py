"""Night-landscape low-light pipelines.

- :func:`night_gray`  — NightLandscapeEnhancement.py:11-89: grayscale,
  median 3x3, CLAHE(clip 2.0, 8x8).
- :func:`night_rgb`   — asm.py:11-166: median 3x3 on the color image,
  CLAHE(2.0, 8x8) on the LAB L channel, merge back.
- :func:`night_gui`   — AI_classification.py:627-637 _run_night_enhance:
  identical math to night_rgb (median3 + LAB CLAHE 2.0).

All jitted + vmappable; histograms (the matplotlib panels of the
reference) are available via :func:`tpuimage.ops.histogram.hist256`.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tpuimage.ops.median import median_blur
from tpuimage.ops.histogram import clahe
from tpuimage.ops import color as colorops


@jax.jit
def night_gray(gray: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """uint8 HW -> stage dict (original/filtered/enhanced)."""
    filtered = median_blur(gray, 3)
    enhanced = clahe(filtered, clip_limit=2.0, tiles_x=8, tiles_y=8)
    return {"original": gray, "filtered": filtered, "enhanced": enhanced}


@jax.jit
def night_rgb(rgb: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """uint8 HWC RGB -> stage dict. LAB math is channel-order-agnostic:
    asm.py's BGR2LAB on BGR equals rgb_to_lab on RGB."""
    filtered = median_blur(rgb, 3)
    lab = colorops.rgb_to_lab(filtered)
    l_enh = clahe(lab[..., 0], clip_limit=2.0, tiles_x=8, tiles_y=8)
    lab_enh = jnp.concatenate([l_enh[..., None], lab[..., 1:]], axis=-1)
    enhanced = colorops.lab_to_rgb(lab_enh)
    return {"original": rgb, "filtered": filtered, "enhanced": enhanced}


night_gui = night_rgb  # AI_classification.py:627-637 runs the same math


@jax.jit
def night_gray_batch(gray_batch: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    return jax.vmap(night_gray)(gray_batch)


@jax.jit
def night_rgb_batch(rgb_batch: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    return jax.vmap(night_rgb)(rgb_batch)
