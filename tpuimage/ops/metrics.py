"""Quality metrics: PSNR, SSIM, brightness/contrast stats.

Replaces cv2.PSNR + skimage.metrics.structural_similarity at
Landscape.py:148-154 (``calculate_metrics``) and ipynb cell 7
(``compute_metrics``), and ``get_image_stats`` at Landscape.py:195-201.

SSIM reproduces skimage defaults for uint8 inputs: win_size=7 uniform
filter, data_range=255, K1=.01 K2=.03, sample covariance normalization
(N/(N-1)), edge crop of (win-1)//2 before the mean — value-identical to
``ssim(a, b)`` to float32 precision.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpuimage.core.dtypes import f32


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """cv2.PSNR: 10*log10(max^2 / MSE); inf-> matches cv2 (returns inf)."""
    mse = jnp.mean((f32(a) - f32(b)) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / mse)


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((f32(a) - f32(b)) ** 2)


def _uniform_filter_valid(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean over win x win windows, 'valid' region only (skimage crops)."""
    ones = (win, win) + (1,) * (x.ndim - 2)
    s = lax.reduce_window(x, 0.0, lax.add, ones, (1,) * x.ndim, "VALID")
    return s / (win * win)


def ssim(a: jnp.ndarray, b: jnp.ndarray, win_size: int = 7,
         data_range: float = 255.0, k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """skimage.metrics.structural_similarity(a, b) with default args.

    Gray HW or color HWC (channel mean like skimage channel_axis)."""
    x = f32(a)
    y = f32(b)
    nd = 2  # spatial dims
    npix = win_size ** nd
    cov_norm = npix / (npix - 1.0)

    ux = _uniform_filter_valid(x, win_size)
    uy = _uniform_filter_valid(y, win_size)
    uxx = _uniform_filter_valid(x * x, win_size)
    uyy = _uniform_filter_valid(y * y, win_size)
    uxy = _uniform_filter_valid(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    # skimage computes the map over the full (same-size) image then crops
    # pad on each side; our 'valid' reduce_window already yields that crop.
    return jnp.mean(s)


def ssim_map(a: jnp.ndarray, b: jnp.ndarray, win_size: int = 7,
             data_range: float = 255.0) -> jnp.ndarray:
    """The per-pixel SSIM map over the valid region (``full=True`` analog)."""
    x, y = f32(a), f32(b)
    npix = win_size ** 2
    cov_norm = npix / (npix - 1.0)
    ux = _uniform_filter_valid(x, win_size)
    uy = _uniform_filter_valid(y, win_size)
    vx = cov_norm * (_uniform_filter_valid(x * x, win_size) - ux * ux)
    vy = cov_norm * (_uniform_filter_valid(y * y, win_size) - uy * uy)
    vxy = cov_norm * (_uniform_filter_valid(x * y, win_size) - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    return ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))


def image_stats(gray: jnp.ndarray):
    """Landscape.py:195-201 get_image_stats: brightness=mean, contrast=std."""
    g = f32(gray)
    return {"brightness": jnp.mean(g), "contrast": jnp.std(g)}
