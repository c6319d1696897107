"""Restoration ops: single-scale Retinex and Richardson-Lucy deconvolution.

Replaces ipynb cell 19 ``single_scale_retinex`` (log-domain SSR, per-channel
min-max normalize) and cell 5 ``deblur_richardson_lucy_gray`` (skimage
``richardson_lucy`` on a 5x5 sigma-1 gaussian PSF).

TPU-native: SSR is a big separable gaussian + elementwise log (one fused
program); RL is a ``lax.fori_loop`` of two small convolutions per step —
the multiplicative-update loop stays entirely on device (SURVEY.md §2.2
last rows).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpuimage.core.dtypes import f32, saturate_u8
from tpuimage.ops.filters import gaussian_blur_f32, get_gaussian_kernel


@functools.partial(jax.jit, static_argnames=("sigma",))
def single_scale_retinex(rgb: jnp.ndarray, sigma: float = 80.0) -> jnp.ndarray:
    """ipynb cell 19: r = log(I+1) - log(G_sigma(I+1)+1), each channel
    min-max scaled to 0..255 (truncating cast like the reference)."""
    img = f32(rgb) + 1.0
    blur = gaussian_blur_f32(img, ksize=0, sigma=sigma)
    retinex = jnp.log(img) - jnp.log(blur + 1.0)
    mn = retinex.min(axis=(0, 1), keepdims=True)
    ch = retinex - mn
    mx = ch.max(axis=(0, 1), keepdims=True)
    out = ch * (255.0 / jnp.maximum(mx, 1e-12))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def _conv2_same(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """2-D 'same' convolution with zero padding (skimage RL uses
    scipy.signal.convolve mode='same')."""
    kh, kw = k.shape
    x4 = x[None, ..., None]
    k4 = k[..., None, None]
    dn = lax.conv_dimension_numbers(x4.shape, k4.shape, ("NHWC", "HWIO", "NHWC"))
    # true convolution = correlation with the flipped kernel
    kf = k4[::-1, ::-1]
    out = lax.conv_general_dilated(x4, kf, (1, 1),
                                   [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
                                   dimension_numbers=dn,
                                   precision=lax.Precision.HIGHEST)
    return out[0, ..., 0]


@functools.partial(jax.jit, static_argnames=("iterations", "psf_size", "psf_sigma"))
def richardson_lucy_gray(gray: jnp.ndarray, iterations: int = 20,
                         psf_size: int = 5, psf_sigma: float = 1.0) -> jnp.ndarray:
    """ipynb cell 5 deblur_richardson_lucy_gray: skimage richardson_lucy on
    I/255 with a gaussian PSF (cv2.getGaussianKernel outer product),
    multiplicative updates from the 0.5 init, clip back to uint8."""
    k1 = get_gaussian_kernel(psf_size, psf_sigma)
    psf = jnp.asarray(np.outer(k1, k1), dtype=jnp.float32)
    psf_mirror = psf[::-1, ::-1]
    img = f32(gray) / 255.0

    def body(_, im_deconv):
        conv = _conv2_same(im_deconv, psf)
        relative_blur = img / jnp.maximum(conv, 1e-12)
        return im_deconv * _conv2_same(relative_blur, psf_mirror)

    im = lax.fori_loop(0, iterations, body, jnp.full_like(img, 0.5))
    return jnp.clip(im * 255.0, 0, 255).astype(jnp.uint8)


def sharpen_kernel_3x3(rgb: jnp.ndarray) -> jnp.ndarray:
    """ipynb cell 13 deblur_image: filter2D with [[0,-1,0],[-1,5,-1],[0,-1,0]]
    (BORDER_REFLECT_101, saturating)."""
    k = jnp.asarray([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], jnp.float32)
    x = f32(rgb)
    if x.ndim == 2:
        x = x[..., None]
        squeeze = True
    else:
        squeeze = False
    p = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    acc = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            c = k[dy, dx]
            acc = acc + c * p[dy:dy + x.shape[0], dx:dx + x.shape[1]]
    out = saturate_u8(acc)
    return out[..., 0] if squeeze else out
