"""Non-Local Means denoising (fastNlMeansDenoising / ...Colored).

Replaces cv2.fastNlMeansDenoisingColored at FaceEnhancement.py:51 (h=10/30),
Landscape.py:118 (h=10, hColor=10) and cv2.fastNlMeansDenoising in ipynb
cell 13; template window 7, search window 21 everywhere in the reference.

Algorithm (same structure as OpenCV's FastNlMeansDenoisingInvoker):
for every search offset t in the 21x21 window, the per-pixel patch SSD
``D_t = box_{7x7}((I - shift_t(I))^2)`` is a separable sliding sum; the
weight is ``exp(-max(D_t - 2*sigma^2*N, 0) / (h^2 * N))`` with N = patch
area * channels (OpenCV's LUT evaluates the same expression in fixed
point); output = sum_t w_t * shift_t(I) / sum_t w_t. The colored variant
follows OpenCV: convert to Lab (LBGR2Lab ~ linear path approximated by the
8-bit Lab op), denoise L with h and (a,b) jointly with h_color, convert
back.

TPU-native design: 441 static shifted views, each with two separable
7-tap window sums — pure VPU work, fully fused by XLA, vmappable over
batch. No per-pixel gather/scatter.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from tpuimage.core.borders import pad2d, BORDER_REFLECT_101
from tpuimage.core.dtypes import saturate_u8, f32
from tpuimage.ops import color as colorops


def _box_sum_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable k x k window sum with reflect-101 padding (same-size)."""
    r = k // 2
    p = pad2d(x, r, r, r, r, mode=BORDER_REFLECT_101)
    ones = (k, 1) + (1,) * (x.ndim - 2)
    s = lax.reduce_window(p, 0.0, lax.add, ones, (1,) * x.ndim, "VALID")
    ones = (1, k) + (1,) * (x.ndim - 2)
    return lax.reduce_window(s, 0.0, lax.add, ones, (1,) * x.ndim, "VALID")


def nlm_denoise(img: jnp.ndarray, h: float, template_size: int = 7,
                search_size: int = 21, sigma: float = 0.0) -> jnp.ndarray:
    """NLM on uint8 HW or HWC; h is the filter strength."""
    tr = template_size // 2
    sr = search_size // 2
    x = f32(img)
    hh, ww = img.shape[0], img.shape[1]
    cn = img.shape[2] if img.ndim == 3 else 1
    N = float(template_size * template_size * cn)
    inv = 1.0 / (h * h * N)
    bias = 2.0 * sigma * sigma * N

    p = pad2d(x, sr, sr, sr, sr, mode=BORDER_REFLECT_101)

    # scan over the 441 search offsets instead of unrolling (compile-time
    # control; the body is the same separable SSD + weighted accumulate).
    offs = np.asarray([(sr + dy, sr + dx)
                       for dy in range(-sr, sr + 1)
                       for dx in range(-sr, sr + 1)], dtype=np.int32)
    slice_sizes = (hh, ww) + x.shape[2:]

    def body(carry, off):
        num, den = carry
        starts = (off[0], off[1]) + (0,) * (x.ndim - 2)
        view = lax.dynamic_slice(p, starts, slice_sizes)
        d2 = (x - view) ** 2
        ssd = _box_sum_same(d2, template_size)
        if img.ndim == 3:
            ssd = ssd.sum(axis=-1)
        wgt = jnp.exp(-jnp.maximum(ssd - bias, 0.0) * inv)
        num = num + view * (wgt[..., None] if img.ndim == 3 else wgt)
        return (num, den + wgt), None

    num0 = jnp.zeros(x.shape, dtype=jnp.float32)
    den0 = jnp.zeros((hh, ww), dtype=jnp.float32)
    (num, den), _ = lax.scan(body, (num0, den0), jnp.asarray(offs))
    out = num / (den[..., None] if img.ndim == 3 else den)
    return saturate_u8(out)


def nlm_denoise_colored(img_rgb: jnp.ndarray, h: float, h_color: float = None,
                        template_size: int = 7, search_size: int = 21) -> jnp.ndarray:
    """cv2.fastNlMeansDenoisingColored: Lab split, L with h, ab with h_color."""
    if h_color is None:
        h_color = h
    lab = colorops.rgb_to_lab(img_rgb)
    L = nlm_denoise(lab[..., 0], h, template_size, search_size)
    ab = nlm_denoise(lab[..., 1:], h_color, template_size, search_size)
    out_lab = jnp.concatenate([L[..., None], ab], axis=-1)
    return colorops.lab_to_rgb(out_lab)
