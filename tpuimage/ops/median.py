"""Exact median filtering via sorting networks.

Replaces cv2.medianBlur at FaceEnhancement.py:36,71 (3),
NightLandscapeEnhancement.py:38 (3), asm.py:63 (3), Landscape.py:109 (5/7),
AI_classification.py:630 (3).

TPU-native design: a k*k median is a fixed compare-exchange network over
k*k shifted views of the image — pure elementwise min/max, vectorized over
all pixels at once on the VPU, no sorting of per-pixel windows. OpenCV's
medianBlur uses BORDER_REPLICATE; multi-channel images filter channels
independently. For the 3x3/5x5 sizes the reference uses, a selection
network (only the lanes feeding the median) would be cheaper, but XLA DCE
already drops unused lanes of the full bitonic/odd-even sort.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpuimage.core.borders import pad2d, BORDER_REPLICATE


def _median_of_views(views):
    """Exact median of an odd number of equal-shaped arrays via odd-even
    transposition sort (O(n^2) compare-exchanges, fine for n<=49)."""
    v = list(views)
    n = len(v)
    for rnd in range(n):
        start = rnd % 2
        for i in range(start, n - 1, 2):
            lo = jnp.minimum(v[i], v[i + 1])
            hi = jnp.maximum(v[i], v[i + 1])
            v[i], v[i + 1] = lo, hi
    return v[n // 2]


def median_blur(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """cv2.medianBlur (exact) for odd ksize; uint8 HW or HWC."""
    if ksize <= 1:
        return img
    assert ksize % 2 == 1, "medianBlur requires odd ksize"
    r = ksize // 2
    p = pad2d(img, r, r, r, r, mode=BORDER_REPLICATE)
    h, w = img.shape[0], img.shape[1]
    views = []
    for dy in range(ksize):
        for dx in range(ksize):
            view = lax.slice_in_dim(lax.slice_in_dim(p, dy, dy + h, axis=0),
                                    dx, dx + w, axis=1)
            views.append(view)
    return _median_of_views(views)
