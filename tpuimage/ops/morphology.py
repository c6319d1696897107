"""Morphology ops: erode/dilate/open/close/blackhat + structuring elements.

Replaces cv2.erode/dilate/morphologyEx/getStructuringElement at
DocScanner.py:199-212,251-254, FaceEnhancement.py:115-117, morph_seq pyc
(grayscale_erosion / binary_closing), ipynb cell 15.

TPU-native design: flat structuring elements make erosion/dilation a
min/max window reduction. For full-rectangle SEs this is two separable
1-D ``lax.reduce_window`` passes (O(k) instead of O(k^2), XLA lowers these
to efficient vector code); masked SEs (ellipse) reduce over the masked
shifted views. Borders replicate OpenCV's +inf/-inf constant semantics
(erode pads 255, dilate pads 0 for uint8).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from tpuimage.core.dtypes import saturate_u8

MORPH_RECT = "rect"
MORPH_ELLIPSE = "ellipse"
MORPH_CROSS = "cross"


def structuring_element(shape: str, ksize) -> np.ndarray:
    """cv2.getStructuringElement with OpenCV's exact ellipse rasterization."""
    kw, kh = (ksize, ksize) if isinstance(ksize, int) else (ksize[0], ksize[1])
    anchor_x, anchor_y = kw // 2, kh // 2
    el = np.zeros((kh, kw), dtype=np.uint8)
    if shape == MORPH_RECT:
        el[:] = 1
        return el
    if shape == MORPH_CROSS:
        el[anchor_y, :] = 1
        el[:, anchor_x] = 1
        return el
    # ellipse: per-row horizontal span from the inscribed ellipse equation
    r, c = anchor_y, anchor_x
    inv_r2 = 1.0 / (r * r) if r else 0.0
    for i in range(kh):
        dy = i - r
        if abs(dy) <= r:
            dx = int(np.rint(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2))) if r else c
            j1, j2 = max(c - dx, 0), min(c + dx + 1, kw)
            el[i, j1:j2] = 1
    return el


def _window_extreme(img: jnp.ndarray, se: np.ndarray, is_erode: bool) -> jnp.ndarray:
    """One erosion/dilation step. ``se`` is a static numpy 0/1 mask."""
    kh, kw = se.shape
    ay, ax = kh // 2, kw // 2
    pad_val = 255 if is_erode else 0
    pads = [(ay, kh - 1 - ay), (ax, kw - 1 - ax)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pads, mode="constant", constant_values=pad_val)

    if se.all():
        # separable log-step sliding min/max (van Herk doubling): window n
        # along an axis = O(log n) shifted reduces. A single 2-D u8
        # lax.reduce_window for the 9x19 blackhat SE measured 10.6 ms at
        # batch 8 on the chip; this form runs in ~1 ms.
        fn = jnp.minimum if is_erode else jnp.maximum
        out = p
        for axis, n in ((0, kh), (1, kw)):
            if n == 1:
                continue
            g = out
            m = 1
            while m * 2 <= n:
                valid = g.shape[axis] - m
                g = fn(lax.slice_in_dim(g, 0, valid, axis=axis),
                       lax.slice_in_dim(g, m, m + valid, axis=axis))
                m *= 2
            if m < n:
                valid = g.shape[axis] - (n - m)
                g = fn(lax.slice_in_dim(g, 0, valid, axis=axis),
                       lax.slice_in_dim(g, n - m, n - m + valid, axis=axis))
            out = g
        return out

    h, w = img.shape[0], img.shape[1]
    acc = None
    reduce = jnp.minimum if is_erode else jnp.maximum
    for dy in range(kh):
        for dx in range(kw):
            if not se[dy, dx]:
                continue
            view = lax.slice_in_dim(lax.slice_in_dim(p, dy, dy + h, axis=0), dx, dx + w, axis=1)
            acc = view if acc is None else reduce(acc, view)
    return acc


def erode(img: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    for _ in range(iterations):
        img = _window_extreme(img, se, is_erode=True)
    return img


def dilate(img: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    for _ in range(iterations):
        img = _window_extreme(img, se, is_erode=False)
    return img


def morph_open(img: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    return dilate(erode(img, se, iterations), se, iterations)


def morph_close(img: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    return erode(dilate(img, se, iterations), se, iterations)


def morph_blackhat(img: jnp.ndarray, se: np.ndarray, iterations: int = 1,
                   impl: str = "auto") -> jnp.ndarray:
    """cv2.MORPH_BLACKHAT = close(src) - src, saturating (DocScanner.py:200).

    impl: "pallas" forces the fused Pallas sliding-extreme kernel (2-D
    odd-rect SEs at iterations=1: close + subtract in ONE VMEM pass instead
    of ~2*(log kh + log kw) shifted full-image passes); "xla" forces the
    log-step form. "auto" currently = "xla" on every backend: the kernel is
    interpret-verified bit-identical (tests/test_fused_chain.py) but still
    awaits hardware parity + timing (benchmarks/hw_check_kernels.py
    blackhat, r3_battery.py prechain — TPU worker outage at build time);
    flip auto to the winner once measured (CLAUDE.md runbook).
    """
    if impl == "pallas":
        if iterations != 1:
            raise ValueError("impl='pallas' supports only iterations=1")
        import jax
        from tpuimage.ops.pallas_kernels import (blackhat_pallas_applicable,
                                                 blackhat_rect_pallas)
        if not blackhat_pallas_applicable(img, se):
            raise ValueError("impl='pallas' requires a 2-D image and a full "
                             "odd-dimension rect SE within the VMEM budget")
        kh, kw = np.asarray(se).shape
        return blackhat_rect_pallas(
            img, kw, kh, interpret=jax.default_backend() in ("cpu",))
    closed = morph_close(img, se, iterations)
    return saturate_u8(closed.astype(jnp.int32) - img.astype(jnp.int32))


def morph_tophat(img: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    opened = morph_open(img, se, iterations)
    return saturate_u8(img.astype(jnp.int32) - opened.astype(jnp.int32))


def morph_gradient(img: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    return saturate_u8(dilate(img, se, iterations).astype(jnp.int32)
                       - erode(img, se, iterations).astype(jnp.int32))
