"""Rasterization helpers (host-side numpy).

Replaces cv2.line (DocScanner.py:86 — drawing Hough segments into the edge
map) and cv2.polylines (DocScanner.py:303,307 — quad overlay for the
scan_02 golden). These run on host because their consumers are host-side
(contour following) or I/O (overlay PNG); they are O(segment pixels), not
hot-path work.

A segment of thickness t is rasterized as all pixels whose center lies
within t/2 of the segment — matched to cv2.line's round-join look for the
thickness-2 case the reference uses.
"""
from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import numpy as np


def draw_segments(shape: Tuple[int, int], segments: Iterable[Sequence[float]],
                  thickness: int = 2) -> np.ndarray:
    """Binary uint8 (0/255) mask with each (x1, y1, x2, y2) segment drawn.

    Uses the C++ capsule-scan rasterizer (tpuimage.native) when available
    — same f64 point-to-segment predicate, value-identical, ~50x the
    per-segment bounding-box numpy loop below (localize_batch's host half
    spent 94 ms/image here on 128-segment pages)."""
    h, w = shape
    out = np.zeros((h, w), dtype=np.uint8)
    r = thickness / 2.0
    seg_arr = np.ascontiguousarray(
        np.asarray(list(segments), dtype=np.float64).reshape(-1, 4))
    if len(seg_arr):
        try:
            from tpuimage.native import load_native
            lib = load_native()
        except Exception:
            lib = None
        if lib is not None:
            import ctypes
            lib.tpuimage_draw_segments(
                seg_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(seg_arr),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                h, w, float(r))
            return out
    for seg in seg_arr:
        x1, y1, x2, y2 = [float(v) for v in seg]
        lo_x = max(int(np.floor(min(x1, x2) - r - 1)), 0)
        hi_x = min(int(np.ceil(max(x1, x2) + r + 1)), w - 1)
        lo_y = max(int(np.floor(min(y1, y2) - r - 1)), 0)
        hi_y = min(int(np.ceil(max(y1, y2) + r + 1)), h - 1)
        if hi_x < lo_x or hi_y < lo_y:
            continue
        ys, xs = np.mgrid[lo_y:hi_y + 1, lo_x:hi_x + 1]
        dx, dy = x2 - x1, y2 - y1
        L2 = dx * dx + dy * dy
        if L2 == 0:
            d2 = (xs - x1) ** 2 + (ys - y1) ** 2
        else:
            t = np.clip(((xs - x1) * dx + (ys - y1) * dy) / L2, 0.0, 1.0)
            d2 = (xs - (x1 + t * dx)) ** 2 + (ys - (y1 + t * dy)) ** 2
        out[lo_y:hi_y + 1, lo_x:hi_x + 1] |= (d2 <= r * r).astype(np.uint8) * 255
    return out


def draw_polyline_overlay(img_rgb: np.ndarray, pts: np.ndarray,
                          color: Tuple[int, int, int] = (0, 255, 0),
                          thickness: int = 2, closed: bool = True) -> np.ndarray:
    """Copy of img with the polygon outline drawn (cv2.polylines analog,
    DocScanner.py:300-307 scan_02 overlay)."""
    out = np.asarray(img_rgb).copy()
    p = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    n = len(p)
    segs = []
    for i in range(n - 1 + (1 if closed else 0)):
        a, b = p[i], p[(i + 1) % n]
        segs.append((a[0], a[1], b[0], b[1]))
    mask = draw_segments(out.shape[:2], segs, thickness=thickness) != 0
    out[mask] = np.asarray(color, dtype=out.dtype)
    return out
