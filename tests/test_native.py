"""Native C++ contour tracer: value-identical to the numpy fallback."""
import time

import numpy as np
import cv2
import pytest

from tpuimage.detect import contours as cnt
from tpuimage.native import load_native


@pytest.fixture(scope="module")
def lib():
    lib = load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _numpy_contours(binary):
    img = (np.asarray(binary) != 0).astype(np.int8)
    h, w = img.shape
    padded = np.zeros((h + 2, w + 2), dtype=np.int8)
    padded[1:-1, 1:-1] = img
    visited = np.zeros_like(padded, dtype=bool)
    out = []
    for y in range(1, h + 1):
        row = padded[y]
        xs = np.nonzero((row[1:-1] == 1) & (row[0:-2] == 0))[0] + 1
        for x in xs:
            if visited[y, x]:
                continue
            out.append(cnt._trace_border(padded, visited, y, x))
    return out


class TestNativeContours:
    def test_matches_numpy_random(self, lib, rng):
        binary = (rng.random((80, 100)) < 0.3).astype(np.uint8) * 255
        a = cnt._find_external_contours_native(binary)
        b = _numpy_contours(binary)
        assert a is not None and len(a) == len(b)
        for ca, cb in zip(a, b):
            np.testing.assert_array_equal(ca, cb)

    def test_matches_numpy_shapes(self, lib):
        binary = np.zeros((60, 60), np.uint8)
        cv2.rectangle(binary, (5, 5), (30, 40), 255, -1) if hasattr(cv2, "rectangle") \
            else None
        binary[5:41, 5:31] = 255
        binary[50, 50] = 255  # isolated pixel
        a = cnt._find_external_contours_native(binary)
        b = _numpy_contours(binary)
        assert len(a) == len(b)
        for ca, cb in zip(a, b):
            np.testing.assert_array_equal(ca, cb)

    def test_speed_on_edge_map(self, lib, rng):
        binary = (rng.random((1200, 849)) < 0.05).astype(np.uint8) * 255
        t0 = time.perf_counter()
        a = cnt.find_external_contours(binary)
        native_t = time.perf_counter() - t0
        # the numpy path takes >10s on this input; 5.0s leaves ~25x headroom
        # over the native tracer's typical ~0.2s so CI load can't flake it
        assert a and native_t < 5.0


def _numpy_draw_segments(shape, segments, thickness):
    """Independent vectorized form of the f64 point-to-segment predicate
    (full bounding-box evaluation, no per-row windowing) — the oracle for
    both the C++ capsule-scan rasterizer and draw_segments' own fallback."""
    h, w = shape
    out = np.zeros((h, w), dtype=np.uint8)
    r = thickness / 2.0
    for x1, y1, x2, y2 in np.asarray(segments, np.float64).reshape(-1, 4):
        lo_x = max(int(np.floor(min(x1, x2) - r - 1)), 0)
        hi_x = min(int(np.ceil(max(x1, x2) + r + 1)), w - 1)
        lo_y = max(int(np.floor(min(y1, y2) - r - 1)), 0)
        hi_y = min(int(np.ceil(max(y1, y2) + r + 1)), h - 1)
        if lo_x > hi_x or lo_y > hi_y:
            continue
        ys, xs = np.mgrid[lo_y:hi_y + 1, lo_x:hi_x + 1]
        dx, dy = x2 - x1, y2 - y1
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d2 = (xs - x1) ** 2 + (ys - y1) ** 2
        else:
            t = np.clip(((xs - x1) * dx + (ys - y1) * dy) / L2, 0.0, 1.0)
            d2 = (xs - (x1 + t * dx)) ** 2 + (ys - (y1 + t * dy)) ** 2
        box = out[lo_y:hi_y + 1, lo_x:hi_x + 1]
        box[d2 <= r * r] = 255
    return out


class TestNativeDrawSegments:
    def test_matches_numpy_random(self, lib, rng):
        from tpuimage.ops.draw import draw_segments
        segs = rng.random((40, 4)) * [[120, 90, 120, 90]]
        for thickness in (1, 2, 5):
            a = draw_segments((90, 120), segs, thickness=thickness)
            b = _numpy_draw_segments((90, 120), segs, thickness)
            np.testing.assert_array_equal(a, b)

    def test_degenerate_and_offcanvas(self, lib):
        from tpuimage.ops.draw import draw_segments
        segs = [(10.0, 10.0, 10.0, 10.0),      # zero-length
                (-50.0, -50.0, -10.0, -10.0),  # fully off-canvas
                (5.5, -20.0, 5.5, 200.0),      # vertical, clipped both ends
                (-20.0, 30.25, 200.0, 30.25)]  # horizontal, clipped
        a = draw_segments((64, 64), segs, thickness=3)
        b = _numpy_draw_segments((64, 64), segs, 3)
        np.testing.assert_array_equal(a, b)

    def test_empty_segments(self, lib):
        from tpuimage.ops.draw import draw_segments
        assert draw_segments((32, 32), []).sum() == 0


class TestContourAreas:
    def test_matches_scalar_loop(self, rng):
        binary = (rng.random((120, 160)) < 0.25).astype(np.uint8) * 255
        cs = cnt.find_external_contours(binary)
        assert len(cs) > 10
        vec = cnt.contour_areas(cs)
        ref = np.asarray([cnt.contour_area(c) for c in cs])
        np.testing.assert_array_equal(vec, ref)

    def test_empty(self):
        assert cnt.contour_areas([]).shape == (0,)
