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
