"""Pallas kernel validation (interpret mode — exercises the kernel logic
on the CPU mesh; hardware enablement is gated in pallas_kernels)."""
import numpy as np
import cv2
import pytest

import jax.numpy as jnp

from tpuimage.ops.pallas_kernels import bilateral_gray_pallas


class TestPallasBilateral:
    @pytest.mark.parametrize("d,sc,ss", [(9, 75, 75), (5, 20, 20), (-1, 30, 10)])
    def test_matches_cv2(self, rng, d, sc, ss):
        img = cv2.GaussianBlur(
            rng.integers(0, 256, (97, 123), np.uint8), (5, 5), 0)
        ref = cv2.bilateralFilter(img, d, sc, ss)
        out = np.asarray(bilateral_gray_pallas(jnp.asarray(img), d,
                                               float(sc), float(ss),
                                               interpret=True))
        assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1

    def test_matches_scan_version(self, rng):
        from tpuimage.ops.bilateral import bilateral_filter
        img = rng.integers(0, 256, (64, 80), np.uint8)
        a = np.asarray(bilateral_gray_pallas(jnp.asarray(img), 9, 75.0, 75.0,
                                             interpret=True))
        b = np.asarray(bilateral_filter(jnp.asarray(img), 9, 75, 75))
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


class TestPallasGaussian:
    @pytest.mark.parametrize("shape,ksize", [
        ((97, 123), 9),     # odd sizes, small kernel
        ((120, 255), 51),   # the docscan ink-mask blur
        ((211, 173), 43),   # the docscan illumination blur (5% of min side)
    ])
    def test_bit_exact_vs_cv2_and_xla(self, rng, shape, ksize):
        from tpuimage.ops.filters import gaussian_blur_u8
        from tpuimage.ops.pallas_kernels import gaussian_blur_u8_pallas
        img = rng.integers(0, 256, shape, np.uint8)
        ref = cv2.GaussianBlur(img, (ksize, ksize), 0)
        a = np.asarray(gaussian_blur_u8_pallas(jnp.asarray(img), ksize,
                                               interpret=True))
        b = np.asarray(gaussian_blur_u8(jnp.asarray(img), ksize=ksize,
                                        impl="xla"))
        np.testing.assert_array_equal(a, ref)
        np.testing.assert_array_equal(a, b)
