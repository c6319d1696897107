"""Differential tests: tpuimage.ops.color vs cv2 on random uint8 arrays.

Exactness targets (SURVEY.md §7 hard part 1): GRAY/YCrCb/HSV-forward are
integer-exact; HSV-inverse and Lab are within ±1 LSB (OpenCV uses SIMD
variants / interpolated LUTs whose rounding differs per platform).
"""
import numpy as np
import cv2
import pytest

from tpuimage.ops import color


def rand_img(rng, h=64, w=64, c=3):
    return rng.integers(0, 256, size=(h, w, c) if c else (h, w), dtype=np.uint8)


def maxdiff(a, b):
    return int(np.max(np.abs(a.astype(np.int32) - np.asarray(b).astype(np.int32))))


def ramp_img():
    """All 256 values in each channel plus structured combos."""
    v = np.arange(256, dtype=np.uint8)
    r, g, b = np.meshgrid(v[::8], v[::8], v[::8], indexing="ij")
    return np.stack([r, g, b], axis=-1).reshape(32, -1, 3)


class TestGray:
    def test_rgb_to_gray_exact(self, rng):
        img = rand_img(rng)
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY), color.rgb_to_gray(img)) == 0

    def test_bgr_to_gray_exact(self, rng):
        img = rand_img(rng)
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY), color.bgr_to_gray(img)) == 0

    def test_gray_ramp_exact(self):
        img = ramp_img()
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY), color.rgb_to_gray(img)) == 0


class TestYCrCb:
    def test_forward_exact(self, rng):
        img = rand_img(rng)
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_RGB2YCrCb), color.rgb_to_ycrcb(img)) == 0
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_BGR2YCrCb), color.bgr_to_ycrcb(img)) == 0

    def test_forward_ramp_exact(self):
        img = ramp_img()
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_RGB2YCrCb), color.rgb_to_ycrcb(img)) == 0

    def test_inverse_exact(self, rng):
        img = rand_img(rng)
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_YCrCb2RGB), color.ycrcb_to_rgb(img)) == 0


class TestHSV:
    def test_forward_exact(self, rng):
        img = rand_img(rng)
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_RGB2HSV), color.rgb_to_hsv(img)) == 0
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_BGR2HSV), color.bgr_to_hsv(img)) == 0

    def test_forward_ramp_exact(self):
        img = ramp_img()
        assert maxdiff(cv2.cvtColor(img, cv2.COLOR_RGB2HSV), color.rgb_to_hsv(img)) == 0

    def test_inverse_close(self, rng):
        # this cv2 build truncates the f32 result on the 8u path; matching
        # that, the full 180x256x256 grid disagrees at only 5e-5 of entries
        # (op-order/FMA boundary cases), max 1 LSB. cvRound-style rounding
        # would disagree at 33%.
        img = rand_img(rng)
        img[..., 0] = img[..., 0] % 181  # valid hue range
        ref = cv2.cvtColor(img, cv2.COLOR_HSV2RGB)
        got = np.asarray(color.hsv_to_rgb(img))
        d = np.abs(got.astype(int) - ref.astype(int))
        assert d.max() <= 1
        assert (d > 0).mean() < 5e-4


class TestLab:
    def test_forward_close(self, rng):
        img = rand_img(rng)
        d = maxdiff(cv2.cvtColor(img, cv2.COLOR_RGB2Lab), color.rgb_to_lab(img))
        assert d <= 1, d

    def test_forward_ramp_close(self):
        img = ramp_img()
        d = maxdiff(cv2.cvtColor(img, cv2.COLOR_RGB2Lab), color.rgb_to_lab(img))
        assert d <= 1, d

    def test_inverse_close(self, rng):
        # Round-trip through valid Lab values only
        src = rand_img(rng)
        lab = cv2.cvtColor(src, cv2.COLOR_RGB2Lab)
        d = maxdiff(cv2.cvtColor(lab, cv2.COLOR_Lab2RGB), color.lab_to_rgb(lab))
        assert d <= 2, d

    def test_inverse_lut_impl(self, rng):
        # the deterministic integer path (used by night_rgb_spatial for
        # sharded==unsharded bit-exactness): same cv2 contract as the f32
        # path, and within 1 LSB of it on a vanishing fraction of pixels
        src = rand_img(rng)
        lab = cv2.cvtColor(src, cv2.COLOR_RGB2Lab)
        lut = color.lab_to_rgb(lab, impl="lut")
        d = maxdiff(cv2.cvtColor(lab, cv2.COLOR_Lab2RGB), lut)
        assert d <= 2, d
        full = rng.integers(0, 256, size=(512, 512, 3), dtype=np.uint8)
        dx = np.abs(np.asarray(color.lab_to_rgb(full, impl="lut")).astype(int)
                    - np.asarray(color.lab_to_rgb(full)).astype(int))
        assert dx.max() <= 1 and (dx > 0).mean() < 1e-4


class TestSplitMerge:
    def test_roundtrip(self, rng):
        img = rand_img(rng)
        assert maxdiff(img, color.merge(color.split(img))) == 0
