"""Differential tests: filters / morphology / median / histogram / threshold
vs cv2 on random uint8 arrays. Targets are exact (0 LSB) unless noted."""
import numpy as np
import cv2
import pytest

from tpuimage.ops import filters, morphology, median, histogram, threshold, arith


def rand_img(rng, h=96, w=80, c=0):
    shape = (h, w, c) if c else (h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def maxdiff(a, b):
    return int(np.max(np.abs(np.asarray(a).astype(np.int32) - np.asarray(b).astype(np.int32))))


class TestGaussian:
    @pytest.mark.parametrize("k,s", [(3, 0), (5, 0), (7, 0), (9, 0), (21, 0),
                                     (31, 0), (35, 0), (51, 0), (61, 0)])
    @pytest.mark.slow
    def test_ksize_exact(self, rng, k, s):
        img = rand_img(rng)
        ref = cv2.GaussianBlur(img, (k, k), s)
        assert maxdiff(ref, filters.gaussian_blur_u8(img, ksize=k, sigma=s)) == 0

    @pytest.mark.parametrize("s", [1.0, 3.0])
    def test_sigma_only_exact(self, rng, s):
        img = rand_img(rng)
        ref = cv2.GaussianBlur(img, (0, 0), s)
        assert maxdiff(ref, filters.gaussian_blur_u8(img, ksize=0, sigma=s)) == 0

    def test_color_exact(self, rng):
        img = rand_img(rng, c=3)
        ref = cv2.GaussianBlur(img, (5, 5), 0)
        assert maxdiff(ref, filters.gaussian_blur_u8(img, ksize=5)) == 0

    def test_kernel_matches_cv2(self):
        for k, s in [(3, 0), (7, 0), (21, 0), (61, 0), (19, 3.0)]:
            ref = cv2.getGaussianKernel(k, s if s > 0 else 0).ravel()
            np.testing.assert_allclose(filters.get_gaussian_kernel(k, s), ref, atol=1e-12)

    @pytest.mark.parametrize("shape,k", [((97, 123), 25), ((211, 173), 43),
                                         ((120, 255), 51)])
    @pytest.mark.slow
    def test_matmul_impl_exact(self, rng, shape, k):
        # the MXU banded-Toeplitz path (TPU production form for big blurs)
        # must be bit-identical to cv2 and to the shifted-MAC form
        img = rng.integers(0, 256, shape, np.uint8)
        ref = cv2.GaussianBlur(img, (k, k), 0)
        mm = filters.gaussian_blur_u8(img, ksize=k, impl="matmul")
        xla = filters.gaussian_blur_u8(img, ksize=k, impl="xla")
        assert maxdiff(ref, mm) == 0
        assert maxdiff(np.asarray(xla), mm) == 0


class TestMedian:
    @pytest.mark.parametrize("k", [3, 5, 7])
    def test_gray_exact(self, rng, k):
        img = rand_img(rng)
        assert maxdiff(cv2.medianBlur(img, k), median.median_blur(img, k)) == 0

    @pytest.mark.parametrize("k", [3, 5])
    def test_color_exact(self, rng, k):
        img = rand_img(rng, c=3)
        assert maxdiff(cv2.medianBlur(img, k), median.median_blur(img, k)) == 0


class TestMorphology:
    def test_structuring_elements_match(self):
        for shape_cv, shape_us in [(cv2.MORPH_RECT, "rect"),
                                   (cv2.MORPH_ELLIPSE, "ellipse"),
                                   (cv2.MORPH_CROSS, "cross")]:
            for k in [(3, 3), (5, 5), (9, 18), (2, 2), (7, 5)]:
                ref = cv2.getStructuringElement(shape_cv, k)
                ours = morphology.structuring_element(shape_us, k)
                np.testing.assert_array_equal(ref, ours, err_msg=f"{shape_us} {k}")

    @pytest.mark.parametrize("shape,k", [("rect", (3, 3)), ("rect", (2, 2)),
                                         ("ellipse", (5, 5)), ("rect", (9, 18))])
    def test_erode_dilate_exact(self, rng, shape, k):
        img = rand_img(rng)
        se_cv = cv2.getStructuringElement({"rect": cv2.MORPH_RECT, "ellipse": cv2.MORPH_ELLIPSE}[shape], k)
        se = morphology.structuring_element(shape, k)
        assert maxdiff(cv2.erode(img, se_cv), morphology.erode(img, se)) == 0
        assert maxdiff(cv2.dilate(img, se_cv), morphology.dilate(img, se)) == 0

    def test_morphology_ex_exact(self, rng):
        img = rand_img(rng)
        se_cv = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        se = morphology.structuring_element("ellipse", (5, 5))
        assert maxdiff(cv2.morphologyEx(img, cv2.MORPH_OPEN, se_cv), morphology.morph_open(img, se)) == 0
        assert maxdiff(cv2.morphologyEx(img, cv2.MORPH_CLOSE, se_cv), morphology.morph_close(img, se)) == 0
        assert maxdiff(cv2.morphologyEx(img, cv2.MORPH_BLACKHAT, se_cv), morphology.morph_blackhat(img, se)) == 0

    def test_iterations(self, rng):
        img = rand_img(rng)
        se_cv = cv2.getStructuringElement(cv2.MORPH_RECT, (2, 2))
        se = morphology.structuring_element("rect", (2, 2))
        assert maxdiff(cv2.dilate(img, se_cv, iterations=2), morphology.dilate(img, se, iterations=2)) == 0


class TestHistogram:
    def test_otsu_exact(self, rng):
        img = rand_img(rng)
        t_ref, bin_ref = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        t, binary = threshold.threshold_otsu(img)
        assert float(t) == t_ref
        assert maxdiff(bin_ref, binary) == 0

    def test_otsu_bimodal(self):
        img = np.concatenate([np.full((50, 50), 40, np.uint8),
                              np.full((50, 50), 200, np.uint8)], axis=1)
        t_ref, _ = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        assert float(histogram.otsu_threshold(img)) == t_ref

    def test_equalize_exact(self, rng):
        img = rand_img(rng)
        assert maxdiff(cv2.equalizeHist(img), histogram.equalize_hist(img)) == 0

    def test_equalize_sparse(self):
        img = (np.arange(100 * 100, dtype=np.int64) % 3 * 50 + 60).astype(np.uint8).reshape(100, 100)
        assert maxdiff(cv2.equalizeHist(img), histogram.equalize_hist(img)) == 0


class TestCLAHE:
    # Tolerance note: the bilinear LUT blend is f32; XLA FMA-contracts it
    # (uncontrollably — see core.dtypes.lerp2), which flips cvRound on rare
    # boundary pixels. OpenCV's own SSE/AVX2/AVX512 dispatches disagree at
    # the same pixels, so the parity contract is ±1 LSB on <0.5% of pixels.
    @pytest.mark.parametrize("clip,tiles", [(2.0, 8), (2.2, 8), (0.5, 8), (0.2, 4), (4.0, 8)])
    def test_bitclose(self, rng, clip, tiles):
        img = rand_img(rng, 120, 100)
        ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=(tiles, tiles)).apply(img)
        ours = np.asarray(histogram.clahe(img, clip_limit=clip, tiles_x=tiles, tiles_y=tiles))
        assert maxdiff(ref, ours) <= 1
        assert np.mean(ref != ours) < 0.005

    def test_bitclose_divisible(self, rng):
        img = rand_img(rng, 128, 128)
        ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
        ours = np.asarray(histogram.clahe(img, 2.0))
        assert maxdiff(ref, ours) <= 1
        assert np.mean(ref != ours) < 0.005


class TestAdaptive:
    @pytest.mark.parametrize("block,C,method", [(35, 10, "gaussian"), (31, 3, "gaussian"), (35, 10, "mean")])
    def test_exact(self, rng, block, C, method):
        img = rand_img(rng)
        algo = cv2.ADAPTIVE_THRESH_GAUSSIAN_C if method == "gaussian" else cv2.ADAPTIVE_THRESH_MEAN_C
        ref = cv2.adaptiveThreshold(img, 255, algo, cv2.THRESH_BINARY, block, C)
        ours = threshold.adaptive_threshold(img, 255, method, block, C)
        assert maxdiff(ref, ours) == 0


class TestLut:
    def test_lookup_matches_gather(self, rng):
        from tpuimage.ops.lut import lut_lookup, lut_lookup_u8
        import jax.numpy as jnp
        # non-multiple-of-chunk size, large table (cbrt-like), negatives in table
        table = jnp.asarray(rng.integers(-2 ** 20, 2 ** 20, size=3072), dtype=jnp.int32)
        idx = jnp.asarray(rng.integers(0, 3072, size=(97, 123)), dtype=jnp.int32)
        np.testing.assert_array_equal(np.asarray(lut_lookup(table, idx)),
                                      np.asarray(table)[np.asarray(idx)])
        t256 = jnp.asarray(rng.integers(0, 256, size=256), dtype=jnp.uint8)
        v = jnp.asarray(rng.integers(0, 256, size=(50, 60)), dtype=jnp.uint8)
        np.testing.assert_array_equal(np.asarray(lut_lookup_u8(t256, v)),
                                      np.asarray(t256)[np.asarray(v)])


class TestArith:
    def test_saturating(self, rng):
        a, b = rand_img(rng), rand_img(rng)
        assert maxdiff(cv2.subtract(a, b), arith.subtract_u8(a, b)) == 0
        assert maxdiff(cv2.add(a, b), arith.add_u8(a, b)) == 0
        assert maxdiff(cv2.max(a, b), arith.max_u8(a, b)) == 0
        assert maxdiff(cv2.absdiff(a, b), arith.absdiff_u8(a, b)) == 0

    def test_divide_scale(self, rng):
        a, b = rand_img(rng), rand_img(rng)
        assert maxdiff(cv2.divide(a, b, scale=255), arith.divide_u8(a, b, scale=255)) == 0

    def test_divide_full_domain(self):
        # the integer round-half-even path must equal cv2 on EVERY (a, b)
        # pair (incl. all exact .5 ties and b == 0)
        a = np.repeat(np.arange(256, dtype=np.uint8), 256).reshape(256, 256)
        b = np.tile(np.arange(256, dtype=np.uint8), 256).reshape(256, 256)
        for scale in (1, 2, 255):
            assert maxdiff(cv2.divide(a, b, scale=scale),
                           arith.divide_u8(a, b, scale=scale)) == 0

    def test_add_weighted(self, rng):
        a, b = rand_img(rng), rand_img(rng)
        ref = cv2.addWeighted(a, 1.8, b, -0.8, 0)
        assert maxdiff(ref, arith.add_weighted(a, 1.8, b, -0.8, 0)) == 0

    def test_normalize_minmax(self, rng):
        a = (rand_img(rng) // 2 + 40).astype(np.uint8)
        ref = cv2.normalize(a, None, 0, 255, cv2.NORM_MINMAX)
        assert maxdiff(ref, arith.normalize_minmax(a)) == 0

    def test_normalize_constant(self):
        a = np.full((10, 10), 77, np.uint8)
        ref = cv2.normalize(a, None, 0, 255, cv2.NORM_MINMAX)
        assert maxdiff(ref, arith.normalize_minmax(a)) == 0

    def test_in_range(self, rng):
        img = rand_img(rng, c=3)
        lo = np.array([0, 133, 77], np.uint8)
        hi = np.array([255, 173, 127], np.uint8)
        ref = cv2.inRange(img, lo, hi)
        assert maxdiff(ref, arith.in_range(img, (0, 133, 77), (255, 173, 127))) == 0

    def test_box_filter(self, rng):
        img = rand_img(rng)
        ref = cv2.boxFilter(img, -1, (31, 31), borderType=cv2.BORDER_REPLICATE)
        assert maxdiff(ref, filters.box_filter_u8(img, 31)) == 0

    def test_unsharp(self, rng):
        img = rand_img(rng, c=3)
        blurred = cv2.GaussianBlur(img, (0, 0), 1.0)
        ref = cv2.addWeighted(img, 1.8, blurred, -0.8, 0)
        assert maxdiff(ref, filters.unsharp_mask_u8(img, 0.8, sigma=1.0)) == 0
