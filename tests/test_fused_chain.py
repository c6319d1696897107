"""Fused post-warp chain: the Pallas blackhat / ink-mask-epilogue kernels
and the histogram-remap Otsu restructure must reproduce the plain-ops
stage outputs bit-exactly (VERDICT round-2 directive 2: fuse the
illumination/ink-mask elementwise chain without moving a single pixel).

Kernels run in interpret mode on the CPU test mesh; hardware bit-parity is
checked by benchmarks/hw_check_kernels.py (CLAUDE.md workflow).
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from tpuimage.ops.morphology import morph_blackhat, structuring_element, dilate
from tpuimage.ops.threshold import threshold_binary
from tpuimage.ops.arith import max_u8, normalize_minmax, normalize_minmax_lut
from tpuimage.ops.histogram import hist256, otsu_from_hist
from tpuimage.ops.pallas_kernels import (blackhat_rect_pallas,
                                         inkmask_weighted_pallas)
from tpuimage.pipelines import docscan

DOC1 = "/root/reference/public/DIP test/document1.jpeg"


class TestRawOtsuThreshold:
    def test_matches_normalize_then_otsu(self, rng):
        """Pullback threshold on the raw plane == threshold on the
        normalized plane, across narrow/wide ranges and a constant plane."""
        for trial in range(12):
            lo = int(rng.integers(0, 250))
            hi = int(rng.integers(lo, 256))
            x = rng.integers(lo, hi + 1, size=(64, 97)).astype(np.uint8)
            if trial == 0:
                x[:] = 7
            xj = jnp.asarray(x)
            n = normalize_minmax(xj)
            t_old = jnp.maximum(jnp.round(otsu_from_hist(hist256(n))) - 8, 0)
            m_old = threshold_binary(n, t_old)
            t_raw = docscan._raw_otsu_threshold(hist256(xj), 8)
            m_new = threshold_binary(xj, t_raw)
            np.testing.assert_array_equal(np.asarray(m_old), np.asarray(m_new))

    def test_lut_monotone(self):
        """The pullback argument requires a monotone normalize LUT."""
        for smin, smax in [(0, 255), (13, 200), (7, 7), (100, 101)]:
            lut = np.asarray(normalize_minmax_lut(jnp.float32(smin),
                                                  jnp.float32(smax)))
            assert (np.diff(lut.astype(np.int32)) >= 0).all()


class TestBlackhatKernel:
    def test_matches_ops_path(self, rng):
        for (h, w), kw, kh in [((40, 60), 9, 19), ((33, 129), 3, 3),
                               ((17, 23), 7, 5), ((300, 453), 9, 19),
                               ((128, 128), 1, 19), ((70, 90), 19, 1)]:
            x = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
            se = structuring_element("rect", (kw, kh))
            ref = morph_blackhat(jnp.asarray(x), se, impl="xla")
            got = blackhat_rect_pallas(jnp.asarray(x), kw, kh, interpret=True)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_forced_pallas_dispatch(self, rng):
        x = rng.integers(0, 256, size=(120, 173)).astype(np.uint8)
        se = structuring_element("rect", (9, 19))
        np.testing.assert_array_equal(
            np.asarray(morph_blackhat(jnp.asarray(x), se, impl="pallas")),
            np.asarray(morph_blackhat(jnp.asarray(x), se, impl="xla")))

    def test_forced_pallas_rejects_unsupported(self, rng):
        x = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
        with pytest.raises(ValueError):
            morph_blackhat(jnp.asarray(x), structuring_element("ellipse", 5),
                           impl="pallas")
        with pytest.raises(ValueError):
            morph_blackhat(jnp.asarray(x), structuring_element("rect", 3),
                           iterations=2, impl="pallas")


class TestInkmaskKernel:
    def test_matches_ops_sequence(self, rng):
        for (h, w), iters, tsub, tbh in [((40, 60), 1, 17.0, 200.0),
                                         ((300, 453), 1, -1.0, 255.0),
                                         ((129, 257), 0, 100.0, 50.0),
                                         ((64, 64), 3, 10.0, 10.0),
                                         ((97, 111), 8, 128.0, 3.0)]:
            sub = rng.integers(0, 256, (h, w)).astype(np.uint8)
            bh = rng.integers(0, 256, (h, w)).astype(np.uint8)
            adapt = (rng.integers(0, 2, (h, w)) * 255).astype(np.uint8)
            mask = max_u8(threshold_binary(jnp.asarray(sub), tsub),
                          threshold_binary(jnp.asarray(bh), tbh))
            if iters > 0:
                mask = dilate(mask, structuring_element("rect", (2, 2)),
                              iterations=iters)
            wgt = jnp.where(mask == 0, jnp.uint8(255), jnp.asarray(adapt))
            m2, w2 = inkmask_weighted_pallas(
                jnp.asarray(sub), jnp.asarray(bh), jnp.asarray(adapt),
                jnp.float32(tsub), jnp.float32(tbh), iters=iters,
                interpret=True)
            np.testing.assert_array_equal(np.asarray(mask), np.asarray(m2))
            np.testing.assert_array_equal(np.asarray(wgt), np.asarray(w2))


class TestGaussChainKernel:
    def test_integer_modes_match_ops(self, rng):
        from tpuimage.ops.filters import gaussian_blur_u8
        from tpuimage.ops.arith import subtract_u8, divide_u8
        from tpuimage.ops.pallas_kernels import gauss_chain_pallas
        for (h, w), k in [((40, 60), 15), ((300, 453), 51), ((129, 257), 43)]:
            x = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
            blur = gaussian_blur_u8(x, ksize=k)
            np.testing.assert_array_equal(
                np.asarray(subtract_u8(blur, x)),
                np.asarray(gauss_chain_pallas(x, k, "sub", interpret=True)),
                err_msg=f"sub {h}x{w} k{k}")
            np.testing.assert_array_equal(
                np.asarray(subtract_u8(x, blur)),
                np.asarray(gauss_chain_pallas(x, k, "subtract",
                                              interpret=True)),
                err_msg=f"subtract {h}x{w} k{k}")
            np.testing.assert_array_equal(
                np.asarray(divide_u8(x, blur, scale=255)),
                np.asarray(gauss_chain_pallas(x, k, "divide",
                                              interpret=True)),
                err_msg=f"divide {h}x{w} k{k}")

    def test_divide_exact_on_full_domain(self):
        """The in-kernel f32-candidate integer divide must equal
        divide_u8's exact round-half-even on every (num, den) pair —
        exercised via a 256x256 ramp where blur==center shifts make the
        denominator sweep; here we test the helper directly instead."""
        import jax
        from tpuimage.ops.pallas_kernels import _div255_round_half_even
        from tpuimage.ops.arith import divide_u8
        a, b = np.meshgrid(np.arange(256), np.arange(256))
        ref = np.asarray(divide_u8(jnp.asarray(a.astype(np.uint8)),
                                   jnp.asarray(b.astype(np.uint8)),
                                   scale=255))
        got = np.asarray(jax.jit(_div255_round_half_even)(
            jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
        np.testing.assert_array_equal(ref, got.astype(np.uint8))

    def test_adaptive_matches_ops(self, rng):
        from tpuimage.ops.threshold import adaptive_threshold
        from tpuimage.ops.pallas_kernels import gauss_chain_pallas
        for (h, w), bs, C in [((40, 60), 31, 3.0), ((300, 453), 31, 3.0),
                              ((129, 257), 35, 10.0), ((64, 64), 7, 2.5)]:
            x = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
            ref = adaptive_threshold(x, 255, "gaussian", bs, C)
            got = gauss_chain_pallas(x, bs, "adaptive", C=C, interpret=True)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got),
                                          err_msg=f"adaptive {h}x{w} bs{bs}")


class TestFusedPreDeskew:
    @pytest.fixture(scope="class")
    def warped(self):
        rgb = docscan.load_image_rgb(DOC1)
        quad = docscan.localize_document(rgb, docscan.GUI_DOCUMENT_CONFIG)
        assert quad is not None
        return np.asarray(docscan.perspective_warp(
            rgb, quad, page="A4", scale_long=1200))

    def test_real_page_bit_exact(self, warped):
        """Forced-pallas epilogue == plain ops on the golden-config page,
        every returned stage."""
        cfg = docscan.GUI_DOCUMENT_CONFIG
        a = docscan._pre_deskew_stages(jnp.asarray(warped), cfg, impl="xla")
        b = docscan._pre_deskew_stages(jnp.asarray(warped), cfg,
                                       impl="pallas")
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"stage {k}")

    def test_vmap_matches_single(self, rng):
        """docscan_post_warp_batch vmaps _pre_deskew_stages; the fused
        kernels must batch identically (vmap-of-pallas_call convention)."""
        import jax
        cfg = docscan.DocScanConfig()
        pages = rng.integers(0, 256, size=(2, 160, 224, 3)).astype(np.uint8)
        batched = jax.vmap(
            lambda im: docscan._pre_deskew_stages(im, cfg, impl="pallas")
        )(jnp.asarray(pages))
        for i in range(2):
            single = docscan._pre_deskew_stages(jnp.asarray(pages[i]), cfg,
                                                impl="pallas")
            for k in single:
                np.testing.assert_array_equal(
                    np.asarray(batched[k][i]), np.asarray(single[k]),
                    err_msg=f"stage {k} image {i}")

    def test_default_config_random_page(self, rng):
        """Default (subtract-illum) config on a random page: the fused
        epilogue must agree even when content is noise."""
        page = rng.integers(0, 256, size=(320, 240, 3)).astype(np.uint8)
        cfg = docscan.DocScanConfig()
        a = docscan._pre_deskew_stages(jnp.asarray(page), cfg, impl="xla")
        b = docscan._pre_deskew_stages(jnp.asarray(page), cfg, impl="pallas")
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"stage {k}")
