"""Differential tests: geometry ops vs cv2."""
import numpy as np
import cv2
import pytest

from tpuimage.ops import geometry as geo


def maxdiff(a, b):
    return int(np.max(np.abs(np.asarray(a).astype(np.int32) - np.asarray(b).astype(np.int32))))


@pytest.fixture()
def img(rng):
    return rng.integers(0, 256, size=(97, 123, 3), dtype=np.uint8)


@pytest.fixture()
def gray(rng):
    return rng.integers(0, 256, size=(97, 123), dtype=np.uint8)


class TestResize:
    @pytest.mark.parametrize("shape", [(50, 70), (200, 150), (97, 123)])
    def test_linear(self, img, shape):
        ref = cv2.resize(img, (shape[1], shape[0]), interpolation=cv2.INTER_LINEAR)
        mine = geo.resize(img, shape[0], shape[1], "linear")
        assert maxdiff(ref, mine) <= 1

    @pytest.mark.parametrize("shape", [(50, 70), (33, 41)])
    def test_area_fractional(self, img, shape):
        ref = cv2.resize(img, (shape[1], shape[0]), interpolation=cv2.INTER_AREA)
        mine = geo.resize(img, shape[0], shape[1], "area")
        assert maxdiff(ref, mine) <= 1

    def test_area_integer_exact(self, rng):
        img = rng.integers(0, 256, size=(96, 120, 3), dtype=np.uint8)
        ref = cv2.resize(img, (40, 32), interpolation=cv2.INTER_AREA)
        mine = geo.resize(img, 32, 40, "area")
        assert maxdiff(ref, mine) == 0

    @pytest.mark.parametrize("shape", [(50, 70), (200, 150)])
    def test_cubic(self, img, shape):
        ref = cv2.resize(img, (shape[1], shape[0]), interpolation=cv2.INTER_CUBIC)
        mine = geo.resize(img, shape[0], shape[1], "cubic")
        assert maxdiff(ref, mine) <= 1

    def test_nearest(self, img):
        ref = cv2.resize(img, (61, 48), interpolation=cv2.INTER_NEAREST)
        mine = geo.resize(img, 48, 61, "nearest")
        assert maxdiff(ref, mine) == 0

    def test_resize_long_side(self, img):
        out = np.asarray(geo.resize_long_side(img, 60))
        assert max(out.shape[:2]) == 60
        # no-op when already smaller
        out2 = np.asarray(geo.resize_long_side(img, 4000))
        assert out2.shape == img.shape


class TestPerspective:
    def test_get_perspective_transform(self):
        src = np.array([[10, 12], [100, 8], [110, 90], [5, 80]], dtype=np.float32)
        dst = np.array([[0, 0], [99, 0], [99, 119], [0, 119]], dtype=np.float32)
        ref = cv2.getPerspectiveTransform(src, dst)
        mine = geo.get_perspective_transform(src, dst)
        assert np.allclose(ref, mine, atol=1e-8)

    def test_warp_perspective(self, img):
        src = np.array([[10, 12], [100, 8], [110, 90], [5, 80]], dtype=np.float32)
        dst = np.array([[0, 0], [99, 0], [99, 119], [0, 119]], dtype=np.float32)
        M = cv2.getPerspectiveTransform(src, dst)
        ref = cv2.warpPerspective(img, M, (100, 120))
        mine = geo.warp_perspective(img, M, 120, 100)
        d = np.abs(ref.astype(int) - np.asarray(mine).astype(int))
        # cv2 evaluates the projective map in f64; ours is f32 on-device —
        # rare cvRound boundary flips only.
        assert d.max() <= 1 and np.mean(d > 0) < 0.005

    def test_warp_tiled_matches_gather(self, img):
        """Tiled one-hot-MXU warp vs the gather form: identical f32
        coordinates, so differences are only the 4-term-vs-2-stage MAC
        order at x.5 boundaries (+-1 LSB, rare); also vs cv2 directly."""
        rng = np.random.default_rng(3)
        quads = [
            np.array([[10, 12], [100, 8], [110, 90], [5, 80]], np.float32),
            np.array([[2, 2], [117, 6], [112, 93], [6, 88]], np.float32),
            np.array([[20, 5], [105, 15], [98, 85], [12, 92]], np.float32),
        ]
        dst = np.array([[0, 0], [99, 0], [99, 119], [0, 119]], np.float32)
        minvs = np.stack([
            np.linalg.inv(geo.get_perspective_transform(q, dst))
            for q in quads]).astype(np.float32)
        stack = np.stack([img,
                          rng.integers(0, 256, img.shape, np.uint8),
                          img[::-1].copy()])
        import jax.numpy as jnp
        tiled = geo.warp_perspective_tiled_batch(jnp.asarray(stack), minvs,
                                                 120, 100)
        assert tiled is not None
        gather = geo.warp_perspective_batch(jnp.asarray(stack),
                                            jnp.asarray(minvs), 120, 100)
        d = np.abs(np.asarray(tiled).astype(int)
                   - np.asarray(gather).astype(int))
        assert d.max() <= 1 and np.mean(d > 0) < 0.005, \
            (d.max(), np.mean(d > 0))
        for i, q in enumerate(quads):
            ref = cv2.warpPerspective(
                stack[i], cv2.getPerspectiveTransform(q, dst), (100, 120))
            d = np.abs(ref.astype(int) - np.asarray(tiled[i]).astype(int))
            assert d.max() <= 1 and np.mean(d > 0) < 0.005, i

    def test_warp_tiled_plan_rejects_degenerate(self, img):
        """Wide-window / degenerate homographies must return None (the
        caller's gather fallback), never a silently-corrupt warp."""
        import jax.numpy as jnp
        stack = jnp.asarray(img[None])
        # extreme downscale: a 32px output tile spans ~all of the source
        src = np.array([[0, 0], [119, 0], [119, 89], [0, 89]], np.float32)
        dst = np.array([[0, 0], [9, 0], [9, 9], [0, 9]], np.float32)
        minv = np.linalg.inv(
            geo.get_perspective_transform(src, dst))[None].astype(np.float32)
        assert geo.warp_perspective_tiled_batch(stack, minv, 10, 10) is None
        # near-singular homography (denominator sign change in-frame)
        bad = np.eye(3, dtype=np.float32)
        bad[2] = [0.1, 0.1, -5.0]
        assert geo.warp_perspective_tiled_batch(
            stack, bad[None], 120, 100) is None

    def test_warp_tiled_plan_rejects_tiny_source(self):
        """Source smaller than the shared window g: the slide clamp can
        pass the coverage check while _warp_tiled_exec's dynamic_slice
        would request a (g, g) slice larger than the padded source — must
        reject to the gather path, not trace-error (ADVICE r4)."""
        import jax.numpy as jnp
        tiny = jnp.asarray(np.arange(16 * 16 * 3, dtype=np.uint8)
                           .reshape(1, 16, 16, 3))
        # output 32x32 single tile whose source window spans [-5, 32) on a
        # 16px source: span 37 -> g 40 > 16 + 2*pad = 32
        minv = np.array([[[1.1, 0.0, -4.0],
                          [0.0, 1.1, -4.0],
                          [0.0, 0.0, 1.0]]], np.float32)
        assert geo.warp_perspective_tiled_batch(tiny, minv, 32, 32) is None

    @pytest.mark.parametrize("seed", [7, 10, 26, 1234])
    def test_remap(self, seed):
        # seeds 7/10/26 hit coords where the 4-tap MAC lands within 1e-5 of
        # an x.5 rounding boundary; XLA's FMA contraction can flip cvRound
        # there (see _bilinear_gather_u8 docstring / CLAUDE.md contract):
        # assert the documented +-1 LSB on <0.5% of pixels, exact elsewhere.
        r = np.random.default_rng(seed)
        gray = r.integers(0, 256, size=(97, 123), dtype=np.uint8)
        my = r.uniform(-3, 99, (50, 60)).astype(np.float32)
        mx = r.uniform(-3, 125, (50, 60)).astype(np.float32)
        for border, kw in [("constant", {}),
                           ("replicate", dict(borderMode=cv2.BORDER_REPLICATE))]:
            ref = cv2.remap(gray, mx, my, cv2.INTER_LINEAR, **kw)
            mine = np.asarray(geo._bilinear_gather_u8(gray, mx, my, border=border))
            d = np.abs(ref.astype(int) - mine.astype(int))
            assert d.max() <= 1 and np.mean(d > 0) < 0.005


class TestAffine:
    def test_warp_affine_replicate(self, gray):
        M = cv2.getRotationMatrix2D((61.5, 48.5), 7.3, 1.0)
        ref = cv2.warpAffine(gray, M, (123, 97), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REPLICATE)
        mine = geo.warp_affine(gray, M, 97, 123, border="replicate")
        d = np.abs(ref.astype(int) - np.asarray(mine).astype(int))
        assert d.max() <= 1 and np.mean(d > 0) < 0.005

    def test_rotation_matrix(self):
        ref = cv2.getRotationMatrix2D((50.0, 40.0), -3.7, 1.0)
        mine = geo.get_rotation_matrix_2d((50.0, 40.0), -3.7, 1.0)
        assert np.allclose(ref, mine, atol=1e-10)
