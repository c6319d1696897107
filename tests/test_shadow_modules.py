"""Shadow-protected pipeline (ipynb cell 19) + notebook modules 1-7 +
restoration ops, differential vs cv2/skimage compositions where exact."""
import numpy as np
import cv2
import pytest

import jax.numpy as jnp

from tpuimage.pipelines import shadow, modules
from tpuimage.ops import restore
from tpuimage.io.imageio import load_image_rgb


@pytest.fixture(scope="module")
def scene():
    img = np.random.default_rng(1234).integers(0, 256, size=(120, 160, 3),
                                               dtype=np.uint8)
    return cv2.GaussianBlur(img, (7, 7), 0)


class TestShadowPipeline:
    pytestmark = pytest.mark.slow
    def test_all_presets_run(self, scene):
        for name, preset in shadow.PRESETS.items():
            final, mask = shadow.enhance_shadow_protected(jnp.asarray(scene), preset)
            assert np.asarray(final).shape == scene.shape, name
            m = np.asarray(mask)
            assert m.shape == scene.shape[:2] and 0 <= m.min() and m.max() <= 1.0

    def test_auto_categorize_night(self):
        rgb = load_image_rgb("/root/reference/public/nightview.png")[::4, ::4]
        assert shadow.auto_categorize(rgb) == "NIGHT"

    def test_auto_categorize_general(self, scene):
        bright = np.clip(scene.astype(int) + 100, 0, 255).astype(np.uint8)
        assert shadow.auto_categorize(bright) in ("GENERAL", "DOCUMENT")

    def test_shadow_mask_matches_cv2(self, scene):
        # cell 19 get_shadow_mask_brightness, cv2 composition
        ours = np.asarray(shadow.get_shadow_mask_brightness(jnp.asarray(scene), 85, 51))
        hsv = cv2.cvtColor(scene[..., ::-1], cv2.COLOR_BGR2HSV)
        binm = (hsv[..., 2] < 85).astype(np.uint8) * 255
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        closed = cv2.morphologyEx(binm, cv2.MORPH_CLOSE, k)
        soft = cv2.GaussianBlur(closed.astype(np.float32), (51, 51), 0) / 255.0
        assert np.abs(ours - soft).max() < 1e-3

    def test_night_preset_saturated_mask_is_noop(self):
        # Faithful reference quirk: on an ALL-dark image the shadow mask
        # saturates to 1 everywhere, the stretch blend then fully prefers
        # the original — the notebook's NIGHT preset is a no-op there.
        rgb = load_image_rgb("/root/reference/public/nightview.png")[::4, ::4]
        final, mask, cat = shadow.enhance_image(rgb)
        assert cat == "NIGHT"
        assert mask.mean() > 0.95
        assert abs(final.mean() - rgb.mean()) < 2.0

    def test_general_preset_enhances_shadow_half(self, rng):
        # half-bright/half-shadow scene: the bright half gets enhanced,
        # the shadow half stays close to the original
        img = np.empty((80, 120, 3), np.uint8)
        img[:, :60] = rng.integers(10, 50, (80, 60, 3))
        img[:, 60:] = rng.integers(120, 230, (80, 60, 3))
        final, mask = shadow.enhance_shadow_protected(
            jnp.asarray(img), shadow.PRESETS["GENERAL"])
        final = np.asarray(final)
        m = np.asarray(mask)
        assert m[:, :55].mean() > 0.6 and m[:, 65:].mean() < 0.4
        diff_shadow = np.abs(final[:, :55].astype(int) - img[:, :55].astype(int)).mean()
        diff_bright = np.abs(final[:, 65:].astype(int) - img[:, 65:].astype(int)).mean()
        assert diff_bright > diff_shadow

    def test_batch(self, scene):
        batch = np.stack([scene, scene[:, ::-1]])
        f, m = shadow.enhance_shadow_batch(jnp.asarray(batch), shadow.PRESETS["GENERAL"])
        single, _ = shadow.enhance_shadow_protected(jnp.asarray(scene), shadow.PRESETS["GENERAL"])
        np.testing.assert_array_equal(np.asarray(f[0]), np.asarray(single))


class TestRestoreOps:
    def test_retinex_properties(self, scene):
        out = np.asarray(restore.single_scale_retinex(jnp.asarray(scene), sigma=30.0))
        assert out.shape == scene.shape and out.dtype == np.uint8
        # per-channel min-max normalized: each channel spans ~full range
        for c in range(3):
            assert out[..., c].min() <= 5 and out[..., c].max() >= 250

    def test_richardson_lucy_deblurs(self):
        # blur a sharp synthetic image with the same PSF and deconvolve
        img = np.zeros((64, 64), np.uint8)
        img[24:40, 24:40] = 220
        k = cv2.getGaussianKernel(5, 1.0)
        psf = np.outer(k, k)
        blurred = cv2.filter2D(img.astype(np.float64) / 255.0, -1, psf,
                               borderType=cv2.BORDER_CONSTANT)
        blurred_u8 = np.clip(blurred * 255, 0, 255).astype(np.uint8)
        out = np.asarray(restore.richardson_lucy_gray(jnp.asarray(blurred_u8), 20))
        e_blur = np.mean((blurred_u8.astype(int) - img.astype(int)) ** 2)
        e_dec = np.mean((out.astype(int) - img.astype(int)) ** 2)
        assert e_dec < e_blur * 0.7

    def test_richardson_lucy_matches_skimage(self):
        pytest.importorskip("skimage")  # not in this image; property test above covers behavior
        from skimage.restoration import richardson_lucy as sk_rl
        rng = np.random.default_rng(3)
        img = cv2.GaussianBlur(rng.integers(0, 256, (48, 48), np.uint8), (5, 5), 0)
        k = cv2.getGaussianKernel(5, 1.0)
        psf = np.outer(k, k)
        ref = sk_rl(img.astype(np.float64) / 255.0, psf, num_iter=10)
        ref_u8 = np.clip(ref * 255, 0, 255).astype(np.uint8)
        ours = np.asarray(restore.richardson_lucy_gray(jnp.asarray(img), 10))
        d = np.abs(ref_u8.astype(int) - ours.astype(int))
        assert np.mean(d <= 2) > 0.98, d.max()

    def test_sharpen_kernel_matches_cv2(self, scene):
        k = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32)
        ref = cv2.filter2D(scene, -1, k)
        ours = np.asarray(restore.sharpen_kernel_3x3(jnp.asarray(scene)))
        assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1


class TestDocRestore:
    pytestmark = pytest.mark.slow
    def test_process_image_outputs(self, tmp_path):
        from tpuimage.pipelines import docrestore
        r = docrestore.process_image("/root/reference/public/DIP test/document1.jpeg",
                                     str(tmp_path), max_dim=600)
        assert set(r) == {"basename", "psnr", "ssim"}
        import os
        assert os.path.exists(tmp_path / "final" / "document1_final.png")
        assert os.path.exists(tmp_path / "segmented" / "document1_seg.png")

    def test_main_process_writes_csv(self, tmp_path):
        from tpuimage.pipelines import docrestore
        import shutil, csv
        src = tmp_path / "in"
        src.mkdir()
        shutil.copy("/root/reference/public/sample.jpg", src / "a.jpg")
        p = docrestore.main_process(str(src), str(tmp_path / "out"))
        rows = list(csv.DictReader(open(p)))
        assert len(rows) == 1 and rows[0]["basename"] == "a"


class TestModules:
    pytestmark = pytest.mark.slow
    def test_module1_matches_cv2(self, scene):
        ours = np.asarray(modules.module1_enhance(jnp.asarray(scene)))
        lab = cv2.cvtColor(scene[..., ::-1], cv2.COLOR_BGR2LAB)
        l = cv2.createCLAHE(4.0, (8, 8)).apply(lab[..., 0])
        x = cv2.cvtColor(np.concatenate([l[..., None], lab[..., 1:]], -1),
                         cv2.COLOR_LAB2BGR)[..., ::-1]
        lo, hi = np.percentile(x, (2, 98))
        x = np.clip((x - lo) * 255 / (hi - lo), 0, 255).astype(np.uint8)
        blurred = cv2.GaussianBlur(x, (3, 3), 0)
        ref = cv2.addWeighted(x, 2.2, blurred, -1.2, 0)
        d = np.abs(ref.astype(int) - ours.astype(int))
        # CLAHE's documented ±1 boundary pixels get amplified by the
        # stretch (x1.5) and unsharp (x3.4) stages — bound the composite
        assert d.max() <= 8 and np.mean(d > 2) < 0.05 and d.mean() < 0.5

    def test_module2_runs(self, scene):
        out = np.asarray(modules.module2_restore(jnp.asarray(scene[:64, :64])))
        assert out.shape == (64, 64, 3)

    def test_module3_identity(self, scene):
        out = modules.module3_transform(scene, 0.0, 1.0, (0, 0))
        np.testing.assert_array_equal(out, scene)

    def test_module3_scale(self, scene):
        out = modules.module3_transform(scene, 0.0, 0.5, (0, 0))
        assert out.shape == (60, 80, 3)

    def test_module4_matches_cv2(self, scene):
        ours = np.asarray(modules.module4_segment(jnp.asarray(scene)))
        gray = cv2.cvtColor(scene[..., ::-1], cv2.COLOR_BGR2GRAY)
        seg = cv2.adaptiveThreshold(gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                    cv2.THRESH_BINARY, 15, 5)
        seg = cv2.bitwise_or(seg, cv2.Canny(gray, 50, 150))
        se = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
        ref = cv2.morphologyEx(seg, cv2.MORPH_CLOSE, se)
        # canny differs at <0.5% pixels (hysteresis border); morphology may
        # spread each disagreement by the SE
        assert np.mean(ref != ours) < 0.02

    def test_module6_features(self, scene):
        f = modules.module6_features(jnp.asarray(scene))
        assert set(f) == {"edge_map", "grad_magnitude_mean", "grad_magnitude_std",
                          "grad_angle_mean", "grad_angle_std", "laplacian_variance"}
        gray = cv2.cvtColor(scene[..., ::-1], cv2.COLOR_BGR2GRAY)
        gx = cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3)
        gy = cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)
        mag = cv2.magnitude(gx, gy)
        assert abs(float(f["grad_magnitude_mean"]) - mag.mean()) < 0.1

    def test_modules_vmap_consistency(self, scene):
        import jax
        batch = jnp.asarray(np.stack([scene, scene[:, ::-1]]))
        b1 = np.asarray(jax.vmap(modules.module1_enhance)(batch))
        s1 = np.asarray(modules.module1_enhance(jnp.asarray(scene)))
        np.testing.assert_array_equal(b1[0], s1)
        b4 = np.asarray(jax.vmap(modules.module4_segment)(batch))
        s4 = np.asarray(modules.module4_segment(jnp.asarray(scene)))
        np.testing.assert_array_equal(b4[0], s4)

    def test_module7_sizes_monotone(self, scene, tmp_path):
        sizes = modules.module7_compress(scene, str(tmp_path))
        assert sizes["compressed_jpeg_q30.jpg"] <= sizes["compressed_jpeg_q90.jpg"]
        assert sizes["compressed_png_l9.png"] <= sizes["compressed_png_l0.png"]
