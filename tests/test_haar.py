"""Haar detector hardening (VERDICT round-1 Weak #5 / Next #8).

cv2 5.0 dropped CascadeClassifier, so differential testing against OpenCV
is impossible; instead these tests pin DETECTION FIXTURES for every
committed portrait (detector changes cannot silently shift boxes), test
_group_rectangles' clustering/containment/eps rules directly, and
property-test the multi-scale driver (min/max size respected, pyramid box
sizes, translation equivariance).
"""
import numpy as np
import pytest
from PIL import Image

from tpuimage.detect import haar

PUB = "/root/reference/public"


def gray(path):
    return np.asarray(Image.open(path).convert("L"))


def boxes_close(got, want, tol=3):
    assert len(got) == len(want), (got, want)
    for gb, wb in zip(sorted(got), sorted(want)):
        assert max(abs(a - b) for a, b in zip(gb, wb)) <= tol, (got, want)


class TestPortraitFixtures:
    """Pinned detections (measured with the stock OpenCV XML cascades on
    this build; FaceEnhancement.py:177-182 / classification.py:52-57
    parameters). A small tolerance absorbs future rounding-level tweaks;
    box COUNT must match exactly."""

    def test_facewithnoise(self):
        g = gray(f"{PUB}/facewithnoise.jpg")
        boxes_close(haar.detect_faces(g), [(39, 104, 296, 296)])
        boxes_close(haar.detect_eyes(g), [(88, 180, 70, 70), (206, 181, 69, 69)])

    def test_facewith50noise(self):
        g = gray(f"{PUB}/facewith50noise.jpg")
        boxes_close(haar.detect_faces(g), [(24, 92, 315, 315)])
        # 50% impulse noise destroys the fine eye features — none detected
        assert haar.detect_eyes(g) == []

    def test_enhanced_face_golden(self):
        g = gray(f"{PUB}/enhanced_face.jpg")
        boxes_close(haar.detect_faces(g), [(39, 101, 293, 293)])
        boxes_close(haar.detect_eyes(g), [(86, 179, 70, 70), (208, 180, 68, 68)])

    def test_wenhao_wang_large(self):
        g = gray(f"{PUB}/DIP test/wenhao_wang.jpeg")   # 2812x1913
        boxes_close(haar.detect_faces(g), [(289, 593, 1244, 1244)], tol=8)

    def test_landscape_negative(self):
        g = gray(f"{PUB}/DIP test/Landscape1.jpeg")
        assert haar.detect_faces(g) == []


class TestGroupRectangles:
    def test_below_threshold_dropped(self):
        rects = [(10, 10, 50, 50)] * 3
        assert haar._group_rectangles(rects, group_threshold=3) == []
        assert haar._group_rectangles(rects * 2, group_threshold=3) == \
            [(10, 10, 50, 50)]

    def test_cluster_average(self):
        rects = [(10, 10, 50, 50), (14, 12, 52, 50), (12, 8, 48, 50),
                 (10, 10, 50, 50)]
        out = haar._group_rectangles(rects, group_threshold=1)
        # average of the cluster, rounded
        assert out == [(12, 10, 50, 50)]

    def test_eps_similarity_boundary(self):
        # delta = eps * (min(w) + min(h)) / 2 = 0.2 * 50 = 10
        a = (100, 100, 50, 50)
        near = (110, 100, 50, 50)    # dx = 10 = delta -> same class
        far = (112, 100, 50, 50)     # dx = 12 > delta -> separate class
        out = haar._group_rectangles([a, a, near], group_threshold=2)
        assert len(out) == 1
        out = haar._group_rectangles([a, a, far, far], group_threshold=1)
        assert len(out) == 2

    def test_containment_suppression(self):
        # small cluster (n1=2) fully inside a big heavy cluster (n2=5 > max(3, 2))
        big = [(50, 50, 200, 200)] * 5
        small = [(100, 100, 40, 40)] * 2
        out = haar._group_rectangles(big + small, group_threshold=1)
        assert out == [(50, 50, 200, 200)]
        # but NOT suppressed when the outer cluster is light (n2 <= 3)
        out = haar._group_rectangles(big[:3] + small, group_threshold=1)
        assert sorted(out) == [(50, 50, 200, 200), (100, 100, 40, 40)]

    def test_empty(self):
        assert haar._group_rectangles([], 3) == []


class TestMultiScaleProperties:
    @pytest.fixture(scope="class")
    def portrait(self):
        return gray(f"{PUB}/facewithnoise.jpg")

    def test_min_size_respected(self, portrait):
        for (x, y, w, h) in haar.detect_multi_scale(
                portrait, "haarcascade_frontalface_default.xml",
                min_neighbors=5, min_size=(300, 300)):
            assert w >= 300 and h >= 300

    def test_max_size_respected(self, portrait):
        for (x, y, w, h) in haar.detect_multi_scale(
                portrait, "haarcascade_eye.xml",
                min_neighbors=5, min_size=(30, 30), max_size=(80, 80)):
            assert w <= 80 and h <= 80

    def test_box_sizes_come_from_pyramid(self, portrait):
        """Every returned box size must be an average of pyramid window
        sizes round(24 * 1.1^k) — guards the scale/step bookkeeping."""
        casc = haar.load_cascade("haarcascade_frontalface_default.xml")
        sizes = set()
        f = 1.0
        while round(casc.win_w * f) <= portrait.shape[1]:
            sizes.add(int(round(casc.win_w * f)))
            f *= 1.1
        lo, hi = min(sizes), max(sizes)
        for (x, y, w, h) in haar.detect_faces(portrait):
            assert w == h and lo <= w <= hi

    def test_translation_equivariance(self, portrait):
        """Shifting the image shifts the detection by about the same
        amount (windows are step-strided, so allow step*factor slack)."""
        base = haar.detect_faces(portrait)
        assert len(base) == 1
        dy, dx = 16, 12
        shifted = np.full_like(portrait, 255)
        shifted[dy:, dx:] = portrait[:-dy or None, :-dx or None]
        got = haar.detect_faces(shifted)
        assert len(got) == 1
        bx, by, bw, bh = base[0]
        gx, gy, gw, gh = got[0]
        assert abs((gx - bx) - dx) <= 12 and abs((gy - by) - dy) <= 12
        assert abs(gw - bw) <= 0.1 * bw


class TestBatchEquivalence:
    """detect_multi_scale_batch must equal per-image detection exactly
    (the batch path IS the production path; round-2 VERDICT item 7)."""

    def test_batch_matches_single(self):
        imgs = [gray(f"{PUB}/facewithnoise.jpg"),
                gray(f"{PUB}/sample.jpg")[:300, :400],
                gray(f"{PUB}/facewith50noise.jpg")]
        batch = haar.detect_faces_batch(imgs)
        singles = [haar.detect_faces(g) for g in imgs]
        assert batch == singles

    def test_batch_empty_and_tiny(self):
        out = haar.detect_faces_batch([np.zeros((10, 10), np.uint8)])
        assert out == [[]]
        assert haar.detect_faces_batch([]) == []


class TestNativeNumpyParity:
    """The C++ early-exit evaluator (native/haar.cpp) and the vectorized
    numpy fallback must produce IDENTICAL candidate lists: both follow the
    same IEEE-double op order (round-3; see haar.cpp's parity contract)."""

    def test_impls_identical_faces(self):
        imgs = [gray(f"{PUB}/facewithnoise.jpg"),
                gray(f"{PUB}/sample.jpg")[:477, :601],   # odd sizes
                gray(f"{PUB}/enhanced_face.jpg")]
        kw = dict(scale_factor=1.1, min_neighbors=5, min_size=(40, 40))
        a = haar.detect_multi_scale_batch(
            imgs, "haarcascade_frontalface_default.xml", impl="numpy", **kw)
        b = haar.detect_multi_scale_batch(
            imgs, "haarcascade_frontalface_default.xml", impl="native", **kw)
        assert a == b

    def test_impls_identical_eyes(self):
        imgs = [gray(f"{PUB}/enhanced_face.jpg")]
        kw = dict(scale_factor=1.1, min_neighbors=5, min_size=(30, 30))
        a = haar.detect_multi_scale_batch(
            imgs, "haarcascade_eye.xml", impl="numpy", **kw)
        b = haar.detect_multi_scale_batch(
            imgs, "haarcascade_eye.xml", impl="native", **kw)
        assert a == b

    def test_bad_impl_rejected(self):
        import pytest
        with pytest.raises(ValueError):
            haar.detect_multi_scale_batch(
                [np.zeros((50, 50), np.uint8)],
                "haarcascade_frontalface_default.xml", impl="cuda")
