"""Face pipeline + Haar detection tests.

Note: this cv2 build (5.0) has no CascadeClassifier, so Haar assertions are
structural (plausible boxes on known portraits) rather than differential;
the stage math is covered differentially in test_filters/test_color, and
the end-to-end output is checked against the committed enhanced_face.jpg
golden (PSNR — the golden is itself JPEG-quantized).
"""
import numpy as np
import cv2
import pytest

from tpuimage.pipelines import face
from tpuimage.detect import haar
from tpuimage.io.imageio import load_image_rgb
from tpuimage.ops.color import rgb_to_gray
from tpuimage.ops.metrics import psnr

FACE = "/root/reference/public/facewithnoise.jpg"
GOLDEN = "/root/reference/public/enhanced_face.jpg"


@pytest.fixture(scope="module")
def portrait():
    return load_image_rgb(FACE)


@pytest.fixture(scope="module")
def portrait_gray(portrait):
    return np.asarray(rgb_to_gray(portrait))


class TestHaar:
    def test_face_found(self, portrait_gray):
        faces = haar.detect_faces(portrait_gray)
        assert len(faces) == 1
        x, y, w, h = faces[0]
        # the portrait's face fills the upper-center of the 365x581 frame
        assert w > 200 and h > 200
        assert 0 <= x < 100 and 50 <= y < 200

    def test_eyes_found_symmetric(self, portrait_gray):
        eyes = haar.detect_eyes(portrait_gray)
        assert len(eyes) == 2
        (x1, y1, w1, h1), (x2, y2, w2, h2) = sorted(eyes)
        assert abs(y1 - y2) < 15          # same height
        assert x2 - x1 > 60               # horizontally separated
        assert abs(w1 - w2) <= 15

    def test_no_face_in_noise(self, rng):
        noise = rng.integers(0, 256, size=(200, 200), dtype=np.uint8)
        assert haar.detect_faces(noise) == []


class TestNoiseClassifier:
    def test_kurtosis_branches(self, rng):
        base = cv2.GaussianBlur(
            rng.integers(0, 256, size=(128, 128, 3), dtype=np.uint8), (7, 7), 0)
        g = np.clip(base.astype(int) + rng.normal(0, 12, base.shape), 0, 255).astype(np.uint8)
        assert face.classify_noise_type(g) == "gaussian"
        sp = base.copy()
        coords = rng.integers(0, 128, size=(300, 2))
        sp[coords[:, 0], coords[:, 1]] = 255
        assert face.classify_noise_type(sp) == "impulse"


class TestEndToEnd:
    pytestmark = pytest.mark.slow
    def test_matches_reference_golden(self, portrait):
        res = face.enhance_face(portrait)
        golden = load_image_rgb(GOLDEN)
        assert res["final"].shape == golden.shape
        # golden is a JPEG re-encode of the reference run; 35 dB = visually
        # identical (measured 40.3 dB)
        assert float(psnr(golden, res["final"])) > 35.0

    def test_stage_dict_complete(self, portrait):
        res = face.enhance_face(portrait, eyes=[])
        for k in ("noise_type", "skin_mask", "skin_enhanced",
                  "features_popped", "final"):
            assert k in res

    def test_gui_variant_differs(self, portrait):
        a = face.enhance_face(portrait, noise_type="gaussian", eyes=[], variant="script")
        b = face.enhance_face(portrait, noise_type="gaussian", eyes=[], variant="gui")
        assert not np.array_equal(a["final"], b["final"])
