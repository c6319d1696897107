"""Golden reproduction harness against /root/reference/outputs (VERDICT
round-1 Missing #1 / Next #3): loads all 12 committed goldens and asserts
quantified reproduction.

Findings this harness encodes (measured, see assertions):

- scan_01_pre: reproduced within the ±1 LSB float contract (bilateral).
- scan_04..scan_08 are reproduced BIT-EXACTLY (maxdiff 0, all 7 PNGs) by
  docscan_post_warp when fed the golden scan_03 warp — the fused TPU
  program is byte-identical to the reference cv2 pipeline on the real
  golden input, including both Otsu solves, the adaptive threshold, the
  Hough deskew median (angle 0) and the morph-skip at ksize 1.
- The only irreproducible artifact is the QUAD: the golden run's
  cv2.HoughLinesP is randomized (unseeded, different OpenCV version — this
  cv2 5.0 returns a different shape and crashes DocScanner.py unpatched,
  CLAUDE.md) and detected a DEGENERATE near-triangle quad: corners
  extracted from the committed scan_02 overlay are TL(446,0) TR(448,0)
  BR(477,626) BL(62,648) — a 2-px-wide top edge. Warping that sliver to
  A4 produced the smeared golden scan_03 and the byte-identical
  scan_04=05=05a / scan_06=06b=07=08 degeneracy (SURVEY §2.1 C11). Our
  deterministic localizer finds the sensible full-document quad instead;
  the quad test below quantifies that residual rather than matching it.
- The morphseq goldens are INTERNALLY INCONSISTENT: no cv2 3x3 morphology
  (erode/dilate/open/close, rect/ellipse/cross, 1-3 iterations) maps the
  committed morphseq_01_gray.png to morphseq_02_eroded.png (best: 74.4%
  pixels, maxdiff 208) — the 312x406 dumps were evidently saved from a
  DIFFERENT resolution of an uncommitted input (erode-then-resize !=
  resize-then-erode). Byte-diffing them is therefore impossible for any
  correct implementation; the test below instead proves our erosion is
  bit-identical to cv2's on the golden step-1 data, and morphseq pipeline
  parity is covered on sample.jpg (BASELINE.json:7) in test_docscan.py.
"""
import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import jax.numpy as jnp

from tpuimage.pipelines import docscan
from tpuimage.ops.morphology import erode, structuring_element

REF = "/root/reference/outputs"
DOC1 = "/root/reference/public/DIP test/document1.jpeg"

SCAN_GOLDENS = [
    "scan_01_pre.png", "scan_02_quad.png", "scan_03_warped.png",
    "scan_04_illum.png", "scan_05_stretch.png", "scan_05a_inkmask.png",
    "scan_06_adapt.png", "scan_06b_weighted.png", "scan_07_deskew.png",
    "scan_08_clean.png",
]
MORPH_GOLDENS = ["morphseq_01_gray.png", "morphseq_02_eroded.png"]


def g(name, mode=None):
    im = Image.open(f"{REF}/{name}")
    if mode:
        im = im.convert(mode)
    return np.asarray(im)


@pytest.fixture(scope="module")
def gui_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("goldens")
    return docscan.process_document(DOC1, out_dir=str(out),
                                    config=docscan.GUI_DOCUMENT_CONFIG)


class TestScanGoldens:
    def test_all_goldens_load(self):
        for name in SCAN_GOLDENS + MORPH_GOLDENS:
            assert g(name).size > 0, name

    def test_scan01_pre(self, gui_run):
        ref = g("scan_01_pre.png", "L")
        ours = np.asarray(docscan.preprocess(
            jnp.asarray(np.asarray(Image.open(DOC1).convert("RGB"))), 9, 75.0, 75.0, 0))
        d = np.abs(ref.astype(int) - ours.astype(int))
        assert d.max() <= 1 and np.mean(d > 0) < 0.005  # float-blend contract

    def test_post_warp_stages_bit_exact_from_golden_warp(self):
        """Feed the golden scan_03 through the fused post-warp program:
        every one of the 7 downstream goldens must reproduce byte-identically."""
        warped = g("scan_03_warped.png", "RGB")
        st = docscan.docscan_post_warp(jnp.asarray(warped),
                                       docscan.GUI_DOCUMENT_CONFIG)
        assert float(np.asarray(st["deskew_angle"])) == 0.0
        for name, key in [("scan_04_illum.png", "illum"),
                          ("scan_05_stretch.png", "stretch"),
                          ("scan_05a_inkmask.png", "inkmask"),
                          ("scan_06_adapt.png", "adapt"),
                          ("scan_06b_weighted.png", "weighted"),
                          ("scan_07_deskew.png", "deskew"),
                          ("scan_08_clean.png", "clean")]:
            ref = g(name, "L")
            ours = np.asarray(st[key])
            assert np.array_equal(ref, ours), f"{name} not bit-exact"

    def test_quad_residual_quantified(self, gui_run):
        """The golden quad is a degenerate HoughLinesP artifact (module
        docstring); assert (a) our quad is the sensible full-document one,
        (b) the golden overlay's quad really is the degenerate near-triangle
        this harness documents (guards the evidence the docstring cites)."""
        quad = gui_run["quad"]
        assert quad is not None and not gui_run["use_whole"]
        h, w = g("scan_01_pre.png", "L").shape
        area = docscan.cnt.contour_area(quad)
        assert area / (h * w) > 0.5  # full-document quad

        overlay = g("scan_02_quad.png", "RGB").astype(int)
        green = (overlay[..., 1] > 200) & (overlay[..., 0] < 100) & (overlay[..., 2] < 100)
        ys, xs = np.nonzero(green)
        pts = np.stack([xs, ys], 1).astype(float)
        gq = docscan.order_quad_points(np.array([
            pts[np.argmin(pts.sum(1))], pts[np.argmin(pts[:, 1] - pts[:, 0])],
            pts[np.argmax(pts.sum(1))], pts[np.argmax(pts[:, 1] - pts[:, 0])]]))
        top_edge = np.linalg.norm(gq[1] - gq[0])
        bottom_edge = np.linalg.norm(gq[2] - gq[3])
        assert top_edge < 0.05 * bottom_edge  # degenerate golden quad
        # quantified residual between our quad and the golden one
        ours = docscan.order_quad_points(quad)
        delta = np.linalg.norm(ours - gq, axis=1)
        assert delta.max() > 100  # genuinely different quads — documented


class TestMorphseqGoldens:
    def test_goldens_internally_inconsistent(self):
        """Guard the evidence in the module docstring: cv2's own 3x3 rect
        erosion of golden step-1 does NOT reproduce golden step-2."""
        g1 = g("morphseq_01_gray.png", "L")
        g2 = g("morphseq_02_eroded.png", "L")
        cv = cv2.erode(g1, cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3)))
        assert not np.array_equal(g2, cv)
        assert np.mean(cv == g2) < 0.80

    def test_our_erosion_bit_exact_on_golden_data(self):
        g1 = g("morphseq_01_gray.png", "L")
        cv = cv2.erode(g1, cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3)))
        ours = np.asarray(erode(jnp.asarray(g1), structuring_element("rect", 3),
                                iterations=1))
        assert np.array_equal(cv, ours)
