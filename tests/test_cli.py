"""CLI entry-point smoke tests (tiny synthetic inputs, CPU mesh)."""
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def tiny_image(tmp_path, rng):
    img = rng.integers(0, 256, size=(96, 80, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(img).save(p)
    return str(p)


class TestCLIs:
    def test_morphseq(self, tiny_image, tmp_path):
        from tpuimage.cli import morphseq
        out = tmp_path / "m"
        morphseq.main([tiny_image, "--out", str(out)])
        assert (out / "morphseq_closed.png").exists()
        assert (out / "morphseq_01_gray.png").exists()

    def test_night(self, tiny_image, tmp_path):
        from tpuimage.cli import night
        out = tmp_path / "n"
        night.main([tiny_image, "--out", str(out), "--mode", "gray",
                    "--histograms"])
        assert (out / "night_enhanced.png").exists()
        assert (out / "night_enhanced_hist.csv").exists()

    def test_landscape(self, tiny_image, tmp_path):
        from tpuimage.cli import landscape
        out = tmp_path / "l"
        landscape.main([tiny_image, "--out", str(out)])
        assert (out / "landscape_metrics.csv").exists()

    def test_landscape_report_and_compare(self, tiny_image, tmp_path):
        from tpuimage.cli import landscape
        out = tmp_path / "lr"
        landscape.main([tiny_image, "--out", str(out), "--report", "--compare"])
        assert (out / "img_report.png").exists()
        assert (out / "img_compare.png").exists()

    def test_night_report_and_compare(self, tiny_image, tmp_path):
        from tpuimage.cli import night
        out = tmp_path / "nr"
        night.main([tiny_image, "--out", str(out), "--report", "--compare"])
        assert (out / "night_enhanced_panel.png").exists()
        assert (out / "night_compare.png").exists()


class TestCompareComposite:
    pytestmark = pytest.mark.slow
    def test_layout_and_mixed_shapes(self, rng):
        from tpuimage.io.report import compare_composite
        a = rng.integers(0, 256, size=(60, 40, 3), dtype=np.uint8)
        b = rng.integers(0, 256, size=(80, 50), dtype=np.uint8)  # gray, taller
        out = compare_composite(a, b, labels=("in", "out"))
        assert out.dtype == np.uint8 and out.ndim == 3
        assert out.shape[1] == 40 + 4 + 50
        assert out.shape[0] == 80 + 18   # tallest pane + label bar
        # the right pane carries b (letterboxed); divider column is white
        assert (out[:, 40 + 2] == 255).all()

    def test_face_no_eyes(self, tiny_image, tmp_path):
        from tpuimage.cli import face
        out = tmp_path / "f"
        face.main([tiny_image, "--out", str(out), "--no-eyes",
                   "--noise-type", "impulse"])
        assert (out / "enhanced_face.jpg").exists()

    def test_docscan(self, tiny_image, tmp_path):
        from tpuimage.cli import docscan as cli_docscan
        out = tmp_path / "d"
        cli_docscan.main([tiny_image, "--out", str(out), "--scale-long", "96",
                          "--mask-blur-ksize", "15", "--block-size", "15"])
        assert (out / "scan_08_clean.png").exists()
        assert (out / "scan_02_quad.png").exists()

    def test_classify(self, tiny_image, tmp_path):
        from tpuimage.cli import classify
        out = tmp_path / "c"
        classify.main([tiny_image, "--out", str(out), "--classifier", "weighted"])
        files = os.listdir(out)
        assert any(f.endswith("_enhanced.png") for f in files)
