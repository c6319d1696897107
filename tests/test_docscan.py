"""DocScanner pipeline tests: quad localization, post-warp stage parity
(bit-exact vs cv2 on the same warped input), deskew, batch consistency.

The committed outputs/ goldens came from a degenerate quad (SURVEY.md §2.1
C11) and the reference's HoughLinesP is random (and crashes on this cv2
build), so the parity contract is: (a) our deterministic localization finds
a sane document quad, (b) stages 04-08 match cv2 exactly given the same
warped page.
"""
import numpy as np
import cv2
import pytest

from tpuimage.pipelines import docscan

DOC1 = "/root/reference/public/DIP test/document1.jpeg"


@pytest.fixture(scope="module")
def doc_result(tmp_path_factory):
    out = tmp_path_factory.mktemp("scan")
    return docscan.process_document(DOC1, out_dir=str(out),
                                    config=docscan.GUI_DOCUMENT_CONFIG)


class TestPackBits:
    """The tunnel-transfer bit-pack must round-trip 0/255 maps exactly
    (scan_batch fetches edge maps and unrotated clean pages packed)."""

    def test_roundtrip_random(self, rng):
        for shape in ((3, 17, 23), (2, 64, 128), (1, 5, 8)):
            x = (rng.random(shape) < 0.4).astype(np.uint8) * 255
            packed = np.asarray(docscan._pack_bits_jit(x))
            assert packed.shape[-1] == -(-shape[-1] // 8)
            back = docscan._unpack_bits_host(packed, shape[-1])
            np.testing.assert_array_equal(back, x)

    def test_nonbinary_values_threshold(self):
        # any nonzero byte packs to a set bit (matches edges>0 semantics)
        x = np.asarray([[0, 1, 128, 255, 0, 0, 7, 0, 3]], np.uint8)
        back = docscan._unpack_bits_host(
            np.asarray(docscan._pack_bits_jit(x)), 9)
        np.testing.assert_array_equal(back, (x > 0).astype(np.uint8) * 255)


class TestApproxPolyDP:
    """Differential test of the cv2.approxPolyDP reconstruction (VERDICT
    round-1 weak #7): real-image contours, byte-identical for >=98% and
    same vertex count for all document-sized shapes."""

    SRCS = [DOC1, "/root/reference/public/DIP test/document2.png",
            "/root/reference/public/sample.jpg",
            "/root/reference/public/nightview.png"]

    def test_closed_matches_cv2_on_real_contours(self):
        from tpuimage.detect import contours as cnt
        tot = exact = 0
        for p in self.SRCS:
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            _, bin_ = cv2.threshold(img, 0, 255,
                                    cv2.THRESH_BINARY + cv2.THRESH_OTSU)
            cs, _ = cv2.findContours(bin_, cv2.RETR_LIST,
                                     cv2.CHAIN_APPROX_SIMPLE)
            for c in cs:
                if cv2.contourArea(c) < 50:
                    continue
                peri = cv2.arcLength(c, True)
                ref = cv2.approxPolyDP(c, 0.02 * peri, True).reshape(-1, 2)
                ours = np.asarray(cnt.approx_poly_dp(c.reshape(-1, 2),
                                                     0.02 * peri, True))
                tot += 1
                exact += np.array_equal(ref, ours)
                # large (document-scale) contours must be byte-identical —
                # residual tie-breaks only occur on small noisy spur blobs
                if cv2.contourArea(c) > 2000:
                    np.testing.assert_array_equal(ref, ours)
        assert tot > 500
        assert exact / tot >= 0.98, f"{exact}/{tot}"

    def test_open_matches_cv2(self):
        from tpuimage.detect import contours as cnt
        for c in (np.array([[0, 0], [5, 1], [10, 0], [15, 6], [20, 0]]),
                  np.array([[0, 0], [1, 0], [2, 3], [3, 0], [10, 1],
                            [20, 0], [21, 5]])):
            for eps in (0.5, 1.5, 4.0):
                ref = cv2.approxPolyDP(c.astype(np.int32).reshape(-1, 1, 2),
                                       eps, False).reshape(-1, 2)
                ours = np.asarray(cnt.approx_poly_dp(c, eps, False))
                np.testing.assert_array_equal(ref, ours)


class TestLocalize:
    pytestmark = pytest.mark.slow
    def test_quad_found_and_ordered(self, doc_result):
        quad = doc_result["quad"]
        assert quad is not None and not doc_result["use_whole"]
        tl, tr, br, bl = quad
        # ordering invariants (y-down coords)
        assert tl[0] + tl[1] <= br[0] + br[1]
        assert tr[0] >= tl[0] and br[1] >= tr[1]
        # document1 fills most of the frame: quad covers > 50% of the image
        from tpuimage.detect import contours as cnt
        img = cv2.imread(DOC1)
        ratio = cnt.contour_area(quad) / (img.shape[0] * img.shape[1])
        assert 0.5 < ratio <= 1.0

    def test_warp_is_a4_page(self, doc_result):
        w = np.asarray(doc_result["warped"])
        assert w.shape == (1200, 849, 3)  # A4 portrait @ scale_long 1200

    def test_document2_quad_and_pipeline(self, tmp_path):
        # SURVEY §7.6: the deterministic HoughLinesP substitute must also
        # behave on the second committed document (document2.png, 832x673,
        # page fills the frame). The reference's HoughLinesP is random (and
        # its (N,4) return shape crashes the reference on this cv2 build),
        # so the parity target is the quad: here the page occupies the full
        # frame and localization must return a (near-)full-frame quad, warp
        # to the A4 target, and run stages 04-08 to a clean binary.
        p = "/root/reference/public/DIP test/document2.png"
        res = docscan.process_document(p, out_dir=str(tmp_path),
                                       config=docscan.GUI_DOCUMENT_CONFIG)
        assert not res["use_whole"]
        from tpuimage.detect import contours as cnt
        img = cv2.imread(p)
        ratio = cnt.contour_area(res["quad"]) / (img.shape[0] * img.shape[1])
        assert ratio > 0.9
        binary = np.asarray(res["binary"])
        assert binary.shape == (1200, 849)
        assert set(np.unique(binary)) <= {0, 255}
        # a scanned text page: mostly white background, some ink
        frac_white = (binary == 255).mean()
        assert 0.6 < frac_white < 0.999

    def test_landscape_orientation_page(self, tmp_path):
        # rotate the document 90 degrees: the quad becomes wider than tall,
        # exercising the landscape branch of the warp target logic
        from PIL import Image
        rgb = np.asarray(Image.open(DOC1).convert("RGB"))
        rot = np.rot90(rgb).copy()
        p = tmp_path / "rot.png"
        Image.fromarray(rot).save(p)
        res = docscan.process_document(str(p), out_dir=None, save_stages=False,
                                       config=docscan.GUI_DOCUMENT_CONFIG)
        if not res["use_whole"]:
            # reference quirk preserved (DocScanner.py:137-139): the
            # landscape branch sets target_w = scale_long and target_h =
            # round(target_w * ratio), yielding a 1200x1697 canvas — taller
            # than wide — for a landscape quad.
            assert np.asarray(res["warped"]).shape == (1697, 1200, 3)
        assert np.asarray(res["binary"]).ndim == 2


class TestPostWarpParity:
    pytestmark = pytest.mark.slow
    @pytest.mark.parametrize("cfg", [docscan.GUI_DOCUMENT_CONFIG,
                                     docscan.DocScanConfig(scale_long=1200)])
    def test_stages_bit_exact(self, doc_result, cfg):
        warped = np.asarray(doc_result["warped"])
        ours = docscan.docscan_post_warp(warped, cfg)
        for name, ref in _cv2_pre_deskew_oracle(warped, cfg).items():
            d = np.abs(ref.astype(int) - np.asarray(ours[name]).astype(int))
            assert d.max() == 0, f"{name}: maxdiff {d.max()}"

    # varied configs: even ksizes (bump logic), mean threshold, negative C,
    # zero dilate iters, huge offset (threshold clamps at 0), big blur frac
    @pytest.mark.parametrize("cfg", [
        docscan.DocScanConfig(illum_method="subtract", thresh_method="mean",
                              block_size=21, C=-3, mask_blur_ksize=31,
                              blackhat_ksize=15, blackhat_vertical_ratio=0.5),
        docscan.DocScanConfig(illum_method="divide", block_size=16, C=0,
                              mask_blur_ksize=20, ink_dilate_iters=0,
                              mask_thresh_offset=0),
        docscan.DocScanConfig(illum_blur_frac=0.2, mask_thresh_offset=100,
                              ink_dilate_iters=2, blackhat_ksize=4),
    ])
    def test_stage_parity_config_fuzz(self, rng, cfg):
        """Pre-deskew stage parity vs a cv2 composition on RANDOM content
        and off-default configs — breadth for the bit-exactness claim."""
        for shape in ((231, 177, 3), (96, 128, 3)):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            ours = docscan.docscan_post_warp(img, cfg)
            for name, ref in _cv2_pre_deskew_oracle(img, cfg).items():
                d = np.abs(ref.astype(int)
                           - np.asarray(ours[name]).astype(int))
                assert d.max() == 0, f"{cfg}: {name}: maxdiff {d.max()}"

    def test_deskew_angle_matches_cv2(self, doc_result):
        cfg = docscan.GUI_DOCUMENT_CONFIG
        warped = np.asarray(doc_result["warped"])
        ours = docscan.docscan_post_warp(warped, cfg)
        weighted = np.asarray(ours["weighted"])
        edges = cv2.Canny(weighted, cfg.canny_low, cfg.canny_high)
        lines = cv2.HoughLines(edges, 1, np.pi / 180, 150)
        if lines is None or len(lines) == 0:
            ref_angle = 0.0
        else:
            thetas = lines.reshape(-1, 2)[:, 1]
            angs = (thetas * 180.0 / np.pi + 90.0) % 180.0 - 90.0
            ref_angle = float(np.median(angs))
            if abs(ref_angle) > cfg.max_rotate:
                ref_angle = 0.0
        assert abs(float(ours["deskew_angle"]) - ref_angle) < 1.0

    def test_zero_angle_deskew_is_identity(self, doc_result):
        stages = doc_result["stages"]
        if float(stages["deskew_angle"]) == 0.0:
            assert np.array_equal(np.asarray(stages["deskew"]),
                                  np.asarray(stages["weighted"]))


class TestBatch:
    pytestmark = pytest.mark.slow
    def test_post_warp_batch_matches_single(self, doc_result):
        warped = np.asarray(doc_result["warped"])[:256, :256]
        batch = np.stack([warped, warped[:, ::-1]])
        cfg = docscan.GUI_DOCUMENT_CONFIG
        single = docscan.docscan_post_warp(warped, cfg)
        batched = docscan.docscan_post_warp_batch(batch, cfg)
        assert np.array_equal(np.asarray(batched["clean"][0]),
                              np.asarray(single["clean"]))

    def test_post_warp_batch_chunked_matches_unchunked(self, doc_result):
        """lax.map batch-chunking (the b32-regression mitigation) must be
        bit-identical to the whole-batch vmap, including when only SOME
        chunks take the rotation branch (the batch-level rotation cond
        becomes per-chunk; angle==0 rotation is exact identity, so the
        unchunked form rotating every page equals the chunked form
        rotating one chunk)."""
        # synthetic page with long VERTICAL rules (the deskew Hough maps
        # near-vertical strokes, theta ~ 0/180, to the rotation angle —
        # a real document crop this small clears no 150-vote Hough peak
        # and silently tested nothing; ADVICE r4), rotated 3 degrees
        page = np.full((256, 256, 3), 255, np.uint8)
        for x in range(24, 240, 36):
            cv2.rectangle(page, (x, 8), (x + 3, 247), (0, 0, 0), -1)
        m = cv2.getRotationMatrix2D((128.0, 128.0), 3.0, 1.0)
        tilted = cv2.warpAffine(page, m, (256, 256),
                                flags=cv2.INTER_LINEAR,
                                borderMode=cv2.BORDER_REPLICATE)
        # chunk 0: edge-free pages (deskew angle exactly 0 — no Canny
        # edges, no Hough lines); chunk 1: tilted rules (angle != 0)
        flat = np.full_like(page, 255)
        gray = np.full_like(page, 128)
        batch = np.stack([flat, gray, tilted, tilted[::-1]])
        cfg = docscan.GUI_DOCUMENT_CONFIG
        full = docscan.docscan_post_warp_batch(batch, cfg, chunk=0)
        chunked = docscan.docscan_post_warp_batch(batch, cfg, chunk=2)
        angles = np.asarray(full["deskew_angle"])
        assert (angles[:2] == 0.0).all() and (angles[2:] != 0.0).all(), \
            "fixture no longer exercises a mixed rotate/no-rotate chunk split"
        for k in full:
            np.testing.assert_array_equal(np.asarray(full[k]),
                                          np.asarray(chunked[k]), err_msg=k)

    def test_post_warp_batch_rejects_non_divisor_chunk(self, doc_result):
        warped = np.asarray(doc_result["warped"])[:64, :64]
        batch = np.stack([warped] * 3)
        with pytest.raises(ValueError, match="does not divide"):
            docscan.docscan_post_warp_batch(batch, docscan.GUI_DOCUMENT_CONFIG,
                                            chunk=2)


class TestScanBatch:
    pytestmark = pytest.mark.slow
    def test_batch_matches_process_document(self, doc_result, tmp_path):
        from PIL import Image
        import jax
        from tpuimage.runtime.mesh import make_mesh
        # two copies of the doc + one broken path, DP-sharded over 8 devices
        inputs = [DOC1, str(tmp_path / "missing.png"), DOC1]
        results = docscan.scan_batch(inputs, config=docscan.GUI_DOCUMENT_CONFIG,
                                     mesh=make_mesh(8))
        assert "error" in results[1]
        for r in (results[0], results[2]):
            assert r["binary"].shape == (1200, 849)
            np.testing.assert_array_equal(r["binary"],
                                          np.asarray(doc_result["binary"]))

    def test_per_image_isolation_within_group(self, monkeypatch):
        """One image whose HOST-side quad fit or homography solve fails
        must not poison the other images of its shape group (scan_batch
        docstring contract; round-3 review finding)."""
        from PIL import Image
        with Image.open(DOC1) as im:
            doc = np.asarray(im.convert("RGB"))
        cfg = docscan.GUI_DOCUMENT_CONFIG

        # (a) quad-fit failure in the localize host half, 2nd image only
        calls = {"n": 0}
        real = docscan._quad_from_localize

        def boom_second(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("synthetic quad-fit failure")
            return real(*a, **kw)

        monkeypatch.setattr(docscan, "_quad_from_localize", boom_second)
        results = docscan.scan_batch([doc, doc, doc], config=cfg)
        monkeypatch.undo()
        assert "error" in results[1]
        assert "synthetic quad-fit" in results[1]["error"]
        for r in (results[0], results[2]):
            assert "binary" in r and r["binary"].shape == (1200, 849)

        # (b) singular homography for the 2nd image only
        calls["n"] = 0
        real_gpt = docscan.geometry.get_perspective_transform

        def singular_second(src, dst):
            calls["n"] += 1
            if calls["n"] == 2:
                return np.zeros((3, 3), np.float32)  # np.linalg.inv raises
            return real_gpt(src, dst)

        monkeypatch.setattr(docscan.geometry, "get_perspective_transform",
                            singular_second)
        results = docscan.scan_batch([doc, doc, doc], config=cfg)
        assert "error" in results[1]
        for r in (results[0], results[2]):
            assert "binary" in r and r["binary"].shape == (1200, 849)

    def test_pipeline_chunk_matches_plain(self, rng):
        """scan_batch(pipeline_chunk=k) drives k-sized sub-batches through
        scan_stream's cross-batch scheduler inside ONE call (the serial
        serve path's intra-batch overlap; VERDICT r4 item 1b) — per-image
        results, ordering, and error isolation must be identical to the
        plain four-phase path, including a non-divisor chunk (last
        sub-batch short) and a failing input."""
        cfg = docscan.DocScanConfig(scale_long=200, mask_blur_ksize=15,
                                    block_size=15)
        from PIL import Image
        with Image.open(DOC1) as im:
            doc = np.asarray(im.convert("RGB"))
        flat = np.full((120, 160, 3), 200, np.uint8)
        inputs = [doc, flat, "/nonexistent.png", doc, doc]
        plain = docscan.scan_batch(inputs, config=cfg)
        piped = docscan.scan_batch(inputs, config=cfg, pipeline_chunk=2)
        assert len(plain) == len(piped) == len(inputs)
        for p, q in zip(plain, piped):
            assert ("error" in p) == ("error" in q)
            if "error" in p:
                continue
            assert p["use_whole"] == q["use_whole"]
            np.testing.assert_array_equal(p["binary"], q["binary"])

    def test_mixed_shape_batch(self, rng):
        """Quad pages + use-whole fallbacks of two different shapes in one
        batch: each shape group processes separately, every result matches
        the per-image process_document path (scan_batch docstring)."""
        from PIL import Image
        cfg = docscan.DocScanConfig(scale_long=200, mask_blur_ksize=15,
                                    block_size=15)
        flat_a = np.full((120, 160, 3), 200, np.uint8)           # landscape
        flat_b = rng.integers(180, 220, size=(160, 100, 3)).astype(np.uint8)
        with Image.open(DOC1) as im:
            doc = np.asarray(im.convert("RGB"))
        inputs = [flat_a, doc, flat_b, flat_a]
        results = docscan.scan_batch(inputs, config=cfg)
        assert all("binary" in r for r in results)
        shapes = [r["binary"].shape for r in results]
        assert shapes[0] == shapes[3] and shapes[0] != shapes[2]
        for inp, r in zip(inputs, results):
            single = docscan.process_document(inp, out_dir=None,
                                              save_stages=False, config=cfg)
            assert r["use_whole"] == single["use_whole"]
            np.testing.assert_array_equal(r["binary"],
                                          np.asarray(single["binary"]))


    def test_fallback_common_shape_bounds_groups(self, rng):
        """fallback_common_shape=True: use-whole pages of hostile mixed
        aspects collapse into the config's page-shape groups (at most 2
        compiles per batch), each flagged with fallback_resized_to, and
        each equal to process_document run on the same pre-resized input
        (the resize is the ONLY difference)."""
        from tpuimage.ops import geometry
        import jax.numpy as jnp
        cfg = docscan.DocScanConfig(scale_long=200, mask_blur_ksize=15,
                                    block_size=15)
        # three distinct fallback aspects: 2 portrait, 1 landscape
        fb = [rng.integers(180, 220, size=s + (3,)).astype(np.uint8)
              for s in [(160, 100), (180, 90), (120, 160)]]
        results = docscan.scan_batch(fb, config=cfg,
                                     fallback_common_shape=True)
        assert all(r["use_whole"] and "binary" in r for r in results)
        # portrait pages share ONE shape; landscape is the other
        assert results[0]["binary"].shape == results[1]["binary"].shape \
            == (200, 141)
        assert results[2]["binary"].shape == (283, 200)
        for r in results:
            assert r["fallback_resized_to"] == r["binary"].shape
        # parity: identical to the exact path on the pre-resized input.
        # The landscape group's long side is 283 > scale_long (the
        # reference's own landscape formula, DocScanner.py:135-137), so
        # the oracle config's scale_long must match the fallback shape's
        # long side or process_document would re-shrink the input.
        import dataclasses
        for img, r in zip(fb, results):
            th, tw = r["fallback_resized_to"]
            pre = np.asarray(geometry.resize(jnp.asarray(img), th, tw,
                                             "area"))
            ocfg = dataclasses.replace(cfg, scale_long=max(th, tw))
            single = docscan.process_document(pre, out_dir=None,
                                              save_stages=False, config=ocfg)
            np.testing.assert_array_equal(r["binary"],
                                          np.asarray(single["binary"]))

    def test_scan_batch_tiled_warp_matches_gather(self):
        """WARP_IMPL='tiled' (the TPU serving default) through the FULL
        scan_batch path vs the gather warp: the warped pages differ by at
        most the +-1-LSB float contract, so the post-warp binary may flip
        only isolated threshold-boundary pixels."""
        from PIL import Image
        cfg = docscan.DocScanConfig(scale_long=400, mask_blur_ksize=15,
                                    block_size=15)
        with Image.open(DOC1) as im:
            doc = np.asarray(im.convert("RGB"))
        old = docscan.WARP_IMPL
        try:
            docscan.WARP_IMPL = "tiled"
            tiled = docscan.scan_batch([doc, doc], config=cfg)
            docscan.WARP_IMPL = "gather"
            gather = docscan.scan_batch([doc, doc], config=cfg)
        finally:
            docscan.WARP_IMPL = old
        for t, g in zip(tiled, gather):
            assert not t.get("use_whole") and not g.get("use_whole")
            diff = (t["binary"] != g["binary"]).mean()
            assert diff < 0.002, diff

    @pytest.mark.parametrize("prefetch", [False, True])
    def test_scan_stream_matches_scan_batch(self, tmp_path, prefetch):
        """Pipelined scan_stream yields, per batch and in order, EXACTLY
        what scan_batch returns — including per-image error isolation,
        quad + use-whole mixes, and a trailing short batch. (The stream
        only reorders dispatch/fetch across batches — and with
        prefetch=True runs the next batch's phase 1 on a worker thread;
        the math is the same phase functions either way.)"""
        from PIL import Image
        cfg = docscan.DocScanConfig(scale_long=200, mask_blur_ksize=15,
                                    block_size=15)
        with Image.open(DOC1) as im:
            doc = np.asarray(im.convert("RGB"))
        flat = np.full((120, 160, 3), 200, np.uint8)
        batches = [[doc, str(tmp_path / "missing.png")],
                   [flat, doc],
                   [flat]]
        streamed = list(docscan.scan_stream(iter(batches), config=cfg,
                                            prefetch=prefetch))
        serial = [docscan.scan_batch(b, config=cfg) for b in batches]
        assert len(streamed) == len(serial) == 3
        for got_batch, want_batch in zip(streamed, serial):
            assert len(got_batch) == len(want_batch)
            for got, want in zip(got_batch, want_batch):
                assert ("error" in got) == ("error" in want)
                if "error" in got:
                    continue
                assert got["use_whole"] == want["use_whole"]
                np.testing.assert_array_equal(got["binary"], want["binary"])
                assert got["deskew_overflow"] == want["deskew_overflow"]


class TestFallback:
    def test_use_whole_on_featureless_image(self, tmp_path):
        from PIL import Image
        flat = np.full((120, 160, 3), 200, np.uint8)
        p = tmp_path / "flat.png"
        Image.fromarray(flat).save(p)
        res = docscan.process_document(str(p), out_dir=None, save_stages=False,
                                       config=docscan.DocScanConfig(scale_long=200))
        assert res["use_whole"]
        assert np.asarray(res["binary"]).ndim == 2

    def test_fallback_disabled_raises(self, tmp_path):
        from PIL import Image
        import dataclasses
        flat = np.full((120, 160, 3), 200, np.uint8)
        p = tmp_path / "flat.png"
        Image.fromarray(flat).save(p)
        cfg = dataclasses.replace(docscan.DocScanConfig(scale_long=200),
                                  fallback_use_whole=False)
        with pytest.raises(RuntimeError):
            docscan.process_document(str(p), out_dir=None, save_stages=False, config=cfg)


def _cv2_pre_deskew_oracle(warped, cfg):
    gray = cv2.cvtColor(warped[..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
    h, w = gray.shape
    base = max(15, int(round(min(h, w) * cfg.illum_blur_frac)))
    base += base % 2 == 0
    bg = cv2.GaussianBlur(gray, (base, base), 0)
    if cfg.illum_method == "divide":
        tmp = cv2.divide(gray, bg, scale=255)
    else:
        tmp = cv2.subtract(gray, bg)
    illum = cv2.normalize(tmp, None, 0, 255, cv2.NORM_MINMAX)
    stretch = cv2.normalize(illum, None, 0, 255, cv2.NORM_MINMAX)

    mbk = cfg.mask_blur_ksize + (cfg.mask_blur_ksize % 2 == 0)
    bg2 = cv2.GaussianBlur(stretch, (mbk, mbk), 0)
    ink = cv2.normalize(cv2.subtract(bg2, stretch), None, 0, 255, cv2.NORM_MINMAX)
    t, _ = cv2.threshold(ink, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    _, ms = cv2.threshold(ink, max(0, int(round(t - cfg.mask_thresh_offset))),
                          255, cv2.THRESH_BINARY)
    bk = max(cfg.blackhat_ksize, 3)
    bk += bk % 2 == 0
    bh_h = max(3, int(round(bk * cfg.blackhat_vertical_ratio)))
    bh_h += bh_h % 2 == 0
    kv = cv2.getStructuringElement(cv2.MORPH_RECT, (bk, bh_h))
    bh = cv2.normalize(cv2.morphologyEx(stretch, cv2.MORPH_BLACKHAT, kv),
                       None, 0, 255, cv2.NORM_MINMAX)
    t2, _ = cv2.threshold(bh, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    _, mb = cv2.threshold(bh, max(0, int(round(t2 - cfg.mask_thresh_offset))),
                          255, cv2.THRESH_BINARY)
    mask = cv2.max(ms, mb)
    mask = cv2.dilate(mask, cv2.getStructuringElement(cv2.MORPH_RECT, (2, 2)),
                      iterations=cfg.ink_dilate_iters)
    bs = cfg.block_size + (cfg.block_size % 2 == 0)
    algo = (cv2.ADAPTIVE_THRESH_GAUSSIAN_C if cfg.thresh_method == "gaussian"
            else cv2.ADAPTIVE_THRESH_MEAN_C)
    ab = cv2.adaptiveThreshold(stretch, 255, algo, cv2.THRESH_BINARY, bs, cfg.C)
    wt = ab.copy()
    wt[mask == 0] = 255
    return {"illum": illum, "stretch": stretch, "inkmask": mask,
            "adapt": ab, "weighted": wt}
