"""Classifier, preset-DB, and CLIP-architecture tests."""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from tpuimage.classify import heuristic
from tpuimage import presets
from tpuimage.io.imageio import load_image_rgb


class TestHeuristicClassifiers:
    pytestmark = pytest.mark.slow
    def test_nightscape(self):
        rgb = load_image_rgb("/root/reference/public/nightview.png")[::2, ::2]
        assert heuristic.classify_priority(rgb) == "nightscape"
        label, probs = heuristic.classify_weighted(rgb)
        assert label == "nightscape"
        assert abs(sum(probs.values()) - 1.0) < 1e-6

    def test_document_priority(self):
        # the PRIORITY classifier (classification.py) routes document1 to
        # document (white 0.79, large rect). The WEIGHTED classifier
        # (AI_classification.py) genuinely scores it landscape (1.19 vs
        # 1.08 — the reference's own arithmetic); keep both behaviors.
        rgb = load_image_rgb("/root/reference/public/DIP test/document1.jpeg")
        assert heuristic.classify_priority(rgb) == "document"
        label, probs = heuristic.classify_weighted(rgb)
        assert label == "landscape"
        assert probs["document"] > 0.4  # close second

    def test_face(self):
        rgb = load_image_rgb("/root/reference/public/facewithnoise.jpg")
        assert heuristic.classify_priority(rgb) == "face"

    def test_landscape_bright_scene(self, rng):
        # bright scene whose Otsu-white fraction stays < 0.5 (scattered
        # highlights), no lines/faces -> landscape in both classifiers
        rgb = np.full((120, 160, 3), 100, np.uint8)
        bright = rng.random((120, 160)) < 0.35
        rgb[bright] = 210
        assert heuristic.classify_priority(rgb) == "landscape"
        label, _ = heuristic.classify_weighted(rgb)
        assert label == "landscape"

    def test_document_cues_match_reference_rules(self):
        rgb = load_image_rgb("/root/reference/public/DIP test/document1.jpeg")
        white_ratio, lines, large_rect = heuristic.document_cues(rgb)
        g = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        _, b = cv2.threshold(g, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        assert abs(white_ratio - float(np.mean(b == 255))) < 1e-6


class TestPresetDB:
    pytestmark = pytest.mark.slow
    def test_loads_all_groups(self):
        cat = presets.load_categorization_presets()
        enh = presets.load_enhancement_presets()
        for g in presets.GROUPS:
            assert any(k.startswith(g + "/") for k in cat), g
            assert any(k.startswith(g + "/") for k in enh), g
        # measured from the JSONs: enhancement 8+12+6+8+12=46,
        # categorization 8+9+6+8+12=43
        assert len(enh) == 46
        assert len(cat) == 43

    def test_apply_every_categorization_preset(self, rng):
        img = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
        for key, p in presets.load_categorization_presets().items():
            out = np.asarray(presets.apply_categorization_preset(img, p))
            assert out.shape == img.shape and out.dtype == np.uint8, key

    def test_apply_every_enhancement_preset(self, rng):
        img = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
        for key, p in presets.load_enhancement_presets().items():
            out = np.asarray(presets.apply_enhancement_preset(img, p))
            assert out.shape == img.shape and out.dtype == np.uint8, key

    def test_preset_semantics_linear_brightness(self):
        img = np.full((32, 32, 3), 100, np.uint8)
        p = presets.CategorizationPreset(name="t", group="g",
                                         brightness_mode="linear",
                                         brightness_beta=12)
        out = np.asarray(presets.apply_categorization_preset(img, p))
        assert np.all(out == 112)

    def test_preset_invert(self):
        img = np.full((8, 8, 3), 10, np.uint8)
        p = presets.CategorizationPreset(name="t", group="g", invert=True)
        assert np.all(np.asarray(presets.apply_categorization_preset(img, p)) == 245)


class TestClipArchitecture:
    pytestmark = pytest.mark.slow
    def test_vision_tower_shapes_and_convert(self, rng):
        from tpuimage.classify import clip as C

        # synthetic open_clip-layout state dict with the real shapes
        sd = {}
        sd["visual.conv1.weight"] = rng.normal(0, 0.02, (768, 3, 32, 32)).astype(np.float32)
        sd["visual.class_embedding"] = rng.normal(0, 0.02, (768,)).astype(np.float32)
        sd["visual.positional_embedding"] = rng.normal(0, 0.02, (50, 768)).astype(np.float32)
        sd["visual.proj"] = rng.normal(0, 0.02, (768, 512)).astype(np.float32)
        for pre, w in (("visual.ln_pre", 768), ("visual.ln_post", 768), ("ln_final", 512)):
            sd[pre + ".weight"] = np.ones(w, np.float32)
            sd[pre + ".bias"] = np.zeros(w, np.float32)
        for tower, n, w in (("visual.transformer", 12, 768), ("transformer", 12, 512)):
            for i in range(n):
                b = f"{tower}.resblocks.{i}"
                for lnn in ("ln_1", "ln_2"):
                    sd[f"{b}.{lnn}.weight"] = np.ones(w, np.float32)
                    sd[f"{b}.{lnn}.bias"] = np.zeros(w, np.float32)
                sd[f"{b}.attn.in_proj_weight"] = rng.normal(0, 0.02, (3 * w, w)).astype(np.float32)
                sd[f"{b}.attn.in_proj_bias"] = np.zeros(3 * w, np.float32)
                sd[f"{b}.attn.out_proj.weight"] = rng.normal(0, 0.02, (w, w)).astype(np.float32)
                sd[f"{b}.attn.out_proj.bias"] = np.zeros(w, np.float32)
                sd[f"{b}.mlp.c_fc.weight"] = rng.normal(0, 0.02, (4 * w, w)).astype(np.float32)
                sd[f"{b}.mlp.c_fc.bias"] = np.zeros(4 * w, np.float32)
                sd[f"{b}.mlp.c_proj.weight"] = rng.normal(0, 0.02, (w, 4 * w)).astype(np.float32)
                sd[f"{b}.mlp.c_proj.bias"] = np.zeros(w, np.float32)
        sd["token_embedding.weight"] = rng.normal(0, 0.02, (49408, 512)).astype(np.float32)
        sd["positional_embedding"] = rng.normal(0, 0.01, (77, 512)).astype(np.float32)
        sd["text_projection"] = rng.normal(0, 0.01, (512, 512)).astype(np.float32)

        params = C.convert_openclip_state_dict(sd)
        tf = rng.normal(0, 1, (4, 512)).astype(np.float32)
        model = C.ClipZeroShot(params, text_features=tf)
        batch = rng.integers(0, 256, size=(2, 224, 224, 3), dtype=np.uint8)
        probs = model.predict_batch(batch)
        assert probs.shape == (2, 4)
        np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
        label, pd = model.predict_array(batch[0])
        assert label in C.LABELS

    def test_text_tower_runs(self, rng):
        from tpuimage.classify.clip import TextTower
        tower = TextTower()
        toks = np.zeros((2, 77), np.int32)
        toks[:, 0] = 49406  # BOS
        toks[0, 1] = 320
        toks[:, 2] = 49407  # EOT
        params = tower.init(jax.random.PRNGKey(0), jnp.asarray(toks))
        out = tower.apply(params, jnp.asarray(toks))
        assert out.shape == (2, 512)


class TestTokenizer:
    def _toy(self):
        from tpuimage.classify.tokenizer import SimpleTokenizer
        # synthetic merges: build "lake</w>" and "face</w>" greedily
        merges = [("l", "a"), ("la", "k"), ("lak", "e</w>"),
                  ("f", "a"), ("fa", "c"), ("fac", "e</w>"),
                  ("a", "n</w>")]
        return SimpleTokenizer(merges=merges)

    def test_merge_algorithm(self):
        tok = self._toy()
        ids = tok.encode("lake")
        assert ids == [tok.encoder["lake</w>"]]
        ids2 = tok.encode("face lake")
        assert ids2 == [tok.encoder["face</w>"], tok.encoder["lake</w>"]]

    def test_tokenize_framing(self):
        tok = self._toy()
        arr = tok.tokenize(["lake", "an unknown-word"])
        assert arr.shape == (2, 77) and arr.dtype == np.int32
        assert arr[0, 0] == tok.sot and arr[0, 2] == tok.eot
        assert arr[0, 1] == tok.encoder["lake</w>"]
        assert (arr[0, 3:] == 0).all()
        # EOT position is where TextTower's argmax picks the embedding
        assert arr[1].max() == tok.eot

    def test_unknown_chars_fall_back_to_bytes(self):
        tok = self._toy()
        ids = tok.encode("zq")  # no merges apply
        assert len(ids) == 2  # 'z' + 'q</w>'


class TestRouter:
    def test_routes_night(self):
        from tpuimage.classify.router import classify_and_enhance
        rgb = load_image_rgb("/root/reference/public/nightview.png")[::4, ::4]
        label, probs, out = classify_and_enhance(rgb)
        assert label == "nightscape"
        assert out.shape == rgb.shape


class TestBatchClassify:
    pytestmark = pytest.mark.slow
    """Batch classify (one vmapped cue program + one Haar cascade pass)
    must produce identical labels to the per-image form."""

    def test_batch_matches_single(self, rng):
        from tpuimage.io.imageio import load_image_rgb
        imgs = [
            np.full((96, 96, 3), 230, np.uint8),                # bright/paper
            (rng.random((96, 96, 3)) * 40).astype(np.uint8),     # dark
            load_image_rgb("/root/reference/public/facewithnoise.jpg"),
        ]
        singles_p = [heuristic.classify_priority(im) for im in imgs]
        singles_w = [heuristic.classify_weighted(im) for im in imgs]
        assert heuristic.classify_priority_batch(imgs) == singles_p
        assert heuristic.classify_weighted_batch(imgs) == singles_w

    def test_cue_schedule_variants_bit_exact(self, rng):
        """Every CUE_SCHEDULE setting of the batched cue program (stacked
        canny, packed/radix vote schedules — round-4 levers for VERDICT
        Next #4) must reproduce jax.vmap(_device_cues) exactly."""
        import jax
        import jax.numpy as jnp
        from tpuimage.io.imageio import load_image_rgb
        from PIL import Image
        paths = ["/root/reference/public/facewithnoise.jpg",
                 "/root/reference/public/nightview.png"]
        imgs = [np.asarray(Image.fromarray(load_image_rgb(p)).resize(
            (128, 128)), dtype=np.uint8) for p in paths]
        imgs.append(np.full((128, 128, 3), 235, np.uint8))
        imgs.append(rng.integers(0, 256, (128, 128, 3), np.uint8))
        stack = jnp.asarray(np.stack(imgs))
        ref = jax.vmap(heuristic._device_cues)(stack)
        for sched in ({"canny_impl": "stacked"},
                      {"theta_pack": 2},
                      {"canny_impl": "stacked", "theta_pack": 4,
                       "vote_lo": 32},
                      {"theta_pack": 2, "vote_lo": 32}):
            got = heuristic._device_cues_batch(stack, **sched)
            for r, g in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(r), np.asarray(g)), sched
