"""CLIP tower numeric verification WITHOUT pretrained weights (VERDICT
round-1 Next #7): a pure-numpy transformer forward faithful to torch
CLIP/open_clip semantics (LayerNorm eps=1e-5, in_proj q/k/v row split,
per-head 1/sqrt(hd) scaling, exact + quick GELU, causal text mask, argmax
EOT pooling) is asserted against the Flax towers with SHARED random
weights in torch state_dict layout — so the converter round-trip
(torch-layout dict -> Flax tree -> apply) is exercised on every key.

Real laion2b weights are environment-blocked (zero egress); these tests
prove the architecture + converter reproduce torch numerics when a
checkpoint is present, and that ClipZeroShot actually produces
predictions end-to-end.
"""
import numpy as np
import pytest
from scipy.special import erf

import jax.numpy as jnp

from tpuimage.classify import clip as C


def _rand(rng, *shape, scale=0.02):
    return rng.standard_normal(shape).astype(np.float32) * scale


def make_state_dict(seed: int = 7):
    """Random torch-layout state_dict with real ViT-B/32 shapes (shared
    with tests/test_clip_golden.py)."""
    rng = np.random.default_rng(seed)
    sd = {}
    sd["visual.conv1.weight"] = _rand(rng, 768, 3, 32, 32)
    sd["visual.class_embedding"] = _rand(rng, 768)
    sd["visual.positional_embedding"] = _rand(rng, 50, 768)
    for p, w in (("visual.ln_pre", 768), ("visual.ln_post", 768),
                 ("ln_final", 512)):
        sd[p + ".weight"] = 1.0 + _rand(rng, w)
        sd[p + ".bias"] = _rand(rng, w)
    sd["visual.proj"] = _rand(rng, 768, 512)
    sd["token_embedding.weight"] = _rand(rng, 49408, 512)
    sd["positional_embedding"] = _rand(rng, 77, 512)
    sd["text_projection"] = _rand(rng, 512, 512)

    def add_block(prefix, width):
        sd[f"{prefix}.ln_1.weight"] = 1.0 + _rand(rng, width)
        sd[f"{prefix}.ln_1.bias"] = _rand(rng, width)
        sd[f"{prefix}.ln_2.weight"] = 1.0 + _rand(rng, width)
        sd[f"{prefix}.ln_2.bias"] = _rand(rng, width)
        sd[f"{prefix}.attn.in_proj_weight"] = _rand(rng, 3 * width, width)
        sd[f"{prefix}.attn.in_proj_bias"] = _rand(rng, 3 * width)
        sd[f"{prefix}.attn.out_proj.weight"] = _rand(rng, width, width)
        sd[f"{prefix}.attn.out_proj.bias"] = _rand(rng, width)
        sd[f"{prefix}.mlp.c_fc.weight"] = _rand(rng, 4 * width, width)
        sd[f"{prefix}.mlp.c_fc.bias"] = _rand(rng, 4 * width)
        sd[f"{prefix}.mlp.c_proj.weight"] = _rand(rng, width, 4 * width)
        sd[f"{prefix}.mlp.c_proj.bias"] = _rand(rng, width)

    for i in range(12):
        add_block(f"visual.transformer.resblocks.{i}", 768)
        add_block(f"transformer.resblocks.{i}", 512)
    return sd


@pytest.fixture(scope="module")
def sd():
    return make_state_dict()


# ---------------------------------------------------------------------------
# pure-numpy reference forward (torch semantics, computed in f64)
# ---------------------------------------------------------------------------

def np_ln(x, w, b, eps=1e-5):  # torch nn.LayerNorm default eps
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_gelu(x, quick):
    if quick:
        return x / (1.0 + np.exp(-1.702 * x))
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_mha(x, sd, prefix, heads, mask=None):
    L, D = x.shape
    qkv = x @ sd[f"{prefix}.in_proj_weight"].T.astype(np.float64) \
        + sd[f"{prefix}.in_proj_bias"]
    q, k, v = np.split(qkv, 3, axis=-1)        # torch row order: q, k, v
    hd = D // heads

    def heads_of(t):
        return t.reshape(L, heads, hd).transpose(1, 0, 2)

    q, k, v = map(heads_of, (q, k, v))
    att = q @ k.transpose(0, 2, 1) / np.sqrt(hd)
    if mask is not None:
        att = att + mask
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    out = (att @ v).transpose(1, 0, 2).reshape(L, D)
    return out @ sd[f"{prefix}.out_proj.weight"].T.astype(np.float64) \
        + sd[f"{prefix}.out_proj.bias"]


def np_block(x, sd, prefix, heads, quick, mask=None):
    x = x + np_mha(np_ln(x, sd[f"{prefix}.ln_1.weight"],
                         sd[f"{prefix}.ln_1.bias"]), sd, f"{prefix}.attn",
                   heads, mask)
    h = np_ln(x, sd[f"{prefix}.ln_2.weight"], sd[f"{prefix}.ln_2.bias"])
    h = np_gelu(h @ sd[f"{prefix}.mlp.c_fc.weight"].T.astype(np.float64)
                + sd[f"{prefix}.mlp.c_fc.bias"], quick)
    h = h @ sd[f"{prefix}.mlp.c_proj.weight"].T.astype(np.float64) \
        + sd[f"{prefix}.mlp.c_proj.bias"]
    return x + h


def np_vision_forward(sd, pixels, quick=False):
    """pixels: (224, 224, 3) normalized f64 -> (512,)"""
    w = sd["visual.conv1.weight"].astype(np.float64)    # (768, 3, 32, 32)
    patches = pixels.reshape(7, 32, 7, 32, 3).transpose(0, 2, 1, 3, 4)
    x = np.einsum("pqyxc,ocyx->pqo", patches, w).reshape(49, 768)
    x = np.concatenate([sd["visual.class_embedding"][None].astype(np.float64), x], 0)
    x = x + sd["visual.positional_embedding"]
    x = np_ln(x, sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"])
    for i in range(12):
        x = np_block(x, sd, f"visual.transformer.resblocks.{i}", 12, quick)
    x = np_ln(x[0], sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
    return x @ sd["visual.proj"].astype(np.float64)


def np_text_forward(sd, tokens, quick=False):
    """tokens: (77,) int -> (512,)"""
    x = sd["token_embedding.weight"].astype(np.float64)[tokens]
    x = x + sd["positional_embedding"]
    mask = np.triu(np.full((77, 77), -1e9), k=1)
    for i in range(12):
        x = np_block(x, sd, f"transformer.resblocks.{i}", 8, quick, mask)
    x = np_ln(x, sd["ln_final.weight"], sd["ln_final.bias"])
    eot = int(np.argmax(tokens))
    return x[eot] @ sd["text_projection"].astype(np.float64)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestTowerNumerics:
    @pytest.mark.parametrize("quick", [False, True])
    def test_vision_tower_matches_numpy(self, sd, quick):
        params = C.convert_openclip_state_dict(sd)
        rng = np.random.default_rng(11)
        img = rng.standard_normal((224, 224, 3)).astype(np.float32)
        ref = np_vision_forward(sd, img.astype(np.float64), quick)
        tower = C.VisionTower(quick_gelu=quick)
        ours = np.asarray(tower.apply({"params": params["vision"]},
                                      jnp.asarray(img)[None]))[0]
        np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-4)

    @pytest.mark.parametrize("quick", [False, True])
    def test_text_tower_matches_numpy(self, sd, quick):
        params = C.convert_openclip_state_dict(sd)
        rng = np.random.default_rng(13)
        tokens = np.zeros(77, np.int64)
        tokens[0] = 49406                       # start of text
        n = 9
        tokens[1:1 + n] = rng.integers(1, 49000, n)
        tokens[1 + n] = 49407                   # end of text (max id)
        ref = np_text_forward(sd, tokens, quick)
        ours = C.compute_text_features(params, tokens[None], quick_gelu=quick)[0]
        np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-4)

    def test_eot_pooling_position(self, sd):
        """Moving the EOT token must change which sequence position is
        pooled (argmax semantics)."""
        params = C.convert_openclip_state_dict(sd)
        t1 = np.zeros(77, np.int64); t1[0] = 49406; t1[3] = 49407
        t2 = t1.copy(); t2[3] = 5; t2[10] = 49407
        f1 = C.compute_text_features(params, t1[None])[0]
        f2 = C.compute_text_features(params, t2[None])[0]
        assert not np.allclose(f1, f2)


class TestZeroShotEndToEnd:
    pytestmark = pytest.mark.slow
    def test_predict_with_random_checkpoint(self, sd, tmp_path):
        """ClipZeroShot produces a prediction from a converted random
        checkpoint incl. the __text_features__ precompute contract."""
        params = C.convert_openclip_state_dict(sd)
        tokens = np.zeros((4, 77), np.int64)
        tokens[:, 0] = 49406
        for i in range(4):
            tokens[i, 1] = 100 + i
            tokens[i, 2] = 49407
        tf = C.compute_text_features(params, tokens)
        assert tf.shape == (4, 512)

        # save/load round-trip through the documented .npz layout
        npz = dict(sd)
        npz["__text_features__"] = tf
        npz["__logit_scale__"] = np.float32(100.0)
        path = tmp_path / "ckpt.npz"
        np.savez(path, **npz)
        model = C.load_from_checkpoint(str(path))

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
        label, probs = model.predict_array(img)
        assert label in C.LABELS
        np.testing.assert_allclose(sum(probs.values()), 1.0, atol=1e-5)
        # batch == single
        pb = model.predict_batch(np.stack([img, img]))
        np.testing.assert_allclose(pb[0], pb[1], atol=0)
        np.testing.assert_allclose(
            pb[0], np.array([probs[l] for l in C.LABELS]), atol=1e-6)
