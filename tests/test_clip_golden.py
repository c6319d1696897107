"""Torch-free pinned-logit CLIP golden (VERDICT r3 Next #6b): the FULL
zero-shot chain — real SimpleTokenizer (deterministic merges subset over
the 4 fixed prompts, AI_classification.py:51-56) -> Flax text tower ->
the documented ``.npz`` checkpoint contract -> load_from_checkpoint ->
PIL-exact preprocess -> vision tower -> cosine logits -> softmax — is
pinned against BOTH
  (1) hard-coded golden constants (computed once from the seeded
      synthetic ViT-B/32 state_dict; any drift in tokenizer, converter,
      towers, preprocess, or checkpoint plumbing breaks them), and
  (2) a fully independent oracle recomputed in-test: live-PIL preprocess
      + the f64 numpy transformer reference of test_clip_numerics.
With real laion2b weights absent (zero egress), this is the strongest
available end-to-end guarantee that a checkpoint drop-in classifies
correctly: every stage that real weights would flow through is exercised
and numerically pinned.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from test_clip_numerics import (make_state_dict, np_text_forward,
                                np_vision_forward)
from test_clip_preprocess import oracle_crop_u8, _MEAN, _STD
from tpuimage.classify import clip as C
from tpuimage.classify.tokenizer import SimpleTokenizer

# Golden constants, computed once from make_state_dict(seed=7) + the
# rng(5) test image below via the f64 oracle (this file's oracle path).
GOLDEN_LOGITS = np.array([2.79473168, -1.76850955, 7.76942806, 2.30309119])
GOLDEN_PROBS = np.array([6.83401187e-03, 7.12664693e-05,
                         9.88914888e-01, 4.17983343e-03])
GOLDEN_LABEL = "document"
GOLDEN_TOKENS_ROW0 = [610, 320, 564, 535, 581, 609, 527, 560, 513, 538,
                      599, 513, 591, 611]


def prompt_merges():
    """Deterministic BPE merges subset: fully merge every distinct word
    of the 4 prompts, left to right (multi-symbol merges + </w> endings,
    the same structure as the real bpe_simple_vocab_16e6 rules)."""
    words = sorted({w for p in C.PROMPTS.values() for w in p.lower().split()})
    merges = []
    for wd in words:
        if len(wd) < 2:
            continue
        syms = list(wd[:-1]) + [wd[-1] + "</w>"]
        while len(syms) > 1:
            merges.append((syms[0], syms[1]))
            syms = [syms[0] + syms[1]] + syms[2:]
    return merges


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    """Run the whole production chain once; return every intermediate."""
    sd = make_state_dict()
    tok = SimpleTokenizer(merges=prompt_merges())
    tokens = tok.tokenize([C.PROMPTS[l] for l in C.LABELS])
    params = C.convert_openclip_state_dict(sd)
    tf = C.compute_text_features(params, tokens)

    npz = dict(sd)
    npz["__text_features__"] = tf
    path = tmp_path_factory.mktemp("ckpt") / "golden.npz"
    np.savez(path, **npz)
    model = C.load_from_checkpoint(str(path))

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (300, 400, 3), np.uint8)
    label, probs = model.predict_array(img)
    return dict(sd=sd, tokens=tokens, tf=tf, img=img, label=label,
                probs=np.array([probs[l] for l in C.LABELS]))


class TestPinnedGolden:
    def test_tokenizer_pinned(self, chain):
        """SOT + one-token-per-word + EOT, ids pinned (vocab layout +
        merge algorithm + prompt text all frozen by these constants)."""
        t0 = chain["tokens"][0]
        n = len(GOLDEN_TOKENS_ROW0)
        np.testing.assert_array_equal(t0[:n], GOLDEN_TOKENS_ROW0)
        assert (t0[n:] == 0).all()
        assert [int((r != 0).sum()) for r in chain["tokens"]] == [14, 3, 17, 7]

    def test_text_features_match_numpy_oracle(self, chain):
        ref = np.stack([np_text_forward(chain["sd"],
                                        chain["tokens"][i].astype(np.int64))
                        for i in range(4)])
        np.testing.assert_allclose(chain["tf"], ref, rtol=0, atol=2e-4)

    def test_probs_pinned(self, chain):
        assert chain["label"] == GOLDEN_LABEL
        np.testing.assert_allclose(chain["probs"], GOLDEN_PROBS,
                                   rtol=0, atol=2e-3)

    def test_probs_match_independent_oracle(self, chain):
        """Recompute the full pipeline in f64 numpy + live PIL: bounds
        the production chain's total numeric drift, not just its drift
        from the day the constants were pinned."""
        sd, img = chain["sd"], chain["img"]
        pix = (oracle_crop_u8(img) / 255.0 - _MEAN) / _STD
        vf = np_vision_forward(sd, pix)
        vf = vf / np.linalg.norm(vf)
        tf = np.stack([np_text_forward(sd, chain["tokens"][i].astype(np.int64))
                       for i in range(4)])
        tf = tf / np.linalg.norm(tf, axis=-1, keepdims=True)
        logits = 100.0 * vf @ tf.T
        np.testing.assert_allclose(logits, GOLDEN_LOGITS, rtol=0, atol=1e-6)
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        np.testing.assert_allclose(chain["probs"], probs, rtol=0, atol=2e-3)
