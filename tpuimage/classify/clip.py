"""CLIP ViT-B/32 zero-shot classifier in Flax (batched JAX inference).

Replaces the torch+open_clip ClipZeroShot of AI_classification.py:152-188
(ViT-B-32, laion2b_s34b_b79k weights, prompts :51-56, logits = softmax of
100 * img @ txt^T :176-181). The reference lazily downloads weights on
first run (:794) and falls back to the heuristic classifier when
open_clip is unavailable (:787-800) — this module mirrors that contract:
architecture + converter are always available; actual weights load from a
local torch checkpoint (zero-egress environments fall back to
tpuimage.classify.heuristic exactly like the reference).

Design notes (TPU): inference is a single jit program over an NHWC uint8
batch — preprocess (resize 224 bicubic + center crop + normalize) runs
on-device; the 4 text prompts are fixed so their embeddings are computed
once (or shipped precomputed) and the per-image work is one ViT forward +
a (B, 512) @ (512, 4) matmul.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from tpuimage.ops.pil_resize import pil_resize_bicubic

LABELS = ["nightscape", "landscape", "document", "face"]
# AI_classification.py:51-56
PROMPTS = {
    "nightscape": "a night cityscape photograph with bright lights and dark sky and road",
    "landscape": "lake",
    "document": "a scanned paper document page with text on a white background",
    "face": "a human face portrait photograph",
}

# OpenAI CLIP normalization constants (used by open_clip's ViT-B-32 transform)
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


# torch nn.LayerNorm (which CLIP/open_clip use) defaults to eps=1e-5;
# flax defaults to 1e-6 — converted checkpoints need torch semantics
# (caught by the numpy-reference verification, tests/test_clip_numerics.py)
_LN = functools.partial(nn.LayerNorm, epsilon=1e-5)


class _MHA(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        B, L, D = x.shape
        qkv = nn.Dense(3 * D, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // self.heads

        def split_heads(t):
            return t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if mask is not None:
            att = att + mask
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, name="out_proj")(out)


class _Block(nn.Module):
    width: int
    heads: int
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + _MHA(self.width, self.heads, name="attn")(
            _LN(name="ln_1")(x), mask)
        h = _LN(name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="mlp_fc")(h)
        if self.quick_gelu:
            # OpenAI-pretrained CLIP checkpoints ("*-quickgelu" in open_clip)
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            # open_clip's ViT-B-32 laion2b_s34b_b79k (the reference's
            # weights, AI_classification.py:157-159) trains with exact GELU
            h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, name="mlp_proj")(h)
        return x + h


class VisionTower(nn.Module):
    """ViT-B/32 image encoder: 224x224 -> 512-d embedding."""
    width: int = 768
    layers: int = 12
    heads: int = 12
    patch: int = 32
    out_dim: int = 512
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, pixels):               # (B, 224, 224, 3) normalized
        B = pixels.shape[0]
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), use_bias=False,
                    name="patch_embed")(pixels)
        x = x.reshape(B, -1, self.width)      # (B, 49, W)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], 1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], self.width))
        x = x + pos
        x = _LN(name="ln_pre")(x)
        for i in range(self.layers):
            x = _Block(self.width, self.heads, self.quick_gelu,
                       name=f"block_{i}")(x)
        x = _LN(name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.out_dim))
        return x @ proj


class TextTower(nn.Module):
    """CLIP text encoder: 77 BPE tokens -> 512-d embedding."""
    vocab: int = 49408
    ctx: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    out_dim: int = 512
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, tokens):               # (B, 77) int32
        x = nn.Embed(self.vocab, self.width, name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.ctx, self.width))
        x = x + pos
        mask = jnp.full((self.ctx, self.ctx), -1e9)
        mask = jnp.triu(mask, k=1)[None, None]
        for i in range(self.layers):
            x = _Block(self.width, self.heads, self.quick_gelu,
                       name=f"block_{i}")(x, mask)
        x = _LN(name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)     # highest id = end-of-text
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (self.width, self.out_dim))
        return x @ proj


def _resize_output_size(h: int, w: int, short: int = 224) -> Tuple[int, int]:
    """torchvision ``Resize(int)`` geometry (_compute_resized_output_size):
    short side -> ``short``, long side -> int(short * long / short_in) —
    TRUNCATED, not rounded."""
    if w <= h:
        return int(short * h / w), short
    return short, int(short * w / h)


def _center_crop_origin(size: int, crop: int) -> int:
    """torchvision ``CenterCrop`` offset: int(round((size - crop) / 2.0))
    — Python 3 banker's rounding on the .5 case (odd margins)."""
    return int(round((size - crop) / 2.0))


def preprocess_crop_u8(img: jnp.ndarray) -> jnp.ndarray:
    """open_clip ViT-B-32 eval transform, uint8 stage: torchvision
    Resize(224, BICUBIC) + CenterCrop(224) over one (H, W, 3) uint8 image
    — BIT-EXACT vs the PIL/torchvision host pipeline (the resample is
    Pillow's fixed-point bicubic reproduced in ops/pil_resize.py; the
    size/offset arithmetic follows torchvision's truncation/banker's
    rounding). Shapes are static, so under jit this traces to two
    integer matmuls + a static slice."""
    h, w = int(img.shape[0]), int(img.shape[1])
    nh, nw = _resize_output_size(h, w)
    out = pil_resize_bicubic(img, nh, nw)
    top = _center_crop_origin(nh, 224)
    left = _center_crop_origin(nw, 224)
    return out[top:top + 224, left:left + 224, :]


@functools.partial(jax.jit, static_argnames=())
def preprocess_batch(rgb_batch: jnp.ndarray) -> jnp.ndarray:
    """open_clip ViT-B-32 eval transform on-device: Resize(short->224,
    PIL bicubic) + CenterCrop(224) bit-exact vs the host PIL pipeline
    (preprocess_crop_u8), then ToTensor + Normalize in f32."""
    one = preprocess_crop_u8
    x = jax.vmap(one)(rgb_batch) if rgb_batch.ndim == 4 else one(rgb_batch)[None]
    xf = x.astype(jnp.float32) / 255.0
    return (xf - _MEAN) / _STD


class ClipZeroShot:
    """Zero-shot scene classifier. Needs converted weights (see
    convert_openclip_state_dict) or precomputed (params, text_features)."""

    def __init__(self, params: Dict[str, Any],
                 text_features: Optional[np.ndarray] = None,
                 logit_scale: float = 100.0, quick_gelu: bool = False):
        self.vision = VisionTower(quick_gelu=quick_gelu)
        self.params = params
        self.logit_scale = logit_scale
        if text_features is None:
            raise ValueError("text_features required (precompute with the "
                             "text tower + tokenizer, or ship alongside the "
                             "converted checkpoint)")
        tf = jnp.asarray(text_features, dtype=jnp.float32)
        self.text_features = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

        @jax.jit
        def _predict(params, batch):
            feats = self.vision.apply({"params": params["vision"]},
                                      preprocess_batch(batch))
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
            logits = self.logit_scale * feats @ self.text_features.T
            return jax.nn.softmax(logits, axis=-1)

        self._predict = _predict

    def predict_batch(self, rgb_batch: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, 4) probs over LABELS."""
        return np.asarray(self._predict(self.params, jnp.asarray(rgb_batch)))

    def predict_array(self, rgb: np.ndarray) -> Tuple[str, Dict[str, float]]:
        probs = self.predict_batch(np.asarray(rgb)[None])[0]
        label = LABELS[int(np.argmax(probs))]
        return label, {k: float(p) for k, p in zip(LABELS, probs)}


def convert_openclip_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map an open_clip/CLIP torch state_dict (numpy-valued) onto the Flax
    parameter trees above. Returns {"vision": ..., "text": ...}.

    Key layout follows the original CLIP naming: ``visual.*`` for the image
    tower, top-level ``transformer.*``/``token_embedding``/... for text.
    """
    def t(a):
        return np.asarray(a)

    def linear(prefix):
        return {"kernel": t(sd[prefix + ".weight"]).T,
                "bias": t(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": t(sd[prefix + ".weight"]),
                "bias": t(sd[prefix + ".bias"])}

    def block(src, width):
        out = {
            "ln_1": ln(f"{src}.ln_1"),
            "ln_2": ln(f"{src}.ln_2"),
            "attn": {
                "in_proj": {"kernel": t(sd[f"{src}.attn.in_proj_weight"]).T,
                            "bias": t(sd[f"{src}.attn.in_proj_bias"])},
                "out_proj": linear(f"{src}.attn.out_proj"),
            },
            "mlp_fc": linear(f"{src}.mlp.c_fc"),
            "mlp_proj": linear(f"{src}.mlp.c_proj"),
        }
        return out

    vision = {
        "patch_embed": {"kernel": t(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": t(sd["visual.class_embedding"]),
        "positional_embedding": t(sd["visual.positional_embedding"]),
        "ln_pre": ln("visual.ln_pre"),
        "ln_post": ln("visual.ln_post"),
        "proj": t(sd["visual.proj"]),
    }
    for i in range(12):
        vision[f"block_{i}"] = block(f"visual.transformer.resblocks.{i}", 768)

    text = {
        "token_embedding": {"embedding": t(sd["token_embedding.weight"])},
        "positional_embedding": t(sd["positional_embedding"]),
        "ln_final": ln("ln_final"),
        "text_projection": t(sd["text_projection"]),
    }
    for i in range(12):
        text[f"block_{i}"] = block(f"transformer.resblocks.{i}", 512)

    return {"vision": vision, "text": text}


def compute_text_features(params: Dict[str, Any], tokens: np.ndarray,
                          quick_gelu: bool = False) -> np.ndarray:
    """Run the text tower over tokenized prompts: (B, 77) int32 -> (B, 512).

    This IS the ``__text_features__`` precompute contract for
    load_from_checkpoint: with real weights,
    ``tokens = Tokenizer(bpe_path).encode_batch([PROMPTS[l] for l in LABELS])``
    and the result (pre-normalization — ClipZeroShot normalizes) is stored
    in the .npz under ``__text_features__``. The prompts are fixed
    (AI_classification.py:51-56), so this runs once per checkpoint, never
    at serving time."""
    tower = TextTower(quick_gelu=quick_gelu)
    return np.asarray(tower.apply({"params": params["text"]},
                                  jnp.asarray(tokens, jnp.int32)))


def load_from_checkpoint(path: str) -> ClipZeroShot:
    """Load a converted .npz checkpoint: the torch state_dict arrays plus a
    precomputed ``__text_features__`` (4, 512) for the fixed PROMPTS.
    Include ``__quick_gelu__ = 1`` for OpenAI-pretrained checkpoints
    (open_clip's "*-quickgelu" models); laion2b weights use exact GELU."""
    data = dict(np.load(path))
    tf = data.pop("__text_features__")
    scale = float(data.pop("__logit_scale__", 100.0))
    qg = bool(data.pop("__quick_gelu__", np.asarray(0)))
    params = convert_openclip_state_dict(data)
    return ClipZeroShot(params, text_features=tf, logit_scale=scale,
                        quick_gelu=qg)
