"""Unified shadow-protected enhancement pipeline (ipynb cell 19).

Re-implements the notebook's complete `enhance_image` (the first, working
definition — its later redefinition is an acknowledged placeholder):
HSV-V shadow mask -> optional single-scale Retinex blend -> shadow-modulated
CLAHE -> shadow-modulated per-channel percentile stretch -> shadow-modulated
unsharp -> final shadow-preserving blend; plus the 4 PRESETS
(DOCUMENT/NIGHT/PORTRAIT/GENERAL) and `auto_categorize` heuristics
(check_night_mode / check_document_mode / check_portrait_mode).

TPU-native: the whole pipeline is ONE jit program per preset (presets are
static), vmappable over batches; categorization is a tiny device program
whose booleans the host reads to pick the preset (mirroring the
reference's host branch).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpuimage.core.dtypes import f32, trunc_u8
from tpuimage.ops import color as colorops
from tpuimage.ops.histogram import clahe
from tpuimage.ops.filters import gaussian_blur_u8, gaussian_blur_f32
from tpuimage.ops.arith import add_weighted
from tpuimage.ops.morphology import structuring_element, morph_close, MORPH_ELLIPSE
from tpuimage.ops.edges import laplacian
from tpuimage.ops.restore import single_scale_retinex


@dataclasses.dataclass(frozen=True)
class ShadowPreset:
    """Cell 19 PRESETS fields."""
    shadow_v_threshold: int = 80
    mask_blur_ksize: int = 51
    use_clahe: bool = True
    clahe_clip: float = 3.0
    clahe_tile: Tuple[int, int] = (8, 8)
    use_contrast_stretch: bool = True
    stretch_percentiles: Tuple[float, float] = (2, 98)
    use_retinex: bool = False
    retinex_sigma: float = 80.0
    retinex_blend: float = 0.5
    use_unsharp: bool = True
    unsharp_radius: int = 1
    unsharp_amount: float = 1.0
    final_shadow_blend_strength: float = 1.0
    mode_info: str = ""


PRESETS: Dict[str, ShadowPreset] = {
    "DOCUMENT": ShadowPreset(
        shadow_v_threshold=110, use_clahe=False, clahe_clip=3.0,
        use_contrast_stretch=True, stretch_percentiles=(5, 98),
        use_retinex=True, retinex_sigma=80, retinex_blend=0.6,
        use_unsharp=True, unsharp_amount=0.8,
        final_shadow_blend_strength=0.7,
        mode_info="Focuses on illumination equalization and text protection."),
    "NIGHT": ShadowPreset(
        shadow_v_threshold=80, use_clahe=False, clahe_clip=8.0,
        use_contrast_stretch=True, stretch_percentiles=(1, 99),
        use_retinex=False, retinex_sigma=150, retinex_blend=1.0,
        use_unsharp=False, unsharp_amount=1.5,
        final_shadow_blend_strength=0.0,
        mode_info="Simple global contrast stretch and strong brightening."),
    "PORTRAIT": ShadowPreset(
        shadow_v_threshold=85, use_clahe=True, clahe_clip=2.0,
        use_contrast_stretch=False, use_retinex=False,
        use_unsharp=False, unsharp_amount=0.0,
        final_shadow_blend_strength=0.6,
        mode_info="Gentle contrast boost, preserves natural skin tones."),
    "GENERAL": ShadowPreset(
        shadow_v_threshold=80, use_clahe=True, clahe_clip=3.0,
        use_contrast_stretch=True, stretch_percentiles=(2, 98),
        use_retinex=False, retinex_blend=0.5,
        use_unsharp=True, unsharp_amount=1.0,
        final_shadow_blend_strength=0.5,
        mode_info="Balanced enhancement for overall dynamic range and clarity."),
}

_ELLIPSE5 = structuring_element(MORPH_ELLIPSE, 5)


# ---------------------------------------------------------------------------
# categorization heuristics (cell 19 §2)
# ---------------------------------------------------------------------------

@jax.jit
def _categorize_cues(rgb: jnp.ndarray):
    hsv = colorops.rgb_to_hsv(rgb)
    v = f32(hsv[..., 2])
    v_mean = jnp.mean(v)
    near_white_ratio = jnp.mean((v > 230).astype(jnp.float32))
    gray = colorops.rgb_to_gray(rgb)
    lap = laplacian(gray)  # cv2.Laplacian CV_64F ksize=1, value-identical
    edge_ratio = jnp.mean((jnp.abs(lap) > 150).astype(jnp.float32))
    return v_mean, near_white_ratio, edge_ratio


def check_night_mode(rgb: np.ndarray, threshold: float = 80.0) -> bool:
    v_mean, _, _ = _categorize_cues(jnp.asarray(rgb))
    return float(v_mean) < threshold


def check_document_mode(rgb: np.ndarray, bright_ratio: float = 0.7,
                        edge_ratio_min: float = 0.015) -> bool:
    _, white, edges = _categorize_cues(jnp.asarray(rgb))
    return float(white) > bright_ratio and float(edges) > edge_ratio_min


def check_portrait_mode(rgb: np.ndarray, detect_faces: bool = False) -> bool:
    """The reference's check is an acknowledged placeholder returning False;
    pass detect_faces=True to use the working Haar detector instead."""
    if not detect_faces:
        return False
    from tpuimage.detect.haar import detect_faces as haar_faces
    gray = np.asarray(colorops.rgb_to_gray(jnp.asarray(rgb)))
    return len(haar_faces(gray)) > 0


def auto_categorize(rgb: np.ndarray, detect_faces: bool = False) -> str:
    """Cell 19 auto_categorize: NIGHT > DOCUMENT > PORTRAIT > GENERAL."""
    v_mean, white, edges = (float(x) for x in _categorize_cues(jnp.asarray(rgb)))
    if v_mean < 80.0:
        return "NIGHT"
    if white > 0.7 and edges > 0.015:
        return "DOCUMENT"
    if check_portrait_mode(rgb, detect_faces):
        return "PORTRAIT"
    return "GENERAL"


# ---------------------------------------------------------------------------
# stages (cell 19 helpers, truncating casts reproduced)
# ---------------------------------------------------------------------------

_trunc_u8 = trunc_u8


def get_shadow_mask_brightness(rgb: jnp.ndarray, v_threshold: int = 70,
                               blur_ksize: int = 51) -> jnp.ndarray:
    """Soft float [0,1] mask, 1 = shadow: V<thr -> 255, ellipse-5 close,
    gaussian blur, /255."""
    hsv = colorops.rgb_to_hsv(rgb)
    v = hsv[..., 2]
    bin_mask = jnp.where(v < v_threshold, jnp.uint8(255), jnp.uint8(0))
    closed = morph_close(bin_mask, _ELLIPSE5)
    k = blur_ksize + (blur_ksize % 2 == 0)
    soft = gaussian_blur_f32(f32(closed), ksize=k)
    return soft / 255.0


def adaptive_clahe(rgb: jnp.ndarray, clahe_clip: float = 3.0,
                   tile_grid: Tuple[int, int] = (8, 8),
                   shadow_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    lab = colorops.rgb_to_lab(rgb)
    L = lab[..., 0]
    L_clahe = clahe(L, clip_limit=clahe_clip,
                    tiles_x=tile_grid[0], tiles_y=tile_grid[1])
    if shadow_mask is None:
        L_out = L_clahe
    else:
        bright = jnp.clip(1.0 - shadow_mask, 0.0, 1.0)
        L_out = _trunc_u8(f32(L_clahe) * bright + f32(L) * (1.0 - bright))
    return colorops.lab_to_rgb(jnp.concatenate([L_out[..., None], lab[..., 1:]], -1))


def contrast_stretch_rgb(rgb: jnp.ndarray, percentiles=(2, 98),
                         shadow_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    img = f32(rgb)
    flat = img.reshape(-1, 3)
    lo = jnp.percentile(flat, percentiles[0], axis=0)
    hi = jnp.percentile(flat, percentiles[1], axis=0)
    denom = jnp.where(hi - lo == 0, 1.0, hi - lo)
    out = jnp.clip((img - lo) * 255.0 / denom, 0, 255)
    out = _trunc_u8(out)
    if shadow_mask is None:
        return out
    m = shadow_mask[..., None]
    return _trunc_u8(f32(out) * (1.0 - m) + f32(rgb) * m)


def adaptive_unsharp(rgb: jnp.ndarray, radius: int = 1, amount: float = 1.0,
                     shadow_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    ksize = radius * 2 + 1 if radius >= 1 else 3
    blurred = gaussian_blur_u8(rgb, ksize=ksize)
    sharpened = add_weighted(rgb, 1.0 + amount, blurred, -amount, 0.0)
    if shadow_mask is None:
        return sharpened
    m = shadow_mask[..., None]
    return _trunc_u8(f32(sharpened) * (1.0 - m) + f32(rgb) * m)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("preset",))
def enhance_shadow_protected(rgb: jnp.ndarray, preset: ShadowPreset):
    """Cell 19 enhance_image (the working definition): returns
    (final uint8, shadow mask float [0,1])."""
    cfg = preset
    img = rgb
    mask = get_shadow_mask_brightness(img, cfg.shadow_v_threshold,
                                      cfg.mask_blur_ksize)
    if cfg.use_retinex:
        r = single_scale_retinex(img, sigma=cfg.retinex_sigma)
        blend = add_weighted(r, cfg.retinex_blend, img, 1.0 - cfg.retinex_blend, 0.0)
        img = blend
    if cfg.use_clahe:
        img = adaptive_clahe(img, cfg.clahe_clip, cfg.clahe_tile, mask)
    if cfg.use_contrast_stretch:
        img = contrast_stretch_rgb(img, cfg.stretch_percentiles, mask)
    if cfg.use_unsharp:
        img = adaptive_unsharp(img, cfg.unsharp_radius, cfg.unsharp_amount, mask)
    m = jnp.clip(mask * cfg.final_shadow_blend_strength, 0.0, 1.0)[..., None]
    final = _trunc_u8(f32(img) * (1.0 - m) + f32(rgb) * m)
    return final, mask


def enhance_image(rgb: np.ndarray, category: Optional[str] = None,
                  detect_faces: bool = False):
    """Host orchestration mirroring the notebook: auto-categorize (unless a
    category is forced), then run the preset's fused program. Returns
    (final, mask, category)."""
    if category is None:
        category = auto_categorize(rgb, detect_faces=detect_faces)
    preset = PRESETS.get(category, PRESETS["GENERAL"])
    final, mask = enhance_shadow_protected(jnp.asarray(rgb), preset)
    return np.asarray(final), np.asarray(mask), category


@functools.partial(jax.jit, static_argnames=("preset",))
def enhance_shadow_batch(rgb_batch: jnp.ndarray, preset: ShadowPreset):
    return jax.vmap(lambda im: enhance_shadow_protected(im, preset))(rgb_batch)
