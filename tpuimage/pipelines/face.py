"""FaceEnhancement: noise-type-adaptive portrait "beauty" pipeline.

Re-implements FaceEnhancement.py end to end: kurtosis noise classifier
(:55-96), dual denoise + skin-mask blend (:326-371), glamour bilateral
(:127-144), eye pop (:173-230, Haar eyes via tpuimage.detect.haar),
saturation (:235-249), warmth (:251-264), contrast stretch (:266-278),
CLAHE 0.5 (:281-295), masked dual sharpening (:297-312), and the two
branch layouts: the script tail (:317-459) and the GUI variant
(AI_classification.py:707-768, which stops gaussian at the bilateral
polish and applies saturation only for gaussian).

All float->uint8 casts in the reference are truncations
(``.astype(np.uint8)``) — reproduced via ``_trunc_u8``. Channel-order
parity: the reference's BGR warmth op adds to its R channel and subtracts
from B; we operate on RGB with the same R/B roles.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuimage.core.dtypes import f32, trunc_u8
from tpuimage.ops.median import median_blur
from tpuimage.ops.filters import gaussian_blur_u8
from tpuimage.ops.bilateral import bilateral_filter
from tpuimage.ops.nlm import nlm_denoise_colored
from tpuimage.ops.histogram import clahe
from tpuimage.ops.lut import lut_lookup_u8
from tpuimage.ops import color as colorops
from tpuimage.ops.arith import in_range, normalize_minmax, add_weighted
from tpuimage.ops.morphology import (structuring_element, morph_open, dilate,
                                     MORPH_ELLIPSE)

# FaceEnhancement.py:8-12
BILATERAL_SIGMA_COLOR = 30
BILATERAL_SIGMA_SPACE = 10
SHARPEN_AMOUNT = 2.0
SKIN_MASK_THRESHOLD = (0, 133, 77, 255, 173, 127)
COLOR_SATURATION = 1.20

_ELLIPSE5 = structuring_element(MORPH_ELLIPSE, 5)


_trunc_u8 = trunc_u8


# ---------------------------------------------------------------------------
# noise classification (FaceEnhancement.py:55-96)
# ---------------------------------------------------------------------------

@jax.jit
def noise_kurtosis(rgb: jnp.ndarray) -> jnp.ndarray:
    """Pearson kurtosis of median-residuals (gray, float64->f32 here)."""
    gray = colorops.rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
    clean = median_blur(gray, 3)
    resid = f32(gray) - f32(clean)
    mean = jnp.mean(resid)
    std = jnp.std(resid)
    fourth = jnp.mean((resid - mean) ** 4)
    return jnp.where(std > 0, fourth / jnp.maximum(std ** 4, 1e-20), 0.0)


def classify_noise_type(rgb) -> str:
    """Host-side branch like the reference: kurtosis > 5 -> impulse."""
    k = float(noise_kurtosis(jnp.asarray(rgb)))
    return "impulse" if k > 5.0 else "gaussian"


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def get_refined_skin_mask(rgb: jnp.ndarray) -> jnp.ndarray:
    """FaceEnhancement.py:101-122: YCrCb box -> open -> 2x dilate -> feather."""
    ycrcb = colorops.rgb_to_ycrcb(rgb)
    lo = SKIN_MASK_THRESHOLD[:3]
    hi = SKIN_MASK_THRESHOLD[3:]
    mask = in_range(ycrcb, lo, hi)
    mask = morph_open(mask, _ELLIPSE5)
    mask = dilate(mask, _ELLIPSE5, iterations=2)
    return gaussian_blur_u8(mask, ksize=21, sigma=0.0)


def blend_masked(a: jnp.ndarray, b: jnp.ndarray, mask_u8: jnp.ndarray) -> jnp.ndarray:
    """(a*mask + b*(1-mask)).astype(uint8) — reference truncation blend."""
    m = f32(mask_u8) / 255.0
    if a.ndim == 3:
        m = m[..., None]
    return _trunc_u8(f32(a) * m + f32(b) * (1.0 - m))


def apply_glamour_skin(rgb: jnp.ndarray, mask_u8: jnp.ndarray) -> jnp.ndarray:
    """FaceEnhancement.py:127-144."""
    smooth = bilateral_filter(rgb, -1, BILATERAL_SIGMA_COLOR, BILATERAL_SIGMA_SPACE)
    return blend_masked(smooth, rgb, mask_u8)


def enhance_details(rgb: jnp.ndarray, amount: float = 1.0) -> jnp.ndarray:
    """FaceEnhancement.py:149-168: unsharp on LAB L (sigma 3)."""
    lab = colorops.rgb_to_lab(rgb)
    l = lab[..., 0]
    blurred = gaussian_blur_u8(l, ksize=0, sigma=3.0)
    sharp = add_weighted(l, 1.0 + amount, blurred, -amount, 0.0)
    lab2 = jnp.concatenate([sharp[..., None], lab[..., 1:]], axis=-1)
    return colorops.lab_to_rgb(lab2)


def adjust_saturation(rgb: jnp.ndarray, saturation: float = 1.0) -> jnp.ndarray:
    """FaceEnhancement.py:235-249 (clip+truncate on S).

    The reference multiplies in numpy FLOAT64 before truncating; an f32
    product truncates differently wherever s*saturation is near-integer
    (s % 5 == 0 at saturation 1.2 — 28% of this portrait's S plane, the
    oracle test caught it). ``saturation`` is static under jit, so the
    exact f64 math is a host-built 256-entry LUT."""
    hsv = colorops.rgb_to_hsv(rgb)
    table = np.clip(np.arange(256, dtype=np.float64) * saturation,
                    0, 255).astype(np.uint8)
    s = lut_lookup_u8(jnp.asarray(table), hsv[..., 1])
    hsv2 = jnp.stack([hsv[..., 0], s, hsv[..., 2]], axis=-1)
    return colorops.hsv_to_rgb(hsv2)


def apply_warmth(rgb: jnp.ndarray, amount: float = 10.0) -> jnp.ndarray:
    """FaceEnhancement.py:251-264: R += amount, B -= amount*0.05."""
    x = f32(rgb)
    x = x.at[..., 0].add(amount)
    x = x.at[..., 2].add(-amount * 0.05)
    return _trunc_u8(x)


def apply_contrast_stretching(rgb: jnp.ndarray) -> jnp.ndarray:
    """FaceEnhancement.py:266-278: NORM_MINMAX on LAB L."""
    lab = colorops.rgb_to_lab(rgb)
    l = normalize_minmax(lab[..., 0])
    lab2 = jnp.concatenate([l[..., None], lab[..., 1:]], axis=-1)
    return colorops.lab_to_rgb(lab2)


def apply_histogram_equalization(rgb: jnp.ndarray) -> jnp.ndarray:
    """FaceEnhancement.py:281-295: CLAHE 0.5 (8,8) on LAB L."""
    lab = colorops.rgb_to_lab(rgb)
    l = clahe(lab[..., 0], clip_limit=0.5, tiles_x=8, tiles_y=8)
    lab2 = jnp.concatenate([l[..., None], lab[..., 1:]], axis=-1)
    return colorops.lab_to_rgb(lab2)


def apply_masked_sharpening(rgb: jnp.ndarray, mask_u8: jnp.ndarray,
                            amount: float = 1.0) -> jnp.ndarray:
    """FaceEnhancement.py:297-312: strong on face, half on background."""
    face = enhance_details(rgb, amount=amount)
    bg = enhance_details(rgb, amount=amount * 0.5)
    return blend_masked(face, bg, mask_u8)


# ---------------------------------------------------------------------------
# eye pop (FaceEnhancement.py:173-230) — host loop over detected eyes,
# jitted per-ROI core (ROI shapes are data-dependent; eyes are few)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def _eye_roi_enhance(roi: jnp.ndarray) -> jnp.ndarray:
    h, w = roi.shape[0], roi.shape[1]
    r = median_blur(roi, 3)
    lab = colorops.rgb_to_lab(r)
    l = clahe(lab[..., 0], clip_limit=0.2, tiles_x=4, tiles_y=4)
    lab2 = jnp.concatenate([l[..., None], lab[..., 1:]], axis=-1)
    enh = colorops.lab_to_rgb(lab2)
    enh = enhance_details(enh, amount=0.5)
    # elliptical feathered alpha (cv2.ellipse filled, axes (w//2, h//2))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - (h // 2)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - (w // 2)
    ax, ay = max(w // 2, 1), max(h // 2, 1)
    inside = (xs / ax) ** 2 + (ys / ay) ** 2 <= 1.0
    mask = jnp.where(inside, jnp.uint8(255), jnp.uint8(0))
    soft = gaussian_blur_u8(mask, ksize=31, sigma=0.0)
    alpha = (f32(soft) / 255.0 * 0.1)[..., None]
    return _trunc_u8(f32(enh) * alpha + f32(r) * (1.0 - alpha))


def pixel_pop_eyes(rgb: np.ndarray, eyes: List[Tuple[int, int, int, int]]) -> np.ndarray:
    """Apply the per-eye enhancement at each (x, y, w, h) box (host loop,
    like the reference's for-loop over detectMultiScale results)."""
    out = np.asarray(rgb).copy()
    for (x, y, w, h) in eyes:
        roi = out[y:y + h, x:x + w]
        if roi.size == 0:
            continue
        out[y:y + h, x:x + w] = np.asarray(_eye_roi_enhance(jnp.asarray(roi)))
    return out


# ---------------------------------------------------------------------------
# full pipelines
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("noise_type",))
def face_pre_eyes(rgb: jnp.ndarray, noise_type: str = "gaussian") -> Dict[str, jnp.ndarray]:
    """Stages up to the eye pop (jittable, vmappable)."""
    if noise_type == "gaussian":
        light = gaussian_blur_u8(rgb, ksize=5)
        strong = gaussian_blur_u8(rgb, ksize=9)
    elif noise_type == "impulse":
        light = median_blur(rgb, 3)
        strong = median_blur(rgb, 5)
    else:  # legacy NLM fallback (FaceEnhancement.py:351-360)
        light = nlm_denoise_colored(rgb, 10.0, 10.0)
        strong = nlm_denoise_colored(rgb, 30.0, 30.0)
    mask = get_refined_skin_mask(light)
    combined = blend_masked(light, strong, mask)
    skin = apply_glamour_skin(combined, mask)
    return {"denoised_light": light, "denoised_strong": strong,
            "skin_mask": mask, "denoised_combined": combined,
            "skin_enhanced": skin}


@functools.partial(jax.jit, static_argnames=("noise_type", "variant"))
def face_post_eyes(rgb: jnp.ndarray, mask: jnp.ndarray,
                   noise_type: str = "gaussian", variant: str = "script") -> jnp.ndarray:
    """Tone/color/sharpen tail after the eye pop.

    variant='script': FaceEnhancement.py:387-440 (gaussian ends with
    masked sharpening 2.0); variant='gui': AI_classification.py:744-768
    (saturation only for gaussian; gaussian ends at the bilateral polish).
    """
    x = rgb
    if variant == "gui":
        # AI_classification.py:750: val_sat = 1.2 if gaussian else 1.0 —
        # sat 1.0 is NOT a no-op (u8 HSV round trip quantizes H/S), so the
        # call must run either way
        x = adjust_saturation(
            x, COLOR_SATURATION if noise_type == "gaussian" else 1.0)
    else:
        x = adjust_saturation(x, COLOR_SATURATION)
    x = apply_warmth(x, 15.0)
    if noise_type == "gaussian":
        x = apply_histogram_equalization(x)          # CLAHE 0.5
        x = bilateral_filter(x, 5, 20, 20)           # polish
        if variant == "script":
            x = apply_masked_sharpening(x, mask, amount=SHARPEN_AMOUNT)
        return x
    # impulse (and legacy) path: stretch; impulse skips sharpening
    x = apply_contrast_stretching(x)
    if noise_type != "impulse" and variant == "script":
        x = apply_masked_sharpening(x, mask, amount=SHARPEN_AMOUNT)
    return x


def enhance_face(rgb: np.ndarray, noise_type: str | None = None,
                 eyes: List[Tuple[int, int, int, int]] | None = None,
                 variant: str = "script") -> Dict[str, np.ndarray]:
    """End-to-end face pipeline (host orchestration mirroring the script).

    ``eyes=None`` runs the Haar eye detector (tpuimage.detect.haar);
    pass ``eyes=[]`` to skip the eye pop.
    """
    rgb_j = jnp.asarray(rgb)
    if noise_type is None:
        noise_type = classify_noise_type(rgb_j)
    pre = face_pre_eyes(rgb_j, noise_type=noise_type)
    skin = np.asarray(pre["skin_enhanced"])
    if eyes is None:
        from tpuimage.detect.haar import detect_eyes
        eyes = detect_eyes(np.asarray(colorops.rgb_to_gray(rgb_j)))
    popped = pixel_pop_eyes(skin, eyes)
    final = face_post_eyes(jnp.asarray(popped), pre["skin_mask"],
                           noise_type=noise_type, variant=variant)
    return {"noise_type": noise_type, "eyes": eyes,
            "skin_mask": np.asarray(pre["skin_mask"]),
            "skin_enhanced": skin, "features_popped": popped,
            "final": np.asarray(final)}
