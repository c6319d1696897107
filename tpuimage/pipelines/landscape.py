"""Landscape batch enhancement + degrade/restore evaluation.

Re-implements Landscape.py: ENHANCEMENT_PRESET (:24-55), degrade_image
(:74-98), denoise_image (:101-119), enhance_contrast_clahe with sky
protection (:122-139), sharpen_image (:142-145), calculate_metrics
(:148-154), enhance_image (:157-192), get_image_stats (:195-201); plus the
GUI landscape runner AI_classification.py:683-704 (bilateral 9/100/75 +
CLAHE 2.2 sky 2.0 blend 0.55 + unsharp 0.8) which shares the same math.

Parity notes: the reference's float->uint8 casts are truncations
(``.astype(np.uint8)``) — reproduced; the unseeded ``np.random.normal``
noise (Landscape.py:93-96) becomes a ``jax.random`` key (SURVEY.md §4
item 5).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tpuimage.core.dtypes import f32, trunc_u8
from tpuimage.ops.median import median_blur
from tpuimage.ops.bilateral import bilateral_filter
from tpuimage.ops.nlm import nlm_denoise_colored
from tpuimage.ops.histogram import clahe
from tpuimage.ops.filters import gaussian_blur_u8
from tpuimage.ops import color as colorops
from tpuimage.ops.arith import add_weighted
from tpuimage.ops.metrics import psnr, ssim

# Landscape.py:24-55 (identical values re-hardcoded by the GUI at
# AI_classification.py:689-696)
ENHANCEMENT_PRESET = {
    "denoising": {"enabled": True, "method": "bilateral", "kernel_size": 5},
    "clahe": {"enabled": True, "clip_limit": 2.2, "tile_grid_size": (8, 8),
              "sky_protection_power": 2.0, "blend_strength": 0.55},
    "sharpening": {"enabled": True, "amount": 0.8, "radius": 1.0},
    "degradation": {"contrast_reduction": 0.7, "underexposure": 0.85,
                    "noise_amount": 10, "saturation_reduction": 0.85},
}


_trunc_u8 = trunc_u8


def degrade_image(rgb: jnp.ndarray, key: jax.Array, config=None) -> jnp.ndarray:
    """Landscape.py:74-98 degrade_image with seeded jax.random noise."""
    cfg = config or ENHANCEMENT_PRESET["degradation"]
    x = f32(rgb) / 255.0
    contrast = cfg.get("contrast_reduction", 0.6)
    x = x * contrast + 0.5 * (1.0 - contrast)
    underexp = cfg.get("underexposure", 0.8)
    x = jnp.power(jnp.maximum(x, 0.0), 1.0 / underexp)
    sat = cfg.get("saturation_reduction", 0.8)
    hsv = f32(colorops.rgb_to_hsv(_trunc_u8(x * 255.0)))
    hsv = hsv.at[..., 1].multiply(sat)
    x = f32(colorops.hsv_to_rgb(_trunc_u8(hsv))) / 255.0
    noise_level = cfg.get("noise_amount", 15)
    if noise_level > 0:
        x = x + jax.random.normal(key, x.shape, dtype=jnp.float32) * (noise_level / 255.0)
    return _trunc_u8(x * 255.0)


def denoise_image(rgb: jnp.ndarray, method: str = "median", kernel_size: int = 5,
                  is_noisy: bool = False) -> jnp.ndarray:
    """Landscape.py:101-119 denoise_image."""
    if method == "median":
        k = kernel_size + 2 if is_noisy else kernel_size
        return median_blur(rgb, k)
    if method == "bilateral":
        d = 11 if is_noisy else 9
        sigma = 100 if is_noisy else 75
        return bilateral_filter(rgb, d, sigma, sigma)
    if method == "nlmeans":
        h = 15 if is_noisy else 10
        return nlm_denoise_colored(rgb, float(h), float(h))
    return rgb


def enhance_contrast_clahe(rgb: jnp.ndarray, clip_limit: float = 2.5,
                           tile_grid: Tuple[int, int] = (8, 8), sky_power: float = 3.0,
                           blend: float = 0.6) -> jnp.ndarray:
    """Landscape.py:122-139: CLAHE on LAB L with sky-protection blend."""
    lab = colorops.rgb_to_lab(rgb)
    l_orig = lab[..., 0]
    l_clahe = clahe(l_orig, clip_limit=clip_limit,
                    tiles_x=tile_grid[0], tiles_y=tile_grid[1])
    l_norm = f32(l_orig) / 255.0
    protection = jnp.power(l_norm, sky_power)
    enhance_weight = (1.0 - protection) * blend
    l_final = _trunc_u8(f32(l_clahe) * enhance_weight + f32(l_orig) * (1.0 - enhance_weight))
    lab_enh = jnp.concatenate([l_final[..., None], lab[..., 1:]], axis=-1)
    return colorops.lab_to_rgb(lab_enh)


def sharpen_image(rgb: jnp.ndarray, amount: float = 1.5, radius: float = 1.0) -> jnp.ndarray:
    """Landscape.py:142-145: unsharp via GaussianBlur((0,0), radius)."""
    blurred = gaussian_blur_u8(rgb, ksize=0, sigma=radius)
    return add_weighted(rgb, 1.0 + amount, blurred, -amount, 0.0)


def calculate_metrics(before: jnp.ndarray, after: jnp.ndarray):
    """Landscape.py:148-154: (cv2.PSNR, gray SSIM)."""
    g1 = colorops.rgb_to_gray(before)
    g2 = colorops.rgb_to_gray(after)
    return psnr(before, after), ssim(g1, g2)


def _enhance(rgb: jnp.ndarray, is_noisy: bool, preset) -> jnp.ndarray:
    p = preset
    cur = rgb
    if p["denoising"]["enabled"]:
        cur = denoise_image(cur, p["denoising"]["method"],
                            p["denoising"]["kernel_size"], is_noisy)
    if p["clahe"]["enabled"]:
        cur = enhance_contrast_clahe(cur, p["clahe"]["clip_limit"],
                                     p["clahe"]["tile_grid_size"],
                                     p["clahe"]["sky_protection_power"],
                                     p["clahe"]["blend_strength"])
    if p["sharpening"]["enabled"]:
        amount = p["sharpening"]["amount"] * (0.7 if is_noisy else 1.0)
        cur = sharpen_image(cur, amount, p["sharpening"]["radius"])
    return cur


@functools.partial(jax.jit, static_argnames=("is_noisy",))
def enhance_image(rgb: jnp.ndarray, is_noisy: bool = False) -> jnp.ndarray:
    """Landscape.py:157-192 enhance_image with the module preset."""
    return _enhance(rgb, is_noisy, ENHANCEMENT_PRESET)


@jax.jit
def landscape_gui(rgb: jnp.ndarray) -> jnp.ndarray:
    """AI_classification.py:683-704 _run_landscape_enhance: bilateral
    9/100/75 then CLAHE(2.2, sky 2.0, blend .55) then unsharp 0.8."""
    cur = bilateral_filter(rgb, 9, 100, 75)
    cur = enhance_contrast_clahe(cur, 2.2, (8, 8), 2.0, 0.55)
    return sharpen_image(cur, 0.8, 1.0)


@jax.jit
def landscape_eval_step(rgb: jnp.ndarray, key: jax.Array) -> Dict[str, jnp.ndarray]:
    """One full Landscape.py batch-loop iteration (:227-364) for one image:
    PATH 1 enhance original; PATH 2 degrade then enhance(is_noisy=True);
    returns all stage images + metrics."""
    enhanced = enhance_image(rgb, is_noisy=False)
    p1_psnr, p1_ssim = calculate_metrics(rgb, enhanced)
    degraded = degrade_image(rgb, key)
    restored = enhance_image(degraded, is_noisy=True)
    p2_psnr, p2_ssim = calculate_metrics(degraded, restored)
    return {
        "original": rgb, "enhanced": enhanced,
        "degraded": degraded, "restored": restored,
        "psnr_enhanced": p1_psnr, "ssim_enhanced": p1_ssim,
        "psnr_restored": p2_psnr, "ssim_restored": p2_ssim,
    }


@jax.jit
def landscape_eval_batch(rgb_batch: jnp.ndarray, keys: jax.Array) -> Dict[str, jnp.ndarray]:
    """The reference's serial per-image loop (Landscape.py:227), vmapped."""
    return jax.vmap(landscape_eval_step)(rgb_batch, keys)
