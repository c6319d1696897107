"""Turn a preset (presets.loader) into a jittable enhancement op chain.

The reference never executes its preset DBs, so the op semantics here are
the standard OpenCV formulations of each field (documented per step), built
entirely from tpuimage ops so a preset application is ONE fused XLA
program, vmappable over batches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuimage.core.dtypes import f32, saturate_u8
from tpuimage.ops import color as colorops
from tpuimage.ops.histogram import clahe, equalize_hist
from tpuimage.ops.filters import gaussian_blur_f32
from tpuimage.presets.loader import CategorizationPreset, EnhancementPreset


def _apply_luminance(rgb, fn):
    lab = colorops.rgb_to_lab(rgb)
    l2 = fn(lab[..., 0])
    return colorops.lab_to_rgb(jnp.concatenate([l2[..., None], lab[..., 1:]], -1))


@functools.partial(jax.jit, static_argnames=("preset",))
def apply_categorization_preset(rgb: jnp.ndarray,
                                preset: CategorizationPreset) -> jnp.ndarray:
    """brightness -> contrast -> saturation -> white balance -> chroma ->
    highlight compression -> local contrast -> optional invert."""
    p = preset
    x = f32(rgb)

    # brightness: convertScaleAbs-style linear beta, or gamma LUT on [0,1]
    if p.brightness_mode == "linear":
        x = x + p.brightness_beta
    elif p.brightness_mode == "gamma":
        x = jnp.power(jnp.clip(x / 255.0, 0.0, 1.0), p.brightness_gamma) * 255.0
    if p.linear_boost_beta:
        x = x + p.linear_boost_beta
    x = saturate_u8(x)

    # contrast: alpha gain about 0, or CLAHE on the L channel
    if p.contrast_mode == "alpha":
        x = saturate_u8(f32(x) * p.contrast_alpha)
    elif p.contrast_mode == "clahe":
        x = _apply_luminance(x, lambda l: clahe(l, clip_limit=p.clahe_clip,
                                                tiles_x=p.clahe_tiles[0],
                                                tiles_y=p.clahe_tiles[1]))

    # saturation with cap: S *= min(mult, 1 + cap)
    if p.saturation_mult != 1.0:
        mult = min(p.saturation_mult, 1.0 + p.saturation_cap)
        hsv = colorops.rgb_to_hsv(x)
        s = saturate_u8(f32(hsv[..., 1]) * mult)
        x = colorops.hsv_to_rgb(jnp.stack([hsv[..., 0], s, hsv[..., 2]], -1))

    # gray-world white balance with clamped per-channel gains
    if p.gray_world:
        xf = f32(x)
        means = jnp.mean(xf, axis=(0, 1))
        gain = jnp.mean(means) / jnp.maximum(means, 1e-6)
        gain = jnp.clip(gain, p.gain_clamp[0], p.gain_clamp[1])
        x = saturate_u8(xf * gain)

    # chroma boost: scale Cb/Cr excursions about 128 in YCrCb
    if p.chroma_boost_cb != 1.0 or p.chroma_boost_cr != 1.0:
        ycc = f32(colorops.rgb_to_ycrcb(x))   # channels (Y, Cr, Cb)
        cr = (ycc[..., 1] - 128.0) * p.chroma_boost_cr + 128.0
        cb = (ycc[..., 2] - 128.0) * p.chroma_boost_cb + 128.0
        x = colorops.ycrcb_to_rgb(saturate_u8(jnp.stack([ycc[..., 0], cr, cb], -1)))

    # highlight compression: curve the top half of the L channel
    # ("mild_sqrt" = sqrt curve at half strength, Document presets)
    if p.highlight_compression in ("sqrt", "log", "mild_sqrt"):
        def compress(l):
            ln = f32(l) / 255.0
            if p.highlight_compression == "log":
                curved = jnp.log1p(ln * 9.0) / jnp.log(10.0)
            else:
                curved = jnp.sqrt(ln)
            t = jnp.clip((ln - 0.5) * 2.0, 0.0, 1.0)
            if p.highlight_compression == "mild_sqrt":
                t = t * 0.5
            return saturate_u8((ln * (1 - t) + curved * t) * 255.0)
        x = _apply_luminance(x, compress)

    # local contrast: thresholded unsharp on L (radius/amount/threshold)
    if p.local_contrast:
        def lc(l):
            lf = f32(l)
            blur = gaussian_blur_f32(lf, ksize=0, sigma=p.lc_radius)
            detail = lf - blur
            detail = jnp.where(jnp.abs(detail) > p.lc_threshold, detail, 0.0)
            return saturate_u8(lf + p.lc_amount * detail)
        x = _apply_luminance(x, lc)

    if p.invert:
        x = jnp.uint8(255) - x
    return x


@functools.partial(jax.jit, static_argnames=("preset",))
def apply_enhancement_preset(rgb: jnp.ndarray,
                             preset: EnhancementPreset) -> jnp.ndarray:
    """contrast_stretch(alpha) -> histogram modification (equalize/CLAHE on
    the chosen channel) with optional sky-protection blend."""
    p = preset
    x = rgb
    if p.contrast_alpha != 1.0:
        x = saturate_u8(f32(x) * p.contrast_alpha)

    if p.hist_method in ("equalization", "clahe"):
        lab = colorops.rgb_to_lab(x) if x.ndim == 3 else None
        l = lab[..., 0] if x.ndim == 3 else x
        if p.hist_method == "equalization":
            l2 = equalize_hist(l)
        else:
            l2 = clahe(l, clip_limit=p.clahe_clip,
                       tiles_x=p.clahe_tiles[0], tiles_y=p.clahe_tiles[1])
        if p.sky_protection_power > 0:
            # Landscape.py:131-136 sky-protection blend
            ln = f32(l) / 255.0
            protection = jnp.power(ln, p.sky_protection_power)
            w = (1.0 - protection) * p.blend_strength
            l2 = saturate_u8(f32(l2) * w + f32(l) * (1.0 - w))
        elif p.blend_strength < 1.0:
            l2 = saturate_u8(f32(l2) * p.blend_strength + f32(l) * (1.0 - p.blend_strength))
        if x.ndim == 3:
            x = colorops.lab_to_rgb(jnp.concatenate([l2[..., None], lab[..., 1:]], -1))
        else:
            x = l2

    if p.invert:
        x = jnp.uint8(255) - x
    return x
