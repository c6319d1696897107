"""Notebook "modules 1-7" (ipynb cells 12-18) as composable functions.

Each module mirrors the notebook cell's parameter block and op order:
1 enhancement (CLAHE 4.0 + percentile stretch + unsharp 1.2)
2 restoration (median 3 + NLM colored h=10 + optional 3x3 sharpen kernel)
3 geometry (rotate / scale / translate / auto perspective correction)
4 segmentation (global|adaptive threshold + Canny OR + morphology)
5 color (space conversion roundtrip + LAB-L CLAHE 2.0)
6 features (Canny edges + Sobel magnitude/phase stats + Laplacian variance)
7 compression (JPEG q30/60/90, PNG l0/5/9 sweeps with size report)

Everything device-side is jittable; module 3's auto-perspective and module
7's codecs are host steps by nature (contours / codecs).
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpuimage.core.dtypes import f32
from tpuimage.ops import color as colorops
from tpuimage.ops.histogram import clahe
from tpuimage.ops.filters import gaussian_blur_u8
from tpuimage.ops.arith import add_weighted, bitwise_or
from tpuimage.ops.median import median_blur
from tpuimage.ops.nlm import nlm_denoise_colored
from tpuimage.ops.restore import sharpen_kernel_3x3
from tpuimage.ops.threshold import threshold_binary, adaptive_threshold
from tpuimage.ops.morphology import (structuring_element, morph_open,
                                     morph_close, MORPH_RECT)
from tpuimage.ops.edges import canny, sobel, magnitude, phase, laplacian_variance
from tpuimage.ops import geometry


def _lab_l_clahe(rgb, clip, tiles=(8, 8)):
    lab = colorops.rgb_to_lab(rgb)
    l = clahe(lab[..., 0], clip_limit=clip, tiles_x=tiles[0], tiles_y=tiles[1])
    return colorops.lab_to_rgb(jnp.concatenate([l[..., None], lab[..., 1:]], -1))


# --- Module 1: enhancement (cell 12) ---------------------------------------

@functools.partial(jax.jit, static_argnames=("use_clahe", "clahe_clip",
                                              "percentiles", "use_unsharp",
                                              "unsharp_radius", "unsharp_amount"))
def module1_enhance(rgb: jnp.ndarray, use_clahe: bool = True,
                    clahe_clip: float = 4.0,
                    percentiles: Tuple[float, float] = (2, 98),
                    use_unsharp: bool = True, unsharp_radius: int = 1,
                    unsharp_amount: float = 1.2) -> jnp.ndarray:
    x = rgb
    if use_clahe:
        x = _lab_l_clahe(x, clahe_clip)
    if percentiles is not None:
        # cell 12 contrast_stretch: GLOBAL percentiles over all channels
        xf = f32(x)
        lo = jnp.percentile(xf, percentiles[0])
        hi = jnp.percentile(xf, percentiles[1])
        x = jnp.clip((xf - lo) * 255.0 / (hi - lo), 0, 255).astype(jnp.uint8)
    if use_unsharp:
        blurred = gaussian_blur_u8(x, ksize=unsharp_radius * 2 + 1)
        x = add_weighted(x, 1.0 + unsharp_amount, blurred, -unsharp_amount, 0.0)
    return x


# --- Module 2: restoration (cell 13) ---------------------------------------

@functools.partial(jax.jit, static_argnames=("use_median", "median_ksize",
                                              "use_nlm", "nlm_h", "nlm_h_color",
                                              "use_deblur"))
def module2_restore(rgb: jnp.ndarray, use_median: bool = True,
                    median_ksize: int = 3, use_nlm: bool = True,
                    nlm_h: float = 10.0, nlm_h_color: float = 10.0,
                    use_deblur: bool = False) -> jnp.ndarray:
    x = rgb
    if use_median:
        x = median_blur(x, median_ksize)
    if use_nlm:
        x = nlm_denoise_colored(x, nlm_h, nlm_h_color)
    if use_deblur:
        x = sharpen_kernel_3x3(x)
    return x


# --- Module 3: geometry (cell 14) -------------------------------------------

def module3_transform(rgb: np.ndarray, rotation_angle: float = 0.0,
                      scale_factor: float = 1.0,
                      translate: Tuple[float, float] = (0, 0),
                      use_perspective: bool = False) -> np.ndarray:
    x = jnp.asarray(rgb)
    if rotation_angle:
        x = geometry.rotate(x, rotation_angle)
    if scale_factor != 1.0:
        h, w = int(x.shape[0]), int(x.shape[1])
        x = geometry.resize(x, int(h * scale_factor), int(w * scale_factor), "linear")
    if translate != (0, 0):
        x = geometry.translate(x, translate[0], translate[1])
    if use_perspective:
        x = jnp.asarray(auto_perspective_correction(np.asarray(x)))
    return np.asarray(x)


def auto_perspective_correction(rgb: np.ndarray) -> np.ndarray:
    """cell 14 auto_perspective_correction: gaussian 5 -> Canny 50/150 ->
    largest 4-gon contour -> warp to its own bounding dims."""
    from tpuimage.detect import contours as cnt
    gray = colorops.rgb_to_gray(jnp.asarray(rgb))
    blurred = gaussian_blur_u8(gray, ksize=5)
    edges = np.asarray(canny(blurred, 50, 150))
    cs = cnt.find_external_contours(edges)
    if not cs:
        return rgb
    cs = sorted(cs, key=cnt.contour_area, reverse=True)
    for c in cs:
        approx = cnt.approx_poly_dp(c, 0.02 * cnt.arc_length(c, True), True)
        if len(approx) == 4:
            pts = np.asarray(approx, np.float64).reshape(4, 2)
            s = pts.sum(axis=1)
            d = pts[:, 1] - pts[:, 0]
            rect = np.array([pts[np.argmin(s)], pts[np.argmin(d)],
                             pts[np.argmax(s)], pts[np.argmax(d)]], np.float32)
            tl, tr, br, bl = rect
            mw = max(int(np.linalg.norm(br - bl)), int(np.linalg.norm(tr - tl)))
            mh = max(int(np.linalg.norm(tr - br)), int(np.linalg.norm(tl - bl)))
            if mw < 2 or mh < 2:
                continue
            dst = np.array([[0, 0], [mw - 1, 0], [mw - 1, mh - 1], [0, mh - 1]],
                           np.float32)
            try:
                M = geometry.get_perspective_transform(rect, dst)
            except np.linalg.LinAlgError:
                continue  # degenerate quad (repeated/collinear corners)
            return np.asarray(geometry.warp_perspective(jnp.asarray(rgb), M, mh, mw))
    return rgb


# --- Module 4: segmentation (cell 15) ---------------------------------------

@functools.partial(jax.jit, static_argnames=("use_global", "global_value",
                                              "block_size", "C", "use_canny",
                                              "morph_op", "morph_ksize",
                                              "morph_iters"))
def module4_segment(rgb: jnp.ndarray, use_global: bool = False,
                    global_value: int = 127, block_size: int = 15, C: int = 5,
                    use_canny: bool = True, morph_op: str = "close",
                    morph_ksize: int = 3, morph_iters: int = 1) -> jnp.ndarray:
    gray = colorops.rgb_to_gray(rgb)
    if use_global:
        seg = threshold_binary(gray, global_value)
    else:
        seg = adaptive_threshold(gray, 255, "gaussian", block_size, C)
    if use_canny:
        seg = bitwise_or(seg, canny(gray, 50, 150))
    if morph_iters > 0:
        se = structuring_element(MORPH_RECT, morph_ksize)
        fn = morph_close if morph_op == "close" else morph_open
        seg = fn(seg, se, iterations=morph_iters)
    return seg


# --- Module 5: color (cell 16) ----------------------------------------------

@functools.partial(jax.jit, static_argnames=("space", "clahe_clip"))
def module5_color(rgb: jnp.ndarray, space: str = "LAB",
                  clahe_clip: float = 2.0) -> jnp.ndarray:
    x = rgb
    if x.ndim == 2:
        x = colorops.gray_to_rgb(x)
    # conversion roundtrip (cell 16 converts then converts back for display;
    # HSV/YCrCb roundtrips are lossy in uint8 exactly like cv2's)
    if space.upper() == "HSV":
        x = colorops.hsv_to_rgb(colorops.rgb_to_hsv(x))
    elif space.upper() == "YCRCB":
        x = colorops.ycrcb_to_rgb(colorops.rgb_to_ycrcb(x))
    # LAB stays (the notebook converts to LAB but the CLAHE step re-derives)
    return _lab_l_clahe(x, clahe_clip)


# --- Module 6: features (cells 8 + 17) --------------------------------------

@jax.jit
def module6_features(rgb: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    gray = colorops.rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
    edges = canny(gray, 50, 150)
    gx = sobel(gray, 1, 0)
    gy = sobel(gray, 0, 1)
    mag = magnitude(gx, gy)
    ang = phase(gx, gy, degrees=True)
    return {
        "edge_map": edges,
        "grad_magnitude_mean": jnp.mean(mag),
        "grad_magnitude_std": jnp.std(mag),
        "grad_angle_mean": jnp.mean(ang),
        "grad_angle_std": jnp.std(ang),
        "laplacian_variance": laplacian_variance(gray),
    }


# --- Module 7: compression sweep (cell 18) ----------------------------------

def module7_compress(rgb: np.ndarray, out_dir: str,
                     jpeg_qualities=(30, 60, 90),
                     png_levels=(0, 5, 9)) -> Dict[str, int]:
    """Save the JPEG/PNG sweeps; returns {filename: bytes}."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    im = Image.fromarray(np.asarray(rgb))
    sizes: Dict[str, int] = {}
    for q in jpeg_qualities:
        p = os.path.join(out_dir, f"compressed_jpeg_q{q}.jpg")
        im.save(p, "JPEG", quality=q)
        sizes[os.path.basename(p)] = os.path.getsize(p)
    for lvl in png_levels:
        p = os.path.join(out_dir, f"compressed_png_l{lvl}.png")
        im.save(p, "PNG", compress_level=lvl)
        sizes[os.path.basename(p)] = os.path.getsize(p)
    return sizes
