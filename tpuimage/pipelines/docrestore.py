"""Notebook document-restoration pipeline (ipynb cells 3-10, the disabled
"main pipeline"): quad correction -> denoise (median + NLM) -> CLAHE ->
percentile stretch -> unsharp -> optional Richardson-Lucy deblur ->
adaptive-threshold segmentation -> edge overlay -> clean-scan composite ->
compressed variants -> PSNR/SSIM metrics written to metrics.csv
(cell 9 process_image / main_process).

Device stages run as jitted tpuimage ops; quad detection reuses the
docscan localization machinery (cell 4's detect_document_contour is the
same Canny+contour+approxPolyDP recipe).
"""
from __future__ import annotations

import csv
import glob
import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from tpuimage.core.dtypes import f32
from tpuimage.io.imageio import load_image_rgb, save_image, ensure_dir
from tpuimage.ops import color as colorops
from tpuimage.ops.median import median_blur
from tpuimage.ops.nlm import nlm_denoise_colored
from tpuimage.ops.histogram import clahe
from tpuimage.ops.filters import gaussian_blur_u8
from tpuimage.ops.arith import add_weighted
from tpuimage.ops.threshold import adaptive_threshold
from tpuimage.ops.morphology import structuring_element, morph_open, MORPH_RECT
from tpuimage.ops.edges import canny
from tpuimage.ops.restore import richardson_lucy_gray
from tpuimage.ops.metrics import psnr, ssim
from tpuimage.ops import geometry
from tpuimage.pipelines.modules import auto_perspective_correction


@jax.jit
def _enhance_core(warped: jnp.ndarray):
    """cells 5-6 composite: median3 + NLM(h=10) -> LAB CLAHE 2.0 ->
    per-channel (2,98) stretch -> unsharp 0.8."""
    den = median_blur(warped, 3)
    den = nlm_denoise_colored(den, 10.0, 10.0)
    lab = colorops.rgb_to_lab(den)
    l = clahe(lab[..., 0], clip_limit=2.0, tiles_x=8, tiles_y=8)
    cl = colorops.lab_to_rgb(jnp.concatenate([l[..., None], lab[..., 1:]], -1))
    x = f32(cl)
    lo = jnp.percentile(x.reshape(-1, 3), 2, axis=0)
    hi = jnp.percentile(x.reshape(-1, 3), 98, axis=0)
    stretched = jnp.clip((x - lo) * (255.0 / jnp.maximum(hi - lo, 1e-8)),
                         0, 255).astype(jnp.uint8)
    blurred = gaussian_blur_u8(stretched, ksize=0, sigma=1.0)
    sharp = add_weighted(stretched, 1.8, blurred, -0.8, 0.0)
    return den, cl, sharp


@jax.jit
def _segment_and_final(gray: jnp.ndarray):
    """cell 6 segment_text (adaptive gaussian 25/10 + open 2x2) + cell 9's
    clean-scan composite (text from the sharpened gray on white)."""
    seg = adaptive_threshold(gray, 255, "gaussian", 25, 10)
    seg = morph_open(seg, structuring_element(MORPH_RECT, 2))
    text_mask = seg < 128
    final = jnp.where(text_mask, gray, jnp.uint8(255))
    edges = canny(gray, 50, 150)
    return seg, final, edges


def process_image(path_in: str, out_root: str = "outputs",
                  max_dim: int = 2000, do_deblur: bool = False) -> Dict[str, float]:
    """cell 9 process_image: stage dumps into corrected/enhanced/segmented/
    final subdirs, returns {basename, psnr, ssim}."""
    rgb = load_image_rgb(path_in)
    rgb = np.asarray(geometry.resize_long_side(jnp.asarray(rgb), max_dim))
    base = os.path.splitext(os.path.basename(path_in))[0]
    dirs = {k: os.path.join(out_root, k)
            for k in ("corrected", "enhanced", "segmented", "final")}
    for d in dirs.values():
        ensure_dir(d)

    warped = auto_perspective_correction(rgb)
    save_image(os.path.join(dirs["corrected"], f"{base}_corrected.png"), warped)

    den, _, sharp = _enhance_core(jnp.asarray(warped))
    save_image(os.path.join(dirs["enhanced"], f"{base}_denoised.png"), np.asarray(den))
    save_image(os.path.join(dirs["enhanced"], f"{base}_enhanced.png"), np.asarray(sharp))

    gray_sharp = colorops.rgb_to_gray(sharp)
    if do_deblur:
        gray_sharp = richardson_lucy_gray(gray_sharp, iterations=15)
        save_image(os.path.join(dirs["enhanced"], f"{base}_deblurred.png"),
                   np.asarray(colorops.gray_to_rgb(gray_sharp)))

    seg, final_gray, edges = _segment_and_final(gray_sharp)
    save_image(os.path.join(dirs["segmented"], f"{base}_seg.png"), np.asarray(seg))

    overlay = np.asarray(warped).copy()
    overlay[np.asarray(edges) > 0] = (255, 0, 0)
    save_image(os.path.join(dirs["enhanced"], f"{base}_edges_overlay.png"), overlay)

    final_rgb = np.asarray(colorops.gray_to_rgb(final_gray))
    save_image(os.path.join(dirs["final"], f"{base}_final.png"), final_rgb)
    from PIL import Image
    for q in (80, 60):
        Image.fromarray(final_rgb).save(
            os.path.join(dirs["final"], f"{base}_final_q{q}.jpg"), "JPEG", quality=q)
    Image.fromarray(final_rgb).save(
        os.path.join(dirs["final"], f"{base}_final_lossless.png"), "PNG",
        compress_level=0)

    ref_gray = colorops.rgb_to_gray(jnp.asarray(warped))
    return {"basename": base,
            "psnr": float(psnr(ref_gray, final_gray)),
            "ssim": float(ssim(ref_gray, final_gray))}


def main_process(input_folder: str, output_root: str = "outputs",
                 do_deblur: bool = False) -> str:
    """cell 9 main_process: batch loop + metrics.csv writer."""
    files = []
    for e in ("*.jpg", "*.jpeg", "*.png", "*.bmp"):
        files.extend(sorted(glob.glob(os.path.join(input_folder, e))))
    rows = []
    for f in files:
        try:
            rows.append(process_image(f, output_root, do_deblur=do_deblur))
        except Exception as e:  # per-image isolation like the notebook's handler
            print(f"Failed {f}: {e}")
    csv_path = os.path.join(output_root, "metrics.csv")
    ensure_dir(output_root)
    with open(csv_path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["basename", "psnr", "ssim"])
        w.writeheader()
        w.writerows(rows)
    return csv_path
