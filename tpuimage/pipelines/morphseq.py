"""morph_seq: standalone 4-step document morphology pipeline (ksize=3).

Re-implements the reference module recovered from
``__pycache__/morph_seq.cpython-310.pyc`` (SURVEY.md §2.1 C6, §3.5):
grayscale -> grayscale erosion (MORPH_RECT 3x3) -> Otsu binarization ->
binary closing. Returns the same stage dict keys and saves the same file
names (``morphseq_01_gray.png`` ... ``morphseq_04_closed.png`` +
``morphseq_closed.png``).

TPU-native: the jitted core (`morphseq_stages`) is pure and vmappable —
erosion/closing are separable reduce_window min/max, Otsu is a histogram
argmax. The batched form `morphseq_batch` maps it over NHW C uint8 stacks.
"""
from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tpuimage.ops.color import rgb_to_gray
from tpuimage.ops.morphology import structuring_element, erode, morph_close, MORPH_RECT
from tpuimage.ops.threshold import threshold_otsu
from tpuimage.io.imageio import load_image_rgb, save_image, ensure_dir

KSIZE = 3
ITERATIONS = 1

_SE3 = structuring_element(MORPH_RECT, KSIZE)


@jax.jit
def morphseq_stages(rgb: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Jitted core: RGB uint8 HWC -> stage dict (pyc process_morph_seq)."""
    gray = rgb_to_gray(rgb)
    eroded = erode(gray, _SE3, iterations=ITERATIONS)
    _, otsu = threshold_otsu(eroded)
    closed = morph_close(otsu, _SE3, iterations=ITERATIONS)
    return {
        "original": rgb,
        "step1_gray": gray,
        "step2_eroded": eroded,
        "step3_otsu": otsu,
        "step4_closed": closed,
    }


@jax.jit
def morphseq_batch(rgb_batch: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """vmapped batch form over NHWC uint8."""
    return jax.vmap(morphseq_stages)(rgb_batch)


def process_morph_seq(input_path: str, out_dir: str = "outputs",
                      save_intermediate: bool = True) -> Dict[str, np.ndarray]:
    """Drop-in equivalent of the reference's process_morph_seq CLI core."""
    rgb = load_image_rgb(input_path)
    stages = jax.device_get(morphseq_stages(rgb))
    stages = {k: np.asarray(v) for k, v in stages.items()}
    ensure_dir(out_dir)
    if save_intermediate:
        save_image(os.path.join(out_dir, "morphseq_01_gray.png"), stages["step1_gray"])
        save_image(os.path.join(out_dir, "morphseq_02_eroded.png"), stages["step2_eroded"])
        save_image(os.path.join(out_dir, "morphseq_03_otsu.png"), stages["step3_otsu"])
        save_image(os.path.join(out_dir, "morphseq_04_closed.png"), stages["step4_closed"])
    save_image(os.path.join(out_dir, "morphseq_closed.png"), stages["step4_closed"])
    return stages
