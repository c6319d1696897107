"""morph_seq: standalone 4-step document morphology pipeline (ksize=3).

Re-implements the reference module recovered from
``__pycache__/morph_seq.cpython-310.pyc`` (SURVEY.md §2.1 C6, §3.5):
grayscale -> grayscale erosion (MORPH_RECT 3x3) -> Otsu binarization ->
binary closing. Returns the same stage dict keys and saves the same file
names (``morphseq_01_gray.png`` ... ``morphseq_04_closed.png`` +
``morphseq_closed.png``).

TPU-native: the jitted core (`morphseq_stages`) is pure and vmappable.
Two implementations, identical stage outputs (tests/test_morphseq.py):

- ops ("xla"): erosion/closing as separable shifted min/max, Otsu as a
  histogram argmax — the current default everywhere.
- fused Pallas ("pallas"): gray+erode in one band kernel, the production
  hist256 kernel + Otsu solve, binary+close in a second band kernel
  (pallas_kernels.gray_erode3_pallas / binary_close3_pallas). Becomes
  the TPU "auto" once hardware parity + timing land (CLAUDE.md runbook).
"""
from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tpuimage.ops.color import rgb_to_gray
from tpuimage.ops.morphology import structuring_element, erode, morph_close, MORPH_RECT
from tpuimage.ops.threshold import threshold_otsu
from tpuimage.ops.histogram import hist256, otsu_from_hist
from tpuimage.io.imageio import load_image_rgb, save_image, ensure_dir

KSIZE = 3
ITERATIONS = 1

_SE3 = structuring_element(MORPH_RECT, KSIZE)


@functools.partial(jax.jit, static_argnames=("impl",))
def morphseq_stages(rgb: jnp.ndarray, impl: str = "auto"
                    ) -> Dict[str, jnp.ndarray]:
    """Jitted core: RGB uint8 HWC -> stage dict (pyc process_morph_seq).

    impl: "pallas"/"xla" force a path (the kernels run interpreted off
    TPU; tests assert bit-identical stages). "auto" = "xla": MEASURED
    winner on the real chip (r4 battery, batch 8 sample.jpg: xla 1.53 ms
    = 6426 MP/s vs the fused Pallas chain's 1.90 ms — XLA's own fusion of
    the 4-stage chain beats the hand-written band kernels here; the
    Pallas path stays as the measured-alternative reference)."""
    from tpuimage.ops.pallas_kernels import morphseq_pallas_applicable
    on_tpu = jax.default_backend() not in ("cpu",)
    if impl == "auto":
        impl = "xla"
    if impl == "pallas":
        from tpuimage.ops.pallas_kernels import (gray_erode3_pallas,
                                                 binary_close3_pallas)
        if not morphseq_pallas_applicable(rgb):
            raise ValueError("fused morphseq chain not applicable here")
        gray, eroded = gray_erode3_pallas(rgb, interpret=not on_tpu)
        t = otsu_from_hist(hist256(eroded))
        otsu, closed = binary_close3_pallas(eroded, t, interpret=not on_tpu)
    else:
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


@functools.partial(jax.jit, static_argnames=("impl",))
def morphseq_batch(rgb_batch: jnp.ndarray, impl: str = "auto"
                   ) -> Dict[str, jnp.ndarray]:
    """vmapped batch form over NHWC uint8."""
    return jax.vmap(lambda im: morphseq_stages(im, impl=impl))(rgb_batch)


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
