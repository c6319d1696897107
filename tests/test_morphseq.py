"""Fused morph_seq Pallas chain vs the plain ops path.

The two implementations of pipelines.morphseq.morphseq_stages must be
bit-identical on every stage: gray+erode3 fused band kernel
(pallas_kernels.gray_erode3_pallas), Otsu from the shared hist path, and
binary+close3 fused band kernel (binary_close3_pallas) vs rgb_to_gray /
erode / threshold_otsu / morph_close. Kernels run interpreted on the CPU
suite; hardware parity is checked by benchmarks/hw_check_kernels.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from tpuimage.pipelines import morphseq


STAGES = ("step1_gray", "step2_eroded", "step3_otsu", "step4_closed")


def _assert_stages_equal(rgb):
    a = morphseq.morphseq_stages(jnp.asarray(rgb), impl="xla")
    b = morphseq.morphseq_stages(jnp.asarray(rgb), impl="pallas")
    for k in STAGES:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=f"stage {k}")


class TestFusedMorphseq:
    @pytest.mark.parametrize("shape", [(97, 131), (64, 128), (128, 64),
                                       (33, 257)])
    def test_random_bitexact(self, rng, shape):
        rgb = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
        _assert_stages_equal(rgb)

    def test_real_image_bitexact(self):
        from PIL import Image
        with Image.open("/root/reference/public/sample.jpg") as im:
            rgb = np.asarray(im.convert("RGB").resize((213, 160)),
                             dtype=np.uint8)
        _assert_stages_equal(rgb)

    def test_near_constant_image(self, rng):
        """Degenerate Otsu input (all pixels in two adjacent bins)."""
        rgb = np.full((64, 130, 3), 200, np.uint8)
        rgb[10:20, 40:80] = 199
        _assert_stages_equal(rgb)

    def test_batch_form_matches_single(self, rng):
        batch = rng.integers(0, 256, size=(3, 64, 96, 3), dtype=np.uint8)
        out = morphseq.morphseq_batch(jnp.asarray(batch), impl="pallas")
        for i in range(3):
            one = morphseq.morphseq_stages(jnp.asarray(batch[i]),
                                           impl="xla")
            for k in STAGES:
                np.testing.assert_array_equal(
                    np.asarray(out[k][i]), np.asarray(one[k]),
                    err_msg=f"image {i} stage {k}")

    def test_applicability_gate(self):
        from tpuimage.ops.pallas_kernels import morphseq_pallas_applicable
        assert morphseq_pallas_applicable(
            np.zeros((963, 1280, 3), np.uint8))
        assert not morphseq_pallas_applicable(np.zeros((64, 64), np.uint8))
        with pytest.raises(ValueError):
            morphseq.morphseq_stages(jnp.zeros((64, 64), jnp.uint8),
                                     impl="pallas")
