"""CLIP preprocessing parity vs the host PIL/torchvision pipeline
(VERDICT r3 Next #6a / weak #7): the reference classifier's eval
transform is torchvision Resize(224, BICUBIC) + CenterCrop(224) +
ToTensor + Normalize over a PIL image (AI_classification.py:152-168 via
open_clip.create_model_and_transforms). The label-affecting stage is the
uint8 resize+crop; tpuimage reproduces Pillow's fixed-point resample
exactly (ops/pil_resize.py), so the u8 stage is asserted BIT-EXACT and
the normalized tensor allclose at f32 rounding tolerance.

torchvision is not installed here; its size/offset arithmetic is
reimplemented in the oracle below with citations:
- _compute_resized_output_size: new_long = int(size * long / short)
  (truncation)  [torchvision/transforms/functional.py]
- CenterCrop: top = int(round((h - crop) / 2.0))  (banker's rounding)
The PIL resize call itself is the real Pillow 12.1.
"""
import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from tpuimage.classify import clip as C
from tpuimage.ops.pil_resize import pil_resize_bicubic

_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float64)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float64)


def oracle_crop_u8(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    if w <= h:
        nh, nw = int(224 * h / w), 224
    else:
        nh, nw = 224, int(224 * w / h)
    out = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC))
    top = int(round((nh - 224) / 2.0))
    left = int(round((nw - 224) / 2.0))
    return out[top:top + 224, left:left + 224]


SHAPES = [
    (480, 640),    # landscape downscale, odd margin after resize
    (640, 480),    # portrait
    (224, 224),    # identity
    (211, 173),    # prime dims, upscale on one side
    (100, 300),    # extreme aspect
    (1200, 849),   # document page shape
    (97, 97),      # square upscale
    (225, 227),    # near-224 odd margins (banker's-rounding case)
]


class TestPilResize:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_resize_bit_exact(self, shape, rng):
        img = rng.integers(0, 256, shape + (3,), np.uint8)
        for th, tw in [(224, 224), (224, 301), (150, 224)]:
            ref = np.asarray(Image.fromarray(img).resize((tw, th),
                                                         Image.BICUBIC))
            ours = np.asarray(pil_resize_bicubic(jnp.asarray(img), th, tw))
            np.testing.assert_array_equal(ours, ref)

    def test_real_image_bit_exact(self):
        from tpuimage.io.imageio import load_image_rgb
        img = load_image_rgb("/root/reference/public/DIP test/Landscape1.jpeg")
        ref = np.asarray(Image.fromarray(img).resize((224, 224),
                                                     Image.BICUBIC))
        ours = np.asarray(pil_resize_bicubic(jnp.asarray(img), 224, 224))
        np.testing.assert_array_equal(ours, ref)


class TestPreprocess:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_crop_u8_bit_exact(self, shape, rng):
        img = rng.integers(0, 256, shape + (3,), np.uint8)
        ours = np.asarray(C.preprocess_crop_u8(jnp.asarray(img)))
        np.testing.assert_array_equal(ours, oracle_crop_u8(img))

    def test_normalized_batch_matches_host(self, rng):
        imgs = rng.integers(0, 256, (3, 480, 640, 3), np.uint8)
        ours = np.asarray(C.preprocess_batch(jnp.asarray(imgs)))
        ref = np.stack([(oracle_crop_u8(i) / 255.0 - _MEAN) / _STD
                        for i in imgs])
        assert ours.shape == (3, 224, 224, 3)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)

    def test_real_images_bit_exact(self):
        """The four scene classes' real sample images, end to end."""
        from tpuimage.io.imageio import load_image_rgb
        for path in ["DIP test/Landscape1.jpeg", "DIP test/NightScape1.jpeg",
                     "DIP test/document1.jpeg", "DIP test/wenhao_wang.jpeg"]:
            img = load_image_rgb(f"/root/reference/public/{path}")
            ours = np.asarray(C.preprocess_crop_u8(jnp.asarray(img)))
            np.testing.assert_array_equal(ours, oracle_crop_u8(img),
                                          err_msg=path)
