"""Border handling matching OpenCV border types.

OpenCV filter default is BORDER_REFLECT_101 (``gfedcb|abcdefgh|gfedcba``),
which is numpy/jnp ``reflect``. medianBlur and adaptiveThreshold use
BORDER_REPLICATE (``edge``); erode/dilate use an effective +/-inf constant.
"""
from __future__ import annotations

import jax.numpy as jnp

BORDER_REFLECT_101 = "reflect"   # cv2.BORDER_DEFAULT / BORDER_REFLECT_101
BORDER_REPLICATE = "edge"        # cv2.BORDER_REPLICATE
BORDER_REFLECT = "symmetric"     # cv2.BORDER_REFLECT
BORDER_CONSTANT = "constant"     # cv2.BORDER_CONSTANT


def pad2d(img: jnp.ndarray, top: int, bottom: int, left: int, right: int,
          mode: str = BORDER_REFLECT_101, value=0) -> jnp.ndarray:
    """Pad the two leading spatial dims of an HW or HWC array."""
    pads = [(top, bottom), (left, right)] + [(0, 0)] * (img.ndim - 2)
    if mode == BORDER_CONSTANT:
        return jnp.pad(img, pads, mode="constant", constant_values=value)
    return jnp.pad(img, pads, mode=mode)
