"""Host-side image I/O (PIL-backed) and stage-dump helpers.

Replaces cv2.imread/imwrite throughout the reference (DocScanner.py:16,24;
FaceEnhancement.py:18; morph_seq pyc load_image/save_image). The framework's
in-memory convention is RGB uint8 HWC (grayscale HW); the reference's BGR
convention only ever mattered at the cv2 call boundary.

Also carries the compression presets of AI_classification.py:231-236
(_compress_and_save) so the serving path has save-size control.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np
from PIL import Image

COMPRESSION_PRESETS: Dict[str, dict] = {
    # AI_classification.py:231-236
    "FAST": {"jpg_quality": 95, "png_compression": 1, "optimize": False},
    "BALANCED": {"jpg_quality": 90, "png_compression": 6, "optimize": True},
    "HIGH": {"jpg_quality": 85, "png_compression": 9, "optimize": True},
    "MAXIMUM": {"jpg_quality": 82, "png_compression": 9, "optimize": True},
}


def ensure_dir(path: str) -> None:
    if path:
        os.makedirs(path, exist_ok=True)


def load_image_rgb(path: str) -> np.ndarray:
    """Load as RGB uint8 HWC. Raises FileNotFoundError like the reference."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Cannot load image: {path}")
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def load_image_gray(path: str) -> np.ndarray:
    """Load as grayscale uint8 HW using the framework's exact RGB->gray op
    (cv2.IMREAD_GRAYSCALE equivalent, NightLandscapeEnhancement.py:23)."""
    rgb = load_image_rgb(path)
    from tpuimage.ops.color import rgb_to_gray
    return np.asarray(rgb_to_gray(rgb))


def save_image(path: str, img, compression: str | None = None) -> None:
    """Save an RGB/gray uint8 array. ``compression`` picks a preset name."""
    ensure_dir(os.path.dirname(path))
    arr = np.asarray(img)
    im = Image.fromarray(arr)
    ext = os.path.splitext(path)[1].lower()
    if compression is not None:
        p = COMPRESSION_PRESETS[compression]
        if ext in (".jpg", ".jpeg"):
            im.save(path, "JPEG", quality=p["jpg_quality"], optimize=p["optimize"],
                    progressive=True)
            return
        if ext == ".png":
            im.save(path, "PNG", compress_level=p["png_compression"],
                    optimize=p["optimize"])
            return
    im.save(path)


def compress_and_save(img, path: str, preset: str = "BALANCED") -> Tuple[float, float]:
    """AI_classification.py:238 _compress_and_save: returns (orig_mb, compressed_mb)."""
    import tempfile
    arr = np.asarray(img)
    im = Image.fromarray(arr)
    ext = os.path.splitext(path)[1].lower()
    with tempfile.NamedTemporaryFile(suffix=ext or ".png", delete=False) as tmp:
        temp_path = tmp.name
    try:
        if ext in (".jpg", ".jpeg"):
            im.save(temp_path, "JPEG", quality=100)
        else:
            im.save(temp_path, "PNG", compress_level=0)
        original = os.path.getsize(temp_path) / (1024 * 1024)
        save_image(path, arr, compression=preset)
        compressed = os.path.getsize(path) / (1024 * 1024)
        return original, compressed
    finally:
        if os.path.exists(temp_path):
            os.remove(temp_path)


def resize_long_side_np(img: np.ndarray, scale_long: int) -> np.ndarray:
    """Host-side resize keeping aspect, long side -> scale_long
    (DocScanner.py:27-36). Uses the device resize op for parity."""
    from tpuimage.ops.geometry import resize_long_side
    return np.asarray(resize_long_side(img, scale_long))
