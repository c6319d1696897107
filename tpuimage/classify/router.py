"""Label -> enhancement-pipeline routing (the reference's serve path).

Mirrors AI_classification.py:859-876: the confirmed label dispatches to
one of the four enhancement runners (:627-704). Each runner here is the
tpuimage pipeline with the GUI's exact overrides.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


def enhance_for_label(label: str, rgb: np.ndarray) -> np.ndarray:
    """Run the enhancement pipeline the GUI routes this label to.
    Returns the enhanced RGB uint8 image (the GUI's display output)."""
    if label == "nightscape":
        from tpuimage.pipelines.night import night_rgb  # :627-637
        return np.asarray(night_rgb(jnp.asarray(rgb))["enhanced"])
    if label == "landscape":
        from tpuimage.pipelines.landscape import landscape_gui  # :683-704
        return np.asarray(landscape_gui(jnp.asarray(rgb)))
    if label == "face":
        from tpuimage.pipelines.face import enhance_face  # :707-768
        return enhance_face(rgb, variant="gui")["final"]
    if label == "document":
        # :640-663 — DocScanner with the GUI override config; the GUI
        # displays the final binary as RGB
        from tpuimage.pipelines import docscan
        from tpuimage.ops.color import gray_to_rgb
        res = docscan.process_document(np.asarray(rgb), out_dir=None,
                                       save_stages=False,
                                       config=docscan.GUI_DOCUMENT_CONFIG)
        return np.asarray(gray_to_rgb(res["binary"]))
    raise ValueError(f"unknown label {label!r}")


def classify_and_enhance(rgb: np.ndarray, classifier: str = "weighted",
                         clip_model=None) -> Tuple[str, Dict[str, float], np.ndarray]:
    """The full GUI flow: classify (CLIP if a model is supplied, else the
    heuristic — matching ensure_model's fallback, AI_classification.py:
    787-800) then route to the enhancement pipeline."""
    if clip_model is not None:
        label, probs = clip_model.predict_array(rgb)
    elif classifier == "priority":
        from tpuimage.classify.heuristic import classify_priority
        label, probs = classify_priority(rgb), {}
    else:
        from tpuimage.classify.heuristic import classify_weighted
        label, probs = classify_weighted(rgb)
    return label, probs, enhance_for_label(label, rgb)
