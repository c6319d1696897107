"""Scene classifiers: priority (classification.py:97-116) and weighted
(AI_classification.py:115-149).

Both keep the reference's exact rules and thresholds. Device ops compute
the cues (Otsu white ratio, Canny + Hough line count, brightness); the
large-rectangle cue and the Haar face count use the host detectors
(tpuimage.detect), mirroring the reference call sites.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpuimage.ops import color as colorops
from tpuimage.ops.threshold import threshold_otsu
from tpuimage.ops.edges import canny
from tpuimage.ops.hough import hough_line_count
from tpuimage.detect import contours as cnt
from tpuimage.detect.haar import detect_faces, detect_faces_batch

LABELS = ["nightscape", "landscape", "document", "face"]


@jax.jit
def _device_cues(rgb: jnp.ndarray):
    """(white_ratio, line_count, brightness, otsu_binary, hough_overflow)
    in one program."""
    gray = colorops.rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
    _, binary = threshold_otsu(gray)
    white_ratio = jnp.mean((binary == 255).astype(jnp.float32))
    edges = canny(gray, 50, 150)
    # Edge budget = 128*h: the per-band cap (h) covers a FULL-HEIGHT
    # vertical line (all h pixels of one column share a band when
    # w % 128 == 0 — a (h*w)//4 budget capped such a line at 128 votes,
    # below the 150 threshold, silently erasing it from the count). For
    # 256x256 cue images kb=256 still rides the vote kernel's theta-inner
    # path (round-2 ADVICE item 1); overflow is returned so denser inputs
    # warn instead of miscounting.
    h, w = gray.shape[0], gray.shape[1]
    line_count, overflow = hough_line_count(edges, threshold=150,
                                            max_lines=256,
                                            max_edges=128 * h,
                                            return_overflow=True)
    brightness = jnp.mean(gray.astype(jnp.float32))
    return white_ratio, line_count, brightness, binary, overflow


def document_cues(rgb: np.ndarray) -> Tuple[float, int, bool]:
    """classification.py:63-91 document_score: (white_ratio, lines, rect)."""
    white_ratio, line_count, _, binary, overflow = _device_cues(
        jnp.asarray(rgb))
    if bool(overflow):
        import warnings
        warnings.warn("hough edge budget overflowed on a classifier cue "
                      "image: line_count is an undercount", RuntimeWarning)
    binary = np.asarray(binary)
    img_area = float(binary.shape[0] * binary.shape[1])
    large_rect = False
    for c in cnt.find_external_contours(binary):
        if cnt.contour_area(c) < 0.3 * img_area:
            continue
        approx = cnt.approx_poly_dp(c, 0.02 * cnt.arc_length(c, True), True)
        if len(approx) == 4:
            large_rect = True
            break
    return float(white_ratio), int(line_count), large_rect


def classify_priority(rgb: np.ndarray) -> str:
    """classification.py:97-116 classify_image: face > document >
    brightness split at 80."""
    gray = np.asarray(colorops.rgb_to_gray(jnp.asarray(rgb)))
    if len(detect_faces(gray)) > 0:
        return "face"
    white_ratio, lines_count, large_rect = document_cues(rgb)
    if white_ratio >= 0.5 and (lines_count >= 50 or large_rect):
        return "document"
    return "nightscape" if float(gray.mean()) < 80.0 else "landscape"


def classify_weighted(rgb: np.ndarray) -> Tuple[str, Dict[str, float]]:
    """AI_classification.py:115-149 classify_heuristic: additive scores,
    argmax label, positive scores normalized into display probs."""
    gray = np.asarray(colorops.rgb_to_gray(jnp.asarray(rgb)))
    scores: Dict[str, float] = {k: 0.0 for k in LABELS}

    fc = len(detect_faces(gray))
    if fc > 0:
        scores["face"] += 1.0 + 0.5 * min(fc, 3)

    white_ratio, lines_count, large_rect = document_cues(rgb)
    scores["document"] += (white_ratio - 0.5) * 2.0
    if lines_count >= 50:
        scores["document"] += 0.5
    if large_rect:
        scores["document"] += 0.5

    bmean = float(gray.mean())
    if bmean < 80:
        scores["nightscape"] += (80 - bmean) / 80.0
    else:
        scores["landscape"] += (bmean - 80) / 80.0

    label = max(scores.items(), key=lambda kv: kv[1])[0]
    total = sum(v for v in scores.values() if v > 0) or 1.0
    probs = {k: max(v, 0.0) / total for k, v in scores.items()}
    return label, probs


# ---------------------------------------------------------------------------
# batch serving path
# ---------------------------------------------------------------------------

def _batch_cues(rgbs):
    """Device cues for a list of images: same-shape groups run as ONE
    vmapped program; Haar faces run as one batched cascade pass.
    Returns per-image (gray, face_count, white_ratio, line_count, rect)."""
    arrs = [np.asarray(r) for r in rgbs]
    grays = [np.asarray(colorops.rgb_to_gray(jnp.asarray(a))) for a in arrs]
    faces = detect_faces_batch(grays)

    cues = [None] * len(arrs)
    by_shape: Dict[tuple, list] = {}
    for i, a in enumerate(arrs):
        by_shape.setdefault(a.shape, []).append(i)
    for shape, idxs in by_shape.items():
        stack = jnp.asarray(np.stack([arrs[i] for i in idxs]))
        wr, lc, _, binary, ovf = jax.vmap(_device_cues)(stack)
        if bool(np.asarray(ovf).any()):
            import warnings
            warnings.warn("hough edge budget overflowed on a classifier "
                          "cue image: line_count is an undercount",
                          RuntimeWarning)
        wr, lc, binary = np.asarray(wr), np.asarray(lc), np.asarray(binary)
        for j, i in enumerate(idxs):
            img_area = float(binary[j].shape[0] * binary[j].shape[1])
            large_rect = False
            for c in cnt.find_external_contours(binary[j]):
                if cnt.contour_area(c) < 0.3 * img_area:
                    continue
                approx = cnt.approx_poly_dp(
                    c, 0.02 * cnt.arc_length(c, True), True)
                if len(approx) == 4:
                    large_rect = True
                    break
            cues[i] = (grays[i], len(faces[i]), float(wr[j]), int(lc[j]),
                       large_rect)
    return cues


def classify_priority_batch(rgbs) -> list:
    """classify_priority over a list of images: one vmapped cue program
    per shape group + one batched Haar pass (identical labels to the
    per-image form)."""
    out = []
    for gray, fc, white_ratio, lines_count, large_rect in _batch_cues(rgbs):
        if fc > 0:
            out.append("face")
        elif white_ratio >= 0.5 and (lines_count >= 50 or large_rect):
            out.append("document")
        else:
            out.append("nightscape" if float(gray.mean()) < 80.0 else "landscape")
    return out


def classify_weighted_batch(rgbs) -> list:
    """classify_weighted over a list of images (batched cues + Haar);
    returns [(label, probs), ...] identical to the per-image form."""
    out = []
    for gray, fc, white_ratio, lines_count, large_rect in _batch_cues(rgbs):
        scores: Dict[str, float] = {k: 0.0 for k in LABELS}
        if fc > 0:
            scores["face"] += 1.0 + 0.5 * min(fc, 3)
        scores["document"] += (white_ratio - 0.5) * 2.0
        if lines_count >= 50:
            scores["document"] += 0.5
        if large_rect:
            scores["document"] += 0.5
        bmean = float(gray.mean())
        if bmean < 80:
            scores["nightscape"] += (80 - bmean) / 80.0
        else:
            scores["landscape"] += (bmean - 80) / 80.0
        label = max(scores.items(), key=lambda kv: kv[1])[0]
        total = sum(v for v in scores.values() if v > 0) or 1.0
        probs = {k: max(v, 0.0) / total for k, v in scores.items()}
        out.append((label, probs))
    return out
