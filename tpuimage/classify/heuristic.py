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
from tpuimage.ops.edges import canny, canny_batch
from tpuimage.ops.hough import hough_line_count
from tpuimage.detect import contours as cnt
from tpuimage.detect.haar import detect_faces, detect_faces_batch

LABELS = ["nightscape", "landscape", "document", "face"]


@jax.jit
def _device_cues(rgb: jnp.ndarray):
    """(white_ratio, line_count, brightness, otsu_binary, hough_overflow,
    gray) in one program (gray is returned so batch callers feed Haar
    without a separate per-image rgb_to_gray dispatch)."""
    gray = colorops.rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
    _, binary = threshold_otsu(gray)
    white_ratio = jnp.mean((binary == 255).astype(jnp.float32))
    edges = canny(gray, 50, 150)
    # Edge budget = max(56.25% of pixels capped at 512k, 128*h): the
    # 128*h term makes the per-band cap cover a FULL-HEIGHT vertical line
    # (all h pixels of one column share a band when w % 128 == 0 — a
    # (h*w)//4 budget capped such a line at 128 votes, below the 150
    # threshold, silently erasing it from the count); the 9/16 density
    # term covers the committed noise images (facewith50noise.jpg's Canny
    # is 37% dense with a 40%-of-positions max band — the "2-13% measured"
    # rule of thumb holds only for natural photos). For 256x256 cue
    # images this is 36864 -> kb=288, still the vote kernel's theta-inner
    # path (round-2 ADVICE item 1); overflow is returned so even denser
    # inputs warn instead of miscounting.
    h, w = gray.shape[0], gray.shape[1]
    budget = max(min((h * w * 9) // 16, 524288), 128 * h)
    line_count, overflow = hough_line_count(edges, threshold=150,
                                            max_lines=256, max_edges=budget,
                                            return_overflow=True)
    brightness = jnp.mean(gray.astype(jnp.float32))
    return white_ratio, line_count, brightness, binary, overflow, gray


def _large_rect(binary: np.ndarray) -> bool:
    """classification.py:76-89: any >=30%-area 4-gon contour in the Otsu
    binary (the ONE implementation — batch and single paths share it)."""
    img_area = float(binary.shape[0] * binary.shape[1])
    for c in cnt.find_external_contours(binary):
        if cnt.contour_area(c) < 0.3 * img_area:
            continue
        approx = cnt.approx_poly_dp(c, 0.02 * cnt.arc_length(c, True), True)
        if len(approx) == 4:
            return True
    return False


def _warn_overflow():
    import warnings
    warnings.warn("hough edge budget overflowed on a classifier cue "
                  "image: line_count is an undercount", RuntimeWarning)


def _priority_rule(fc: int, white_ratio: float, lines_count: int,
                   large_rect: bool, bmean: float) -> str:
    """classification.py:97-116 decision ladder (shared by the single and
    batch forms so the thresholds cannot desynchronize)."""
    if fc > 0:
        return "face"
    if white_ratio >= 0.5 and (lines_count >= 50 or large_rect):
        return "document"
    return "nightscape" if bmean < 80.0 else "landscape"


def _weighted_rule(fc: int, white_ratio: float, lines_count: int,
                   large_rect: bool, bmean: float):
    """AI_classification.py:115-149 additive scores -> (label, probs)
    (shared by the single and batch forms)."""
    scores: Dict[str, float] = {k: 0.0 for k in LABELS}
    if fc > 0:
        scores["face"] += 1.0 + 0.5 * min(fc, 3)
    scores["document"] += (white_ratio - 0.5) * 2.0
    if lines_count >= 50:
        scores["document"] += 0.5
    if large_rect:
        scores["document"] += 0.5
    if bmean < 80:
        scores["nightscape"] += (80 - bmean) / 80.0
    else:
        scores["landscape"] += (bmean - 80) / 80.0
    label = max(scores.items(), key=lambda kv: kv[1])[0]
    total = sum(v for v in scores.values() if v > 0) or 1.0
    probs = {k: max(v, 0.0) / total for k, v in scores.items()}
    return label, probs


def document_cues(rgb: np.ndarray) -> Tuple[float, int, bool]:
    """classification.py:63-91 document_score: (white_ratio, lines, rect)."""
    white_ratio, line_count, _, binary, overflow, _ = _device_cues(
        jnp.asarray(rgb))
    if bool(overflow):
        _warn_overflow()
    return (float(white_ratio), int(line_count),
            _large_rect(np.asarray(binary)))


def classify_priority(rgb: np.ndarray) -> str:
    """classification.py:97-116 classify_image: face > document >
    brightness split at 80."""
    gray = np.asarray(colorops.rgb_to_gray(jnp.asarray(rgb)))
    fc = len(detect_faces(gray))
    if fc > 0:
        return "face"  # skip the cue program entirely, like the reference
    white_ratio, lines_count, large_rect = document_cues(rgb)
    return _priority_rule(fc, white_ratio, lines_count, large_rect,
                          float(gray.mean()))


def classify_weighted(rgb: np.ndarray) -> Tuple[str, Dict[str, float]]:
    """AI_classification.py:115-149 classify_heuristic: additive scores,
    argmax label, positive scores normalized into display probs."""
    gray = np.asarray(colorops.rgb_to_gray(jnp.asarray(rgb)))
    fc = len(detect_faces(gray))
    white_ratio, lines_count, large_rect = document_cues(rgb)
    return _weighted_rule(fc, white_ratio, lines_count, large_rect,
                          float(gray.mean()))


# ---------------------------------------------------------------------------
# batch serving path
# ---------------------------------------------------------------------------

# Batched cue-program schedule, bit-exact on every setting (the parity
# tests pin all of them against jax.vmap(_device_cues)):
#   canny:      "vmap" (per-image canny under vmap) | "stacked" (one
#               stacked-plane hysteresis fixpoint — ops.edges.canny_batch)
#               | "stacked_linescan" (stacked plane + the log-step
#               doubling flood — far fewer fixpoint iterations per check)
#   theta_pack / unroll / vote_lo: the Hough vote-kernel schedule knobs
#               (ops.hough.hough_accumulator).
# Round-4 hardware sweeps (benchmarks/micro_classify.py, real v5e,
# 2026-08-19). The bitpacked hysteresis (ops.edges, "auto" on TPU) made
# the canny block nearly free (2.6 -> 0.25 ms on the 12-image cue batch),
# which FLIPPED the canny lever: the stacked-plane fixpoint's win was
# amortizing hysteresis iterations across the batch, and with iterations
# this cheap its guard-row plumbing only adds cost (0.30 vs 0.25 ms).
# Winner: plain vmap canny + theta_pack=4 + 32-bin lo-pass vote =
# 2.18 ms = 331 MP/s on the cue block (the 20x bar is 242 MP/s).
# All settings are bit-exact (tests pin them against vmap(_device_cues)).
CUE_SCHEDULE: Dict[str, object] = {
    "canny": "vmap", "theta_pack": 4, "unroll": 1, "vote_lo": 32,
}


@functools.partial(jax.jit, static_argnames=("canny_impl", "theta_pack",
                                             "unroll", "vote_lo"))
def _device_cues_batch(stack, canny_impl: str = "vmap", theta_pack: int = 1,
                       unroll: int = 1, vote_lo: int = 0):
    """_device_cues over a same-shape stack — identical per-image outputs
    (pinned by tests/test_classify.py) with the batch-level levers of
    round-3 VERDICT Next #4: optionally ONE stacked-plane canny
    hysteresis fixpoint for the whole batch and a packed vote-kernel
    schedule, instead of vmapping everything per image."""
    gray = (jax.vmap(colorops.rgb_to_gray)(stack) if stack.ndim == 4
            else stack)
    binary = jax.vmap(lambda g: threshold_otsu(g)[1])(gray)
    white_ratio = jnp.mean((binary == 255).astype(jnp.float32), axis=(1, 2))
    if canny_impl == "stacked":
        edges = canny_batch(gray, 50, 150)
    elif canny_impl == "stacked_linescan":
        edges = canny_batch(gray, 50, 150, impl="linescan")
    elif canny_impl == "stacked_hybrid":
        edges = canny_batch(gray, 50, 150, impl="hybrid")
    else:
        edges = jax.vmap(lambda g: canny(g, 50, 150))(gray)
    h, w = gray.shape[1], gray.shape[2]
    budget = max(min((h * w * 9) // 16, 524288), 128 * h)
    line_count, overflow = jax.vmap(
        lambda e: hough_line_count(e, threshold=150, max_lines=256,
                                   max_edges=budget, return_overflow=True,
                                   theta_pack=theta_pack, unroll=unroll,
                                   vote_lo=vote_lo))(edges)
    brightness = jnp.mean(gray.astype(jnp.float32), axis=(1, 2))
    return white_ratio, line_count, brightness, binary, overflow, gray


def _batch_cues(rgbs):
    """Device cues for a list of images: same-shape groups run as ONE
    batched program (which also yields the grayscale, so Haar needs no
    per-image rgb_to_gray dispatches — each was a tunnel round trip);
    Haar faces run as one batched cascade pass afterwards.
    Returns per-image (bmean, face_count, white_ratio, line_count, rect)."""
    arrs = [np.asarray(r) for r in rgbs]
    n = len(arrs)
    grays = [None] * n
    wrs = [0.0] * n
    lcs = [0] * n
    rects = [False] * n
    by_shape: Dict[tuple, list] = {}
    for i, a in enumerate(arrs):
        by_shape.setdefault(a.shape, []).append(i)
    for shape, idxs in by_shape.items():
        stack = jnp.asarray(np.stack([arrs[i] for i in idxs]))
        wr, lc, _, binary, ovf, gray = _device_cues_batch(
            stack, canny_impl=CUE_SCHEDULE["canny"],
            theta_pack=CUE_SCHEDULE["theta_pack"],
            unroll=CUE_SCHEDULE["unroll"],
            vote_lo=CUE_SCHEDULE["vote_lo"])
        if bool(np.asarray(ovf).any()):
            _warn_overflow()
        wr, lc = np.asarray(wr), np.asarray(lc)
        binary, gray = np.asarray(binary), np.asarray(gray)
        for j, i in enumerate(idxs):
            grays[i] = gray[j]
            wrs[i], lcs[i] = float(wr[j]), int(lc[j])
            rects[i] = _large_rect(binary[j])
    faces = detect_faces_batch(grays)
    return [(float(grays[i].mean()), len(faces[i]), wrs[i], lcs[i],
             rects[i]) for i in range(n)]


def classify_priority_batch(rgbs) -> list:
    """classify_priority over a list of images: one vmapped cue program
    per shape group + one batched Haar pass (identical labels to the
    per-image form)."""
    return [_priority_rule(fc, wr, lc, rect, bmean)
            for bmean, fc, wr, lc, rect in _batch_cues(rgbs)]


def classify_weighted_batch(rgbs) -> list:
    """classify_weighted over a list of images (batched cues + Haar);
    returns [(label, probs), ...] identical to the per-image form."""
    return [_weighted_rule(fc, wr, lc, rect, bmean)
            for bmean, fc, wr, lc, rect in _batch_cues(rgbs)]
