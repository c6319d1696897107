"""Haar cascade object detection (Viola-Jones) as dense TPU evaluation.

Replaces cv2.CascadeClassifier.detectMultiScale at FaceEnhancement.py:
177-182 (haarcascade_eye.xml, scale 1.1, minNeighbors 5, minSize 30x30)
and classification.py:52-57 / AI_classification.py:120-127
(haarcascade_frontalface_default.xml, scale 1.1, minNeighbors 5,
minSize 40x40).

OpenCV's detector walks windows sequentially with per-window early exit —
TPU-hostile. Here every scale is an image-pyramid level (resize by
1/factor, like OpenCV's new-style cascade): the integral and
squared-integral images are cumsums, each Haar feature at ALL window
positions simultaneously is a fixed linear combination of shifted views
of the integral image, stage sums are dense adds, and the cascade's
early-exit becomes a running boolean mask AND-ed per stage (masked dense
evaluation, SURVEY.md §7 hard part 2). Detected rects then go through the
same rounding and groupRectangles clustering as OpenCV.

Cascade XMLs are the stock OpenCV data files (found on this system under
/usr/share/opencv4/haarcascades); the parser reads the new
``opencv-cascade-classifier`` stump format.
"""
from __future__ import annotations

import functools
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpuimage.ops.geometry import resize

_CASCADE_SEARCH_PATHS = [
    "/usr/share/opencv4/haarcascades",
    os.path.join(os.path.dirname(__file__), "data"),
]


def find_cascade(name: str) -> str:
    for base in _CASCADE_SEARCH_PATHS:
        p = os.path.join(base, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"cascade {name!r} not found in {_CASCADE_SEARCH_PATHS}")


class HaarCascade:
    """Parsed stump cascade: packed numpy arrays ready for dense eval."""

    def __init__(self, xml_path: str):
        root = ET.parse(xml_path).getroot()
        c = root.find("cascade")
        if c is None or c.get("type_id") != "opencv-cascade-classifier":
            raise ValueError(f"{xml_path}: not a new-format cascade")
        self.win_h = int(c.findtext("height"))
        self.win_w = int(c.findtext("width"))

        feats = []
        for f in c.find("features"):
            rects = []
            for r in f.find("rects"):
                x, y, w, h, wt = r.text.split()
                rects.append((int(x), int(y), int(w), int(h), float(wt)))
            while len(rects) < 3:
                rects.append((0, 0, 0, 0, 0.0))
            feats.append(rects)
        self.rects = np.asarray(feats, dtype=np.float32)  # (F, 3, 5)

        stage_thresholds = []
        stage_slices = []
        feat_idx, node_thr, leaves = [], [], []
        for st in c.find("stages"):
            stage_thresholds.append(float(st.findtext("stageThreshold")))
            start = len(feat_idx)
            for wc in st.find("weakClassifiers"):
                nodes = wc.findtext("internalNodes").split()
                lv = wc.findtext("leafValues").split()
                assert nodes[0] == "0" and nodes[1] == "-1", "stump cascade only"
                feat_idx.append(int(nodes[2]))
                node_thr.append(float(nodes[3]))
                leaves.append((float(lv[0]), float(lv[1])))
            stage_slices.append((start, len(feat_idx)))
        self.stage_thresholds = np.asarray(stage_thresholds, dtype=np.float32)
        self.stage_slices = stage_slices
        self.feat_idx = np.asarray(feat_idx, dtype=np.int32)
        self.node_thr = np.asarray(node_thr, dtype=np.float32)
        self.leaves = np.asarray(leaves, dtype=np.float32)  # (W, 2)


@functools.lru_cache(maxsize=8)
def load_cascade(name: str) -> HaarCascade:
    return HaarCascade(find_cascade(name))


# ---------------------------------------------------------------------------
# dense single-scale evaluation
# ---------------------------------------------------------------------------

def _integral(img_f32: jnp.ndarray) -> jnp.ndarray:
    """(H+1, W+1) integral image like cv2.integral."""
    s = jnp.cumsum(jnp.cumsum(img_f32, axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


def _rect_sums(ii: jnp.ndarray, x: int, y: int, w: int, h: int,
               oh: int, ow: int) -> jnp.ndarray:
    """Sum over rect (x..x+w, y..y+h) for every window origin on the
    (oh, ow) origin grid — four shifted views of the integral image."""
    return (ii[y + h:y + h + oh, x + w:x + w + ow]
            - ii[y:y + oh, x + w:x + w + ow]
            - ii[y + h:y + h + oh, x:x + ow]
            + ii[y:y + oh, x:x + ow])


@functools.partial(jax.jit, static_argnames=("cascade_key",))
def _eval_scale(gray_scaled: jnp.ndarray, cascade_key: str) -> jnp.ndarray:
    """Evaluate the cascade at every window origin of one pyramid level.
    Returns a boolean (oh, ow) pass map."""
    casc = load_cascade(cascade_key)
    wh, ww = casc.win_h, casc.win_w
    H, W = gray_scaled.shape
    oh, ow = H - wh + 1, W - ww + 1

    x = gray_scaled.astype(jnp.float32)
    ii = _integral(x)
    sq = _integral(x * x)

    # variance normalization over normrect = (1, 1, w-2, h-2) like OpenCV's
    # HaarEvaluator
    nx, ny, nw, nh = 1, 1, ww - 2, wh - 2
    area = float(nw * nh)
    vsum = _rect_sums(ii, nx, ny, nw, nh, oh, ow)
    vsq = _rect_sums(sq, nx, ny, nw, nh, oh, ow)
    nf2 = area * vsq - vsum * vsum
    nf = jnp.sqrt(jnp.maximum(nf2, 0.0))
    valid_var = nf2 > 0.0
    nf = jnp.where(valid_var, nf, 1.0)

    passed = valid_var
    for (s0, s1), sthr in zip(casc.stage_slices, casc.stage_thresholds):
        ssum = jnp.zeros((oh, ow), dtype=jnp.float32)
        for wci in range(s0, s1):
            fi = int(casc.feat_idx[wci])
            val = jnp.zeros((oh, ow), dtype=jnp.float32)
            for (rx, ry, rw, rh, wt) in casc.rects[fi]:
                if wt == 0.0:
                    continue
                val = val + wt * _rect_sums(ii, int(rx), int(ry), int(rw), int(rh), oh, ow)
            thr = casc.node_thr[wci] * nf
            lo, hi = float(casc.leaves[wci, 0]), float(casc.leaves[wci, 1])
            ssum = ssum + jnp.where(val < thr, lo, hi)
        passed = passed & (ssum >= float(sthr))
    return passed


# ---------------------------------------------------------------------------
# multi-scale driver + grouping (host, mirrors OpenCV)
# ---------------------------------------------------------------------------

def _group_rectangles(rects: List[Tuple[int, int, int, int]], group_threshold: int,
                      eps: float = 0.2) -> List[Tuple[int, int, int, int]]:
    """cv2.groupRectangles: union-find clustering by the eps-similarity
    predicate, average rect per class, neighbor-count + containment filters."""
    n = len(rects)
    if n == 0:
        return []
    R = np.asarray(rects, dtype=np.float64)

    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            delta = eps * (min(R[i, 2], R[j, 2]) + min(R[i, 3], R[j, 3])) * 0.5
            if (abs(R[i, 0] - R[j, 0]) <= delta and abs(R[i, 1] - R[j, 1]) <= delta
                    and abs(R[i, 0] + R[i, 2] - R[j, 0] - R[j, 2]) <= delta
                    and abs(R[i, 1] + R[i, 3] - R[j, 1] - R[j, 3]) <= delta):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri

    classes: Dict[int, List[int]] = {}
    for i in range(n):
        classes.setdefault(find(i), []).append(i)

    rrects, weights = [], []
    for members in classes.values():
        m = R[np.asarray(members)]
        nm = len(members)
        avg = np.rint(m.mean(axis=0)).astype(np.int64)
        rrects.append(avg)
        weights.append(nm)

    out = []
    for i, (r1, n1) in enumerate(zip(rrects, weights)):
        if n1 <= group_threshold:
            continue
        keep = True
        for j, (r2, n2) in enumerate(zip(rrects, weights)):
            if i == j:
                continue
            dx = int(r2[2] * eps)
            dy = int(r2[3] * eps)
            if (n2 > max(3, n1)
                    and r1[0] >= r2[0] - dx and r1[1] >= r2[1] - dy
                    and r1[0] + r1[2] <= r2[0] + r2[2] + dx
                    and r1[1] + r1[3] <= r2[1] + r2[3] + dy):
                keep = False
                break
        if keep:
            out.append((int(r1[0]), int(r1[1]), int(r1[2]), int(r1[3])))
    return out


def detect_multi_scale(gray: np.ndarray, cascade_name: str,
                       scale_factor: float = 1.1, min_neighbors: int = 5,
                       min_size: Tuple[int, int] = (0, 0),
                       max_size: Tuple[int, int] | None = None,
                       ) -> List[Tuple[int, int, int, int]]:
    """cv2.CascadeClassifier(cascade).detectMultiScale equivalent.

    Returns a list of (x, y, w, h) like the reference call sites expect.
    """
    casc = load_cascade(cascade_name)
    H, W = gray.shape
    gray_j = jnp.asarray(gray)

    candidates: List[Tuple[int, int, int, int]] = []
    factor = 1.0
    while True:
        win_w = int(round(casc.win_w * factor))
        win_h = int(round(casc.win_h * factor))
        sw, sh = int(round(W / factor)), int(round(H / factor))
        if sw - casc.win_w <= 0 or sh - casc.win_h <= 0:
            break
        if max_size and (win_w > max_size[0] or win_h > max_size[1]):
            break
        if win_w < min_size[0] or win_h < min_size[1]:
            factor *= scale_factor
            continue
        scaled = resize(gray_j, sh, sw, "linear")
        passed = np.asarray(_eval_scale(scaled, cascade_name))
        step = 1 if factor > 2.0 else 2
        ys, xs = np.nonzero(passed[::step, ::step])
        for y, x in zip(ys * step, xs * step):
            candidates.append((int(round(x * factor)), int(round(y * factor)),
                               win_w, win_h))
        factor *= scale_factor

    return _group_rectangles(candidates, min_neighbors)


def detect_eyes(gray: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """FaceEnhancement.py:177-182 parameters."""
    return detect_multi_scale(gray, "haarcascade_eye.xml",
                              scale_factor=1.1, min_neighbors=5,
                              min_size=(30, 30))


def detect_faces(gray: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """classification.py:52-57 / AI_classification.py:120-127 parameters."""
    return detect_multi_scale(gray, "haarcascade_frontalface_default.xml",
                              scale_factor=1.1, min_neighbors=5,
                              min_size=(40, 40))
