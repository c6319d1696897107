"""Haar cascade object detection (Viola-Jones).

Replaces cv2.CascadeClassifier.detectMultiScale at FaceEnhancement.py:
177-182 (haarcascade_eye.xml, scale 1.1, minNeighbors 5, minSize 30x30)
and classification.py:52-57 / AI_classification.py:120-127
(haarcascade_frontalface_default.xml, scale 1.1, minNeighbors 5,
minSize 40x40). Note this image's cv2 build (5.0) has dropped
CascadeClassifier entirely — this module is the only working detector.

Evaluation strategy (SURVEY.md §7 hard part 2, fallback milestone):
per pyramid level the integral images are cumsums and each stage is
evaluated VECTORIZED over the currently-alive window set (numpy fancy
indexing over flat integral offsets); the cascade's early exit becomes
stage-wise compaction of the alive set. Early stages kill >95% of
windows, so the work profile matches OpenCV's sequential early-exit
without any per-window Python loop. This runs on host: detection is a
once-per-image routing step (not benchmark-path work), windows shrink
dynamically (TPU-hostile shapes), and the arithmetic is integer-exact.
Rect clustering is the same groupRectangles algorithm as OpenCV.

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
# single-scale evaluation: stage-wise alive-set compaction (host numpy)
# ---------------------------------------------------------------------------

def _eval_scale(gray_scaled: np.ndarray, casc: HaarCascade,
                step: int) -> np.ndarray:
    """Evaluate the cascade at every ``step``-strided window origin of one
    pyramid level. Returns (K, 2) surviving (y, x) origins."""
    wh, ww = casc.win_h, casc.win_w
    H, W = gray_scaled.shape
    oh, ow = H - wh + 1, W - ww + 1
    if oh <= 0 or ow <= 0:
        return np.zeros((0, 2), dtype=np.int64)

    x = gray_scaled.astype(np.float64)
    ii = np.zeros((H + 1, W + 1), dtype=np.float64)
    sq = np.zeros((H + 1, W + 1), dtype=np.float64)
    np.cumsum(np.cumsum(x, 0), 1, out=ii[1:, 1:])
    np.cumsum(np.cumsum(x * x, 0), 1, out=sq[1:, 1:])
    iif = ii.ravel()
    sqf = sq.ravel()
    stride = W + 1

    oy, ox = np.mgrid[0:oh:step, 0:ow:step]
    base = (oy * stride + ox).ravel()          # flat offset of each origin

    def rect_sum(flat, off, rx, ry, rw, rh):
        o = off + ry * stride + rx
        return (flat[o + rh * stride + rw] - flat[o + rw]
                - flat[o + rh * stride] + flat[o])

    # variance normalization over normrect (1,1,w-2,h-2) like HaarEvaluator
    nw_, nh_ = ww - 2, wh - 2
    area = float(nw_ * nh_)
    vsum = rect_sum(iif, base, 1, 1, nw_, nh_)
    vsq = rect_sum(sqf, base, 1, 1, nw_, nh_)
    mean = vsum / area
    nf2 = vsq * area - vsum * vsum
    nf = np.sqrt(np.maximum(nf2, 0.0))
    alive_mask = nf2 > 0
    alive = base[alive_mask]
    nf_a = nf[alive_mask]

    R = casc.rects  # (F, 3, 5)
    for (s0, s1), sthr in zip(casc.stage_slices, casc.stage_thresholds):
        if len(alive) == 0:
            break
        ssum = np.zeros(len(alive), dtype=np.float64)
        for wci in range(s0, s1):
            fi = int(casc.feat_idx[wci])
            val = np.zeros(len(alive), dtype=np.float64)
            for (rx, ry, rw, rh, wt) in R[fi]:
                if wt == 0.0:
                    continue
                val += wt * rect_sum(iif, alive, int(rx), int(ry), int(rw), int(rh))
            ssum += np.where(val < casc.node_thr[wci] * nf_a,
                             casc.leaves[wci, 0], casc.leaves[wci, 1])
        keep = ssum >= sthr
        alive = alive[keep]
        nf_a = nf_a[keep]

    ys, xs = alive // stride, alive % stride
    return np.stack([ys, xs], axis=-1)


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


def _resize_linear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2.resize INTER_LINEAR on uint8 gray, host numpy (Q11 fixed point —
    same math as tpuimage.ops.geometry._resize_linear_u8)."""
    from tpuimage.ops.geometry import _linear_coeffs_1d
    h, w = img.shape
    sy, wy1, wy2 = _linear_coeffs_1d(out_h, h)
    sx, wx1, wx2 = _linear_coeffs_1d(out_w, w)
    x = img.astype(np.float32)
    row = x[:, sx] * wx1 + x[:, np.minimum(sx + 1, w - 1)] * wx2
    acc = row[sy] * wy1[:, None] + row[np.minimum(sy + 1, h - 1)] * wy2[:, None]
    return np.clip(np.floor((acc + 2.0 ** 21) / 2.0 ** 22), 0, 255).astype(np.uint8)


def detect_multi_scale(gray: np.ndarray, cascade_name: str,
                       scale_factor: float = 1.1, min_neighbors: int = 5,
                       min_size: Tuple[int, int] = (0, 0),
                       max_size: Tuple[int, int] | None = None,
                       ) -> List[Tuple[int, int, int, int]]:
    """cv2.CascadeClassifier(cascade).detectMultiScale equivalent.

    Returns a list of (x, y, w, h) like the reference call sites expect.
    """
    casc = load_cascade(cascade_name)
    gray = np.asarray(gray)
    H, W = gray.shape

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
        scaled = _resize_linear_np(gray, sh, sw)
        step = 1 if factor > 2.0 else 2
        for y, x in _eval_scale(scaled, casc, step):
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
