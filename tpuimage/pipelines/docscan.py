"""DocScanner — the flagship 8-stage document-scan pipeline.

Re-implements DocScanner.py:262-365 (process_document) and its stage
functions (preprocess :39, localize_document :76, perspective_warp :117,
illumination_correction :147, adaptive_binarize :163, contrast_stretch
:171, _compute_ink_mask :175, deskew :217, morph_cleanup :247) plus the
GUI override preset AI_classification.py:645-663 that produced the
scan_03..08 goldens (849x1200 A4 @ scale_long 1200).

TPU-native architecture (SURVEY.md §7 step 6):

- ``localize`` — one jit program: gray → Canny → dense Hough accumulator →
  deterministic segments. The tiny edge map + segments come back to host
  where border-following / approxPolyDP pick the document quad (inherently
  sequential, O(edge pixels), clean 8-float output — the one host/device
  boundary in the pipeline).
- ``docscan_post_warp`` — ONE fused jit program for stages 04-08:
  illumination flattening, contrast stretch, ink mask (incl. two Otsu
  solves), adaptive threshold, mask weighting, deskew (Hough median angle
  + traced-angle rotation — no host round-trip), morphological close.
  This is the "fused DocScanner pipeline" of BASELINE.json:2 and is
  vmappable over a batch of warped pages (static A4 shape).
- ``process_document`` — host orchestration mirroring the reference CLI
  semantics, including the use-whole-image fallback chain
  (DocScanner.py:286-298) and per-stage dumps.

Data-dependent shapes: the warp target is fixed by (page, scale_long,
portrait?) — at most two static shapes per config (portrait/landscape), so
jit caching stays bounded (SURVEY.md §7 hard part 4).
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpuimage.core.dtypes import f32
from tpuimage.ops.bilateral import bilateral_filter
from tpuimage.ops.filters import gaussian_blur_u8
from tpuimage.ops import color as colorops
from tpuimage.ops.arith import (subtract_u8, divide_u8, normalize_minmax,
                                normalize_minmax_lut, max_u8)
from tpuimage.ops.threshold import adaptive_threshold, threshold_binary
from tpuimage.ops.histogram import hist256, otsu_from_hist
from tpuimage.ops.morphology import structuring_element, dilate, morph_close, morph_blackhat
from tpuimage.ops.edges import canny
from tpuimage.ops.hough import hough_fold_median_angle, hough_lines_p_det
from tpuimage.ops import geometry
from tpuimage.ops.draw import draw_segments, draw_polyline_overlay
from tpuimage.detect import contours as cnt
from tpuimage.io.imageio import load_image_rgb, save_image


@dataclasses.dataclass(frozen=True)
class DocScanConfig:
    """All tunables of DocScanner.py:262-276 / main() :368-401."""
    page: str = "A4"
    scale_long: int = 1600
    bilateral_d: int = 9
    bilateral_sigma_color: float = 75.0
    bilateral_sigma_space: float = 75.0
    gaussian_ksize: int = 0
    canny_low: int = 50
    canny_high: int = 150
    min_area_ratio: float = 0.2
    max_area_ratio: float = 0.98
    illum_method: str = "subtract"
    illum_blur_frac: float = 0.02
    block_size: int = 35
    C: int = 10
    thresh_method: str = "gaussian"
    mask_blur_ksize: int = 51
    blackhat_ksize: int = 9
    blackhat_vertical_ratio: float = 2.0
    ink_dilate_iters: int = 1
    mask_thresh_offset: int = 8
    morph_ksize: int = 3
    morph_iters: int = 1
    max_rotate: float = 10.0
    fallback_use_whole: bool = True
    min_quad_area_ratio: float = 0.15
    # deskew Hough edge budget; 0 = hough_accumulator's density-scaled
    # default (18.75% of pixels, floor 128k, cap 512k). Raise when the
    # deskew_overflow flag fires on unusually dense pages.
    deskew_max_edges: int = 0


# The override config AI_classification.py:645-663 used to produce the
# committed scan_03..08 goldens (849x1200).
GUI_DOCUMENT_CONFIG = DocScanConfig(
    scale_long=1200, illum_method="divide", illum_blur_frac=0.05,
    block_size=31, C=3, canny_low=30, canny_high=100,
    morph_ksize=1, morph_iters=0)

# serving warp dispatch: "auto" = tiled one-hot-MXU warp on accelerators
# (geometry.warp_perspective_tiled_batch; host plan falls back to gather
# for degenerate/wide-window homographies), gather on CPU where XLA
# gathers are cheap. "tiled"/"gather" force a path (tests, measurement).
WARP_IMPL = "auto"


# ---------------------------------------------------------------------------
# stage ops (jit-compiled pieces)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("d", "sigma_color", "sigma_space",
                                              "gaussian_ksize"))
def preprocess(rgb: jnp.ndarray, d: int = 9, sigma_color: float = 75.0,
               sigma_space: float = 75.0, gaussian_ksize: int = 0) -> jnp.ndarray:
    """DocScanner.py:39-45: gray → bilateral → optional gaussian."""
    gray = colorops.rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
    out = bilateral_filter(gray, d, sigma_color, sigma_space)
    if gaussian_ksize and gaussian_ksize > 1:
        out = gaussian_blur_u8(out, ksize=gaussian_ksize)
    return out


@functools.partial(jax.jit, static_argnames=("canny_low", "canny_high"))
def _localize_device(rgb: jnp.ndarray, canny_low: int, canny_high: int):
    """Device part of localize_document (DocScanner.py:78-81): Canny edges +
    deterministic Hough segments (threshold 80, minLineLength 80)."""
    gray = colorops.rgb_to_gray(rgb)
    # impl="auto": bitpacked hysteresis on accelerators, dilate on CPU
    # (backend-measured in ops.edges.canny — bitpack took the A4x8 canny
    # 7.17 -> 1.28 ms on the v5e).
    edges = canny(gray, canny_low, canny_high, impl="auto")
    segs, ok = hough_lines_p_det(edges, threshold=80, min_line_length=80.0,
                                 max_lines=128)
    return edges, segs, ok


@functools.partial(jax.jit, static_argnames=("canny_low", "canny_high"))
def _localize_device_batch(rgbs: jnp.ndarray, canny_low: int, canny_high: int):
    """vmapped _localize_device over a same-shape stack (one dispatch)."""
    return jax.vmap(lambda im: _localize_device(im, canny_low, canny_high))(rgbs)


def order_quad_points(pts: np.ndarray) -> np.ndarray:
    """DocScanner.py:48-57: TL/TR/BR/BL by coordinate sum/difference."""
    pts = np.asarray(pts, dtype=np.float32).reshape(4, 2)
    s = pts.sum(axis=1)
    d = pts[:, 1] - pts[:, 0]
    out = np.zeros((4, 2), dtype=np.float32)
    out[0] = pts[np.argmin(s)]
    out[2] = pts[np.argmax(s)]
    out[1] = pts[np.argmin(d)]
    out[3] = pts[np.argmax(d)]
    return out


def _largest_quadrilateral(contour_list) -> Optional[np.ndarray]:
    """DocScanner.py:60-73: approxPolyDP(0.02*peri) keep 4-gons, max area."""
    best, max_area = None, 0.0
    for c in contour_list:
        if len(c) < 4:
            continue
        peri = cnt.arc_length(c, closed=True)
        approx = cnt.approx_poly_dp(c, 0.02 * peri, closed=True)
        if len(approx) == 4:
            area = cnt.contour_area(approx)
            if area > max_area:
                max_area, best = area, approx
    return None if best is None else np.asarray(best, dtype=np.float32).reshape(4, 2)


def _quad_from_localize(edges: np.ndarray, segs: np.ndarray, ok: np.ndarray,
                        shape, config: DocScanConfig) -> Optional[np.ndarray]:
    """Host half of localize_document: draw segments over the edge map,
    trace contours, pick the largest quadrilateral (DocScanner.py:84-109)."""
    segs = segs[ok]
    line_img = draw_segments(edges.shape, segs, thickness=2)
    combined = edges | line_img

    contour_list = cnt.find_external_contours(combined)
    img_area = shape[0] * shape[1]
    areas = cnt.contour_areas(contour_list) / max(img_area, 1)
    filtered = [c for c, a in zip(contour_list, areas)
                if config.min_area_ratio <= a <= config.max_area_ratio]
    quad = _largest_quadrilateral(filtered if filtered else contour_list)
    if quad is None:
        if not contour_list:
            return None
        c = max(contour_list, key=cnt.contour_area)
        quad = cnt.box_points(cnt.min_area_rect(c))
    return order_quad_points(quad)


def _pack_bits_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Pack a 0/255 (or 0/1) uint8 array's last axis 8 pixels/byte
    (little-endian bit order, matching np.unpackbits(bitorder='little')).
    The axon tunnel fetches at ~40 MB/s, so binary device→host transfers
    (edge maps, clean pages) shrink 8x for a few cheap device ops."""
    w = x.shape[-1]
    wp = -(-w // 8) * 8
    bits = jnp.pad((x > 0).astype(jnp.uint8),
                   [(0, 0)] * (x.ndim - 1) + [(0, wp - w)])
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return (bits.reshape(*x.shape[:-1], wp // 8, 8) * weights).sum(
        axis=-1, dtype=jnp.uint8)


_pack_bits_jit = jax.jit(_pack_bits_u8)


def _unpack_bits_host(packed: np.ndarray, w: int) -> np.ndarray:
    """Host inverse of _pack_bits_u8 → 0/255 uint8."""
    return (np.unpackbits(packed, axis=-1, bitorder="little")
            [..., :w] * np.uint8(255))


@functools.partial(jax.jit, static_argnames=("canny_low", "canny_high"))
def _localize_device_batch_packed(rgbs: jnp.ndarray, canny_low: int,
                                  canny_high: int):
    """_localize_device_batch with everything flattened into ONE uint8
    buffer per batch: packed edge bits ++ f32 segments (bitcast) ++ valid
    mask. One device→host fetch instead of three — each fetch over the
    axon tunnel pays a full ~35-45 ms round trip regardless of size."""
    edges, segs, ok = jax.vmap(
        lambda im: _localize_device(im, canny_low, canny_high))(rgbs)
    b = edges.shape[0]
    eb = _pack_bits_u8(edges).reshape(b, -1)
    sb = jax.lax.bitcast_convert_type(segs.astype(jnp.float32),
                                      jnp.uint8).reshape(b, -1)
    ob = ok.astype(jnp.uint8)
    return jnp.concatenate([eb, sb, ob], axis=1)


def _localize_parse_buf(buf: np.ndarray, h: int, w: int,
                        config: DocScanConfig) -> list:
    """Host half of the batched localize: parse the fetched packed buffer
    (layout of _localize_device_batch_packed) and run the per-image
    contour walk / quad fit. Per-image isolation: one malformed image must
    not poison its shape group (scan_batch contract) — failed entries
    carry the exception."""
    b = buf.shape[0]
    ne = h * (-(-w // 8))
    edges_b = _unpack_bits_host(buf[:, :ne].reshape(b, h, -1), w)
    n_segs = (buf.shape[1] - ne) // 17   # 16 bitcast bytes + 1 valid byte
    segs_b = buf[:, ne:ne + n_segs * 16].copy().view(np.float32
                                                     ).reshape(b, n_segs, 4)
    ok_b = buf[:, ne + n_segs * 16:].astype(bool)
    out = []
    for i in range(b):
        try:
            out.append(_quad_from_localize(edges_b[i], segs_b[i], ok_b[i],
                                           (h, w), config))
        except Exception as e:  # noqa: BLE001 — isolation boundary
            out.append(e)
    return out


def localize_batch_dev(rgb_dev: jnp.ndarray, config: DocScanConfig) -> list:
    """Batched localize over a DEVICE-RESIDENT same-shape stack: ONE
    vmapped dispatch for Canny + Hough segments (results flattened into a
    single bit-packed buffer → one tunnel fetch), then the per-image host
    contour walk."""
    h, w = int(rgb_dev.shape[1]), int(rgb_dev.shape[2])
    buf = np.asarray(_localize_device_batch_packed(
        rgb_dev, config.canny_low, config.canny_high))
    return _localize_parse_buf(buf, h, w, config)


def localize_batch(rgbs: np.ndarray, config: DocScanConfig) -> list:
    """localize_batch_dev over a host batch (uploads once). Replaces N
    sequential ~RTT-bound dispatches in scan_batch with one."""
    return localize_batch_dev(jnp.asarray(rgbs), config)


def localize_document(rgb: np.ndarray, config: DocScanConfig) -> Optional[np.ndarray]:
    """DocScanner.py:76-109 — device Canny/Hough + host contour/quad fit."""
    edges_d, segs_d, ok_d = _localize_device(jnp.asarray(rgb),
                                             config.canny_low, config.canny_high)
    return _quad_from_localize(np.asarray(edges_d), np.asarray(segs_d),
                               np.asarray(ok_d), rgb.shape[:2], config)


def _warp_target_size(quad: np.ndarray, page: str, scale_long: int) -> Tuple[int, int]:
    """DocScanner.py:117-139 target-size logic: page ratio x portrait test."""
    tl, tr, br, bl = quad
    width = max(int(np.linalg.norm(tr - tl)), int(np.linalg.norm(br - bl)))
    height = max(int(np.linalg.norm(bl - tl)), int(np.linalg.norm(br - tr)))
    portrait = height >= width
    pu = page.upper()
    if pu in ("A4", "A3", "A5"):
        ratio = math.sqrt(2.0)
    elif pu == "LETTER":
        ratio = 11.0 / 8.5
    else:
        ratio = height / max(width, 1)
    if portrait:
        th = scale_long
        tw = int(round(th / ratio))
    else:
        tw = scale_long
        th = int(round(tw * ratio))
    return th, tw


def _fallback_common_size(shape, page: str, scale_long: int) -> Tuple[int, int]:
    """Common target shape for use-whole fallback pages
    (scan_batch(fallback_common_shape=True)): the SAME page-ratio formula
    as _warp_target_size with the portrait test taken from the input's
    own aspect — so fallback pages land in the identical shape groups as
    quad-detected pages (at most 2 compiles per batch for the standard
    page configs). For a custom ``page`` string _warp_target_size derives
    the ratio from the quad; with no quad here, A-series sqrt(2) is used
    as the documented default."""
    h, w = int(shape[0]), int(shape[1])
    portrait = h >= w
    pu = page.upper()
    if pu == "LETTER":
        ratio = 11.0 / 8.5
    else:
        ratio = math.sqrt(2.0)
    if portrait:
        th = scale_long
        tw = int(round(th / ratio))
    else:
        tw = scale_long
        th = int(round(tw * ratio))
    return th, tw


def perspective_warp(rgb: np.ndarray, quad: np.ndarray, page: str = "A4",
                     scale_long: int = 1600) -> jnp.ndarray:
    """DocScanner.py:117-144: homography to the fixed page rectangle."""
    th, tw = _warp_target_size(quad, page, scale_long)
    dst = np.array([[0, 0], [tw - 1, 0], [tw - 1, th - 1], [0, th - 1]],
                   dtype=np.float32)
    M = geometry.get_perspective_transform(quad.astype(np.float32), dst)
    rgb_j = jnp.asarray(rgb)
    # same dispatch as the serving path (WARP_IMPL comment above): tiled
    # one-hot-MXU warp on accelerators, gather on CPU / plan rejection
    if WARP_IMPL != "gather" and (WARP_IMPL == "tiled"
                                  or jax.default_backend() != "cpu"):
        minv = np.linalg.inv(M)[None].astype(np.float32)
        src = rgb_j[None] if rgb_j.ndim == 3 else rgb_j[None, :, :, None]
        warped = geometry.warp_perspective_tiled_batch(src, minv, th, tw)
        if warped is not None:
            return warped[0] if rgb_j.ndim == 3 else warped[0, :, :, 0]
    return geometry.warp_perspective(rgb_j, M, th, tw)


def _deskew_angle(binary: jnp.ndarray, canny_low: int, canny_high: int,
                  max_rotate: float, max_edges: int = 0) -> jnp.ndarray:
    """DocScanner.py:217-231: Canny → HoughLines(thr 150) → median of
    fold-to-[-90,90) angles, zeroed when |median| > max_rotate.

    hough_fold_median_angle computes the median over ALL peaks via
    per-theta counts (no line cap — exact for arbitrarily dense pages,
    unlike the earlier top-512 extraction). Also returns the edge-budget
    overflow flag: True means the Hough compaction dropped edges and the
    angle is an undercount statistic (never observed on real pages —
    budgets are ~1.5-9x above measured Canny densities — but dense
    synthetic inputs now fail loudly instead of deskewing wrong)."""
    # impl="auto": bitpacked hysteresis on accelerators, dilate on CPU.
    # The input is an already-binarized page, so the fixpoint converges
    # in ONE body iteration either way — but even there the bitpack body
    # (bit ops on a 32x-smaller array) measured 5.6x cheaper than the
    # dilate body's 64 full-plane shifted ORs (A4x8: 1.28 vs 7.17 ms).
    edges = canny(binary, canny_low, canny_high, impl="auto")
    med, overflow = hough_fold_median_angle(edges, threshold=150,
                                            return_overflow=True,
                                            max_edges=max_edges)
    return jnp.where(jnp.abs(med) > max_rotate, 0.0, med), overflow


def _raw_otsu_threshold(hist_raw: jnp.ndarray, mask_thresh_offset) -> jnp.ndarray:
    """Threshold on a RAW uint8 plane equivalent to the reference's
    Otsu(-offset) threshold of its NORM_MINMAX-normalized plane
    (DocScanner.py:184-189,196-204) — without materializing the normalized
    plane.

    normalize_minmax is a monotone per-value u8->u8 map, so (a) the
    histogram of the normalized plane is the raw histogram pushed through
    the LUT, and (b) ``norm(x) > t`` pulls back to ``x > T`` with
    ``T = #{v : lut[v] <= t} - 1``. Both are exact (the LUT is built from
    the identical f32 expression; the push-forward is an integer-count
    permutation-sum). This removes two full-image normalize passes + their
    histogram re-reads per page — the normalized planes were never stage
    outputs (only the masks are).

    hist_raw: (256,) counts of the raw plane. Returns T as f32 (in
    [-1, 255]) for threshold_binary's strict ``>`` compare.
    """
    nz = hist_raw > 0
    smin = jnp.argmax(nz).astype(jnp.float32)
    smax = (255 - jnp.argmax(nz[::-1])).astype(jnp.float32)
    lut = normalize_minmax_lut(smin, smax)
    # push-forward: hist_n[j] = sum_v hist_raw[v] * [lut[v] == j]; counts
    # < 2^24 stay exact in f32 at HIGHEST precision (no bf16 rewrite)
    oh = (lut.astype(jnp.int32)[:, None]
          == jnp.arange(256, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    hist_n = jnp.matmul(f32(hist_raw)[None, :], oh,
                        precision=jax.lax.Precision.HIGHEST)[0]
    t_eff = jnp.maximum(jnp.round(otsu_from_hist(hist_n))
                        - mask_thresh_offset, 0)
    return (jnp.sum((f32(lut) <= t_eff).astype(jnp.int32)) - 1
            ).astype(jnp.float32)


def _pre_deskew_stages(warped_rgb: jnp.ndarray, config: DocScanConfig,
                       impl: str = "auto") -> Dict[str, jnp.ndarray]:
    """Stages 04-06b (everything before the deskew rotation): illumination,
    stretch, ink mask, adaptive threshold, mask weighting.

    impl steers the blackhat + the ink-mask EPILOGUE
    (threshold/dilate/weighting): "pallas" forces the fused kernels, "xla"
    the plain ops; identical integer results (tests/test_fused_chain.py).
    "auto" = "xla": MEASURED winner on the real chip (r4 battery, batch 8
    A4: xla 4.08 ms vs the fused Pallas chain's 13.42 ms — Mosaic's
    misaligned-slice VMEM stacking makes the hand-fused gaussian/blackhat
    chain 3x SLOWER than XLA's banded-matmul form; hardware parity of the
    fused path confirmed in the same run)."""
    c = config
    gray = colorops.rgb_to_gray(warped_rgb)
    fused = impl == "pallas"
    if fused:
        from tpuimage.ops.pallas_kernels import (gauss_chain_pallas,
                                                 gauss_chain_pallas_applicable)
        interp = jax.default_backend() in ("cpu",)
        if not gauss_chain_pallas_applicable(gray, c.mask_blur_ksize):
            raise ValueError("fused gaussian chain not applicable here")

    # --- illumination correction (DocScanner.py:147-160) ---
    h, w = int(gray.shape[0]), int(gray.shape[1])
    base = max(15, int(round(min(h, w) * c.illum_blur_frac)))
    if base % 2 == 0:
        base += 1
    divide = c.illum_method.lower() == "divide"
    if fused:
        tmp = gauss_chain_pallas(gray, base,
                                 "divide" if divide else "subtract",
                                 interpret=interp)
    else:
        bg = gaussian_blur_u8(gray, ksize=base)
        tmp = divide_u8(gray, bg, scale=255) if divide \
            else subtract_u8(gray, bg)
    illum = normalize_minmax(tmp)

    # --- contrast stretch (:171-172) ---
    # provably identity here: illum is already NORM_MINMAX output (min=0,
    # max=255 endpoints exact), so a second min-max stretch maps x -> x.
    # The committed goldens confirm it (scan_04 == scan_05 byte-identical,
    # SURVEY.md §2.1 C11); skipping saves a full-image reduce per page.
    stretched = illum

    # --- ink mask (:175-214) ---
    # Both branches normalize, Otsu-threshold, and discard the normalized
    # plane; the fused form histograms the RAW planes and pulls the
    # thresholds back through the (monotone) normalize LUT instead — see
    # _raw_otsu_threshold. Masks are bit-identical to the normalize-then-
    # threshold sequence.
    mk = c.mask_blur_ksize + (c.mask_blur_ksize % 2 == 0)
    if fused:
        sub_raw = gauss_chain_pallas(stretched, mk, "sub", interpret=interp)
    else:
        ink_bg = gaussian_blur_u8(stretched, ksize=mk)
        sub_raw = subtract_u8(ink_bg, stretched)

    bk = max(c.blackhat_ksize, 3)
    bk += (bk % 2 == 0)
    bh_h = max(3, int(round(bk * c.blackhat_vertical_ratio)))
    bh_h += (bh_h % 2 == 0)
    se_vert = structuring_element("rect", (bk, bh_h))
    bh_raw = morph_blackhat(stretched, se_vert, impl=impl)

    # the two independent Otsu solves share one batched histogram dispatch
    hists = jax.vmap(hist256)(jnp.stack([sub_raw, bh_raw]))
    t_sub, t_bh = (_raw_otsu_threshold(hists[i], c.mask_thresh_offset)
                   for i in range(2))

    # --- adaptive binarize (:163-168) ---
    bs = c.block_size + (c.block_size % 2 == 0)
    if fused and c.thresh_method == "gaussian":
        base_bin = gauss_chain_pallas(stretched, bs, "adaptive", C=c.C,
                                      interpret=interp)
    else:
        base_bin = adaptive_threshold(stretched, 255, c.thresh_method, bs,
                                      c.C)

    # --- masks + dilate + mask weighting (:207-212, :338-339) ---
    # impl="pallas" forces the fused epilogue kernel; "auto" stays on the
    # ops path — measured winner (r4 battery prechain section; hardware
    # parity of the fused path confirmed in the same run).
    if impl == "pallas":
        from tpuimage.ops.pallas_kernels import (inkmask_pallas_applicable,
                                                 inkmask_weighted_pallas)
        if not inkmask_pallas_applicable(stretched, c.ink_dilate_iters):
            raise ValueError("fused ink-mask epilogue not applicable here")
        ink_mask, weighted = inkmask_weighted_pallas(
            sub_raw, bh_raw, base_bin, t_sub, t_bh,
            iters=c.ink_dilate_iters,
            interpret=jax.default_backend() in ("cpu",))
    else:
        mask_sub = threshold_binary(sub_raw, t_sub)
        mask_bh = threshold_binary(bh_raw, t_bh)
        ink_mask = max_u8(mask_sub, mask_bh)
        if c.ink_dilate_iters > 0:
            ink_mask = dilate(ink_mask, structuring_element("rect", (2, 2)),
                              iterations=c.ink_dilate_iters)
        weighted = jnp.where(ink_mask == 0, jnp.uint8(255), base_bin)

    return {
        "illum": illum, "stretch": stretched, "inkmask": ink_mask,
        "adapt": base_bin, "weighted": weighted,
    }


def _rotate_for(config: DocScanConfig):
    """Deskew rotation op for the config: |angle| <= max_rotate always holds
    (DocScanner.py:229 zeroes larger medians), so the tiled matmul-bilinear
    rotation applies (gather-free; ~8x faster on TPU than the gather form);
    very large bounds fall back to the exact gather form."""
    c = config
    if c.max_rotate <= 30.0:
        return lambda im, a: geometry.rotate_traced_tiled(im, a,
                                                          max_angle=c.max_rotate)
    return lambda im, a: geometry.rotate_traced(im, a, border="replicate")


def _morph_cleanup(desk: jnp.ndarray, config: DocScanConfig) -> jnp.ndarray:
    """DocScanner.py:247-259: close only, skipped for ksize<=1."""
    c = config
    if c.morph_ksize > 1 and c.morph_iters > 0:
        se = structuring_element("rect", (c.morph_ksize, c.morph_ksize))
        return morph_close(desk, se, iterations=c.morph_iters)
    return desk


@functools.partial(jax.jit, static_argnames=("config",))
def docscan_post_warp(warped_rgb: jnp.ndarray, config: DocScanConfig) -> Dict[str, jnp.ndarray]:
    """Stages 04-08 fused into one program (BASELINE.json:2 metric).

    warped_rgb: uint8 HWC (static page shape) → dict of every stage image.
    """
    c = config
    pre = _pre_deskew_stages(warped_rgb, c)
    weighted = pre["weighted"]
    # deskew (:217-236): in-graph angle + traced rotation; angle==0 (the
    # common outcome) short-circuits to identity in unbatched runs.
    angle, overflow = _deskew_angle(weighted, c.canny_low, c.canny_high,
                                    c.max_rotate, c.deskew_max_edges)
    rot = _rotate_for(c)
    desk = jax.lax.cond(angle == 0.0, lambda im: im,
                        lambda im: rot(im, angle), weighted)
    clean = _morph_cleanup(desk, c)
    return {**pre, "deskew": desk, "clean": clean, "deskew_angle": angle,
            "deskew_overflow": overflow}


def _post_warp_batch_body(warped_batch: jnp.ndarray, c: DocScanConfig):
    """One fused post-warp dispatch over an NHWC batch (the body shared by
    the whole-batch and chunked forms of docscan_post_warp_batch)."""
    pre = jax.vmap(lambda im: _pre_deskew_stages(im, c))(warped_batch)
    weighted = pre["weighted"]
    angles, overflows = jax.vmap(
        lambda wt: _deskew_angle(wt, c.canny_low, c.canny_high, c.max_rotate,
                                 c.deskew_max_edges)
    )(weighted)
    rot = _rotate_for(c)
    desk = jax.lax.cond(
        jnp.any(angles != 0.0),
        lambda wb: jax.vmap(rot)(wb, angles),  # angle==0 rotation is exact identity
        lambda wb: wb,
        weighted)
    clean = jax.vmap(lambda im: _morph_cleanup(im, c))(desk)
    return {**pre, "deskew": desk, "clean": clean, "deskew_angle": angles,
            "deskew_overflow": overflows}


def _auto_batch_chunk(bsz: int) -> int:
    """Chunk size for the fused batch program. The r4 battery measured the
    fused program at 737/701/547 MP/s for batch 8/16/32 (stagescale
    attributes the falloff to the pre-deskew XLA stages' fusion/layout at
    32x1MP working sets, not any Pallas kernel). The r5 chunkscale run on
    real v5e measured the lax.map fix at b32: chunk0 543.8, chunk8
    707.7, chunk16 693.3 MP/s — sequential batch-8 sub-programs recover
    the whole regression, so auto chunks to 8 for batches ABOVE 16 (b16
    itself measured within noise of b8 whole-batch in r4; chunking it is
    unmeasured). Non-multiples of 8 keep the whole-batch vmap — the
    sub-batch program would compile per distinct remainder."""
    return 8 if bsz > 16 and bsz % 8 == 0 else 0


@functools.partial(jax.jit, static_argnames=("config", "chunk"))
def docscan_post_warp_batch(warped_batch: jnp.ndarray, config: DocScanConfig,
                            chunk: Optional[int] = None):
    """The fused post-warp program vmapped over a batch of pages (NHWC).

    Unlike a plain vmap of docscan_post_warp — where lax.cond degenerates
    to select and EVERY page pays the rotation — the deskew rotation here
    is guarded by a BATCH-LEVEL lax.cond: when no page needs rotating (the
    common all-clean-pages case, and always true for the degenerate golden
    run) the whole rotation block is skipped at runtime (VERDICT round-1
    Weak #9). The rotation cond is per-CHUNK when chunking is active.

    chunk: images per sequential sub-dispatch inside the jit (lax.map).
    None = auto (see _auto_batch_chunk); 0 = whole batch in one vmap.
    An EXPLICIT chunk must divide the batch size (ValueError otherwise —
    a forced chunk=8 on b=12 silently measuring the unchunked program is
    worse than an error; ADVICE r4). Results are identical either way —
    chunking only bounds the working set XLA fuses over, which is what
    regresses at batch 32.
    """
    c = config
    bsz = int(warped_batch.shape[0])
    if chunk is None:
        k = _auto_batch_chunk(bsz)
        if bsz % max(k, 1) != 0:
            k = 0   # auto quietly falls back for awkward batch sizes
    else:
        k = int(chunk)
        if k > 0 and bsz % k != 0:
            raise ValueError(
                f"chunk={k} does not divide batch size {bsz}; pass a "
                f"divisor or chunk=0 for the whole-batch vmap")
    if k <= 0 or k >= bsz:
        return _post_warp_batch_body(warped_batch, c)
    chunked = warped_batch.reshape((bsz // k, k) + warped_batch.shape[1:])
    out = jax.lax.map(lambda wb: _post_warp_batch_body(wb, c), chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((bsz,) + x.shape[2:]), out)


@functools.partial(jax.jit, static_argnames=("config",))
def docscan_post_warp_batch_serve(warped_batch: jnp.ndarray,
                                  config: DocScanConfig):
    """Serving form of docscan_post_warp_batch: returns {buf, clean},
    where ``buf`` is a flat uint8 side-channel holding, in order, the
    4*b bitcast bytes of the f32 deskew angles, b overflow bytes, and the
    8-pixels/byte bit-packed clean pages (decoded only by
    _post_warp_serve_host — keep the layouts in sync). The full-stage form
    materializes 7 full-resolution stage arrays to HBM per dispatch even
    when the caller wants just the final page (jit outputs cannot be
    dead-coded); this one lets XLA drop everything but the clean chain,
    and fuses the 8-pixels/byte bit-pack of the clean page in-program so
    the unrotated-page fetch is 1/8th the bytes. The host picks ``packed``
    (lossless for 0/255 pages) when every deskew angle is 0, ``clean``
    otherwise (bilinear rotation makes gray pixels)."""
    out = docscan_post_warp_batch(warped_batch, config)
    buf = jnp.concatenate([
        jax.lax.bitcast_convert_type(
            out["deskew_angle"].astype(jnp.float32), jnp.uint8).reshape(-1),
        out["deskew_overflow"].astype(jnp.uint8).reshape(-1),
        _pack_bits_u8(out["clean"]).reshape(-1),
    ])
    return {"buf": buf, "clean": out["clean"]}


def _serve_parse(out: dict, b: int, h: int, w: int):
    """Fetch + decode a dispatched serve program's outputs (the blocking
    half of _post_warp_serve_host): ONE tunnel round trip in the
    no-rotation common case. Returns (clean u8 (b,h,w), angles, overflow).
    """
    buf = np.asarray(out["buf"])
    angles = buf[:4 * b].copy().view(np.float32)
    oflow = buf[4 * b:5 * b].astype(bool)
    if angles.any():
        clean = np.asarray(out["clean"])   # gray pixels: raw second fetch
    else:
        clean = _unpack_bits_host(buf[5 * b:].reshape(b, h, -1), w)
    return clean, angles, oflow


def _post_warp_serve_host(batch: jnp.ndarray, config: DocScanConfig):
    """Run the serve program and fetch results. Returns (clean u8
    (b,h,w), angles, overflow)."""
    b, h, w = (int(batch.shape[0]), int(batch.shape[1]), int(batch.shape[2]))
    return _serve_parse(docscan_post_warp_batch_serve(batch, config), b, h, w)


# ---------------------------------------------------------------------------
# host orchestration (the reference process_document contract)
# ---------------------------------------------------------------------------

def process_document(input_path, out_dir: Optional[str] = "outputs",
                     config: DocScanConfig = DocScanConfig(),
                     save_stages: bool = True, do_ocr: bool = False,
                     space_mesh=None) -> dict:
    """DocScanner.py:262-365 process_document: returns {quad, warped,
    binary, stages...}; optionally dumps every stage PNG like the
    reference (scan_01..scan_08). ``input_path`` may also be an RGB uint8
    ndarray (in-memory serving path).

    space_mesh: optional jax Mesh with a "space" axis — runs the post-warp
    stages H-sharded across its devices (pages too large for one chip;
    runtime.spatial.docscan_post_warp_spatial, bit-identical output). The
    warped height must divide the axis size; otherwise this falls back to
    the single-device program with a warning."""
    if isinstance(input_path, (str, os.PathLike)):
        rgb = load_image_rgb(input_path)
    else:
        rgb = np.asarray(input_path)
    c = config

    def dump(name, img):
        if save_stages and out_dir:
            save_image(os.path.join(out_dir, name), np.asarray(img))

    pre = preprocess(jnp.asarray(rgb), c.bilateral_d, c.bilateral_sigma_color,
                     c.bilateral_sigma_space, c.gaussian_ksize)
    dump("scan_01_pre.png", pre)

    quad = localize_document(rgb, c)
    use_whole = quad is None
    if quad is not None:
        ratio = cnt.contour_area(quad) / max(rgb.shape[0] * rgb.shape[1], 1)
        if ratio < c.min_quad_area_ratio:
            use_whole = True
    if use_whole and not c.fallback_use_whole:
        raise RuntimeError("Quad too small or missing, and fallback disabled.")

    h, w = rgb.shape[:2]
    if not use_whole and quad is not None:
        overlay = draw_polyline_overlay(rgb, quad, color=(0, 255, 0))
    else:
        full = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float32)
        overlay = draw_polyline_overlay(rgb, full, color=(255, 165, 0))
    dump("scan_02_quad.png", overlay)

    if not use_whole and quad is not None:
        warped = perspective_warp(rgb, quad, page=c.page, scale_long=c.scale_long)
    else:
        warped = geometry.resize_long_side(jnp.asarray(rgb), c.scale_long,
                                           interpolation="area")
    dump("scan_03_warped.png", warped)

    if space_mesh is not None:
        ndev = space_mesh.shape["space"]
        if int(warped.shape[0]) % ndev == 0:
            from tpuimage.runtime.spatial import docscan_post_warp_spatial
            stages = docscan_post_warp_spatial(jnp.asarray(warped), c,
                                               space_mesh)
        else:
            import warnings
            warnings.warn(f"warped height {int(warped.shape[0])} does not "
                          f"divide the space axis ({ndev}); running the "
                          "post-warp stages unsharded")
            stages = docscan_post_warp(warped, c)
    else:
        stages = docscan_post_warp(warped, c)
    dump("scan_04_illum.png", stages["illum"])
    dump("scan_05_stretch.png", stages["stretch"])
    dump("scan_05a_inkmask.png", stages["inkmask"])
    dump("scan_06_adapt.png", stages["adapt"])
    dump("scan_06b_weighted.png", stages["weighted"])
    dump("scan_07_deskew.png", stages["deskew"])
    dump("scan_08_clean.png", stages["clean"])

    result = {"quad": quad, "warped": warped, "binary": stages["clean"],
              "use_whole": use_whole, "stages": stages}
    if bool(np.asarray(stages["deskew_overflow"])):
        import warnings
        warnings.warn("Hough edge budget overflowed during deskew: the "
                      "deskew angle is computed from an undercounted vote "
                      "accumulator; rerun with a larger "
                      "DocScanConfig.deskew_max_edges.")
    return _finish_document(result, out_dir, do_ocr)


def _finish_document(result: dict, out_dir: Optional[str], do_ocr: bool) -> dict:

    if do_ocr:
        # optional host OCR behind the same flag as DocScanner.py:354-363
        try:
            import pytesseract
            text = pytesseract.image_to_string(np.asarray(result["binary"]),
                                               config="--psm 6")
            if out_dir:
                with open(os.path.join(out_dir, "scan_ocr.txt"), "w",
                          encoding="utf-8") as f:
                    f.write(text)
            result["ocr_text"] = text
        except Exception as e:
            result["ocr_error"] = str(e)
    return result


def _auto_pipeline_chunk(n: int) -> int:
    """Sub-batch size for scan_batch's intra-batch pipelining (0 = off,
    run the four phases once over the whole batch). Splitting one call
    into pipeline_chunk-sized sub-batches driven through scan_stream
    overlaps each sub-batch's host work (decode + upload + quad fit) with
    the previous one's device work — the serial serve path's phases are
    otherwise strictly sequential. Results are identical per image (the
    post-warp program is vmapped per image; sub-batching only regroups
    dispatches). OFF until the pipescale battery section measures the
    win on hardware (measured-winners discipline, CLAUDE.md)."""
    del n
    return 0


def scan_batch(inputs, config: DocScanConfig = GUI_DOCUMENT_CONFIG,
               mesh=None, fallback_common_shape: bool = False,
               pipeline_chunk: Optional[int] = None) -> list:
    """Batched serving path: localize each document on host (cheap,
    per-image), stack the warped pages, and run the fused post-warp
    program per SHAPE GROUP — DP-sharded over a device mesh when one is
    given. Returns a list of per-image dicts {quad, use_whole, binary}.
    Per-image failures are isolated (the reference's try/except-continue
    pattern): failed entries carry {"error": ...} instead. All HOST-side
    per-image work (load, contour/quad fit, homography solve/invert) is
    individually wrapped; only a failure of a batched DEVICE dispatch —
    all-or-nothing by construction (compile error, OOM), never
    data-dependent — marks its whole shape group.

    Shape handling: quad-detected pages all share the static page geometry
    (portrait/landscape A4 at scale_long — at most 2 shapes per config and
    2 cached compiles). Use-whole fallbacks keep the reference's
    resize_long_side semantics, whose output shape depends on the input
    aspect — each DISTINCT fallback shape is its own group and first
    occurrence pays a compile (20-60 s over the axon tunnel). Padding them
    to the dominant page shape would bound compiles but silently change
    the numbers: the pipeline's min-max normalizations and Otsu solves are
    global statistics, so padded pixels would shift every threshold.
    Exactness wins by default.

    fallback_common_shape=True bounds compiles for hostile mixed-aspect
    fleets: use-whole pages are resized (INTER_AREA, no padding) to the
    config's page geometry at scale_long (_fallback_common_size) — the
    SAME shape groups as quad-detected pages, so the whole batch compiles
    at most 2 post-warp programs. The tradeoff is surfaced per page in
    the returned meta (``fallback_resized_to``): the page is
    aspect-distorted to the page ratio, so its binary differs from
    process_document's exact aspect-preserving output (every pixel is
    still real image content — the global statistics see no synthetic
    pixels, unlike padding).

    This is the scale-out replacement for calling process_document in a
    loop: one jit dispatch amortizes the whole batch (SURVEY.md §2.3 DP).

    Implementation: four serving phases (load/localize-dispatch →
    quad-fit/warp → post-warp dispatch → fetch) shared with scan_stream,
    which reorders them across batches to overlap host and device work.

    pipeline_chunk: when a positive value smaller than len(inputs) is
    given (or resolved by _auto_pipeline_chunk for None), the call is
    split into that many images per sub-batch and driven through
    scan_stream's cross-batch scheduler — host phases of sub-batch i+1
    overlap device work of sub-batch i WITHIN this one call (the serial
    path otherwise runs its phases strictly back-to-back; VERDICT r4
    item 1b). Per-image results are identical either way.
    """
    n = len(inputs)
    k = _auto_pipeline_chunk(n) if pipeline_chunk is None \
        else int(pipeline_chunk)
    if 0 < k < n:
        subs = [inputs[i:i + k] for i in range(0, n, k)]
        out: list = []
        for res in scan_stream(iter(subs), config, mesh=mesh,
                               fallback_common_shape=fallback_common_shape):
            out.extend(res)
        return out
    state = _scan_load_localize(inputs, config)
    _scan_quad_fit(state, config, fallback_common_shape)
    _scan_postwarp_dispatch(state, config, mesh)
    return _scan_fetch(state)


def _scan_load_localize(inputs, config: DocScanConfig) -> dict:
    """Serving phase 1 — host image load, shape grouping, ONE upload and
    ONE localize dispatch per same-shape group (each image crosses the
    ~40 MB/s tunnel exactly once; the stack stays device-resident for the
    warp). No blocking device work: the packed localize buffers are left
    un-fetched device handles."""
    n = len(inputs)
    rgbs = []
    metas: list = [None] * n
    for i, item in enumerate(inputs):
        try:
            rgbs.append(load_image_rgb(item)
                        if isinstance(item, (str, os.PathLike))
                        else np.asarray(item))
        except Exception as e:
            metas[i] = {"error": str(e)}
            rgbs.append(None)
    by_shape: Dict[tuple, list] = {}
    for i, rgb in enumerate(rgbs):
        if rgb is not None:
            by_shape.setdefault(rgb.shape, []).append(i)
    dev_stacks: Dict[tuple, tuple] = {}   # shape -> (device stack, {idx: row})
    loc_bufs: Dict[tuple, jnp.ndarray] = {}
    for shape, idxs in by_shape.items():
        try:
            stack_dev = jnp.asarray(np.stack([rgbs[i] for i in idxs]))
            dev_stacks[shape] = (stack_dev, {i: j for j, i in enumerate(idxs)})
            loc_bufs[shape] = _localize_device_batch_packed(
                stack_dev, config.canny_low, config.canny_high)
        except Exception as e:
            # upload / trace / compile failure is systemic for the group
            for i in idxs:
                metas[i] = {"error": str(e)}
                rgbs[i] = None
    return {"n": n, "rgbs": rgbs, "metas": metas, "by_shape": by_shape,
            "dev_stacks": dev_stacks, "loc_bufs": loc_bufs}


def _scan_quad_fit(state: dict, config: DocScanConfig,
                   fallback_common_shape: bool) -> None:
    """Serving phase 2 — fetch the localize buffers (blocks ONLY on the
    localize programs: they were dispatched before any later device work),
    host contour walk + quad fit + homography solves, then dispatch the
    batched warps / fallback resizes. Ends with ``state['pages']``
    device-resident; no result fetch."""
    rgbs, metas = state["rgbs"], state["metas"]
    dev_stacks = state["dev_stacks"]
    quads: list = [None] * state["n"]
    for shape, idxs in state["by_shape"].items():
        if shape not in state["loc_bufs"]:
            continue   # phase-1 group failure already recorded
        try:
            buf = np.asarray(state["loc_bufs"][shape])
            found = _localize_parse_buf(buf, int(shape[0]), int(shape[1]),
                                        config)
            for i, q in zip(idxs, found):
                if isinstance(q, Exception):
                    # host-side quad fit failed for THIS image only
                    metas[i] = {"error": str(q)}
                    rgbs[i] = None
                else:
                    quads[i] = q
        except Exception as e:
            # the batched device dispatch is all-or-nothing by
            # construction; a failure here is systemic (execution/OOM),
            # not data-dependent
            for i in idxs:
                metas[i] = {"error": str(e)}
                rgbs[i] = None
    del state["loc_bufs"]   # free the device buffers

    # --- warp (quad pages grouped by (input shape, target shape): one
    # batched dispatch per group reading the device-resident stack; the
    # warped pages STAY on device for the post-warp program) ---
    pages: list = [None] * state["n"]
    warp_groups: Dict[tuple, list] = {}
    for i, rgb in enumerate(rgbs):
        if rgb is None:
            continue
        try:
            quad = quads[i]
            use_whole = quad is None
            if quad is not None:
                ratio = cnt.contour_area(quad) / max(rgb.shape[0] * rgb.shape[1], 1)
                if ratio < config.min_quad_area_ratio:
                    use_whole = True
            metas[i] = {"quad": quad, "use_whole": use_whole}
            if not use_whole and quad is not None:
                th, tw = _warp_target_size(quad, config.page, config.scale_long)
                warp_groups.setdefault((rgb.shape, th, tw), []).append(i)
            elif fallback_common_shape:
                th, tw = _fallback_common_size(rgb.shape, config.page,
                                               config.scale_long)
                stack_dev, pos = dev_stacks[rgb.shape]
                pages[i] = geometry.resize(stack_dev[pos[i]], th, tw, "area")
                metas[i]["fallback_resized_to"] = (th, tw)
            else:
                stack_dev, pos = dev_stacks[rgb.shape]
                pages[i] = geometry.resize_long_side(
                    stack_dev[pos[i]], config.scale_long, interpolation="area")
        except Exception as e:
            metas[i] = {"error": str(e)}
    for (shape, th, tw), idxs in warp_groups.items():
        dst = np.array([[0, 0], [tw - 1, 0], [tw - 1, th - 1],
                        [0, th - 1]], dtype=np.float32)
        # per-image isolation of the host-side solves: a degenerate quad
        # (near-collinear points -> singular homography) must not poison
        # the rest of its group
        minvs_list, good = [], []
        for i in idxs:
            try:
                minvs_list.append(np.linalg.inv(
                    geometry.get_perspective_transform(
                        metas[i]["quad"].astype(np.float32), dst)))
                good.append(i)
            except Exception as e:
                metas[i] = {"error": str(e)}
        if not good:
            continue
        try:
            stack_dev, pos = dev_stacks[shape]
            rows = [pos[i] for i in good]
            src = stack_dev if rows == list(range(stack_dev.shape[0])) \
                else jnp.take(stack_dev, jnp.asarray(rows), axis=0)
            minvs = np.stack(minvs_list).astype(np.float32)
            warped = None
            # tiled one-hot-MXU warp on accelerators (r4: 29.7 -> ~4
            # ms/img on the serve batch); the host plan rejects degenerate
            # or wide-window homographies -> gather. WARP_IMPL forces a
            # path for tests/measurement.
            if WARP_IMPL != "gather" and (
                    WARP_IMPL == "tiled"
                    or jax.default_backend() != "cpu"):
                warped = geometry.warp_perspective_tiled_batch(
                    src, minvs, th, tw)
            if warped is None:
                warped = geometry.warp_perspective_batch(
                    src, jnp.asarray(minvs), th, tw)
            for j, i in enumerate(good):
                pages[i] = warped[j]
        except Exception as e:
            # batched device warp: all-or-nothing dispatch, systemic
            for i in good:
                metas[i] = {"error": str(e)}
    state["pages"] = pages


def _scan_postwarp_dispatch(state: dict, config: DocScanConfig, mesh) -> None:
    """Serving phase 3 — stack each page-shape group (portrait/landscape
    compile separately) and dispatch the fused serve program; results are
    left as un-fetched device handles in ``state['groups']``."""
    pages = state["pages"]
    groups = []
    shapes = {p.shape for p in pages if p is not None}
    for shape in shapes:
        idxs = [i for i, p in enumerate(pages)
                if p is not None and p.shape == shape]
        batch = jnp.stack([pages[i] for i in idxs])
        n_real = batch.shape[0]
        if mesh is not None:
            from tpuimage.runtime.mesh import shard_batch
            ndev = int(np.prod(list(mesh.shape.values())))
            rem = (-n_real) % ndev
            if rem:
                batch = jnp.concatenate(
                    [batch, jnp.repeat(batch[-1:], rem, axis=0)], axis=0)
            batch = shard_batch(batch, mesh)
        out = docscan_post_warp_batch_serve(batch, config)
        groups.append((idxs, n_real, int(batch.shape[0]),
                       int(batch.shape[1]), int(batch.shape[2]), out))
    state["groups"] = groups
    del state["pages"], state["dev_stacks"]   # free the device stacks


def _scan_fetch(state: dict) -> list:
    """Serving phase 4 — fetch each group's packed result buffer (the
    only blocking transfer) and build the per-image result dicts."""
    metas = state["metas"]
    out_by_idx = {}
    for idxs, n_real, b_pad, h, w, out in state["groups"]:
        clean, angles, oflow = _serve_parse(out, b_pad, h, w)
        clean, oflow = clean[:n_real], oflow[:n_real]
        for j, i in enumerate(idxs):
            out_by_idx[i] = (clean[j], bool(oflow[j]))
    results = []
    for i, meta in enumerate(metas):
        if "error" in meta:
            results.append(meta)
        else:
            binary, oflow_i = out_by_idx[i]
            results.append({**meta, "binary": binary,
                            "deskew_overflow": oflow_i})
    return results


def scan_stream(batches, config: DocScanConfig = GUI_DOCUMENT_CONFIG,
                mesh=None, fallback_common_shape: bool = False,
                prefetch: bool = True):
    """Pipelined serving over a stream of batches (generator). Yields
    scan_batch's result list for each input batch, in order, with
    identical per-image semantics — but schedules the four serving phases
    across batches so host work and device compute overlap:

        dispatch localize(i)          # device starts batch i
        dispatch post-warp(i-1)       # queued behind localize(i)
        fetch localize buffer(i)      # waits ONLY for localize(i)
        host quad fit + solves(i)     # overlaps post-warp(i-1) on device
        fetch results(i-2)            # long completed: transfer only

    The overlapped work is exactly what dominates small-page serve latency
    in this environment (BASELINE.md e2e note): the host contour walk /
    homography solves and the PIL decode + upload of the next batch hide
    under the in-flight fused post-warp program, and the device never
    idles between batches. At most two batches are in flight plus one
    being prepared (bounded device memory). Single-batch callers should
    use scan_batch; a stream of one batch degenerates to it exactly.
    ``prefetch=True`` additionally runs phase 1 (decode + upload +
    localize dispatch) of the NEXT batch on a single worker thread while
    the main thread does the current batch's host quad fit and result
    parsing — the upload is the serve path's largest serial cost
    (~20 ms/img of tunnel transfer) and PIL/numpy/ctypes all release the
    GIL, so the two genuinely overlap. A second worker symmetrically
    fetches+parses RESULTS (phase 4: ~12 ms/img of tunnel download plus
    host bit-unpacking — the largest main-thread cost after quad fit)
    one batch behind the main thread, so in steady state the main thread
    does only quad fits and dispatches. Results are identical (phases of
    different batches touch disjoint state; JAX dispatch and device->host
    transfers are thread-safe) and still yield in input order.
    """
    from collections import deque
    ready = None          # quad fit done, post-warp not yet dispatched
    inflight = deque()    # post-warp dispatched, results not fetched
    fetches = deque()     # fetch futures (or eager results), input order
    ex = fex = None
    if prefetch:
        from concurrent.futures import ThreadPoolExecutor
        ex = ThreadPoolExecutor(max_workers=1,
                                thread_name_prefix="scan_stream_load")
        fex = ThreadPoolExecutor(max_workers=1,
                                 thread_name_prefix="scan_stream_fetch")
    pending = None
    try:
        it = iter(batches)

        def _next_state():
            """Phase 1 of the next batch, possibly on the worker."""
            try:
                inputs = next(it)
            except StopIteration:
                return None
            if ex is None:
                return _scan_load_localize(inputs, config)
            return ex.submit(_scan_load_localize, inputs, config)

        def _start_fetch(st):
            return _scan_fetch(st) if fex is None else fex.submit(
                _scan_fetch, st)

        def _emit(f):
            return f if fex is None else f.result()

        pending = _next_state()
        while pending is not None:
            state = pending.result() if ex is not None else pending
            pending = _next_state()   # overlaps everything below
            if ready is not None:
                _scan_postwarp_dispatch(ready, config, mesh)
                inflight.append(ready)
            while len(inflight) > 1:
                # hand (i-2)'s fetch to the worker BEFORE the quad fit so
                # the download rides under the host geometry work; emit a
                # batch only once a newer fetch is queued behind it
                fetches.append(_start_fetch(inflight.popleft()))
            _scan_quad_fit(state, config, fallback_common_shape)
            while len(fetches) > 1:
                yield _emit(fetches.popleft())
            ready = state
        if ready is not None:
            _scan_postwarp_dispatch(ready, config, mesh)
            inflight.append(ready)
        while inflight:
            fetches.append(_start_fetch(inflight.popleft()))
        while fetches:
            yield _emit(fetches.popleft())
    finally:
        if ex is not None:
            # cancel the queued prefetch if it has not started; a RUNNING
            # phase-1 (decode/upload/localize dispatch) cannot be cancelled
            # mid-call, so an abandoned stream may still finish one
            # background phase-1 — cancel_futures stops anything queued
            # behind it from starting (ADVICE r4)
            if pending is not None and not isinstance(pending, dict):
                pending.cancel()
            ex.shutdown(wait=False, cancel_futures=True)
        if fex is not None:
            for f in fetches:
                f.cancel()
            fex.shutdown(wait=False, cancel_futures=True)
