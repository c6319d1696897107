"""Histogram family: 256-bin hist, Otsu, equalizeHist, CLAHE.

Replaces cv2.threshold(+THRESH_OTSU) at DocScanner.py:187,202 /
classification.py:67 / morph_seq pyc; cv2.equalizeHist (preset
"equalization", enhancement_presets.json:6); cv2.createCLAHE at
NightLandscapeEnhancement.py:50, asm.py:92, Landscape.py:127,
FaceEnhancement.py:198,291, AI_classification.py:633,689.

CLAHE reproduces OpenCV exactly: pad to a tile multiple with
BORDER_REFLECT_101, per-tile 256-bin histogram, integer clip with
uniform + stepped-residual redistribution, cumulative LUT scaled by
255/tileArea (cvRound), then bilinear interpolation between the four
neighbouring tile LUTs with cvRound at the end.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tpuimage.core.dtypes import saturate_u8, f32, i32, lerp2
from tpuimage.core.borders import pad2d, BORDER_REFLECT_101


def hist256(gray: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """256-bin histogram of a uint8 array (int32 counts).

    MXU formulation: decompose the bin index as hi*64+lo and compute the
    2-D histogram as onehot_hi^T @ onehot_lo — bf16 0/1 factors with f32
    accumulation give exact integer counts (scatter-add histograms measured
    ~40 ms/megapixel on TPU; this runs in ~1 ms). CPU keeps scatter-add
    (fast there; counts identical).

    impl: "auto" = scatter on CPU / MXU elsewhere; "scatter" / "mxu" force
    a path (tests assert both agree on CPU)."""
    import jax
    if impl == "auto":
        impl = "scatter" if jax.default_backend() == "cpu" else "pallas"
    if impl == "scatter":
        return jnp.zeros(256, jnp.int32).at[i32(gray).reshape(-1)].add(1)
    if impl == "pallas":
        # TPU production path: the MXU form below materializes ~68 bytes
        # of one-hot indicators per pixel to HBM; the kernel builds them
        # in VMEM (identical counts, tests/test_pallas.py)
        from tpuimage.ops.pallas_kernels import hist256_batch_pallas
        return hist256_batch_pallas(
            gray[None], interpret=jax.default_backend() == "cpu")[0]
    v = i32(gray).reshape(-1)
    hi = v >> 6
    lo = v & 63
    oh_hi = (hi[:, None] == jnp.arange(4, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    counts = jnp.matmul(oh_hi.T, oh_lo, preferred_element_type=jnp.float32)
    return counts.reshape(256).astype(jnp.int32)


def otsu_threshold(gray: jnp.ndarray):
    """Otsu threshold (returns float threshold, same math as cv2)."""
    return otsu_from_hist(hist256(gray))


def otsu_from_hist(hist: jnp.ndarray):
    """Otsu threshold from a 256-bin histogram.

    Vectorized re-statement of OpenCV's getThreshold_Otsu8u loop using
    prefix sums; the epsilon guards replicate the reference comparisons.
    Split from otsu_threshold so callers with several inputs can batch the
    histogram step (one MXU dispatch) and vmap this part.
    """
    h = f32(hist)
    n = jnp.sum(h)
    scale = 1.0 / n
    idx = jnp.arange(256, dtype=jnp.float32)
    mu = jnp.sum(idx * h) * scale

    p = h * scale
    q1 = jnp.cumsum(p)                     # inclusive: q1 after bin i
    s1 = jnp.cumsum(idx * p)               # sum of i*p up to i
    q2 = 1.0 - q1
    eps = jnp.float32(np.finfo(np.float32).eps)
    valid = (jnp.minimum(q1, q2) >= eps) & (jnp.maximum(q1, q2) <= 1.0 - eps)
    mu1 = jnp.where(q1 > 0, s1 / jnp.where(q1 > 0, q1, 1.0), 0.0)
    mu2 = jnp.where(q2 > 0, (mu - q1 * mu1) / jnp.where(q2 > 0, q2, 1.0), 0.0)
    sigma = jnp.where(valid, q1 * q2 * (mu1 - mu2) ** 2, -1.0)
    return jnp.argmax(sigma).astype(jnp.float32)


def equalize_hist(gray: jnp.ndarray) -> jnp.ndarray:
    """cv2.equalizeHist: CDF LUT anchored at the first occupied bin."""
    h = hist256(gray)
    total = gray.size
    nonzero = h > 0
    first = jnp.argmax(nonzero)            # first occupied bin
    hfirst = h[first]
    denom = total - hfirst
    scale = jnp.where(denom > 0, 255.0 / jnp.maximum(denom, 1), 0.0)
    csum = jnp.cumsum(h)
    # lut[i] = round((cumsum(i) - cumsum(first)) * scale); lut[first] = 0
    lut_f = (f32(csum) - f32(csum[first])) * scale
    lut = saturate_u8(lut_f)
    lut = jnp.where(jnp.arange(256) < first, jnp.uint8(0), lut)
    # degenerate constant image -> stays constant (OpenCV returns value i)
    from tpuimage.ops.lut import lut_lookup_u8
    out = lut_lookup_u8(lut, gray)
    return jnp.where(denom > 0, out, gray)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------

def _clahe_tile_luts(tiles: jnp.ndarray, clip_limit: float, tile_area: int,
                     impl: str = "auto") -> jnp.ndarray:
    """tiles: (T, th*tw) uint8 -> per-tile LUT (T, 256) uint8.

    impl: "auto" = scatter on CPU / MXU batched einsum elsewhere;
    "scatter" / "mxu" force a path (tests assert both agree on CPU)."""
    nbins = 256
    if impl == "auto":
        impl = "scatter" if jax.default_backend() == "cpu" else "pallas"
    if impl == "scatter":
        one_hot_counts = jax.vmap(
            lambda t: jnp.zeros(nbins, jnp.int32).at[i32(t)].add(1))(tiles)
        return _tile_luts_from_counts(one_hot_counts, clip_limit, tile_area)
    if impl == "pallas":
        from tpuimage.ops.pallas_kernels import hist256_batch_pallas
        counts = hist256_batch_pallas(
            tiles, interpret=jax.default_backend() == "cpu")
        return _tile_luts_from_counts(counts, clip_limit, tile_area)
    # per-tile histograms via the same hi/lo one-hot matmul as hist256
    # (batched einsum: T tiles at once, exact integer counts in f32)
    v = i32(tiles)                      # (T, N)
    hi = v >> 6
    lo = v & 63
    oh_hi = (hi[..., None] == jnp.arange(4, dtype=jnp.int32)).astype(jnp.bfloat16)
    oh_lo = (lo[..., None] == jnp.arange(64, dtype=jnp.int32)).astype(jnp.bfloat16)
    counts2d = jnp.einsum("tnh,tnl->thl", oh_hi, oh_lo,
                          preferred_element_type=jnp.float32)
    one_hot_counts = counts2d.reshape(tiles.shape[0], nbins).astype(jnp.int32)
    return _tile_luts_from_counts(one_hot_counts, clip_limit, tile_area)


def _tile_luts_from_counts(one_hot_counts: jnp.ndarray, clip_limit: float,
                           tile_area: int) -> jnp.ndarray:
    """OpenCV's clip + uniform/stepped-residual redistribution + CDF LUT."""
    nbins = 256
    if clip_limit > 0:
        clip = max(int(clip_limit * tile_area / nbins), 1)
        clipped = jnp.minimum(one_hot_counts, clip)
        excess = jnp.sum(one_hot_counts - clipped, axis=1)  # (T,)
        batch = excess // nbins
        residual = excess % nbins
        hist = clipped + batch[:, None]
        # stepped residual: bins k*step for k < residual, step = max(256//residual, 1)
        step = jnp.maximum(jnp.where(residual > 0, nbins // jnp.maximum(residual, 1), nbins), 1)
        idx = jnp.arange(nbins)[None, :]
        bump = (idx % step[:, None] == 0) & ((idx // step[:, None]) < residual[:, None])
        hist = hist + bump.astype(jnp.int32)
    else:
        hist = one_hot_counts

    # OpenCV: float lutScale = 255.0f / tileArea (single-precision divide),
    # then sum * lutScale in float32 — match the exact f32 rounding.
    lut_scale = np.float32(255.0) / np.float32(tile_area)
    csum = jnp.cumsum(hist, axis=1)
    return saturate_u8(f32(csum) * lut_scale)


@functools.partial(jax.jit,
                   static_argnames=("clip_limit", "tiles_x", "tiles_y", "impl"))
def clahe(gray: jnp.ndarray, clip_limit: float = 40.0,
          tiles_x: int = 8, tiles_y: int = 8, impl: str = "auto") -> jnp.ndarray:
    """cv2.createCLAHE(clipLimit, (tiles_x, tiles_y)).apply(gray), bit-exact.

    impl: "auto" = gather+lerp on CPU / blend-matrix scan elsewhere;
    "gather" / "mxu" force a path (tests assert both agree on CPU within
    the documented ±1 LSB cvRound-boundary contract)."""
    h, w = gray.shape
    if h % tiles_y == 0 and w % tiles_x == 0:
        ph = pw = 0
        th, tw = h // tiles_y, w // tiles_x
    else:
        # OpenCV quirk: when either dim is non-divisible it pads BOTH with
        # ``tiles - (dim % tiles)`` — a full extra tile on a divisible dim.
        ph = tiles_y - (h % tiles_y)
        pw = tiles_x - (w % tiles_x)
        th, tw = (h + ph) // tiles_y, (w + pw) // tiles_x
    src_lut = pad2d(gray, 0, ph, 0, pw, mode=BORDER_REFLECT_101) if (ph or pw) else gray

    if impl == "auto":
        impl = "gather" if jax.default_backend() == "cpu" else "pallas"
    tiles = (src_lut.reshape(tiles_y, th, tiles_x, tw)
             .transpose(0, 2, 1, 3)
             .reshape(tiles_y * tiles_x, th * tw))
    luts = f32(_clahe_tile_luts(tiles, clip_limit, th * tw,
                                impl="scatter" if impl == "gather" else
                                ("mxu" if impl == "mxu" else "auto"))
               .reshape(tiles_y, tiles_x, 256))

    if impl == "gather":
        # gather+lerp path (fast on CPU; ±1 LSB vs the matrix path on rare
        # cvRound boundary pixels, both within the documented contract)
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        tyf = ys * (np.float32(1.0) / np.float32(th)) - np.float32(0.5)
        txf = xs * (np.float32(1.0) / np.float32(tw)) - np.float32(0.5)
        ty1 = jnp.floor(tyf).astype(jnp.int32)
        tx1 = jnp.floor(txf).astype(jnp.int32)
        ya = (tyf - ty1)[:, None]
        xa = (txf - tx1)[None, :]
        ty1c = jnp.clip(ty1, 0, tiles_y - 1)[:, None]
        ty2c = jnp.clip(ty1 + 1, 0, tiles_y - 1)[:, None]
        tx1c = jnp.clip(tx1, 0, tiles_x - 1)[None, :]
        tx2c = jnp.clip(tx1 + 1, 0, tiles_x - 1)[None, :]
        v = i32(gray)
        l11 = luts[ty1c, tx1c, v]
        l12 = luts[ty1c, tx2c, v]
        l21 = luts[ty2c, tx1c, v]
        l22 = luts[ty2c, tx2c, v]
        return saturate_u8(lerp2(l11, l12, l21, l22, xa, ya))

    # Bilinear interpolation between the 4 neighbouring tile LUTs.
    #
    # The tile indices and blend weights depend only on (h, w, tiles) — they
    # are STATIC — so the whole per-pixel 4-LUT blend folds into static row
    # and column blend matrices R (h, tiles_y) and C (tiles_x, w):
    #   blended[y, x, b] = (R @ luts[:, :, b] @ C)[y, x]
    # and the per-pixel value lookup becomes a 256-plane select scan. This
    # removes all per-pixel gathers (4 x megapixel gathers measured ~120 ms
    # on TPU; the scan runs in ~2 ms). OpenCV coord math preserved:
    # inv_th = 1.0f/tileHeight (f32 divide), tyf = y*inv_th - 0.5f.
    R = jnp.asarray(clahe_blend_matrix(h, th, tiles_y))      # (h, ty)
    C = jnp.asarray(clahe_blend_matrix(w, tw, tiles_x).T)    # (tx, w)
    if impl == "pallas":
        # TPU production path: the XLA matrix form materializes the
        # (pixels, 256) one-hot + (pixels, ty*tx) W to HBM (10.6 ms for a
        # batch-8 nightview); the fused kernel keeps both in VMEM — within
        # the ±1 LSB cvRound contract vs the matrix path and cv2
        # (tests/test_pallas.py)
        from tpuimage.ops.pallas_kernels import clahe_apply_pallas
        return clahe_apply_pallas(gray, luts, R, C, th=th, tw=tw,
                                  interpret=jax.default_backend() == "cpu")
    return clahe_apply_matrix(gray, luts, R, C)


def clahe_blend_matrix(n_pix: int, tile: int, n_tiles: int) -> np.ndarray:
    """Static (n_pix, n_tiles) bilinear tile-blend matrix (OpenCV coord
    math: inv_t = 1.0f/tile as an f32 divide, pf = p*inv_t - 0.5f)."""
    pf = (np.arange(n_pix, dtype=np.float32)
          * (np.float32(1.0) / np.float32(tile)) - np.float32(0.5))
    t1 = np.floor(pf).astype(np.int64)
    fa = (pf - t1).astype(np.float32)
    t1c = np.clip(t1, 0, n_tiles - 1)
    t2c = np.clip(t1 + 1, 0, n_tiles - 1)
    M = np.zeros((n_pix, n_tiles), dtype=np.float32)
    M[np.arange(n_pix), t1c] += 1.0 - fa
    M[np.arange(n_pix), t2c] += fa
    return M


def clahe_apply_matrix(gray: jnp.ndarray, luts: jnp.ndarray,
                       R: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """The CLAHE apply step given per-tile LUTs and blend matrices.

    Per-pixel tile-LUT rows via ONE MXU one-hot contraction, then the
    bilinear tile blend as a per-pixel quadratic form:
      W[p, ty*tx] = onehot_256(v[p]) @ luts_flat   (bf16 exact: LUT
      values are u8 integers, one-hots are 0/1, f32 accumulation)
      out[p] = R[y, :] @ W[p].reshape(ty, tx) @ C[:, x]
    This replaces the earlier 256-level select scan, whose per-level
    R@plane@C matmuls were K=9 contractions (~7% MXU depth) and whose
    accumulator made 256 full-image HBM round-trips: measured 22 ms ->
    the one-hot form is one K=256 matmul at full depth. The quadratic
    form contracts in the same (ty-then-tx) f32 nesting as the old
    matmul chain, inheriting the documented ±1 LSB cvRound-boundary
    contract vs the gather path.

    R may be a SLICE of the full row-blend matrix (h_local, ty) — that is
    the sharded CLAHE apply: each shard passes its own rows of R against
    the globally gathered LUT table (runtime/spatial.py).
    """
    h, w = gray.shape
    v = i32(gray)
    ty_n, tx_n = int(luts.shape[0]), int(luts.shape[1])
    lut_flat = (luts.reshape(ty_n * tx_n, 256).T).astype(jnp.bfloat16)
    lvl = jnp.arange(256, dtype=jnp.int32)
    oh = (v.reshape(-1)[:, None] == lvl[None, :]).astype(jnp.bfloat16)
    W = jnp.matmul(oh, lut_flat, preferred_element_type=jnp.float32)
    W = W.reshape(h, w, ty_n, tx_n)
    tmp = jnp.einsum("yt,ywtx->ywx", R, W,
                     precision=jax.lax.Precision.HIGHEST)   # (h, w, tx)
    res = jnp.einsum("ywx,xw->yw", tmp, C,
                     precision=jax.lax.Precision.HIGHEST)
    return saturate_u8(res)
