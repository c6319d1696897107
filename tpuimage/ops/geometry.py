"""Geometric transforms: resize, affine/perspective warps, rotation.

Replaces cv2.resize (DocScanner.py:36 INTER_AREA, ipynb cell 14
INTER_LINEAR/CUBIC), cv2.getPerspectiveTransform + cv2.warpPerspective
(DocScanner.py:142-143, ipynb cell 4), cv2.getRotationMatrix2D +
cv2.warpAffine BORDER_REPLICATE (DocScanner.py:234-235, ipynb cell 14).

TPU-native design: every warp is an inverse-map bilinear/bicubic gather —
pure jnp, fully vmappable over a batch, no scatter. Output shapes are
static (a jit requirement); data-dependent target sizes (the detected-quad
warp) are handled by fixing the page geometry per preset (SURVEY.md §7
hard part 4) and computing the 3x3 homography on host or with
jnp.linalg.solve (8x8 — negligible).

cv2 parity notes: OpenCV's 8u resize path runs fixed-point
(INTER_RESIZE_COEF_BITS=11); we compute the same coefficient quantization
in f32 so INTER_LINEAR resize is bit-exact and INTER_AREA exact at integer
scale; INTER_CUBIC matches within +-1 LSB. This cv2 5.0 build's
remap/warpAffine/warpPerspective INTER_LINEAR are plain-f32 bilinear with
a final cvRound; we match within the CLAUDE.md float contract — +-1 LSB
on <0.5% of pixels where XLA FMA contraction lands the 4-tap MAC on the
other side of an x.5 rounding boundary (uncontrollable; measured ~1 px
per 3000 on random float coords), exact elsewhere.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax import lax

from tpuimage.core.dtypes import saturate_u8, f32
from tpuimage.core.borders import pad2d

# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

_RESIZE_BITS = 11          # INTER_RESIZE_COEF_BITS
_RESIZE_SCALE = 1 << _RESIZE_BITS


def _linear_coeffs_1d(dst: int, src: int):
    """OpenCV resize INTER_LINEAR source indices + Q11 fixed-point weights."""
    scale = src / dst
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    sx = np.floor(x).astype(np.int64)
    fx = x - sx
    # border handling like OpenCV: below 0 -> (0, fx=0); at/after the last
    # pixel -> (src-1, fx=0) so full weight lands on the LAST pixel (the
    # second tap reads a clamped index with zero weight).
    fx = np.where(sx < 0, 0.0, fx)
    sx = np.maximum(sx, 0)
    fx = np.where(sx >= src - 1, 0.0, fx)
    sx = np.minimum(sx, src - 1)
    w1 = np.rint((1.0 - fx) * _RESIZE_SCALE)
    w2 = np.rint(fx * _RESIZE_SCALE)
    return sx, w1.astype(np.float32), w2.astype(np.float32)


def _cubic_kernel(x: np.ndarray, A: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax <= 1.0, ((A + 2.0) * ax - (A + 3.0)) * ax * ax + 1.0,
        np.where(ax < 2.0, ((A * ax - 5.0 * A) * ax + 8.0 * A) * ax - 4.0 * A, 0.0))


def _cubic_coeffs_1d(dst: int, src: int):
    scale = src / dst
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    sx = np.floor(x).astype(np.int64)
    fx = x - sx
    offs = np.arange(-1, 3)
    w = _cubic_kernel(fx[:, None] - offs[None, :])       # (dst, 4)
    w = np.rint(w * _RESIZE_SCALE)
    idx = np.clip(sx[:, None] + offs[None, :], 0, src - 1)
    return idx.astype(np.int64), w.astype(np.float32)


def _resize_linear_u8(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    sy, wy1, wy2 = _linear_coeffs_1d(out_h, h)
    sx, wx1, wx2 = _linear_coeffs_1d(out_w, w)
    x = f32(img)
    # horizontal pass: Q11 weights, keep integer-valued f32
    left = x[:, sx]
    right = x[:, np.minimum(sx + 1, w - 1)]
    shp = (1, out_w) + (1,) * (img.ndim - 2)
    row = left * wx1.reshape(shp) + right * wx2.reshape(shp)
    # vertical pass then descale by 2*bits with half-up rounding
    top = row[sy]
    bot = row[np.minimum(sy + 1, h - 1)]
    shp = (out_h, 1) + (1,) * (img.ndim - 2)
    acc = top * wy1.reshape(shp) + bot * wy2.reshape(shp)
    return saturate_u8(jnp.floor((acc + 2.0 ** 21) / 2.0 ** 22))


def _resize_cubic_u8(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    iy, wy = _cubic_coeffs_1d(out_h, h)
    ix, wx = _cubic_coeffs_1d(out_w, w)
    x = f32(img)
    shp_w = (1, out_w) + (1,) * (img.ndim - 2)
    row = sum(x[:, ix[:, t]] * wx[:, t].reshape(shp_w) for t in range(4))
    shp_h = (out_h, 1) + (1,) * (img.ndim - 2)
    acc = sum(row[iy[:, t]] * wy[:, t].reshape(shp_h) for t in range(4))
    return saturate_u8(acc / 2.0 ** 22)


def _resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    sy = np.minimum(np.floor(np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    sx = np.minimum(np.floor(np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return img[sy][:, sx]


def _resize_area_u8(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    if h % out_h == 0 and w % out_w == 0:
        # integer decimation: exact box mean with cvRound
        ky, kx = h // out_h, w // out_w
        x = f32(img).reshape((out_h, ky, out_w, kx) + img.shape[2:])
        s = x.sum(axis=(1, 3))
        return saturate_u8(s * (1.0 / (ky * kx)))
    # fractional INTER_AREA: weighted box per output pixel (float path)
    def coeffs(dst, src):
        scale = src / dst
        rows = []
        for d in range(dst):
            a, b = d * scale, (d + 1) * scale
            ia, ib = int(np.floor(a)), int(min(np.ceil(b), src))
            idx = np.arange(ia, ib)
            wgt = np.minimum(idx + 1, b) - np.maximum(idx, a)
            rows.append((idx, wgt / (b - a)))
        n = max(len(r[0]) for r in rows)
        I = np.zeros((dst, n), dtype=np.int64)
        W = np.zeros((dst, n), dtype=np.float32)
        for d, (idx, wgt) in enumerate(rows):
            I[d, :len(idx)] = idx
            W[d, :len(idx)] = wgt
        return I, W
    iy, wy = coeffs(out_h, h)
    ix, wx = coeffs(out_w, w)
    x = f32(img)
    shp_w = (1, out_w) + (1,) * (img.ndim - 2)
    row = sum(x[:, ix[:, t]] * wx[:, t].reshape(shp_w) for t in range(ix.shape[1]))
    shp_h = (out_h, 1) + (1,) * (img.ndim - 2)
    acc = sum(row[iy[:, t]] * wy[:, t].reshape(shp_h) for t in range(iy.shape[1]))
    return saturate_u8(acc)


def resize(img: jnp.ndarray, out_h: int, out_w: int,
           interpolation: str = "linear") -> jnp.ndarray:
    """cv2.resize to a static (out_h, out_w). interpolation in
    {nearest, linear, cubic, area}."""
    if out_h == img.shape[0] and out_w == img.shape[1]:
        return img
    if interpolation == "nearest":
        return _resize_nearest(img, out_h, out_w)
    if interpolation == "linear":
        return _resize_linear_u8(img, out_h, out_w)
    if interpolation == "cubic":
        return _resize_cubic_u8(img, out_h, out_w)
    if interpolation == "area":
        if out_h >= img.shape[0] or out_w >= img.shape[1]:
            # OpenCV INTER_AREA upscale falls back to bilinear
            return _resize_linear_u8(img, out_h, out_w)
        return _resize_area_u8(img, out_h, out_w)
    raise ValueError(f"unknown interpolation {interpolation!r}")


def resize_long_side(img: jnp.ndarray, scale_long: int,
                     interpolation: str = "area") -> jnp.ndarray:
    """DocScanner.py:27-36 resize_long_side: long side -> scale_long, aspect
    kept, INTER_AREA; no-op when already smaller."""
    h, w = int(img.shape[0]), int(img.shape[1])
    long_side = max(h, w)
    if long_side <= scale_long:
        return img
    s = scale_long / long_side
    return resize(img, int(round(h * s)), int(round(w * s)), interpolation)


# ---------------------------------------------------------------------------
# affine / perspective warps (inverse-map bilinear gather)
# ---------------------------------------------------------------------------

def get_perspective_transform(src_pts, dst_pts) -> np.ndarray:
    """cv2.getPerspectiveTransform: 3x3 homography from 4 point pairs.

    Host-side numpy (8x8 solve, runs once per image; DocScanner.py:142).
    """
    src = np.asarray(src_pts, dtype=np.float64).reshape(4, 2)
    dst = np.asarray(dst_pts, dtype=np.float64).reshape(4, 2)
    A = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[i] = [x, y, 1, 0, 0, 0, -x * u, -y * u]
        A[i + 4] = [0, 0, 0, x, y, 1, -x * v, -y * v]
        b[i], b[i + 4] = u, v
    h = np.linalg.solve(A, b)
    return np.append(h, 1.0).reshape(3, 3)


def get_rotation_matrix_2d(center, angle_deg: float, scale: float = 1.0) -> np.ndarray:
    """cv2.getRotationMatrix2D (DocScanner.py:234)."""
    a = np.deg2rad(angle_deg)
    alpha, beta = scale * np.cos(a), scale * np.sin(a)
    cx, cy = center
    return np.array([
        [alpha, beta, (1 - alpha) * cx - beta * cy],
        [-beta, alpha, beta * cx + (1 - alpha) * cy],
    ], dtype=np.float64)


_WARP_BITS = 5                     # cv2 INTER_BITS
_WARP_SCALE = 1 << _WARP_BITS      # 32 fractional positions
_WARP_ROUND = 1 << (2 * _WARP_BITS + _RESIZE_BITS * 2 - 1)


def _bilinear_gather_u8(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray,
                        border: str = "constant", border_value: float = 0.0) -> jnp.ndarray:
    """Sample img at float coords (map_x, map_y) with cv2 INTER_LINEAR
    semantics.

    This OpenCV build (5.0) computes remap/warp bilinear in plain float32
    (verified empirically: no 1/32 coordinate quantization, no Q15 weight
    tables) with a final cvRound — which is exactly the TPU-friendly
    formulation: a 4-tap gather with float MACs. Parity is +-1 LSB on
    <0.5% of pixels (XLA FMA contraction vs cv2's MAC order at x.5
    boundaries — see module docstring), exact elsewhere.
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx, fy = map_x - x0, map_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # flatten to 1-D gathers — XLA TPU lowers a single-dim gather far
    # better than the 2-D advanced-indexing form
    flat = img.reshape((h * w,) + img.shape[2:])

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = f32(jnp.take(flat, yc * w + xc, axis=0))
        if border == "replicate":
            return v
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        m = inb.astype(jnp.float32)
        if img.ndim == 3:
            m = m[..., None]
        return v * m + border_value * (1.0 - m)

    def wmul(wy, wx):
        ww = wy * wx
        return ww[..., None] if img.ndim == 3 else ww

    acc = (tap(y0i, x0i) * wmul(1.0 - fy, 1.0 - fx)
           + tap(y0i, x0i + 1) * wmul(1.0 - fy, fx)
           + tap(y0i + 1, x0i) * wmul(fy, 1.0 - fx)
           + tap(y0i + 1, x0i + 1) * wmul(fy, fx))
    return saturate_u8(acc)


def warp_perspective(img: jnp.ndarray, M: np.ndarray, out_h: int, out_w: int,
                     border: str = "constant", border_value: float = 0.0) -> jnp.ndarray:
    """cv2.warpPerspective INTER_LINEAR (DocScanner.py:143). M maps src->dst;
    sampling inverts it on host."""
    Minv = np.linalg.inv(np.asarray(M, dtype=np.float64))
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    A = jnp.asarray(Minv, dtype=jnp.float32)
    denom = A[2, 0] * xs + A[2, 1] * ys + A[2, 2]
    denom = jnp.where(denom != 0, denom, 1e-20)
    sx = (A[0, 0] * xs + A[0, 1] * ys + A[0, 2]) / denom
    sy = (A[1, 0] * xs + A[1, 1] * ys + A[1, 2]) / denom
    return _bilinear_gather_u8(img, sx, sy, border=border, border_value=border_value)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "border",
                                             "border_value"))
def warp_perspective_batch(imgs: jnp.ndarray, Minv: jnp.ndarray,
                           out_h: int, out_w: int,
                           border: str = "constant",
                           border_value: float = 0.0) -> jnp.ndarray:
    """warp_perspective vmapped over (B, H, W, C) images with per-image
    INVERSE homographies (B, 3, 3) f32 — one device dispatch for a whole
    same-shape serving batch (scan_batch's warp stage; per-image eager
    warps each paid a tunnel round-trip). Callers precompute
    ``np.linalg.inv(M)`` on host. Same math as warp_perspective."""
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")

    def one(img, A):
        denom = A[2, 0] * xs + A[2, 1] * ys + A[2, 2]
        denom = jnp.where(denom != 0, denom, 1e-20)
        sx = (A[0, 0] * xs + A[0, 1] * ys + A[0, 2]) / denom
        sy = (A[1, 0] * xs + A[1, 1] * ys + A[1, 2]) / denom
        return _bilinear_gather_u8(img, sx, sy, border=border,
                                   border_value=border_value)

    return jax.vmap(one)(imgs, Minv)


_TILE_T = 32        # output tile side for the tiled warps
_TILE_PAD = 8       # zero padding around the source (border=constant 0)


def perspective_tiles_plan(minvs: np.ndarray, in_h: int, in_w: int,
                           out_h: int, out_w: int, g_max: int = 64):
    """Host-side plan for :func:`warp_perspective_tiled_batch`.

    A homography maps lines to lines, so the image of a convex output
    tile is a convex quad and the min/max of the INVERSE map over the 4
    tile corners bounds every interior sample exactly; -1/+2 covers the
    bilinear taps. The corner map is evaluated in float32 with the exact
    operation order the device uses, so the bounds are bounds on the
    device's own f32 coordinates, not approximations.

    Returns (img_id, ty, tx, oy, ox int32 arrays, G) — flattened
    img-major tile records and the static window side — or None when any
    tile's window exceeds ``g_max``, leaves the padded source, or its
    denominator changes sign/vanishes (degenerate homography): the caller
    falls back to the gather form.
    """
    T, P = _TILE_T, _TILE_PAD
    nty, ntx = -(-out_h // T), -(-out_w // T)
    b = minvs.shape[0]
    A = np.asarray(minvs, np.float32)            # device uses this f32 cast
    tyv = (np.arange(nty, dtype=np.int32) * T)
    txv = (np.arange(ntx, dtype=np.int32) * T)
    # tile-corner grid, pad pixels clamped to the last real row/col (the
    # device clamps identically, so windows stay tight on edge tiles)
    y2 = np.stack([tyv, np.minimum(tyv + T - 1, out_h - 1)])  # (2, nty)
    x2 = np.stack([txv, np.minimum(txv + T - 1, out_w - 1)])  # (2, ntx)
    gy = np.broadcast_to(y2[:, None, :, None], (2, 2, nty, ntx)) \
        .astype(np.float32)
    gx = np.broadcast_to(x2[None, :, None, :], (2, 2, nty, ntx)) \
        .astype(np.float32)
    ids, tys, txs, oys, oxs = [], [], [], [], []
    g_need = 16
    for i in range(b):
        a = A[i]
        den = a[2, 0] * gx + a[2, 1] * gy + a[2, 2]
        if not (np.all(den > 1e-6) or np.all(den < -1e-6)):
            return None
        sx = (a[0, 0] * gx + a[0, 1] * gy + a[0, 2]) / den
        sy = (a[1, 0] * gx + a[1, 1] * gy + a[1, 2]) / den
        ox = np.floor(sx.min(axis=(0, 1))).astype(np.int64) - 1   # (nty,ntx)
        oy = np.floor(sy.min(axis=(0, 1))).astype(np.int64) - 1
        span_x = np.floor(sx.max(axis=(0, 1))).astype(np.int64) + 2 - ox
        span_y = np.floor(sy.max(axis=(0, 1))).astype(np.int64) + 2 - oy
        g_need = max(g_need, int(span_x.max()), int(span_y.max()))
        if g_need > g_max:
            return None
        oys.append((oy, oy + span_y))
        oxs.append((ox, ox + span_x))
        ids.append(np.full(nty * ntx, i, np.int32))
        tys.append(np.broadcast_to(tyv[:, None], (nty, ntx)).reshape(-1))
        txs.append(np.broadcast_to(txv[None, :], (nty, ntx)).reshape(-1))
    g = -(-g_need // 8) * 8
    if g > g_max:
        return None
    if g > min(in_h, in_w) + 2 * P:
        # source smaller than the shared window: the slide clamp below
        # could still pass the coverage check, but _warp_tiled_exec's
        # dynamic_slice would then request a (g, g) slice larger than the
        # padded source — a trace-time error instead of the documented
        # gather fallback (ADVICE r4). Tiny sources go to the gather path.
        return None
    oy = np.concatenate([o.reshape(-1) for o, _ in oys])
    ox = np.concatenate([o.reshape(-1) for o, _ in oxs])
    wy_end = np.concatenate([e.reshape(-1) for _, e in oys])
    wx_end = np.concatenate([e.reshape(-1) for _, e in oxs])
    # slide windows up-left so the shared g fits the padded source (the
    # tile's own span <= g, so coverage of [floor(min)-1, floor(max)+2)
    # survives the shift); reject coords outside the padding itself
    oy = np.maximum(np.minimum(oy, in_h + P - g), -P)
    ox = np.maximum(np.minimum(ox, in_w + P - g), -P)
    if (oy + g < wy_end).any() or (ox + g < wx_end).any():
        return None
    return (np.concatenate(ids), np.concatenate(tys), np.concatenate(txs),
            oy.astype(np.int32), ox.astype(np.int32), g)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "g"))
def _warp_tiled_exec(src_pad: jnp.ndarray, minvs: jnp.ndarray,
                     ids: jnp.ndarray, tys: jnp.ndarray, txs: jnp.ndarray,
                     oys: jnp.ndarray, oxs: jnp.ndarray,
                     out_h: int, out_w: int, g: int) -> jnp.ndarray:
    T, P = _TILE_T, _TILE_PAD
    bsz, c = src_pad.shape[0], src_pad.shape[3]
    nty, ntx = -(-out_h // T), -(-out_w // T)
    yl = jnp.arange(T, dtype=jnp.int32)[:, None]
    xl = jnp.arange(T, dtype=jnp.int32)[None, :]
    a_iota = jnp.arange(g, dtype=jnp.int32)

    def one_tile(args):
        i, ty, tx, oy, ox = args
        a = lax.dynamic_slice(minvs, (i, 0, 0), (1, 3, 3))[0]
        region = lax.dynamic_slice(src_pad, (i, P + oy, P + ox, 0),
                                   (1, g, g, c))[0]
        # global output coords, pad pixels clamped to the last real
        # row/col (the plan bounds windows with the same clamp; clamped
        # pads are cropped away after assembly)
        gy = f32(jnp.minimum(ty + yl, out_h - 1))
        gx = f32(jnp.minimum(tx + xl, out_w - 1))
        den = a[2, 0] * gx + a[2, 1] * gy + a[2, 2]
        den = jnp.where(den != 0, den, 1e-20)
        # window-local source coords: ox/oy are integers and |sx| < 2^11,
        # so the f32 subtraction is exact — floor/frac match the global
        # gather form bit for bit
        sx = (a[0, 0] * gx + a[0, 1] * gy + a[0, 2]) / den - f32(ox)
        sy = (a[1, 0] * gx + a[1, 1] * gy + a[1, 2]) / den - f32(oy)
        sx = jnp.clip(sx, 0.0, g - 1.001)   # no-op for planned tiles
        sy = jnp.clip(sy, 0.0, g - 1.001)
        y0 = jnp.floor(sy).astype(jnp.int32).reshape(-1)
        x0 = jnp.floor(sx).astype(jnp.int32).reshape(-1)
        fy = (sy.reshape(-1) - f32(y0))[:, None]
        fx = (sx.reshape(-1) - f32(x0))[:, None]
        # EXACT row selection: 0/1 one-hots and u8 values are both exact
        # in bf16, products accumulate in f32 -> rows0/rows1 are the
        # integer tap rows (full-speed MXU, no precision caveat)
        reg2 = region.reshape(g, g * c).astype(jnp.bfloat16)
        sel0 = (a_iota[None, :] == y0[:, None]).astype(jnp.bfloat16)
        sel1 = (a_iota[None, :] == y0[:, None] + 1).astype(jnp.bfloat16)
        rows0 = jnp.matmul(sel0, reg2, preferred_element_type=jnp.float32)
        rows1 = jnp.matmul(sel1, reg2, preferred_element_type=jnp.float32)
        rows = ((1.0 - fy) * rows0 + fy * rows1).reshape(T * T, g, c)
        ohx0 = (a_iota[None, :] == x0[:, None]).astype(jnp.float32)
        ohx1 = (a_iota[None, :] == x0[:, None] + 1).astype(jnp.float32)
        v0 = jnp.sum(rows * ohx0[:, :, None], axis=1)
        v1 = jnp.sum(rows * ohx1[:, :, None], axis=1)
        val = (1.0 - fx) * v0 + fx * v1
        return saturate_u8(val.reshape(T, T, c))

    tiles = lax.map(one_tile, (ids, tys, txs, oys, oxs), batch_size=64)
    out = (tiles.reshape(bsz, nty, ntx, T, T, c)
           .transpose(0, 1, 3, 2, 4, 5)
           .reshape(bsz, nty * T, ntx * T, c))
    return out[:, :out_h, :out_w]


def warp_perspective_tiled_batch(imgs: jnp.ndarray, minvs_np: np.ndarray,
                                 out_h: int, out_w: int,
                                 g_max: int = 64):
    """warp_perspective_batch as tiled one-hot MXU contractions instead of
    per-pixel gathers — the same reformulation that made the deskew
    rotation ~8x faster on TPU (rotate_traced_tiled), generalized to
    per-image homographies whose tile windows the HOST bounds exactly
    (``perspective_tiles_plan``; the inverse maps are host-known in the
    serving path, DocScanner.py:142-143).

    Semantics: bilinear as exact integer tap selection (bf16 0/1 matmuls,
    f32 accumulation) + two-stage f32 lerp (y then x) — within the repo
    float contract of the gather form (identical coordinates, same final
    rounding; the 4-term-vs-2-stage MAC order differs by at most 1 LSB on
    the same rare x.5 boundaries where cv2's own SIMD paths disagree).

    Returns the warped (B, out_h, out_w, C) u8 stack, or None when the
    plan rejects the homographies (caller must fall back to
    warp_perspective_batch). border=constant 0, the cv2 default used by
    every reference warp call.
    """
    in_h, in_w = int(imgs.shape[1]), int(imgs.shape[2])
    plan = perspective_tiles_plan(np.asarray(minvs_np, np.float32),
                                  in_h, in_w, out_h, out_w, g_max=g_max)
    if plan is None:
        return None
    ids, tys, txs, oys, oxs, g = plan
    p = _TILE_PAD
    src_pad = jnp.pad(imgs, ((0, 0), (p, p), (p, p), (0, 0)))
    return _warp_tiled_exec(src_pad, jnp.asarray(minvs_np, jnp.float32),
                            jnp.asarray(ids), jnp.asarray(tys),
                            jnp.asarray(txs), jnp.asarray(oys),
                            jnp.asarray(oxs), out_h, out_w, g)


def warp_affine(img: jnp.ndarray, M: np.ndarray, out_h: int, out_w: int,
                border: str = "constant", border_value: float = 0.0) -> jnp.ndarray:
    """cv2.warpAffine INTER_LINEAR (DocScanner.py:235 uses BORDER_REPLICATE).
    M is the forward 2x3; inverted on host like cv2's invertAffineTransform."""
    M = np.asarray(M, dtype=np.float64)
    D = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    Di = 1.0 / D if D != 0 else 0.0
    ia = np.array([
        [M[1, 1] * Di, -M[0, 1] * Di, 0.0],
        [-M[1, 0] * Di, M[0, 0] * Di, 0.0],
    ])
    ia[0, 2] = -ia[0, 0] * M[0, 2] - ia[0, 1] * M[1, 2]
    ia[1, 2] = -ia[1, 0] * M[0, 2] - ia[1, 1] * M[1, 2]
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    A = jnp.asarray(ia, dtype=jnp.float32)
    sx = A[0, 0] * xs + A[0, 1] * ys + A[0, 2]
    sy = A[1, 0] * xs + A[1, 1] * ys + A[1, 2]
    return _bilinear_gather_u8(img, sx, sy, border=border, border_value=border_value)


def rotate_traced_tiled(img: jnp.ndarray, angle_deg: jnp.ndarray,
                        max_angle: float = 12.0) -> jnp.ndarray:
    """Exact bilinear rotation about the center for |angle| <= max_angle
    (replicate border) — the DocScanner deskew case (clamped to 10 deg).

    TPU-native formulation: a rotation this small displaces each pixel by a
    bounded amount, so every 32x32 output tile samples from ONE 56x56
    source window (fetched with a batched dynamic_slice — coarse, fast).
    Within a tile, bilinear sampling is two one-hot-weighted contractions:
      val[p] = sum_b OHx[p,b] * (OHy @ region)[p,b]
    where OHy[p,a] carries the two y-taps' lerp weights at rows a=y0,y0+1
    and OHx the x-taps — exactly the 4-tap bilinear sum, with no per-pixel
    gather (measured ~8x faster than the gather form on TPU).
    """
    T = 32
    h, w = int(img.shape[0]), int(img.shape[1])
    cx, cy = w / 2.0, h / 2.0
    hp = (h + T - 1) // T * T
    wp = (w + T - 1) // T * T
    nty, ntx = hp // T, wp // T
    # window/padding sized from the angle bound and the image diagonal —
    # hardcoding these corrupted large pages silently (dynamic_slice clamps)
    s_max = float(np.sin(np.deg2rad(max_angle)))
    c_min = float(np.cos(np.deg2rad(max_angle)))
    # within-tile source extent relative to the tile-corner projection:
    # positive up to (T-1)(s_max+1), negative down to -(T-1)*s_max
    neg = int(np.ceil((T - 1) * s_max)) + 2
    span = neg + (T - 1) * (s_max + 1.0) + 4
    G = int(-(-span // 8) * 8)
    disp = s_max * (max(hp, wp) / 2.0 + T) + (1.0 - c_min) * (max(hp, wp) / 2.0 + T)
    P = int(np.ceil(disp)) + G + 16

    src = pad2d(f32(img), P, P + (hp - h), P, P + (wp - w), mode="edge")

    # the window math above is only valid within +-max_angle — enforce it
    a = jnp.deg2rad(jnp.clip(f32(angle_deg), -max_angle, max_angle))
    ca, sa = jnp.cos(a), jnp.sin(a)

    # tile bases (static) and per-tile source-window origins (traced)
    tys, txs = np.meshgrid(np.arange(nty) * T, np.arange(ntx) * T, indexing="ij")
    tys = jnp.asarray(tys.reshape(-1), jnp.float32)
    txs = jnp.asarray(txs.reshape(-1), jnp.float32)
    sy00 = sa * (txs - cx) + ca * (tys - cy) + cy
    sx00 = ca * (txs - cx) - sa * (tys - cy) + cx
    oy = jnp.floor(sy00).astype(jnp.int32) - neg
    ox = jnp.floor(sx00).astype(jnp.int32) - neg

    yl = jnp.arange(T, dtype=jnp.float32)[:, None]
    xl = jnp.arange(T, dtype=jnp.float32)[None, :]
    a_iota = jnp.arange(G, dtype=jnp.int32)

    def one_tile(args):
        by, bx, oy_t, ox_t = args
        region = lax.dynamic_slice(src, (P + oy_t, P + ox_t), (G, G))
        gy = by + yl                      # global output coords (T, T)
        gx = bx + xl
        sy = sa * (gx - cx) + ca * (gy - cy) + cy - oy_t.astype(jnp.float32)
        sx = ca * (gx - cx) - sa * (gy - cy) + cx - ox_t.astype(jnp.float32)
        sy = jnp.clip(sy, 0.0, G - 1.001)
        sx = jnp.clip(sx, 0.0, G - 1.001)
        y0 = jnp.floor(sy).astype(jnp.int32).reshape(-1)
        x0 = jnp.floor(sx).astype(jnp.int32).reshape(-1)
        fy = (sy.reshape(-1) - y0.astype(jnp.float32))[:, None]
        fx = (sx.reshape(-1) - x0.astype(jnp.float32))[:, None]
        ohy = (jnp.where(a_iota[None, :] == y0[:, None], 1.0 - fy, 0.0)
               + jnp.where(a_iota[None, :] == y0[:, None] + 1, fy, 0.0))
        ohx = (jnp.where(a_iota[None, :] == x0[:, None], 1.0 - fx, 0.0)
               + jnp.where(a_iota[None, :] == x0[:, None] + 1, fx, 0.0))
        rows = jnp.matmul(ohy, region, precision=lax.Precision.HIGHEST)
        val = jnp.sum(rows * ohx, axis=-1)
        return val.reshape(T, T)

    tiles = lax.map(one_tile,
                    (tys.astype(jnp.int32), txs.astype(jnp.int32), oy, ox),
                    batch_size=128)
    out = (tiles.reshape(nty, ntx, T, T).transpose(0, 2, 1, 3)
           .reshape(hp, wp)[:h, :w])
    return saturate_u8(out)


def rotate_traced(img: jnp.ndarray, angle_deg: jnp.ndarray,
                  border: str = "replicate") -> jnp.ndarray:
    """Rotate about the image center by a *traced* angle (degrees) — the
    in-graph form of getRotationMatrix2D+warpAffine used by DocScanner's
    deskew (DocScanner.py:233-235), so the whole post-warp pipeline stays a
    single jit program with no host round-trip for the data-dependent angle.

    The inverse map of a rotation by +a about c is a rotation by -a about
    c; sampling uses the same exact bilinear gather as warp_affine.
    """
    h, w = int(img.shape[0]), int(img.shape[1])
    cx, cy = w / 2.0, h / 2.0

    def do_rotate(im):
        a = jnp.deg2rad(f32(angle_deg))
        ca, sa = jnp.cos(a), jnp.sin(a)
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        xr = xs - cx
        yr = ys - cy
        # forward M (cv2 convention, y-down): [cos, sin; -sin, cos] — the
        # inverse applied to dst coords is [cos, -sin; sin, cos].
        sx = ca * xr - sa * yr + cx
        sy = sa * xr + ca * yr + cy
        return _bilinear_gather_u8(im, sx, sy, border=border)

    # angle==0 is an exact identity (bilinear with fx=fy=0 copies pixels);
    # it is also the common deskew outcome, so skip the gather entirely.
    return jax.lax.cond(jnp.asarray(angle_deg) == 0.0,
                        lambda im: im, do_rotate, img)


def rotate(img: jnp.ndarray, angle_deg: float, scale: float = 1.0,
           border: str = "constant") -> jnp.ndarray:
    """ipynb cell 14 rotate: getRotationMatrix2D(center) + warpAffine."""
    h, w = int(img.shape[0]), int(img.shape[1])
    M = get_rotation_matrix_2d((w / 2.0, h / 2.0), angle_deg, scale)
    return warp_affine(img, M, h, w, border=border)


def translate(img: jnp.ndarray, tx: float, ty: float,
              border: str = "constant") -> jnp.ndarray:
    """ipynb cell 14 translate: warpAffine with [[1,0,tx],[0,1,ty]]."""
    M = np.array([[1.0, 0.0, tx], [0.0, 1.0, ty]])
    h, w = int(img.shape[0]), int(img.shape[1])
    return warp_affine(img, M, h, w, border=border)
