"""Colorspace conversions bit-matching OpenCV's 8-bit fixed-point paths.

Replaces the ``cv2.cvtColor`` calls throughout the reference:
DocScanner.py:41 (BGR2GRAY), FaceEnhancement.py:106 (BGR2YCrCb),
:155/:166 (BGR2LAB/LAB2BGR), :241/:249 (BGR2HSV/HSV2BGR), asm.py:88
(BGR2LAB), Landscape.py:88 (BGR2HSV), morph_seq pyc (BGR2RGB, RGB2GRAY).

All functions take/return uint8 arrays, HWC (or HW for gray), and are pure
and jittable. The framework's native channel order is RGB; BGR variants are
provided because the reference's OpenCV pipelines are BGR-centric and the
parity tests compare against cv2 on both orders.

Fixed-point constants mirror opencv imgproc (color_yuv / color_hsv /
color_lab simd paths): yuv_shift=14 descale arithmetic for GRAY/YCrCb,
hsv_shift=12 integer tables for HSV, and the gamma+cbrt ushort tables with
lab_shift=12 / gamma_shift=3 for Lab.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpuimage.core.dtypes import saturate_u8, descale, i32, f32

# ---------------------------------------------------------------------------
# GRAY — modern OpenCV bit-exact path: Y = descale(R*9798 + G*19235 + B*3735, 15)
# (verified exact against cv2 5.0; the YCrCb path below still uses the
# historical Q14 coefficients internally)
# ---------------------------------------------------------------------------
_R2Y, _G2Y, _B2Y = 4899, 9617, 1868
_YUV_SHIFT = 14
_R2Y15, _G2Y15, _B2Y15 = 9798, 19235, 3735


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = i32(img[..., 0]), i32(img[..., 1]), i32(img[..., 2])
    return descale(r * _R2Y15 + g * _G2Y15 + b * _B2Y15, 15).astype(jnp.uint8)


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    return rgb_to_gray(img[..., ::-1])


def gray_to_rgb(gray: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([gray, gray, gray], axis=-1)


# ---------------------------------------------------------------------------
# YCrCb  (FaceEnhancement.py:106 skin mask; output order Y, Cr, Cb)
# ---------------------------------------------------------------------------
_YCRCB_C3 = 11682  # cvRound(0.713 * 2**14)
_YCRCB_C4 = 9241   # cvRound(0.564 * 2**14)


def rgb_to_ycrcb(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = i32(img[..., 0]), i32(img[..., 1]), i32(img[..., 2])
    y = descale(r * _R2Y + g * _G2Y + b * _B2Y, _YUV_SHIFT)
    delta = 128 << _YUV_SHIFT
    cr = descale((r - y) * _YCRCB_C3 + delta, _YUV_SHIFT)
    cb = descale((b - y) * _YCRCB_C4 + delta, _YUV_SHIFT)
    return saturate_u8(jnp.stack([y, cr, cb], axis=-1))


def bgr_to_ycrcb(img: jnp.ndarray) -> jnp.ndarray:
    return rgb_to_ycrcb(img[..., ::-1])


_YCRCB_INV = (22987, -11698, -5636, 29049)  # 1.403, -0.714, -0.344, 1.773 Q14


def ycrcb_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    y, cr, cb = i32(img[..., 0]), i32(img[..., 1]), i32(img[..., 2])
    c0, c1, c2, c3 = _YCRCB_INV
    r = y + descale((cr - 128) * c0, _YUV_SHIFT)
    g = y + descale((cr - 128) * c1 + (cb - 128) * c2, _YUV_SHIFT)
    b = y + descale((cb - 128) * c3, _YUV_SHIFT)
    return saturate_u8(jnp.stack([r, g, b], axis=-1))


def ycrcb_to_bgr(img: jnp.ndarray) -> jnp.ndarray:
    return ycrcb_to_rgb(img)[..., ::-1]


# ---------------------------------------------------------------------------
# HSV (8-bit, H in [0,180)) — integer table algorithm of color_hsv.simd
# (FaceEnhancement.py:241 saturation adjust, Landscape.py:88 degrade)
# ---------------------------------------------------------------------------
_HSV_SHIFT = 12


def _hsv_tables():
    i = np.arange(256, dtype=np.float64)
    with np.errstate(divide="ignore"):
        sdiv = np.where(i > 0, np.rint((255 << _HSV_SHIFT) / i), 0.0)
        hdiv = np.where(i > 0, np.rint((180 << _HSV_SHIFT) / (6.0 * i)), 0.0)
    return (jnp.asarray(sdiv.astype(np.int64), dtype=jnp.int32),
            jnp.asarray(hdiv.astype(np.int64), dtype=jnp.int32))


_SDIV_TAB, _HDIV_TAB = _hsv_tables()


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    from tpuimage.ops.lut import lut_lookup
    r, g, b = i32(img[..., 0]), i32(img[..., 1]), i32(img[..., 2])
    v = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - vmin
    s = (diff * lut_lookup(_SDIV_TAB, v) + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
    h_raw = jnp.where(
        v == r, g - b,
        jnp.where(v == g, (b - r) + 2 * diff, (r - g) + 4 * diff))
    h = (h_raw * lut_lookup(_HDIV_TAB, diff) + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
    h = jnp.where(h < 0, h + 180, h)
    return jnp.stack([h, s, v], axis=-1).astype(jnp.uint8)


def bgr_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    return rgb_to_hsv(img[..., ::-1])


def hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """Float sector algorithm of OpenCV HSV2RGB_f with 8-bit rescale."""
    h = f32(img[..., 0]) * (6.0 / 180.0)
    s = f32(img[..., 1]) * (1.0 / 255.0)
    v = f32(img[..., 2]) * (1.0 / 255.0)
    h = jnp.where(h < 0, h + 6.0, h)
    sector = jnp.floor(h)
    hfrac = h - sector
    sector = sector.astype(jnp.int32) % 6
    tab0 = v
    tab1 = v * (1.0 - s)
    tab2 = v * (1.0 - s * hfrac)
    tab3 = v * (1.0 - s * (1.0 - hfrac))
    # OpenCV sector_data[][3] (b,g,r order); we emit r,g,b
    #   sector: 0        1        2        3        4        5
    # b index: 1        1        3        0        0        2
    # g index: 3        0        0        2        1        1
    # r index: 0        2        1        1        3        0
    tabs = [tab0, tab1, tab2, tab3]

    def pick(idx_per_sector):
        # 6-way select chain (per-pixel table gathers are slow on TPU)
        out = tabs[idx_per_sector[0]]
        for k in range(1, 6):
            out = jnp.where(sector == k, tabs[idx_per_sector[k]], out)
        return out

    b = pick([1, 1, 3, 0, 0, 2])
    g = pick([3, 0, 0, 2, 1, 1])
    r = pick([0, 2, 1, 1, 3, 0])
    # this cv2 5.0 build TRUNCATES the f32 result on the 8u path (measured
    # on the full 180x256x256 grid: floor disagrees at 5e-5 of entries —
    # op-order/FMA boundary cases — where cvRound disagreed at 33%)
    x = jnp.stack([r, g, b], axis=-1) * 255.0
    return jnp.clip(jnp.floor(x), 0, 255).astype(jnp.uint8)


def hsv_to_bgr(img: jnp.ndarray) -> jnp.ndarray:
    return hsv_to_rgb(img)[..., ::-1]


# ---------------------------------------------------------------------------
# Lab (8-bit): gamma + cbrt ushort tables, integer descale (color_lab.cpp)
# ---------------------------------------------------------------------------
_LAB_SHIFT = 12
_GAMMA_SHIFT = 3
_LAB_SHIFT2 = _LAB_SHIFT + _GAMMA_SHIFT
_D65 = (0.950456, 1.0, 1.088754)
_SRGB2XYZ_D65 = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
])
_XYZ2SRGB_D65 = np.linalg.inv(_SRGB2XYZ_D65)


def _lab_tables():
    # sRGB gamma table: 0..255 -> linear scaled to 0..255*8
    x = np.arange(256, dtype=np.float64) / 255.0
    lin = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    gamma_tab = np.rint(lin * 255.0 * (1 << _GAMMA_SHIFT)).astype(np.int64)

    # cube-root table over the descaled XYZ range
    n = 256 * 3 // 2 * (1 << _GAMMA_SHIFT)  # 3072
    t = np.arange(n, dtype=np.float64) / (255.0 * (1 << _GAMMA_SHIFT))
    fy = np.where(t < 0.008856, t * 7.787 + 16.0 / 116.0, np.cbrt(t))
    cbrt_tab = np.rint(fy * (1 << _LAB_SHIFT2)).astype(np.int64)

    # fixed-point sRGB->XYZ coefficients, X/Z rows scaled by whitepoint
    scale = np.array([(1 << _LAB_SHIFT) / _D65[0],
                      (1 << _LAB_SHIFT),
                      (1 << _LAB_SHIFT) / _D65[2]])
    coeffs = np.rint(_SRGB2XYZ_D65 * scale[:, None]).astype(np.int64)
    return gamma_tab, cbrt_tab, coeffs


# numpy masters (the Pallas kernel reads these host-side — a jnp constant
# cannot be np.asarray'd while an outer trace is active)
_GAMMA_TAB_NP, _CBRT_TAB_NP, _LAB_COEFFS = _lab_tables()
_GAMMA_TAB = jnp.asarray(_GAMMA_TAB_NP, dtype=jnp.int32)
_CBRT_TAB = jnp.asarray(_CBRT_TAB_NP, dtype=jnp.int32)
_CBRT_N = int(_CBRT_TAB.shape[0])


def rgb_to_lab(img: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    from tpuimage.ops.lut import lut_lookup
    import jax
    # TPU production path: the fused Pallas LUT kernel — the XLA one-hot
    # form materializes the 3072-entry cbrt indicators to HBM (17.1 ms for
    # a batch-8 nightview; the kernel cuts it to ~2 ms, bit-identical)
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() not in ("cpu",)
                and img.ndim == 3 and img.dtype == jnp.uint8 else "xla")
    if impl == "pallas":
        from tpuimage.ops.pallas_kernels import rgb_to_lab_pallas
        return rgb_to_lab_pallas(img,
                                 interpret=jax.default_backend() == "cpu")
    # per-channel planar lookups: measured equal to channel-major stacked
    # calls (XLA amortizes the one-hot construction either way), and a
    # trailing-axis stack puts 3 in the lane dim — 3x slower end-to-end
    r = lut_lookup(_GAMMA_TAB, i32(img[..., 0]))
    g = lut_lookup(_GAMMA_TAB, i32(img[..., 1]))
    b = lut_lookup(_GAMMA_TAB, i32(img[..., 2]))
    C = _LAB_COEFFS

    def fchan(row):
        idx = descale(r * int(C[row, 0]) + g * int(C[row, 1]) + b * int(C[row, 2]),
                      _LAB_SHIFT)
        return lut_lookup(_CBRT_TAB, jnp.clip(idx, 0, _CBRT_N - 1))

    fX, fY, fZ = fchan(0), fchan(1), fchan(2)
    Lscale = (116 * 255 + 50) // 100               # 296
    Lshift = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)
    L = descale(Lscale * fY + Lshift, _LAB_SHIFT2)
    a = descale(500 * (fX - fY) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    bb = descale(200 * (fY - fZ) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    return saturate_u8(jnp.stack([L, a, bb], axis=-1))


def bgr_to_lab(img: jnp.ndarray) -> jnp.ndarray:
    return rgb_to_lab(img[..., ::-1])


_XYZ2SRGB_J = jnp.asarray(_XYZ2SRGB_D65, dtype=jnp.float32)

# --- deterministic fixed-point Lab->RGB (impl="lut") --------------------
# The float inverse path below is at XLA's mercy for FMA contraction: the
# SAME u8 Lab input produces results differing by 1 LSB on ~1e-6 of
# pixels between compilation contexts (plain jit vs shard_map — measured
# on nightview; CLAUDE.md's uncontrollable-contraction caveat). For the
# spatially-sharded pipelines that promise sharded == unsharded
# bit-exactness, this path evaluates the identical math as pure integer
# ops: per-channel contributions from host-built f64 tables (Lab is u8,
# so X depends only on (L,a), Y on L, Z on (L,b)), an i32 MAC at 2^26
# fixed point, and the monotone gamma+cvRound folded into 255 integer
# thresholds (searchsorted). Bit-identical across backends and program
# contexts by construction; within 1 ulp of the real-valued function, so
# it agrees with the float path everywhere except pixels whose true
# value sits within ~2e-8 of a cvRound boundary (measured: ≤1 LSB on
# <2e-5 of random Lab inputs) — comfortably inside the ±2 LSB cv2
# contract (tests/test_color.py::test_inverse_close).
_LAB_INV_SHIFT = 26


def _lab_inv_tables():
    S = float(1 << _LAB_INV_SHIFT)
    M = _XYZ2SRGB_D65
    L = np.arange(256, dtype=np.float64) * (100.0 / 255.0)
    fy = (L + 16.0) / 116.0
    y = np.where(L > 8.0, fy ** 3, L / 903.3)
    ab = np.arange(256, dtype=np.float64) - 128.0
    fx = fy[:, None] + ab[None, :] / 500.0      # (L, a)
    fz = fy[:, None] - ab[None, :] / 200.0      # (L, b)

    def finv(t):
        return np.where(t ** 3 > 0.008856, t ** 3, (t - 16.0 / 116.0) / 7.787)

    x = finv(fx) * _D65[0]
    z = finv(fz) * _D65[2]
    XT = np.rint(M[:, 0][:, None, None] * x[None] * S).astype(np.int32)
    YT = np.rint(M[:, 1][:, None] * y[None] * S).astype(np.int32)
    ZT = np.rint(M[:, 2][:, None, None] * z[None] * S).astype(np.int32)

    def gamma255(m):
        t = m / S
        s = np.where(t <= 0.0031308, t * 12.92,
                     1.055 * t ** (1.0 / 2.4) - 0.055)
        return np.rint(s * 255.0)               # cvRound (half-to-even)

    # thr[k-1] = smallest integer m in [0, 2^26] with gamma255(m) >= k
    thr = np.empty(255, dtype=np.int32)
    for k in range(1, 256):
        s = (k - 0.5) / 255.0
        t = s / 12.92 if s <= 0.0031308 * 12.92 else ((s + 0.055) / 1.055) ** 2.4
        m = int(np.ceil(t * S))
        while m > 0 and gamma255(m - 1) >= k:
            m -= 1
        while gamma255(m) < k:
            m += 1
        thr[k - 1] = m
    return XT, YT, ZT, thr


_LAB_INV_CACHE = None


def _lab_to_rgb_lut(img: jnp.ndarray) -> jnp.ndarray:
    global _LAB_INV_CACHE
    if _LAB_INV_CACHE is None:
        _LAB_INV_CACHE = _lab_inv_tables()
    XT, YT, ZT, thr = _LAB_INV_CACHE
    XTj = jnp.asarray(XT.reshape(3, -1))
    YTj = jnp.asarray(YT)
    ZTj = jnp.asarray(ZT.reshape(3, -1))
    thrj = jnp.asarray(thr)
    Li = i32(img[..., 0])
    la = Li * 256 + i32(img[..., 1])
    lb = Li * 256 + i32(img[..., 2])
    hi = jnp.int32(1 << _LAB_INV_SHIFT)
    outs = []
    for c in range(3):
        acc = XTj[c][la] + YTj[c][Li] + ZTj[c][lb]
        acc = jnp.clip(acc, 0, hi)
        outs.append(jnp.searchsorted(thrj, acc, side="right")
                    .astype(jnp.uint8))
    return jnp.stack(outs, axis=-1)


def lab_to_rgb(img: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """Float inverse path (Lab2RGBfloat) with 8-bit rescale and sRGB gamma.

    impl: "auto"/"xla" = the f32 path below (production default — matches
    cv2's Lab2RGBfloat within the ±2 LSB contract); "lut" = the
    deterministic integer fixed-point path (bit-identical across
    backends and compilation contexts; see _lab_inv_tables) used by the
    spatially-sharded pipelines whose tests assert array_equal."""
    if impl == "lut":
        return _lab_to_rgb_lut(img)
    L = f32(img[..., 0]) * (100.0 / 255.0)
    a = f32(img[..., 1]) - 128.0
    b = f32(img[..., 2]) - 128.0

    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        return jnp.where(t ** 3 > 0.008856, t ** 3, (t - 16.0 / 116.0) / 7.787)

    y = jnp.where(L > 8.0, fy ** 3, L / 903.3)
    x = finv(fx) * _D65[0]
    z = finv(fz) * _D65[2]
    # elementwise MACs, not a matmul: the TPU MXU's default bf16 matmul
    # precision would cancel catastrophically near the gamut boundary
    M = _XYZ2SRGB_J
    rgb_lin = jnp.stack([M[0, 0] * x + M[0, 1] * y + M[0, 2] * z,
                         M[1, 0] * x + M[1, 1] * y + M[1, 2] * z,
                         M[2, 0] * x + M[2, 1] * y + M[2, 2] * z], axis=-1)
    rgb_lin = jnp.clip(rgb_lin, 0.0, 1.0)
    srgb = jnp.where(rgb_lin <= 0.0031308,
                     rgb_lin * 12.92,
                     1.055 * rgb_lin ** (1.0 / 2.4) - 0.055)
    return saturate_u8(srgb * 255.0)


def lab_to_bgr(img: jnp.ndarray) -> jnp.ndarray:
    return lab_to_rgb(img)[..., ::-1]


# ---------------------------------------------------------------------------
# split / merge  (FaceEnhancement.py:156,165; asm.py:89,99)
# ---------------------------------------------------------------------------

def split(img: jnp.ndarray):
    return tuple(img[..., c] for c in range(img.shape[-1]))


def merge(channels) -> jnp.ndarray:
    return jnp.stack(list(channels), axis=-1)
