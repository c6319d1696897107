"""Separable filters bit-matching OpenCV's 8-bit paths.

Replaces ``cv2.GaussianBlur`` (DocScanner.py:44,153,184; FaceEnhancement.py
:120,159,334,338; Landscape.py:144), ``cv2.boxFilter`` (inside
adaptiveThreshold MEAN_C), and the unsharp-mask composite
(Landscape.py:142-145, FaceEnhancement.py:149-168).

OpenCV's 8u GaussianBlur is bit-exact fixed point: the float64 kernel is
quantized to Q8.8 with left-to-right error diffusion (sum == 256 exactly),
rows then columns accumulate integers, and the final Q16.16 value rounds
half-up. All intermediates are < 2**24 so float32 MACs reproduce the
integer arithmetic exactly — which lets the conv run on the TPU VPU/MXU
instead of slow integer paths. (Quantization scheme verified empirically
against cv2 5.0 impulse responses; see tests/test_filters.py.)
"""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpuimage.core.borders import pad2d, BORDER_REFLECT_101, BORDER_REPLICATE
from tpuimage.core.dtypes import saturate_u8, f32

# Fixed binary kernels OpenCV uses for sigma<=0, ksize<=7 (small_gaussian_tab)
_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


def gaussian_sigma_from_ksize(ksize: int) -> float:
    """OpenCV: sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8 when sigma <= 0."""
    return 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8


def gaussian_ksize_from_sigma(sigma: float, depth_8u: bool = True) -> int:
    """OpenCV createGaussianKernels: ksize = round(sigma*(8u?3:4)*2+1) | 1."""
    k = int(round(sigma * (3 if depth_8u else 4) * 2 + 1)) | 1
    return max(k, 1)


def get_gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """Float64 kernel identical to cv2.getGaussianKernel (normalized)."""
    if sigma <= 0 and ksize <= 7 and ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize].copy()
    s = sigma if sigma > 0 else gaussian_sigma_from_ksize(ksize)
    c = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64) - c
    k = np.exp(-(x * x) / (2.0 * s * s))
    return k / k.sum()


def gaussian_kernel_q8(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV's bit-exact 8u kernel: Q8.8 by left-to-right error diffusion."""
    c = get_gaussian_kernel(ksize, sigma) * 256.0
    q = np.zeros(ksize, dtype=np.int64)
    err = 0.0
    for i in range(ksize):
        v = c[i] + err
        q[i] = np.rint(v)
        err = v - q[i]
    return q


def _sepconv_valid_f32(padded: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray) -> jnp.ndarray:
    """Separable 'valid' convolution of an already-padded HW/HWC f32 array.

    Implemented as unrolled shifted multiply-adds on the VPU: a 1-channel
    spatial conv lowers to an MXU matmul with 1x1 feature dims (measured
    ~38 ms for a 59-tap blur of a 1 MP image — <1% MXU utilization), while
    k shifted fused MACs on the VPU run in ~1 ms. Accumulation order is
    tap 0..k-1, left-to-right; the 8u gaussian path keeps integer-valued
    f32 accumulators (< 2^24) so order cannot change its results.
    """
    kyv = np.asarray(ky, dtype=np.float32).ravel()
    kxv = np.asarray(kx, dtype=np.float32).ravel()

    def one_axis(x, k, axis):
        n = len(k)
        out = x.shape[axis] - n + 1
        sl = lambda i: lax.slice_in_dim(x, i, i + out, axis=axis)
        sym = n % 2 == 1 and bool(np.all(k == k[::-1]))
        if sym:
            # OpenCV's symmetric row/column filter order:
            # k[r]*x[0] + sum_i k[r+i]*(x[+i] + x[-i]) — matching it keeps
            # the f32 rounding sequence identical for the float paths
            # (adaptiveThreshold's CV_32F blur).
            r = n // 2
            acc = sl(r) * float(k[r])
            for i in range(1, r + 1):
                acc = acc + (sl(r - i) + sl(r + i)) * float(k[r + i])
            return acc
        acc = None
        for i in range(n):
            term = sl(i) * float(k[i])
            acc = term if acc is None else acc + term
        return acc

    return one_axis(one_axis(padded, kyv, 0), kxv, 1)


def _toeplitz_band(k: np.ndarray, out_dim: int) -> np.ndarray:
    """(out_dim + len(k) - 1, out_dim) banded matrix: T[i+j, j] = k[i] —
    'valid' 1-D convolution of a padded axis as a dense matmul."""
    n = len(k)
    T = np.zeros((out_dim + n - 1, out_dim), np.float32)
    j = np.arange(out_dim)
    for i in range(n):
        T[i + j, j] = k[i]
    return T


# matmul dispatch threshold: below this tap count the unrolled shifted-MAC
# VPU form wins (fuses into neighbors); above it the MXU banded matmul wins
# (measured, 8x 1200x849 chained reps: k=25 XLA 0.09 vs matmul 0.36 ms;
# k=43 0.72 vs 0.29; k=51 1.78 vs ~0.1)
_GAUSS_MATMUL_MIN_K = 35


def _gaussian_matmul_u8(img: jnp.ndarray, ksize: int, sigma: float,
                        border: str) -> jnp.ndarray:
    """cv2.GaussianBlur 8u as two banded-Toeplitz bf16 matmuls on the MXU.

    Exactness: Q8.8 taps (ints <= 256) and u8 pixels are bf16-exact; each
    product needs <= 17 mantissa bits and every f32-accumulated sum stays
    < 2^24, so the row pass is one exact matmul. Its 17-bit integer result
    does NOT fit bf16, so the column pass splits it into hi/lo bytes
    (both bf16-exact) stacked side-by-side into a single matmul, then
    recombines: b = 256*(Tc@hi) + Tc@lo < 2^24 — still exact. Identical
    output to the shifted-MAC form, but the FLOPs ride the MXU: a k-tap
    separable blur is 2k shifted full-image reads on the VPU vs ~2
    dense (dim x dim) matmuls that cost O(dim/128) MXU passes.
    """
    k = gaussian_kernel_q8(ksize, sigma).astype(np.float32)
    r = ksize // 2
    h, w = int(img.shape[0]), int(img.shape[1])
    p = pad2d(f32(img), r, r, r, r, mode=border).astype(jnp.bfloat16)
    t_r = jnp.asarray(_toeplitz_band(k, w), jnp.bfloat16)        # (w+2r, w)
    t_c = jnp.asarray(_toeplitz_band(k, h).T, jnp.bfloat16)      # (h, h+2r)
    a = jnp.matmul(p, t_r, preferred_element_type=jnp.float32)   # (h+2r, w)
    a_hi = jnp.floor(a * (1.0 / 256.0))                          # exact: 2^-8 scale
    a_lo = a - a_hi * 256.0
    stacked = jnp.concatenate([a_hi, a_lo], axis=1).astype(jnp.bfloat16)
    b2 = jnp.matmul(t_c, stacked, preferred_element_type=jnp.float32)
    b = b2[:, :w] * 256.0 + b2[:, w:]                            # Q16.16 ints
    return jnp.clip(jnp.floor((b + 32768.0) * (1.0 / 65536.0)), 0, 255
                    ).astype(jnp.uint8)


def gaussian_blur_u8(img: jnp.ndarray, ksize: int = 0, sigma: float = 0.0,
                     border: str = BORDER_REFLECT_101,
                     impl: str = "auto") -> jnp.ndarray:
    """cv2.GaussianBlur on uint8, bit-exact (fixed-point Q8.8 path).

    ksize==0 derives the kernel size from sigma like cv2's ``(0,0)`` form
    (DocScanner ``GaussianBlur(img,(0,0),radius)`` call sites).

    impl: "auto" = MXU banded-matmul form on TPU for 2-D inputs with
    ksize >= 35 (the big illumination/ink-mask blurs) / the XLA
    shifted-MAC form elsewhere; "xla" / "matmul" / "pallas" force a path
    (the Pallas band kernel is validated but measured slower than XLA —
    see gaussian_pallas_applicable). All are bit-exact (integer-valued
    f32 accumulation, order-free).
    """
    if ksize <= 0:
        if sigma <= 0:
            return img
        ksize = gaussian_ksize_from_sigma(sigma)
    if ksize == 1:
        return img
    import jax
    on_tpu = jax.default_backend() not in ("cpu",)
    # forced paths raise on unsupported combinations instead of silently
    # falling through to XLA (a silent fallthrough can mask dispatch bugs
    # in forced-path benchmarks)
    if impl == "matmul" and img.ndim != 2:
        raise ValueError("impl='matmul' requires a 2-D image, got ndim="
                         f"{img.ndim}")
    if impl == "pallas" and border != BORDER_REFLECT_101:
        raise ValueError("impl='pallas' supports only BORDER_REFLECT_101, "
                         f"got {border!r}")
    if impl == "matmul" or (impl == "auto" and on_tpu and img.ndim == 2
                            and ksize >= _GAUSS_MATMUL_MIN_K):
        return _gaussian_matmul_u8(img, ksize, sigma, border)
    if impl == "pallas":
        from tpuimage.ops.pallas_kernels import gaussian_blur_u8_pallas
        return gaussian_blur_u8_pallas(img, ksize, sigma,
                                       interpret=not on_tpu)
    k = gaussian_kernel_q8(ksize, sigma).astype(np.float32)
    r = ksize // 2
    p = pad2d(f32(img), r, r, r, r, mode=border)
    out32 = _sepconv_valid_f32(p, k, k)  # exact integers in f32, Q16.16
    # round half up: (x + 2^15) >> 16
    return jnp.clip(jnp.floor((out32 + 32768.0) * (1.0 / 65536.0)), 0, 255).astype(jnp.uint8)


def gaussian_blur_f32(img: jnp.ndarray, ksize: int = 0, sigma: float = 0.0,
                      border: str = BORDER_REFLECT_101) -> jnp.ndarray:
    """Float gaussian blur (for float-valued masks / internal use)."""
    if ksize <= 0:
        if sigma <= 0:
            return img
        ksize = gaussian_ksize_from_sigma(sigma, depth_8u=False)
    if ksize == 1:
        return img
    k = get_gaussian_kernel(ksize, sigma).astype(np.float32)
    r = ksize // 2
    p = pad2d(f32(img), r, r, r, r, mode=border)
    return _sepconv_valid_f32(p, k, k)


def box_filter_u8(img: jnp.ndarray, ksize: int,
                  border: str = BORDER_REPLICATE) -> jnp.ndarray:
    """Normalized cv2.boxFilter on uint8 (the ADAPTIVE_THRESH_MEAN_C mean).

    Integer window sum (exact in f32 for ksize<=256) scaled by 1/area and
    cvRounded, matching OpenCV's saturate_cast<uchar>(sum*scale).
    """
    r = ksize // 2
    p = pad2d(f32(img), r, ksize - 1 - r, r, ksize - 1 - r, mode=border)
    ones = np.ones(ksize, dtype=np.float32)
    s = _sepconv_valid_f32(p, ones, ones)
    return saturate_u8(s * (1.0 / (ksize * ksize)))


def unsharp_mask_u8(img: jnp.ndarray, amount: float, sigma: float = 0.0,
                    ksize: int = 0) -> jnp.ndarray:
    """sharpen = addWeighted(img, 1+amount, blur, -amount, 0)
    (Landscape.py:142-145 ``sharpen_image``; FaceEnhancement.py:162)."""
    blurred = gaussian_blur_u8(img, ksize=ksize, sigma=sigma)
    return saturate_u8(f32(img) * (1.0 + amount) + f32(blurred) * (-amount))
