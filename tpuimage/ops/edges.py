"""Edge/derivative ops: Sobel, Scharr, Laplacian, magnitude/phase, Canny.

Replaces cv2.Canny (DocScanner.py:79,218; classification.py:71; ipynb cells
4,15,17), cv2.Sobel / cv2.Laplacian / cv2.magnitude / cv2.phase (ipynb
cells 8,17; AI_classification.py check_document_mode analog).

TPU-native design: derivatives are tiny fixed convs (VPU-friendly); Canny's
non-maximum suppression is evaluated densely with the same integer sector
tests as OpenCV (TG22 = tan(22.5deg) in Q15), and the hysteresis flood —
sequential BFS in OpenCV — becomes a bounded fixpoint inside
``lax.while_loop`` with a backend-dispatched growth schedule: masked 3x3
dilations on CPU, uint32 row-bitboards (32 rows per lane word, growth as
pure bit ops) on TPU. See ``canny`` for the measured tradeoff.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpuimage.core.borders import pad2d, BORDER_REFLECT_101
from tpuimage.core.dtypes import f32

_SOBEL_3 = {
    # (deriv order dx, dy) -> 3x3 kernel (correlation form, like cv2)
    (1, 0): np.outer([1, 2, 1], [-1, 0, 1]),
    (0, 1): np.outer([-1, 0, 1], [1, 2, 1]),
    (2, 0): np.outer([1, 2, 1], [1, -2, 1]),
    (0, 2): np.outer([1, -2, 1], [1, 2, 1]),
    (1, 1): np.outer([-1, 0, 1], [-1, 0, 1]),
}

_SCHARR = {
    (1, 0): np.outer([3, 10, 3], [-1, 0, 1]),
    (0, 1): np.outer([-1, 0, 1], [3, 10, 3]),
}


def _conv3x3_i32(img: jnp.ndarray, k: np.ndarray,
                 border: str = BORDER_REFLECT_101) -> jnp.ndarray:
    """Exact integer 3x3 correlation via shifted adds (f32 MACs are exact
    for |acc| < 2^24; Sobel of uint8 peaks at 4*255*... well within)."""
    h, w = img.shape[0], img.shape[1]
    p = f32(pad2d(img, 1, 1, 1, 1, mode=border))
    acc = jnp.zeros(img.shape, dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            c = float(k[dy, dx])
            if c == 0.0:
                continue
            view = lax.slice_in_dim(lax.slice_in_dim(p, dy, dy + h, axis=0),
                                    dx, dx + w, axis=1)
            acc = acc + view * c
    return acc


def sobel(img: jnp.ndarray, dx: int, dy: int, ksize: int = 3,
          scharr: bool = False) -> jnp.ndarray:
    """cv2.Sobel(..., CV_32F/CV_16S value-identical), ksize 3 (ipynb cell 17)."""
    if scharr or ksize == -1:
        k = _SCHARR[(dx, dy)]
    else:
        assert ksize == 3, "only ksize=3 supported (all reference call sites)"
        k = _SOBEL_3[(dx, dy)]
    return _conv3x3_i32(img, k)


def laplacian(img: jnp.ndarray, ksize: int = 1) -> jnp.ndarray:
    """cv2.Laplacian ksize=1 (the [[0,1,0],[1,-4,1],[0,1,0]] stencil)
    or ksize=3 ([[2,0,2],[0,-8,0],[2,0,2]])."""
    if ksize <= 1:
        k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]])
    else:
        k = np.array([[2, 0, 2], [0, -8, 0], [2, 0, 2]])
    return _conv3x3_i32(img, k)


def magnitude(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """cv2.magnitude (L2)."""
    return jnp.sqrt(f32(gx) ** 2 + f32(gy) ** 2)


def phase(gx: jnp.ndarray, gy: jnp.ndarray, degrees: bool = True) -> jnp.ndarray:
    """cv2.phase: atan2 in [0, 360) degrees (ipynb cell 17)."""
    ang = jnp.arctan2(f32(gy), f32(gx))
    if degrees:
        ang = jnp.rad2deg(ang)
        return jnp.where(ang < 0, ang + 360.0, ang)
    return jnp.where(ang < 0, ang + 2.0 * np.pi, ang)


def laplacian_variance(gray: jnp.ndarray) -> jnp.ndarray:
    """Blur metric Var(Laplacian) (ipynb cell 17 feature extraction)."""
    lap = laplacian(gray)
    return jnp.var(lap)


# ---------------------------------------------------------------------------
# Canny
# ---------------------------------------------------------------------------

_TG22 = 13573  # cv2: tan(22.5 deg) * 2^15, rounded


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """x shifted so out[y, x] = x[y+dy, x+dx], out-of-range -> fill."""
    h, w = x.shape
    p = jnp.pad(x, ((1, 1), (1, 1)), mode="constant", constant_values=fill)
    return lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w))


def canny_pre(gray: jnp.ndarray, low: float, high: float,
              l2_gradient: bool = False, row_valid: jnp.ndarray | None = None):
    """The local (stencil) half of cv2.Canny: Sobel3 -> magnitude ->
    integer sector NMS -> double threshold. Returns (strong, weak) bool
    maps; :func:`canny` composes this with the hysteresis fixpoint.

    Split out so spatially-sharded callers (runtime.spatial) can evaluate
    it on a 2-row-halo'd block (radius 2: sobel 1 + NMS 1) and run the
    hysteresis flood with per-iteration halo exchange instead.

    row_valid: optional (H,) bool — rows outside the GLOBAL image. The
    unsharded NMS sees magnitude 0 beyond the image (the _shift2d fill);
    a halo'd block carries real values there, so sharded callers zero the
    magnitude on out-of-image rows to keep edge-row NMS decisions
    identical."""
    if low > high:
        low, high = high, low
    dx = sobel(gray, 1, 0)
    dy = sobel(gray, 0, 1)
    if l2_gradient:
        mag = dx * dx + dy * dy
        low_t, high_t = float(low) ** 2, float(high) ** 2
    else:
        mag = jnp.abs(dx) + jnp.abs(dy)
        # cv2 truncates float thresholds toward zero for L1
        low_t, high_t = float(int(low)), float(int(high))
    if row_valid is not None:
        mag = jnp.where(row_valid[:, None], mag, 0.0)

    # --- sector NMS (canny.cpp): integer tangent tests in Q15 ---
    xs = jnp.abs(dx)
    ys = jnp.abs(dy) * 32768.0
    tg22x = xs * float(_TG22)
    tg67x = tg22x + xs * 65536.0

    m = mag
    left = _shift2d(m, 0, -1, 0.0)
    right = _shift2d(m, 0, 1, 0.0)
    up = _shift2d(m, -1, 0, 0.0)
    down = _shift2d(m, 1, 0, 0.0)
    # diagonal neighbours picked by the sign product s = sign(dx*dy)
    same_sign = (dx * dy) >= 0
    diag1 = jnp.where(same_sign, _shift2d(m, -1, -1, 0.0),
                      _shift2d(m, -1, 1, 0.0))
    diag2 = jnp.where(same_sign, _shift2d(m, 1, 1, 0.0),
                      _shift2d(m, 1, -1, 0.0))

    horiz = ys < tg22x
    vert = ys > tg67x
    keep = jnp.where(
        horiz, (m > left) & (m >= right),
        jnp.where(vert, (m > up) & (m >= down), (m > diag1) & (m >= diag2)))

    cand = keep & (m > low_t)
    strong = cand & (m > high_t)
    return strong, cand & ~strong


def _shift1d(x: jnp.ndarray, s: int, axis: int, fill: bool) -> jnp.ndarray:
    """out[i] = x[i+s] along ``axis``, out-of-range -> fill (bool arrays)."""
    n = x.shape[axis]
    if s == 0:
        return x
    if abs(s) >= n:
        return jnp.full(x.shape, fill, dtype=x.dtype)
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(s)
    block = jnp.full(pad_shape, fill, dtype=x.dtype)
    if s > 0:
        return jnp.concatenate([lax.slice_in_dim(x, s, n, axis=axis), block],
                               axis=axis)
    return jnp.concatenate([block, lax.slice_in_dim(x, 0, n + s, axis=axis)],
                           axis=axis)


def dilate8_bool(b: jnp.ndarray) -> jnp.ndarray:
    """8-connected boolean dilation (the hysteresis growth step)."""
    p = jnp.pad(b, 1, mode="constant", constant_values=False)
    acc = b
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            if oy == 0 and ox == 0:
                continue
            acc = acc | lax.dynamic_slice(p, (1 + oy, 1 + ox), b.shape)
    return acc


def _pack_rows_u32(b: jnp.ndarray, g: int) -> jnp.ndarray:
    """(R, W) bool -> (g, W) uint32 bitboard: bit k of word y is row
    32*y + k (rows >= R pack as False)."""
    r, w = b.shape
    pad = g * 32 - r
    if pad:
        b = jnp.concatenate(
            [b, jnp.zeros((pad, w), b.dtype)], axis=0)
    shifted = (b.reshape(g, 32, w).astype(jnp.uint32)
               << jnp.arange(32, dtype=jnp.uint32)[None, :, None])
    return lax.reduce(shifted, np.uint32(0), lax.bitwise_or, (1,))


def _unpack_rows_u32(p: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_rows_u32` -> (r, W) bool."""
    g, w = p.shape
    bits = ((p[:, None, :]
             >> jnp.arange(32, dtype=jnp.uint32)[None, :, None])
            & jnp.uint32(1))
    return bits.reshape(g * 32, w)[:r].astype(jnp.bool_)


# Growth steps per convergence check in the bitpacked schedule: steps are
# ~12 elementwise u32 ops on a 32x-smaller array, so overshooting the
# fixpoint is nearly free while every check is a full-array reduction.
_BITPACK_STEPS_PER_CHECK = 16


def _hysteresis_bitpacked(strong: jnp.ndarray, weak: jnp.ndarray,
                          max_iters: int) -> jnp.ndarray:
    """The hysteresis fixpoint on uint32 row-bitboards: 32 plane rows live
    in the bits of one lane word, so a 3x3 boolean dilation is 2 bit
    shifts + 2 word-carry shifts + 2 lane shifts + ORs on a 32x-smaller
    array (full 128-lane utilization is preserved because packing is
    along H). The growth step `new = s | (weak & dilate8(s))` is pure
    AND/OR, so it is computed directly in the packed domain; the fixpoint
    (monotone weak-reachability closure) is bit-identical to the
    unpacked schedules."""
    r, w = strong.shape
    g = -(-r // 32)
    sp = _pack_rows_u32(strong, g)
    wp = _pack_rows_u32(weak, g)
    zero = np.uint32(0)

    def grow(p):
        # plane-row neighbours: bit shifts with carries across word rows
        dn = (p << 1) | (_shift1d(p, -1, 0, zero) >> 31)   # in[r-1]
        up = (p >> 1) | (_shift1d(p, 1, 0, zero) << 31)    # in[r+1]
        v = p | up | dn
        # lane (column) neighbours, then 3x3 OR = hOR(vOR)
        return v | _shift1d(v, 1, 1, zero) | _shift1d(v, -1, 1, zero)

    def cond(state):
        i, s, changed = state
        return changed & (i < max_iters)

    def body(state):
        i, s, _ = state
        new = s
        for _ in range(_BITPACK_STEPS_PER_CHECK):
            new = new | (wp & grow(new))
        return i + 1, new, jnp.any(new != s)

    # init flag == True but built FROM the data so its varying-manual-axes
    # type matches the body's flag under shard_map (runtime.spatial calls
    # this per shard; a replicated literal True fails the while_loop carry
    # type check there — same pvary discipline as _hysteresis_sharded)
    init_changed = jnp.any(sp >= 0) | jnp.bool_(True)
    _, sp, _ = lax.while_loop(cond, body, (jnp.int32(0), sp, init_changed))
    return _unpack_rows_u32(sp, r)


def _hysteresis_fixpoint(strong: jnp.ndarray, weak: jnp.ndarray,
                         impl: str, max_iters: int) -> jnp.ndarray:
    """Grow ``strong`` through 8-connected ``weak`` to the reachability
    fixpoint (shared by :func:`canny` and :func:`canny_batch`; the growth
    schedules and their measured tradeoff are documented on ``canny``)."""
    if impl == "bitpack":
        return _hysteresis_bitpacked(strong, weak, max_iters)
    dilate8 = dilate8_bool

    if impl == "hybrid":
        # 2 UNCONDITIONAL line-scan sweeps collapse every long H/V weak
        # run up front (each flood crosses whole runs), then the cheap
        # dilate schedule finishes the diagonal/zigzag residue. Growth is
        # monotone within weak-reachability, so the fixpoint is the SAME
        # from any seed between strong and the closure — bit-identical to
        # both pure schedules (impl-equality test covers it).
        def _scan(s, trav, axis, reverse):
            n = s.shape[axis]
            sign = 1 if reverse else -1
            f, t = trav, s
            d = 1
            while d < n:
                f_prev = _shift1d(f, sign * d, axis, True)
                t_prev = _shift1d(t, sign * d, axis, False)
                t = t | (t_prev & f)
                f = f_prev & f
                d *= 2
            return t & trav
        for _ in range(2):
            trav = weak | strong
            for ax, rev in ((1, False), (1, True), (0, False), (0, True)):
                strong = _scan(strong, trav, ax, rev)
            strong = strong | (weak & dilate8(strong))
        impl = "dilate"

    def cond(state):
        i, s, changed = state
        return changed & (i < max_iters)

    if impl == "linescan":
        # Per-prefix state (f = every pixel traversable, t = fire exits the
        # right edge); combine a(+)b = (a.f & b.f, b.t | (a.t & b.f)) — the
        # composition of monotone boolean affine maps, hence associative.
        #
        # Evaluated by MANUAL Hillis-Steele doubling (shift-by-2^k with
        # identity fill, log2(n) levels of pure elementwise logic) rather
        # than lax.associative_scan: XLA lowers associative_scan via an
        # odd/even recursion that MATERIALIZES every level (and transposes
        # for axis 0) — measured 11-56x slower than even the dilate
        # schedule on real TPU (r4 battery). The doubling form is shifts +
        # fused boolean ops, the exact shape XLA compiles well; identical
        # scan results (same monoid, same inclusive-scan semantics).
        def _line_scan(s, trav, axis, reverse):
            n = s.shape[axis]
            sign = 1 if reverse else -1   # gather from x-d (fwd) / x+d (bwd)
            f, t = trav, s
            d = 1
            while d < n:
                f_prev = _shift1d(f, sign * d, axis, True)
                t_prev = _shift1d(t, sign * d, axis, False)
                t = t | (t_prev & f)
                f = f_prev & f
                d *= 2
            return t & trav

        def _sweep(s, trav):
            s = _line_scan(s, trav, 1, False)
            s = _line_scan(s, trav, 1, True)
            s = _line_scan(s, trav, 0, False)
            s = _line_scan(s, trav, 0, True)
            return s

        def body(state):
            i, s, _ = state
            trav = weak | s
            new = _sweep(s, trav)
            new = new | (weak & dilate8(new))
            new = _sweep(new, weak | new)
            return i + 1, new, jnp.any(new != s)
    else:
        # 8 masked growth steps per convergence check: the full-array
        # `any(new != s)` reduction per single-step iteration dominated the
        # loop on long weak-edge chains; extra steps past convergence are
        # no-ops (grow is monotone with fixpoint weak-reachability).
        def body(state):
            i, s, _ = state
            new = s
            for _ in range(8):
                new = new | (weak & dilate8(new))
            return i + 1, new, jnp.any(new != s)

    # data-derived True init flag: see _hysteresis_bitpacked's pvary note
    init_changed = jnp.any(strong | weak) | jnp.bool_(True)
    _, strong, _ = lax.while_loop(cond, body,
                                  (jnp.int32(0), strong, init_changed))
    return strong


def canny(gray: jnp.ndarray, low: float, high: float,
          l2_gradient: bool = False, max_hysteresis_iters: int | None = None,
          impl: str = "auto") -> jnp.ndarray:
    """cv2.Canny on uint8 gray, aperture 3 (all reference call sites).

    Exact algorithm: Sobel3 (replicate border) -> L1 (default) or L2
    magnitude -> OpenCV's integer sector NMS -> double threshold ->
    hysteresis to the weak-reachability fixpoint. Returns uint8 0/255.

    ``impl`` selects the hysteresis growth schedule (all converge to the
    identical fixpoint — growth is monotone within weak-reachability):
      - "bitpack":  32 plane rows packed into uint32 lane words; each
        growth step is ~12 bitwise ops on a 32x-smaller array
        (_hysteresis_bitpacked). DEFAULT on accelerators.
      - "dilate":   8 masked 3x3 dilations per convergence check. Cheap
        per step but needs one step per chain pixel (landscape images run
        200+ checks x 8 steps). DEFAULT on CPU.
      - "linescan": flood through ENTIRE horizontal/vertical 4-connected
        weak runs per pass via doubling scans, plus one masked dilation
        for diagonal hops. Converges in 5-21 checks on the same images
        (10-45x fewer) — but each check costs far more than the count
        advantage recovers.

    "auto", measured on BOTH backends (r4 battery + bitpack session,
    real v5e):
      - TPU: bitpack 0.05 ms vs dilate 2.62 vs hybrid 2.23 on the
        12x256x256 stacked cue batch; 1.28 vs 7.17 ms on the A4x8 page
        batch. linescan loses everywhere on TPU (149.7 ms on the cue
        batch — full-plane log-step scans + per-check transposes dwarf
        the iteration-count advantage; the round-3 CPU-iteration-count
        extrapolation was wrong on hardware).
      - XLA:CPU: dilate 114 ms vs bitpack 196 ms on the cue batch (CPU
        lowers the shift/carry chains poorly) and 8-20x faster than
        linescan — "auto" = dilate there.
    Every schedule remains forceable for targeted measurement.
    """
    if impl == "auto":
        impl = "dilate" if jax.default_backend() == "cpu" else "bitpack"
    if impl not in ("dilate", "linescan", "hybrid", "bitpack"):
        raise ValueError(
            f"impl must be auto|dilate|linescan|hybrid|bitpack, got {impl!r}")
    strong, weak = canny_pre(gray, low, high, l2_gradient)

    h, w = gray.shape
    max_iters = max_hysteresis_iters or (h + w)
    strong = _hysteresis_fixpoint(strong, weak, impl, max_iters)
    return jnp.where(strong, jnp.uint8(255), jnp.uint8(0))


def canny_batch(grays: jnp.ndarray, low: float, high: float,
                l2_gradient: bool = False,
                max_hysteresis_iters: int | None = None,
                impl: str = "auto") -> jnp.ndarray:
    """:func:`canny` over a same-shape batch (B, H, W) — BIT-IDENTICAL to
    per-image canny, as ONE stacked-plane program instead of a vmapped one.

    vmap of ``canny`` pays per-iteration batching overhead in the
    hysteresis ``while_loop`` (masked selects over the whole batch per
    convergence check) and runs every scan/dilate with an extra batch
    dim. Here the batch is stacked into a single (B*(H+2), W) plane —
    each image bordered by its own REFLECT_101 row so the Sobel stencil
    is exact at image edges, with guard rows masked out of the NMS via
    ``canny_pre``'s row_valid (guards carry magnitude 0, matching the
    per-image out-of-range fill) — and the hysteresis fixpoint runs once
    on the plane. Guard rows are never weak, so growth cannot cross
    image boundaries; the joint fixpoint therefore equals each image's
    own fixpoint, reached in max-over-batch iterations (exactly what the
    vmapped while_loop pays). The classifier's batched cue program is
    the motivating caller (round-3 VERDICT Next #4: the 12-image cue
    sweep's canny block).
    """
    b, h, w = grays.shape
    assert h >= 2, "canny_batch needs H >= 2 (REFLECT_101 guard rows)"
    if impl == "auto":
        # backend-dispatched measured winner (see canny)
        impl = "dilate" if jax.default_backend() == "cpu" else "bitpack"
    if impl not in ("dilate", "linescan", "hybrid", "bitpack"):
        raise ValueError(
            f"impl must be auto|dilate|linescan|hybrid|bitpack, got {impl!r}")
    g = jnp.concatenate([grays[:, 1:2], grays, grays[:, h - 2:h - 1]],
                        axis=1)                       # (B, H+2, W)
    plane = g.reshape(b * (h + 2), w)
    valid = np.tile(np.concatenate([[False], np.ones(h, bool), [False]]), b)
    strong, weak = canny_pre(plane, low, high, l2_gradient,
                             row_valid=jnp.asarray(valid))
    max_iters = max_hysteresis_iters or (h + w)
    strong = _hysteresis_fixpoint(strong, weak, impl, max_iters)
    out = jnp.where(strong, jnp.uint8(255), jnp.uint8(0))
    return out.reshape(b, h + 2, w)[:, 1:h + 1]
