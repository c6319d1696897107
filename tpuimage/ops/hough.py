"""Hough line transform as a dense TPU-friendly accumulator.

Replaces cv2.HoughLines (DocScanner.py:219 deskew, threshold 150) and
cv2.HoughLinesP (DocScanner.py:81 localize, classification.py:72 document
cue). HoughLinesP is probabilistic (random sampling, order-dependent) —
TPU-hostile and irreproducible; per SURVEY.md §7 hard part 2 we substitute
a deterministic variant: peaks of the standard accumulator, emitted as full
image-clipped segments. Its only uses in the reference are (a) counting
lines for a document score and (b) re-drawing lines over the edge map to
close contour gaps — both served by the deterministic form.

Design (TPU-native, MXU-formulated): OpenCV's per-pixel scatter into
(rho, theta) bins is pathological on TPU (measured 1.6 s/megapixel-image —
scatter serializes). Instead:

1. compact the sparse edge set to a static-size coordinate list with
   ``top_k`` (edge maps here are 2-13%% dense);
2. per theta, decompose the rho index as ``r = hi*64 + lo`` and compute
   the 2-D histogram as a matmul of the two one-hot factors:
   ``votes[hi, lo] = onehot_hi^T @ onehot_lo`` — bf16 0/1 inputs with f32
   accumulation on the MXU give EXACT integer counts (< 2^24);
3. scan over the 180 theta bins.

~98 GMACs total for 131072 edges — milliseconds on the MXU vs seconds of
scatter, with vote counts identical to the scatter formulation for edge
sets within the compaction budget.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpuimage.core.dtypes import f32


_LO_BINS = 64


_GROUP = 128         # columns per local-sort group in the two-stage path
_GROUP_CAP = 64      # group-front slots carried into the merge sort


def band_compact_coords(edges: jnp.ndarray, max_edges: int,
                        with_overflow: bool = False, impl: str = "auto",
                        group: int = _GROUP, cap: int = _GROUP_CAP):
    """Banded edge compaction for the Pallas vote kernel: band b holds the
    edges with flat_idx % 128 == b, packed to the front.

    with_overflow=True appends a scalar bool: True when edges were dropped
    (votes would silently be missing them) — the runtime guard of round-2
    VERDICT item 6.

    Two implementations (identical outputs within budget; tests cross-check):

    - ``flat``: one sort of packed int16 keys ``(edge << bits) | (N-1-idx)``
      over the full (128, N) band matrix — ascending sort puts edges at the
      tail with in-band index ascending. ~5x faster than the earlier
      values+indices co-sorting ``top_k`` (half the bytes, no payload), but
      the bitonic network still moves bytes × ~k(k+1)/2 passes: 3.0 ms of
      the batch-8 A4 fused program (micro_compact.py) — nearly all of it
      the sort itself.
    - ``twostage`` (default on TPU for large N): (1) int8 local sorts
      within 128-column groups — key ``(edge << 7) | (127 - local_idx)``,
      sort width 128 → 28 bitonic passes on HALF the bytes (vs 91 full-
      width int16 passes); (2) keep each group's first _GROUP_CAP slots
      (real Canny densities are 2-13%, so ~6-16 edges per 128-slot group;
      cap 64 = 50% local density — binomial tails at the measured 2-13% Canny
      densities never reach it) and merge-sort the (128, groups*cap)
      int16 global keys — a ~4x narrower sort. Groups denser than the cap
      drop their largest-local-index edges and raise the overflow flag
      (the per-band budget check still applies on top).

    Over-budget bands drop their largest-index edges, matching the old
    top_k tie order.

    ``group``/``cap`` tune the two-stage path's local-sort width and the
    group-front slots carried into the merge (the merge sort's width is
    ``n_groups * cap``, so a smaller cap directly shrinks the stage-2
    bitonic network — at the cost of a lower per-group density ceiling
    before edges drop with the overflow flag). Defaults are the measured
    production values; both must satisfy ``1 <= cap <= group <= 128``
    (the int8 local key holds bit 7 = edge flag | 7-bit local index).

    Returns (xs_t, ys_t, counts): (kb, 128) float32 transposed coordinate
    planes (invalid slots poisoned — see hough_votes_pallas) and per-band
    edge counts. Coordinates are precomputed here so the vote kernel's
    per-(theta, trip) body avoids the div/mod and count-mask compare.
    """
    from tpuimage.ops.pallas_kernels import (HOUGH_POISON_X, HOUGH_POISON_Y,
                                             _HOUGH_BANDS, _HOUGH_ROWS)
    h, w = edges.shape
    n = h * w
    n_over_b = -(-n // _HOUGH_BANDS)
    kk = min(max(1, max_edges // _HOUGH_BANDS), n_over_b)  # per-band budget
    kb = kk + (-kk) % _HOUGH_ROWS                          # row-chunk pad
    n_bits = max((n_over_b - 1).bit_length(), 1)
    if not (1 <= cap <= group <= 128) or group & (group - 1):
        # power-of-two group keeps the stage-2 grev bound proof below:
        # round_up(n_over_b, group) <= 2^n_bits needs group | 2^n_bits
        raise ValueError(f"need 1 <= cap <= group <= 128 with group a "
                         f"power of two (got group={group}, cap={cap})")
    if impl == "auto":
        # two-stage pays off when the merge width shrinks the sort a lot
        # AND the int16 key fits (flag + 13-bit index); tiny images keep
        # the flat path (local-sort padding would dominate)
        n_groups = -(-n_over_b // group)
        impl = ("twostage"
                if (n_bits + 1 <= 15 and n_over_b >= 4 * group
                    and n_groups * cap < n_over_b)
                else "flat")
    if impl == "twostage" and (n_bits + 1 > 15 or n_over_b < group):
        # forced paths must raise, not silently corrupt (filters.py rule):
        # n_bits+1 > 15 overflows the int16 merge key's valid flag into the
        # sign bit; n_over_b < one group makes grev exceed 2^n_bits and
        # clobber the flag bit
        raise ValueError(
            f"impl='twostage' needs n_bits + 1 <= 15 and at least one full "
            f"{group}-column group (got n_bits={n_bits}, "
            f"n_over_b={n_over_b}); use impl='flat' or 'rank'")
    e = (edges.reshape(-1) > 0)

    if impl == "rank":
        # sort-free: exclusive per-band rank (cumsum) + Pallas masked-sum
        # extraction (rank_extract_pallas). Identical outputs/overflow
        # semantics to "flat" (lowest-index edges kept); tests cross-check.
        from tpuimage.ops.pallas_kernels import (rank_extract_pallas,
                                                 _RANK_PSLAB)
        n_pad = n_over_b + (-n_over_b) % _RANK_PSLAB
        plane = jnp.pad(e, (0, n_pad * _HOUGH_BANDS - n)
                        ).reshape(n_pad, _HOUGH_BANDS)     # position-major
        pi = plane.astype(jnp.int32)
        csum = jnp.cumsum(pi, axis=0)
        rank = csum - pi                                   # exclusive
        counts_true = csum[-1]                             # (128,)
        counts = jnp.minimum(counts_true, kk)
        overflow = jnp.any(counts_true > kk)
        on_tpu = jax.default_backend() not in ("cpu",)
        ci_t = rank_extract_pallas(rank, plane, kk,
                                   interpret=not on_tpu)   # (kk, 128)
        band_t = jnp.arange(_HOUGH_BANDS, dtype=jnp.int32)[None, :]
        gi_t = ci_t * _HOUGH_BANDS + band_t
        ok_t = (jnp.arange(kk, dtype=jnp.int32)[:, None] < counts[None, :])
        from tpuimage.ops.pallas_kernels import (HOUGH_POISON_X,
                                                 HOUGH_POISON_Y)
        xs_t = jnp.where(ok_t, (gi_t % w).astype(jnp.float32),
                         HOUGH_POISON_X)
        ys_t = jnp.where(ok_t, (gi_t // w).astype(jnp.float32),
                         HOUGH_POISON_Y)
        if kb > kk:
            xs_t = jnp.pad(xs_t, ((0, kb - kk), (0, 0)),
                           constant_values=HOUGH_POISON_X)
            ys_t = jnp.pad(ys_t, ((0, kb - kk), (0, 0)),
                           constant_values=HOUGH_POISON_Y)
        if with_overflow:
            return xs_t, ys_t, counts, overflow
        return xs_t, ys_t, counts

    m = jnp.pad(e, (0, n_over_b * _HOUGH_BANDS - n)
                ).reshape(n_over_b, _HOUGH_BANDS).T        # (128, N) bool

    if impl == "twostage":
        n_groups = -(-n_over_b // group)
        npad = n_groups * group - n_over_b
        mg = jnp.pad(m, ((0, 0), (0, npad))).reshape(
            _HOUGH_BANDS, n_groups, group)
        # stage 1: int8 local sort. The edge flag in bit 7 makes edge keys
        # NEGATIVE (int8), so ascending sort puts edges at the group FRONT,
        # ordered by ascending local index (key = 0x80 | lci). The sort
        # MUST run on a 2-D operand: the same keys shaped (B, G, 128) sort
        # 18x slower on TPU (0.99 vs 17.9 ms at batch 8 — XLA's sort
        # lowering degrades with extra batch dims).
        lidx = jnp.arange(group, dtype=jnp.int32).astype(jnp.int8)
        lkey = jnp.where(mg, jnp.int8(-128) | lidx, lidx)
        ls = lax.sort(lkey.reshape(_HOUGH_BANDS * n_groups, group),
                      dimension=1, is_stable=False)
        front = ls.reshape(_HOUGH_BANDS, n_groups,
                           group)[:, :, :cap]               # (B, G, CAP)
        lvalid = (front < 0).astype(jnp.int32)
        lci = front.astype(jnp.int32) & 127                 # local idx
        # stage 2: int16 merge over the group fronts with global keys.
        # max grev = round_up(n_over_b, group) - 1 <= 2^n_bits - 1 because
        # 2^n_bits >= n_over_b and is divisible by group (a power of two
        # <= 128 <= 2^n_bits here given n_over_b >= group).
        gbase = (jnp.arange(n_groups, dtype=jnp.int32) * group)[None, :, None]
        gci = gbase + lci                                   # global in-band idx
        grev = (n_groups * group - 1) - gci
        gkey = ((lvalid << n_bits) | grev).astype(jnp.int16)
        gs = lax.sort(gkey.reshape(_HOUGH_BANDS, n_groups * cap),
                      dimension=1, is_stable=False)
        kk2 = min(kk, n_groups * cap)
        top = gs[:, gs.shape[1] - kk2:][:, ::-1].astype(jnp.int32)
        validb = (top >> n_bits) & 1
        counts = validb.sum(axis=1)
        flag_mask = (1 << n_bits) - 1
        ci = (n_groups * group - 1) - (top & flag_mask)
        if kk2 < kk:
            pad_cols = kk - kk2
            validb = jnp.pad(validb, ((0, 0), (0, pad_cols)))
            ci = jnp.pad(ci, ((0, 0), (0, pad_cols)))
        # overflow: any group denser than the cap, or any band over budget
        gcounts = mg.astype(jnp.int32).sum(axis=2)          # (B, G)
        true_counts = gcounts.sum(axis=1)
        overflow = (jnp.any(gcounts > cap)
                    | jnp.any(true_counts > kk))
    else:
        flag_mask = (1 << n_bits) - 1
        # 16-bit keys when flag+index fit 15 bits (images up to ~2 MP with
        # 128 bands): halves the bytes through the bitonic sort network —
        # measured ~2x on the A4-page compaction vs int32 keys
        key_dtype = jnp.int16 if n_bits + 1 <= 15 else jnp.int32
        rev = ((n_over_b - 1) - jnp.arange(n_over_b, dtype=jnp.int32)[None, :]
               ).astype(key_dtype)
        key = (m.astype(key_dtype) << n_bits) | rev
        s = lax.sort(key, dimension=1, is_stable=False)
        top = s[:, n_over_b - kk:][:, ::-1].astype(jnp.int32)  # (128, kk)
        validb = top >> n_bits                                 # 0/1
        counts = validb.sum(axis=1)
        ci = (n_over_b - 1) - (top & flag_mask)                # in-band index
        true_counts = m.astype(jnp.int32).sum(axis=1)
        overflow = jnp.any(true_counts > kk)

    band = jnp.arange(_HOUGH_BANDS, dtype=jnp.int32)[:, None]
    gi = ci * _HOUGH_BANDS + band                          # flat image index
    ok = validb > 0
    xs = jnp.where(ok, (gi % w).astype(jnp.float32), HOUGH_POISON_X)
    ys = jnp.where(ok, (gi // w).astype(jnp.float32), HOUGH_POISON_Y)
    xs_t, ys_t = xs.T, ys.T                                # (kk, 128)
    if kb > xs_t.shape[0]:
        padn = kb - xs_t.shape[0]
        xs_t = jnp.pad(xs_t, ((0, padn), (0, 0)),
                       constant_values=HOUGH_POISON_X)
        ys_t = jnp.pad(ys_t, ((0, padn), (0, 0)),
                       constant_values=HOUGH_POISON_Y)
    if with_overflow:
        return xs_t, ys_t, counts, overflow
    return xs_t, ys_t, counts


def theta_windows(h: int, w: int, c_mid: int, rho_base: int, rho_bins: int,
                  lo_bins: int, theta_bins: int = 180):
    """PER-THETA rho windows for the vote kernel: any single theta reaches
    only [(w-1)*min(cos,0), (w-1)*max(cos,0) + (h-1)*sin] (~hypot bins at
    the diagonal) — ~1.5x narrower than the all-theta union the static
    clip pays. The kernel votes into per-theta re-based windows and
    shifts them back exactly (pallas_kernels.unpack).

    Returns (win0, span): win0[t] is theta t's lo_bins-aligned hi-block
    offset within the clipped [rho_base, rho_base+rho_bins) space (tuple
    of ints, jit-static), span the static block count. The ONE
    implementation of this math — benchmarks and tests must call it, not
    re-derive it (round-3 review finding)."""
    th_np = np.arange(theta_bins) * (np.pi / theta_bins)
    ct_np, st_np = np.cos(th_np), np.sin(th_np)
    rmin = (w - 1) * np.minimum(ct_np, 0.0)
    rmax = (w - 1) * np.maximum(ct_np, 0.0) + (h - 1) * st_np
    gmin = np.clip(np.floor(rmin) - 1 + c_mid - rho_base, 0,
                   rho_bins - 1).astype(np.int64)
    gmax = np.clip(np.ceil(rmax) + 1 + c_mid - rho_base, 0,
                   rho_bins - 1).astype(np.int64)
    win0 = gmin // lo_bins
    span = int((gmax // lo_bins + 1 - win0).max())
    gb = (rho_bins + lo_bins - 1) // lo_bins
    win0 = np.minimum(win0, gb - span)
    return tuple(int(v) for v in win0), span


@functools.partial(jax.jit, static_argnames=("rho", "theta_bins", "max_edges",
                                              "impl", "return_overflow",
                                              "theta_pack", "unroll",
                                              "vote_lo", "schedule"))
def hough_accumulator(edges: jnp.ndarray, rho: float = 1.0,
                      theta_bins: int = 180,
                      max_edges: int = 0, impl: str = "auto",
                      return_overflow: bool = False,
                      theta_pack: int = 1, unroll: int = 0,
                      vote_lo: int = 0, schedule: str = "auto"):
    """(numrho, numtheta) vote accumulator, same binning as cv2.HoughLines
    with theta = pi/theta_bins: r = round((x cos t + y sin t)/rho) + (nr-1)/2.

    The edge set is compacted to a static-size list before voting. The
    default budget scales with the image (18.75%% of pixels, floor 128k,
    cap 512k) — well above real Canny densities (2-13%% measured); denser
    inputs drop their HIGHEST-index pixels (bottom rows — band_compact_coords
    keeps each band's lowest-index edges), so pass an explicit ``max_edges``
    for those. ``return_overflow=True`` appends a traced bool that is True
    exactly when edges were dropped: votes are then undercounts, so callers
    should widen ``max_edges`` and retry (or fail loudly) instead of
    trusting the result.

    impl: "auto" = Pallas kernel on TPU / XLA one-hot scan elsewhere;
    "xla" / "pallas" force a path (the Pallas kernel runs interpreted off
    TPU; tests assert the two produce identical counts).

    theta_pack / unroll / vote_lo / schedule tune the Pallas vote
    kernel's schedule (thetas packed per MXU tile pass — on BOTH the
    grid and the theta-inner schedule; chunks per fori body; the hi/lo
    radix of the one-hot factorization, vote_lo=32 admits theta_pack=4
    on small images; body ordering — see hough_votes_pallas); identical
    counts on every setting, ignored on the XLA path. Defaults are the
    r5-battery-measured winners (real v5e, A4 batch 8):
    ``schedule="auto"`` resolves to "buildahead" with unroll=4 on the
    rows=128 grid path (4.08-4.35 ms vs 4.40-4.59 for r4's unroll=2 and
    4.77 serial — all U one-hot builds of a body issue before its U
    dots, and even/odd dots land in separate accumulator halves so the
    acc read-modify-write never chains consecutive dots) and "serial"
    elsewhere; ``theta_pack`` stays 1 (pack2 measured 7.0-8.1 ms — the
    kernel is MAC/VPU-bound, not tile-pass-bound, so packing only adds
    one-hot width). Losing r5 experiments, for the record: balanced
    radix lo=40/32 (6.45-6.83 ms — non-pow2 tiles cost more than the
    narrower one-hot saves), int8 MXU (6.23 — v5e Mosaic doesn't reach
    the 2x int8 rate on this shape), and bf16 iota compares (the v5e
    VPU has NO bf16 vector compare: Mosaic fails with "Target does not
    support this comparison", so cmp_bf16 stays an option for future
    targets only). Hardware parity: battery votex section +
    /tmp/r5_hw/votex_bf16.log (buildahead u4 == prod counts, True).
    """
    h, w = edges.shape
    numrho = int(round(((w + h) * 2 + 1) / rho))
    n_hi = (numrho + _LO_BINS - 1) // _LO_BINS + 1  # +1 spare for invalid bin
    if max_edges <= 0:
        max_edges = min(max(131072, (h * w * 3) // 16), 524288)
    k = min(max_edges, h * w)

    on_tpu = jax.default_backend() not in ("cpu",)
    if impl == "auto":
        impl = "pallas" if on_tpu else "xla"
    if impl == "pallas" and rho == 1.0:
        from tpuimage.ops.pallas_kernels import (hough_votes_pallas,
                                                 _HOUGH_LO)
        xs_t, ys_t, counts, overflow = band_compact_coords(
            edges, k, with_overflow=True)
        # statically reachable rho bins: x*cos(t) + y*sin(t) over the image
        # rectangle and t in [0, pi) lies in [-(w-1), hypot(w-1, h-1)]
        c_mid = (numrho - 1) // 2
        rho_base = max(c_mid - (w - 1) - 1, 0)
        rho_hi = min(c_mid + int(np.ceil(np.hypot(w - 1, h - 1))) + 1, numrho - 1)
        rho_bins = rho_hi - rho_base + 1
        lo = vote_lo if vote_lo > 0 else _HOUGH_LO
        win0, span = theta_windows(h, w, c_mid, rho_base, rho_bins,
                                   lo, theta_bins)
        # rows=128 measured fastest with windows for A4 pages (micro_hough:
        # 6.0 ms static clip/rows64 -> 4.3 ms wins/rows128 at batch 8). On
        # the theta-inner path (small cue images, kk <= 384 = the
        # classifier cue budget on 256x256 inputs) the chunk is mostly
        # padding: real band counts are ~8-30, so rows=32 quarters the
        # per-theta one-hot compare work (the VPU cost that dominates tiny
        # images) while the dynamic trip count stays 1. Keep this
        # threshold == pallas_kernels._THETA_INNER_MAX_KB.
        kk_est = min(max(1, k // 128), -(-(h * w) // 128))
        rows = 128 if kk_est > 384 else 32
        if theta_pack > 1 and (theta_pack * (span + 1) > 128
                               or theta_pack * lo > 128
                               or theta_bins % theta_pack):
            theta_pack = 1  # page too tall for packed hi/lo rows: fall back
        if schedule == "auto":
            # measured winner (r5 battery) — see docstring. buildahead
            # exists on the grid path only (rows == 128 here implies the
            # grid schedule: kk_est > _THETA_INNER_MAX_KB).
            schedule = ("buildahead"
                        if (rows == 128 and theta_pack == 1 and unroll == 0)
                        else "serial")
        if unroll == 0:
            if schedule != "serial":
                unroll = 4       # r5 winner: buildahead u4
            else:
                # r4 winner on the serial schedule
                unroll = 2 if (rows == 128 and theta_pack == 1) else 1
        if theta_pack > 1 and rows != 128:
            unroll = 1  # the inner-pack kernel is serial-only
        acc = hough_votes_pallas(xs_t, ys_t, counts, numrho, theta_bins,
                                 interpret=not on_tpu, rho_base=rho_base,
                                 rho_bins=rho_bins, rows=rows,
                                 lo_bins=lo, theta_wins=win0,
                                 win_hi=span, theta_pack=theta_pack,
                                 unroll=unroll, schedule=schedule)
        return (acc, overflow) if return_overflow else acc

    thetas = np.arange(theta_bins) * (np.pi / theta_bins)
    cos_t = jnp.asarray(np.cos(thetas) / rho, dtype=jnp.float32)
    sin_t = jnp.asarray(np.sin(thetas) / rho, dtype=jnp.float32)

    # --- compact the edge set to k (x, y) coordinates ---
    flat = edges.reshape(-1).astype(jnp.int32)
    vals, idx = lax.top_k(flat, k)
    valid = vals > 0
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)

    hi_iota = jnp.arange(n_hi, dtype=jnp.int32)
    lo_iota = jnp.arange(_LO_BINS, dtype=jnp.int32)
    invalid_bin = n_hi * _LO_BINS - 1  # lands in the spare hi row

    def one_theta(carry, ct_st):
        ct, st = ct_st
        r = jnp.round(xs * ct + ys * st).astype(jnp.int32) + (numrho - 1) // 2
        r = jnp.where(valid, r, invalid_bin)
        hi = r // _LO_BINS
        lo = r % _LO_BINS
        # exact integer counts via bf16 0/1 matmul with f32 accumulation
        oh_hi = (hi[:, None] == hi_iota[None, :]).astype(jnp.bfloat16)
        oh_lo = (lo[:, None] == lo_iota[None, :]).astype(jnp.bfloat16)
        votes2d = jnp.matmul(oh_hi.T, oh_lo,
                             preferred_element_type=jnp.float32)
        return carry, votes2d.reshape(-1)[:numrho].astype(jnp.int32)

    _, acc = lax.scan(one_theta, None, (cos_t, sin_t))
    acc = acc.T  # (numrho, theta_bins)
    if return_overflow:
        return acc, jnp.sum(flat > 0) > k
    return acc


def _is_peak(acc: jnp.ndarray, threshold: int) -> jnp.ndarray:
    """cv2 findLocalMaximums: votes > threshold, strict vs rho-1/theta-1,
    >= vs rho+1/theta+1."""
    a = jnp.pad(acc, 1, mode="constant")
    c = a[1:-1, 1:-1]
    return ((c > a[:-2, 1:-1]) & (c >= a[2:, 1:-1]) &
            (c > a[1:-1, :-2]) & (c >= a[1:-1, 2:]) &
            (c > threshold))


def hough_fold_median_angle(edges: jnp.ndarray, threshold: int,
                            rho: float = 1.0, theta_bins: int = 180,
                            return_overflow: bool = False,
                            max_edges: int = 0):
    """Median of fold-to-[-90, 90) line angles (degrees) over ALL Hough
    peaks above threshold — the DocScanner deskew statistic
    (DocScanner.py:219-228: np.median over every returned line's angle).

    The angle of a (rho, theta) line is independent of rho, so the median
    only needs per-theta PEAK COUNTS: a weighted median over 180 bins
    (static fold ordering + cumsum) replaces the top-k peak extraction +
    512-line sort the generic hough_lines path used — cheaper on TPU AND
    exact for any number of lines (cv2 returns all peaks, uncapped).
    Returns 0.0 when no line clears the threshold (reference behavior:
    lines is None -> angle 0, DocScanner.py:221-224).
    ``return_overflow=True`` appends the edge-budget overflow bool from
    hough_accumulator (True = votes undercounted, angle untrustworthy).
    """
    acc, overflow = hough_accumulator(edges, rho=rho, theta_bins=theta_bins,
                                      max_edges=max_edges,
                                      return_overflow=True)
    angle = fold_median_from_acc(acc, threshold, theta_bins)
    return (angle, overflow) if return_overflow else angle


def fold_median_from_acc(acc: jnp.ndarray, threshold: int,
                         theta_bins: int = 180) -> jnp.ndarray:
    """The fold-median statistic of hough_fold_median_angle from an
    already-built accumulator — shared with the spatially-sharded deskew
    (runtime.spatial builds ``acc`` as a psum of per-shard votes)."""
    counts = jnp.sum(_is_peak(acc, threshold).astype(jnp.int32), axis=0)

    theta_deg = np.arange(theta_bins) * (180.0 / theta_bins)
    fold = np.mod(theta_deg + 90.0, 180.0) - 90.0
    order = np.argsort(fold, kind="stable")          # static permutation
    fold_sorted = jnp.asarray(fold[order], jnp.float32)
    c = jnp.cumsum(counts[order])
    n = c[-1]

    def value_at_rank(q):  # 0-indexed rank -> fold value
        return fold_sorted[jnp.argmax(c > q)]

    med = 0.5 * (value_at_rank((n - 1) // 2) + value_at_rank(n // 2))
    return jnp.where(n > 0, med, 0.0)


def hough_line_count(edges: jnp.ndarray, threshold: int, rho: float = 1.0,
                     theta_bins: int = 180, max_lines: int = 64,
                     max_edges: int = 0, return_overflow: bool = False,
                     theta_pack: int = 1, unroll: int = 0,
                     vote_lo: int = 0):
    """min(number of Hough peaks above threshold, max_lines) — identical to
    ``hough_lines(...)[1].sum()`` (top_k keeps exactly the positive-vote
    peaks) without materializing the top_k extraction, which dominates the
    classifier-cue program on tiny images (the cue only compares the count
    against a threshold, classification.py:72).

    ``return_overflow=True`` appends the edge-budget overflow bool: True
    means the compaction dropped edges and the count is an undercount.
    Callers passing a tight ``max_edges`` should consume it (the round-2
    guard exists so over-budget inputs fail loudly, not silently).
    theta_pack / unroll / vote_lo tune the Pallas vote schedule (counts
    identical on every setting — see hough_accumulator)."""
    acc, overflow = hough_accumulator(edges, rho=rho, theta_bins=theta_bins,
                                      max_edges=max_edges,
                                      return_overflow=True,
                                      theta_pack=theta_pack, unroll=unroll,
                                      vote_lo=vote_lo)
    n = jnp.minimum(jnp.sum(_is_peak(acc, threshold).astype(jnp.int32)),
                    max_lines)
    return (n, overflow) if return_overflow else n


def hough_lines(edges: jnp.ndarray, threshold: int, rho: float = 1.0,
                theta_bins: int = 180, max_lines: int = 64,
                max_edges: int = 0, return_overflow: bool = False):
    """cv2.HoughLines analog: returns (lines (max_lines, 2) [rho, theta],
    valid mask). Peaks = strict local maxima over the 4-neighbourhood in
    (rho, theta) with votes > threshold, ordered by votes (cv2 sorts too).

    max_edges tightens the compaction budget; ``return_overflow=True``
    appends hough_accumulator's edge-budget overflow bool (True = edges
    were dropped and the peaks are computed from undercounted votes).
    Tight-budget callers must either size the budget for their worst legal
    input or consume the flag — dropping it silently miscounts."""
    acc, overflow = hough_accumulator(edges, rho=rho, theta_bins=theta_bins,
                                      max_edges=max_edges,
                                      return_overflow=True)
    numrho = acc.shape[0]
    votes = jnp.where(_is_peak(acc, threshold), acc, 0)
    flat = votes.reshape(-1)
    top_v, top_i = lax.top_k(flat, max_lines)
    r_idx = top_i // theta_bins
    t_idx = top_i % theta_bins
    rhos = (f32(r_idx) - (numrho - 1) // 2) * rho
    thetas = f32(t_idx) * (np.pi / theta_bins)
    lines = jnp.stack([rhos, thetas], axis=-1)
    if return_overflow:
        return lines, top_v > 0, overflow
    return lines, top_v > 0


def hough_lines_p_det(edges: jnp.ndarray, threshold: int,
                      min_line_length: float = 0.0, max_lines: int = 64,
                      rho: float = 1.0, theta_bins: int = 180):
    """Deterministic stand-in for cv2.HoughLinesP (DocScanner.py:81).

    Returns (segments (max_lines, 4) [x1,y1,x2,y2], valid) — each detected
    (rho, theta) peak clipped to the image rectangle. min_line_length prunes
    segments whose clipped span is shorter.
    """
    h, w = edges.shape
    lines, valid = hough_lines(edges, threshold, rho=rho,
                               theta_bins=theta_bins, max_lines=max_lines)
    r = lines[:, 0]
    t = lines[:, 1]
    ct, st = jnp.cos(t), jnp.sin(t)
    # param form: p(s) = (r*ct - s*st, r*st + s*ct); clip s to the box
    big = float(h + w) * 2.0

    def clip_s(px, py, dx, dy):
        # entering/exit params against x in [0,w-1], y in [0,h-1]
        def rng(p0, d, lo, hi):
            s1 = jnp.where(d != 0, (lo - p0) / jnp.where(d != 0, d, 1.0), -big)
            s2 = jnp.where(d != 0, (hi - p0) / jnp.where(d != 0, d, 1.0), big)
            return jnp.minimum(s1, s2), jnp.maximum(s1, s2)

        ax1, ax2 = rng(px, dx, 0.0, w - 1.0)
        ay1, ay2 = rng(py, dy, 0.0, h - 1.0)
        return jnp.maximum(ax1, ay1), jnp.minimum(ax2, ay2)

    px, py = r * ct, r * st
    dx, dy = -st, ct
    s0, s1 = clip_s(px, py, dx, dy)
    x1, y1 = px + s0 * dx, py + s0 * dy
    x2, y2 = px + s1 * dx, py + s1 * dy
    seg_len = jnp.hypot(x2 - x1, y2 - y1)
    ok = valid & (s1 > s0) & (seg_len >= min_line_length)
    segs = jnp.stack([x1, y1, x2, y2], axis=-1)
    return segs, ok
