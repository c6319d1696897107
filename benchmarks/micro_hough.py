"""Micro-benchmark of the docscan deskew Hough block on the current device:
legacy top_k compaction vs the packed-sort compaction (the production path),
and the Pallas vote kernel variants (mxu dtype, rho clip, chunk rows).

All timings use in-jit chained reps (data dependency threaded through each
iteration) so the ~30 ms tunnel RTT cancels exactly.

Usage: python benchmarks/micro_hough.py [batch]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPS = 10


def main():
    from tpuimage.pipelines import docscan
    from tpuimage.ops.edges import canny
    from tpuimage.ops.hough import (band_compact_coords, hough_accumulator,
                                    hough_fold_median_angle)
    from tpuimage.ops.pallas_kernels import (hough_votes_pallas,
                                             _HOUGH_BANDS, _HOUGH_ROWS)
    from PIL import Image

    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200), Image.BILINEAR),
                          dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    batch = jnp.asarray(np.broadcast_to(page, (BATCH,) + page.shape).copy())
    weighted = jax.jit(lambda b: docscan.docscan_post_warp_batch(b, cfg)["weighted"])(batch)
    edges = jax.jit(jax.vmap(lambda g: canny(g, cfg.canny_low, cfg.canny_high)))(weighted)
    edges = jnp.asarray(np.asarray(edges))  # materialize
    h, w = int(edges.shape[1]), int(edges.shape[2])
    n = h * w
    print("edge density:", round(float(np.asarray(edges[0] > 0).mean()), 4))

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0])
    int(np.asarray(triv(edges)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(edges)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.2f} ms")

    def chained(op, inp):
        @jax.jit
        def f(b):
            def body(i, carry):
                b_, acc = carry
                tok = op(b_)
                return b_.at[0, 0, 0].set((tok % 251).astype(b_.dtype)), acc + tok
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
        int(np.asarray(f(inp)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(inp)))
            best = min(best, time.perf_counter() - t0)
        return (best - rtt) / REPS

    numrho = int(round((w + h) * 2 + 1))
    k = min(max(131072, (n * 3) // 16), 524288)

    # --- legacy co-sorting top_k compaction ---
    n_over_b = -(-n // _HOUGH_BANDS)
    kk = min(max(1, k // _HOUGH_BANDS), n_over_b)

    def compact_topk(eb):
        def one(e):
            flat = e.reshape(-1).astype(jnp.int32)
            m = jnp.pad(flat, (0, n_over_b * _HOUGH_BANDS - n)
                        ).reshape(n_over_b, _HOUGH_BANDS).T
            vals, ci = lax.top_k(m, kk)
            return jnp.sum((vals > 0).astype(jnp.int32), axis=1)
        return jax.vmap(one)(eb).sum()

    dt = chained(compact_topk, edges)
    print(f"compact_topk(legacy)  {dt*1e3:7.2f} ms")

    # --- production packed-sort compaction ---
    def compact_sort(eb):
        def one(e):
            _, _, counts = band_compact_coords(e, k)
            return counts
        return jax.vmap(one)(eb).sum()

    dt = chained(compact_sort, edges)
    print(f"compact_sort(prod)    {dt*1e3:7.2f} ms")

    # --- vote kernel variants over fixed compacted inputs ---
    xs_t, ys_t, counts = jax.jit(jax.vmap(lambda e: band_compact_coords(e, k)))(edges)
    xs_t = jnp.asarray(np.asarray(xs_t))
    ys_t = jnp.asarray(np.asarray(ys_t))
    counts = jnp.asarray(np.asarray(counts))

    c_mid = (numrho - 1) // 2
    rho_base = max(c_mid - (w - 1) - 1, 0)
    rho_hi = min(c_mid + int(np.ceil(np.hypot(w - 1, h - 1))) + 1, numrho - 1)

    def theta_wins_for(lo_b=64, theta_bins=180):
        # the ONE implementation lives in ops.hough (review finding)
        from tpuimage.ops.hough import theta_windows
        return theta_windows(h, w, (numrho - 1) // 2, rho_base,
                             rho_hi - rho_base + 1, lo_b, theta_bins)

    def chained_vote(mxu, clip, rows, wins=False):
        kw = dict(rho_base=rho_base, rho_bins=rho_hi - rho_base + 1) if clip else {}
        if wins:
            tw, span = theta_wins_for()
            kw.update(theta_wins=tw, win_hi=span)

        @jax.jit
        def f(xs):
            def body(i, carry):
                xs_, acc = carry
                v = jax.vmap(lambda a, b, c: hough_votes_pallas(
                    a, b, c, numrho, mxu=mxu, rows=rows, **kw))(xs_, ys_t, counts)
                tok = v.sum()
                # all-batch perturbation (CLAUDE.md pitfall 2: touching only
                # element 0 lets XLA hoist the other elements' voting work)
                return (xs_.at[:, 0, 0].set(xs_[:, 0, 0] + 0.0 * tok),
                        acc + tok)
            return lax.fori_loop(0, REPS, body, (xs, jnp.int32(0)))[1]
        s = int(np.asarray(f(xs_t)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(f(xs_t)))
            best = min(best, time.perf_counter() - t0)
        return (best - rtt) / REPS, s // REPS

    ref = None
    for name, mxu, clip, rows, wins in (
            ("bf16_clip1_rows64", "bf16", True, 64, False),
            ("bf16_wins_rows64", "bf16", True, 64, True),
            ("bf16_wins_rows128", "bf16", True, 128, True),
            ("bf16_clip0_rows64", "bf16", False, 64, False)):
        dt, s = chained_vote(mxu, clip, rows, wins)
        if ref is None:
            ref = s
        assert s == ref, (name, s, ref)
        print(f"vote_{name:22s}  {dt*1e3:7.2f} ms")

    # --- full deskew statistic ---
    def fold(eb):
        a = jax.vmap(lambda e: hough_fold_median_angle(e, threshold=150))(eb)
        return a.astype(jnp.int32).sum()

    dt = chained(fold, edges)
    print(f"fold_median(total)    {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
