"""Round-3 measurement battery: every pending hardware question in one
sequential, incrementally-printing run (the worker can crash mid-battery;
each section stands alone).

Sections:
  1. compaction: flat vs twostage vs rank (the sort-free rank extraction)
  2. vote kernel: production grid+wins vs theta_pack=2
  3. canny hysteresis: dilate vs linescan on the classify cue batch
  4. prechain: pre-deskew block, plain ops vs fused Pallas
     blackhat/ink-mask kernels (+ hardware parity)
  4b. morphseq: morph_seq pipeline, plain ops vs the fused Pallas chain
     (gray+erode3 / binary+close3 band kernels), batch 8 on sample.jpg
  5. fused docscan program at batch 8 (current production defaults)
  6. batch scaling 8/16/32 for the fused program
  6b. votescale: the vote kernel ALONE at batch 8/16/32 (attributes any
     batch-32 regression to the kernel vs the XLA stages)
  7. roofline arithmetic for the vote kernel (printed from measured dims)

All timings: in-jit chained reps (data dependency threaded through each
iteration), full-sum tokens, all-batch perturbation — see BASELINE.md
round-2 pitfalls.

Usage: python benchmarks/r3_battery.py [section ...]   (default: all)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BATCH = 8
REPS = 10

_rtt = None


def rtt():
    global _rtt
    if _rtt is None:
        x = jnp.ones((8, 128), jnp.float32)
        triv = jax.jit(lambda b: b.sum())
        float(np.asarray(triv(x)))
        t0 = time.perf_counter()
        for _ in range(5):
            float(np.asarray(triv(x)))
        _rtt = (time.perf_counter() - t0) / 5
        print(f"rtt {_rtt*1e3:.2f} ms", flush=True)
    return _rtt


def chained(op, inp, perturb):
    @jax.jit
    def f(b):
        def body(i, carry):
            b_, acc = carry
            tok = op(b_)
            return perturb(b_, tok), acc + tok
        return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
    int(np.asarray(f(inp)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(np.asarray(f(inp)))
        best = min(best, time.perf_counter() - t0)
    return (best - rtt()) / REPS


def edge_batch():
    from tpuimage.pipelines import docscan
    from tpuimage.ops.edges import canny
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200),
                                                   Image.BILINEAR),
                          dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    batch = jnp.asarray(np.broadcast_to(page, (BATCH,) + page.shape).copy())
    weighted = jax.jit(
        lambda b: docscan.docscan_post_warp_batch(b, cfg)["weighted"])(batch)
    edges = jax.jit(jax.vmap(
        lambda g: canny(g, cfg.canny_low, cfg.canny_high)))(weighted)
    return jnp.asarray(np.asarray(edges))


def perturb_edges(b_, tok):
    return b_.at[:, 0, 0].set((tok % 251).astype(b_.dtype))


def sec_compact():
    from tpuimage.ops.hough import band_compact_coords
    edges = edge_batch()
    h, w = int(edges.shape[1]), int(edges.shape[2])
    k = min(max(131072, (h * w * 3) // 16), 524288)
    print("edge density:", round(float(np.asarray(edges[0] > 0).mean()), 4),
          flush=True)
    for impl in ("flat", "twostage", "rank"):
        def op(eb, impl=impl):
            def one(e):
                # token must consume ALL outputs (CLAUDE.md pitfall 3): a
                # counts-only token dead-codes the coordinate extraction —
                # for impl='rank' that is the entire Pallas kernel
                xs, ys, counts = band_compact_coords(e, k, impl=impl)
                return (xs.sum() + ys.sum()).astype(jnp.int32) + counts.sum()
            return jax.vmap(one)(eb).sum()
        try:
            dt = chained(op, edges, perturb_edges)
            print(f"compact[{impl:9s}] {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"compact[{impl:9s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def _vote_setup(edges):
    from tpuimage.ops.hough import band_compact_coords
    h, w = int(edges.shape[1]), int(edges.shape[2])
    numrho = (w + h) * 2 + 1
    k = min(max(131072, (h * w * 3) // 16), 524288)
    xs_t, ys_t, counts = jax.jit(jax.vmap(
        lambda e: band_compact_coords(e, k)))(edges)
    xs_t = jnp.asarray(np.asarray(xs_t))
    ys_t = jnp.asarray(np.asarray(ys_t))
    counts = jnp.asarray(np.asarray(counts))
    from tpuimage.ops.hough import theta_windows
    c_mid = (numrho - 1) // 2
    rho_base = max(c_mid - (w - 1) - 1, 0)
    rho_hi = min(c_mid + int(np.ceil(np.hypot(w - 1, h - 1))) + 1,
                 numrho - 1)
    rho_bins = rho_hi - rho_base + 1
    wins, span = theta_windows(h, w, c_mid, rho_base, rho_bins, 64)
    return (xs_t, ys_t, counts, numrho, rho_base, rho_bins, wins, span)


def sec_vote():
    from tpuimage.ops.pallas_kernels import hough_votes_pallas
    edges = edge_batch()
    (xs_t, ys_t, counts, numrho, rho_base, rho_bins,
     wins, span) = _vote_setup(edges)

    def perturb_xs(b_, tok):
        return b_.at[:, 0, :].set((tok % 251).astype(jnp.float32))

    for name, kw in [
            ("grid+wins r128 (prod)", dict(rows=128, theta_wins=wins,
                                           win_hi=span)),
            ("grid+wins r64", dict(rows=64, theta_wins=wins, win_hi=span)),
            ("pack2+wins r128", dict(rows=128, theta_wins=wins,
                                     win_hi=span, theta_pack=2)),
            ("pack2+wins r64", dict(rows=64, theta_wins=wins,
                                    win_hi=span, theta_pack=2)),
            ("pack2 noclip-wins r128", dict(rows=128, theta_pack=2)),
            # unrolled serial schedules: U chunks per fori body (one basic
            # block) so Mosaic can overlap chunk j+1's VPU one-hot build
            # with chunk j's MXU dot without the pipelined-carry VMEM trap
            ("grid+wins r128 unroll2", dict(rows=128, theta_wins=wins,
                                            win_hi=span, unroll=2)),
            # r4 refinement: unroll2 won the first sweep (4.24 vs 4.81
            # serial); probe deeper unrolls at the winning rows=128
            ("grid+wins r128 unroll3", dict(rows=128, theta_wins=wins,
                                            win_hi=span, unroll=3)),
            ("grid+wins r128 unroll4", dict(rows=128, theta_wins=wins,
                                            win_hi=span, unroll=4)),
            ("grid+wins r128 unroll6", dict(rows=128, theta_wins=wins,
                                            win_hi=span, unroll=6)),
            ("grid+wins r64 unroll2", dict(rows=64, theta_wins=wins,
                                           win_hi=span, unroll=2)),
            ("grid+wins r64 unroll4", dict(rows=64, theta_wins=wins,
                                           win_hi=span, unroll=4)),
            ("pack2+wins r64 unroll2", dict(rows=64, theta_wins=wins,
                                            win_hi=span, theta_pack=2,
                                            unroll=2)),
    ]:
        def op(xs, name=name, kw=kw):
            def one(x, y, c):
                acc = hough_votes_pallas(x, y, c, numrho,
                                         rho_base=rho_base,
                                         rho_bins=rho_bins, **kw)
                return acc.astype(jnp.int32).sum()
            return jax.vmap(one)(xs, ys_t, counts).sum()
        try:
            dt = chained(op, xs_t, perturb_xs)
            print(f"vote[{name:24s}] {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"vote[{name:24s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # correctness spot-check on hardware: pack2 == grid
    def acc_of(kw):
        def one(x, y, c):
            return hough_votes_pallas(x, y, c, numrho, rho_base=rho_base,
                                      rho_bins=rho_bins, rows=128,
                                      theta_wins=wins, win_hi=span, **kw)
        return np.asarray(jax.jit(jax.vmap(one))(xs_t, ys_t, counts))
    a = acc_of({})
    b = acc_of(dict(theta_pack=2))
    print("hw parity pack2 == grid:", np.array_equal(a, b), flush=True)
    c = acc_of(dict(unroll=2))
    print("hw parity unroll2 == grid:", np.array_equal(a, c), flush=True)


def sec_votex():
    """Round-5 vote-kernel experiments (VERDICT r4 item 3): the kernel is
    VPU-bound on the one-hot build (~90 compare rows per edge-theta vs
    ~230 ns of MXU per chunk-theta), so the levers are (a) fewer/denser
    VPU compare ops — bf16 iota compares (2x if Mosaic packs bf16
    2/lane), balanced radix lo=40 (89 -> 80 rows) — and (b) breaking the
    accumulator RMW chain that serializes consecutive dots (dual
    accumulator halves, build-ahead body order). Also re-measures
    mxu=int8 on the current windowed schedule (last measured r2,
    pre-windows). All exact (interp-parity tests in test_tpu_impls)."""
    from tpuimage.ops.pallas_kernels import hough_votes_pallas
    from tpuimage.ops.hough import theta_windows
    edges = edge_batch()
    h, w = int(edges.shape[1]), int(edges.shape[2])
    (xs_t, ys_t, counts, numrho, rho_base, rho_bins,
     wins, span) = _vote_setup(edges)
    c_mid = (numrho - 1) // 2
    wins40, span40 = theta_windows(h, w, c_mid, rho_base, rho_bins, 40)
    wins32, span32 = theta_windows(h, w, c_mid, rho_base, rho_bins, 32)

    def perturb_xs(b_, tok):
        return b_.at[:, 0, :].set((tok % 251).astype(jnp.float32))

    base = dict(rows=128, theta_wins=wins, win_hi=span)
    for name, kw in [
            ("serial (re-measure)", dict(base)),
            ("unroll2 (prod)", dict(base, unroll=2)),
            ("unroll2 cmp_bf16", dict(base, unroll=2, cmp_bf16=True)),
            ("unroll4 cmp_bf16", dict(base, unroll=4, cmp_bf16=True)),
            ("serial cmp_bf16", dict(base, cmp_bf16=True)),
            ("dual u2", dict(base, schedule="dual", unroll=2)),
            ("dual u4", dict(base, schedule="dual", unroll=4)),
            ("dual u2 cmp_bf16", dict(base, schedule="dual", unroll=2,
                                      cmp_bf16=True)),
            ("dual u4 cmp_bf16", dict(base, schedule="dual", unroll=4,
                                      cmp_bf16=True)),
            ("buildahead u2", dict(base, schedule="buildahead", unroll=2)),
            ("buildahead u4", dict(base, schedule="buildahead", unroll=4)),
            ("buildahead u4 bf16", dict(base, schedule="buildahead",
                                        unroll=4, cmp_bf16=True)),
            ("lo40+wins u1", dict(rows=128, lo_bins=40, theta_wins=wins40,
                                  win_hi=span40)),
            ("lo40+wins u2", dict(rows=128, lo_bins=40, theta_wins=wins40,
                                  win_hi=span40, unroll=2)),
            ("lo40 u2 cmp_bf16", dict(rows=128, lo_bins=40,
                                      theta_wins=wins40, win_hi=span40,
                                      unroll=2, cmp_bf16=True)),
            ("lo32+wins u2", dict(rows=128, lo_bins=32, theta_wins=wins32,
                                  win_hi=span32, unroll=2)),
            ("int8 u2 (re-measure)", dict(base, unroll=2, mxu="int8")),
            ("int8 dual u4 bf16", dict(base, schedule="dual", unroll=4,
                                       cmp_bf16=True, mxu="int8")),
    ]:
        def op(xs, kw=kw):
            def one(x, y, c):
                acc = hough_votes_pallas(x, y, c, numrho,
                                         rho_base=rho_base,
                                         rho_bins=rho_bins, **kw)
                return acc.astype(jnp.int32).sum()
            return jax.vmap(one)(xs, ys_t, counts).sum()
        try:
            dt = chained(op, xs_t, perturb_xs)
            print(f"votex[{name:22s}] {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"votex[{name:22s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # hardware parity: every experimental schedule == production counts
    def acc_of(kw):
        def one(x, y, c):
            return hough_votes_pallas(x, y, c, numrho, rho_base=rho_base,
                                      rho_bins=rho_bins, **kw)
        return np.asarray(jax.jit(jax.vmap(one))(xs_t, ys_t, counts))
    a = acc_of(base)
    for name, kw in [
            ("cmp_bf16", dict(base, unroll=2, cmp_bf16=True)),
            ("dual", dict(base, schedule="dual", unroll=4)),
            ("buildahead", dict(base, schedule="buildahead", unroll=4,
                                cmp_bf16=True)),
            ("lo40", dict(rows=128, lo_bins=40, theta_wins=wins40,
                          win_hi=span40, unroll=2))]:
        print(f"hw parity {name} == prod:",
              np.array_equal(a, acc_of(kw)), flush=True)


def sec_canny():
    import glob
    from tpuimage.ops.edges import canny
    from tpuimage.ops import color as colorops
    from PIL import Image
    files = sorted(glob.glob("/root/reference/public/*.jpg")
                   + glob.glob("/root/reference/public/*.png"))
    imgs = []
    for f in files:
        with Image.open(f) as im:
            imgs.append(np.asarray(im.convert("RGB").resize((256, 256)),
                                   dtype=np.uint8))
    stack = jnp.asarray(np.stack(imgs))
    grays = jax.jit(jax.vmap(colorops.rgb_to_gray))(stack)
    grays = jnp.asarray(np.asarray(grays))

    def perturb(b_, tok):
        return b_.at[:, 0, :].set((tok % 251).astype(jnp.uint8))

    for impl in ("dilate", "linescan", "hybrid", "bitpack"):
        def op(gb, impl=impl):
            return jax.vmap(lambda g: canny(g, 50, 150, impl=impl)
                            .astype(jnp.int32).sum())(gb).sum()
        try:
            dt = chained(op, grays, perturb)
            print(f"canny12x256[{impl:8s}] {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"canny12x256[{impl:8s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # A4-page batch (the fused-program canny)
    from tpuimage.pipelines import docscan
    from PIL import Image as I2
    with I2.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200),
                                                   I2.BILINEAR),
                          dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    batch = jnp.asarray(np.broadcast_to(page, (BATCH,) + page.shape).copy())
    weighted = jnp.asarray(np.asarray(jax.jit(
        lambda b: docscan.docscan_post_warp_batch(b, cfg)["weighted"])(batch)))
    for impl in ("dilate", "linescan", "hybrid", "bitpack"):
        def op(gb, impl=impl):
            return jax.vmap(lambda g: canny(g, cfg.canny_low, cfg.canny_high,
                                            impl=impl)
                            .astype(jnp.int32).sum())(gb).sum()
        try:
            dt = chained(op, weighted, perturb)
            print(f"cannyA4x8[{impl:8s}]  {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"cannyA4x8[{impl:8s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def sec_fused(batches=(8,)):
    from tpuimage.pipelines import docscan
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200),
                                                   Image.BILINEAR),
                          dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    for bsz in batches:
        batch = jnp.asarray(np.broadcast_to(page, (bsz,) + page.shape).copy())

        def op(b):
            return docscan.docscan_post_warp_batch(b, cfg)["clean"] \
                .astype(jnp.int32).sum()

        def perturb(b_, tok):
            return b_.at[:, 0, 0, 0].set((tok % 251).astype(jnp.uint8))

        try:
            dt = chained(op, batch, perturb)
            mp = bsz * page.shape[0] * page.shape[1] / 1e6
            print(f"fused[b{bsz:<2d}] {dt*1e3:7.2f} ms  "
                  f"{mp/dt:7.1f} MP/s", flush=True)
        except Exception as e:
            print(f"fused[b{bsz:<2d}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def sec_prechain():
    """Pre-deskew block (illumination -> weighted binary), ops vs fused
    Pallas epilogue+blackhat, batch 8 — the round-2 VERDICT directive-2
    lever (bar: <= ~3 ms for the whole non-deskew block)."""
    from tpuimage.pipelines import docscan
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200),
                                                   Image.BILINEAR),
                          dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    batch = jnp.asarray(np.broadcast_to(page, (BATCH,) + page.shape).copy())

    def perturb(b_, tok):
        return b_.at[:, 0, 0, 0].set((tok % 251).astype(jnp.uint8))

    outs = {}
    for impl in ("xla", "pallas"):
        def op(b, impl=impl):
            st = jax.vmap(lambda im_: docscan._pre_deskew_stages(
                im_, cfg, impl=impl))(b)
            # consume every stage output (pitfall 3): illum/inkmask/adapt
            # feed nothing else in this harness
            return sum(v.astype(jnp.int32).sum() for v in st.values())
        try:
            dt = chained(op, batch, perturb)
            print(f"prechain[{impl:6s}] {dt*1e3:7.2f} ms", flush=True)
            outs[impl] = np.asarray(jax.jit(jax.vmap(
                lambda im_: docscan._pre_deskew_stages(im_, cfg, impl=impl)
                ["weighted"]))(batch))
        except Exception as e:
            print(f"prechain[{impl:6s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    if len(outs) == 2:
        print("hw parity fused == ops:",
              np.array_equal(outs["xla"], outs["pallas"]), flush=True)


def sec_morphseq():
    """morph_seq pipeline, ops vs fused Pallas chain (gray+erode3 band
    kernel, hist256 Otsu, binary+close3 band kernel), batch 8 on the
    real sample.jpg — tokens consume ALL four stage outputs (pitfall 3)."""
    from tpuimage.pipelines import morphseq
    from PIL import Image
    with Image.open("/root/reference/public/sample.jpg") as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    batch = jnp.asarray(np.broadcast_to(rgb, (BATCH,) + rgb.shape).copy())
    mp = BATCH * rgb.shape[0] * rgb.shape[1] / 1e6

    def perturb(b_, tok):
        return b_.at[:, 0, 0, 0].set((tok % 251).astype(jnp.uint8))

    for impl in ("xla", "pallas"):
        def op(b, impl=impl):
            st = morphseq.morphseq_batch(b, impl=impl)
            return sum(st[k].astype(jnp.int32).sum()
                       for k in ("step1_gray", "step2_eroded",
                                 "step3_otsu", "step4_closed"))
        try:
            dt = chained(op, batch, perturb)
            print(f"morphseq[{impl:6s}] {dt*1e3:7.2f} ms  "
                  f"{mp/dt:7.1f} MP/s", flush=True)
        except Exception as e:
            print(f"morphseq[{impl:6s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def sec_votescale():
    """Vote kernel ALONE at batch 8/16/32 — attributes the fused program's
    batch-32 regression (round-2 VERDICT weak #7): if the kernel scales
    ~linearly here, the regression lives in the XLA stages (memory
    pressure / scheduling), not the Pallas kernel."""
    from tpuimage.ops.pallas_kernels import hough_votes_pallas
    edges8 = edge_batch()
    for bsz in (8, 16, 32):
        reps = -(-bsz // 8)
        edges = jnp.concatenate([edges8] * reps, axis=0)[:bsz]
        (xs_t, ys_t, counts, numrho, rho_base, rho_bins,
         wins, span) = _vote_setup(edges)

        def perturb_xs(b_, tok):
            return b_.at[:, 0, :].set((tok % 251).astype(jnp.float32))

        def op(xs):
            def one(x, y, c):
                acc = hough_votes_pallas(x, y, c, numrho, rho_base=rho_base,
                                         rho_bins=rho_bins, rows=128,
                                         theta_wins=wins, win_hi=span)
                return acc.astype(jnp.int32).sum()
            return jax.vmap(one)(xs, ys_t, counts).sum()
        try:
            dt = chained(op, xs_t, perturb_xs)
            print(f"votescale[b{bsz:<2d}] {dt*1e3:7.2f} ms "
                  f"({dt/bsz*1e3:5.2f} ms/img)", flush=True)
        except Exception as e:
            print(f"votescale[b{bsz:<2d}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def sec_stagescale():
    """Per-stage batch scaling 8/16/32 — pinpoints the fused program's
    batch-32 regression (r4 battery: 637/632/507 MP/s at b8/16/32 while
    the vote kernel alone scales linearly). Times each XLA block of the
    fused program in isolation at each batch size; the block whose
    ms/img grows at b32 is the culprit."""
    from tpuimage.pipelines import docscan
    from tpuimage.ops.edges import canny
    from tpuimage.ops.hough import band_compact_coords
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200),
                                                   Image.BILINEAR),
                          dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    batch8 = jnp.asarray(np.broadcast_to(page, (8,) + page.shape).copy())
    weighted8 = jnp.asarray(np.asarray(jax.jit(
        lambda b: docscan.docscan_post_warp_batch(b, cfg)["weighted"])(batch8)))
    h, w = int(weighted8.shape[1]), int(weighted8.shape[2])
    k = min(max(131072, (h * w * 3) // 16), 524288)

    def perturb_u8(b_, tok):
        return b_.at[:, 0, 0].set((tok % 251).astype(jnp.uint8))

    def perturb_rgb(b_, tok):
        return b_.at[:, 0, 0, 0].set((tok % 251).astype(jnp.uint8))

    stages = {
        "prechain": (
            lambda b: sum(v.astype(jnp.int32).sum() for v in jax.vmap(
                lambda im_: docscan._pre_deskew_stages(im_, cfg))(b).values()),
            "rgb"),
        "canny": (
            lambda b: jax.vmap(lambda g: canny(
                g, cfg.canny_low, cfg.canny_high)
                .astype(jnp.int32).sum())(b).sum(),
            "gray"),
        "compact": (
            lambda b: jax.vmap(lambda e: sum(
                x.sum().astype(jnp.int32)
                for x in band_compact_coords(e, k)))(b).sum(),
            "edges"),
    }
    edges8 = jnp.asarray(np.asarray(jax.jit(jax.vmap(
        lambda g: canny(g, cfg.canny_low, cfg.canny_high)))(weighted8)))
    inputs = {"rgb": batch8, "gray": weighted8, "edges": edges8}
    for name, (op, kind) in stages.items():
        for bsz in (8, 16, 32):
            reps = -(-bsz // 8)
            inp = jnp.concatenate([inputs[kind]] * reps, axis=0)[:bsz]
            try:
                dt = chained(op, inp,
                             perturb_rgb if kind == "rgb" else perturb_u8)
                print(f"stagescale[{name:8s} b{bsz:<2d}] {dt*1e3:7.2f} ms "
                      f"({dt/bsz*1e3:5.2f} ms/img)", flush=True)
            except Exception as e:
                print(f"stagescale[{name:8s} b{bsz:<2d}] FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def sec_chunkscale():
    """Fused program at batch 32 with lax.map batch-chunking — the
    candidate FIX for the b32 regression that stagescale attributed to
    the pre-deskew XLA stages (fusion/layout at 32x1MP working sets).
    chunk=0 is the current whole-batch vmap; chunk=8/16 run sequential
    sub-batches inside one jit. 'lean8' maps a body that computes ONLY
    the clean chain, bounding any while-loop DCE difference (the dict
    form relies on XLA pruning dead tuple elements through lax.map)."""
    from tpuimage.pipelines import docscan
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        page = np.asarray(im.convert("RGB").resize((849, 1200),
                                                   Image.BILINEAR),
                          dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    batch = jnp.asarray(np.broadcast_to(page, (32,) + page.shape).copy())
    mp = 32 * page.shape[0] * page.shape[1] / 1e6

    def perturb(b_, tok):
        return b_.at[:, 0, 0, 0].set((tok % 251).astype(jnp.uint8))

    def lean8(b):
        chunked = b.reshape((4, 8) + b.shape[1:])
        clean = jax.lax.map(
            lambda wb: docscan._post_warp_batch_body(wb, cfg)["clean"],
            chunked)
        return clean.astype(jnp.int32).sum()

    ops = {"chunk0 ": lambda b: docscan.docscan_post_warp_batch(
               b, cfg, chunk=0)["clean"].astype(jnp.int32).sum(),
           "chunk8 ": lambda b: docscan.docscan_post_warp_batch(
               b, cfg, chunk=8)["clean"].astype(jnp.int32).sum(),
           "chunk16": lambda b: docscan.docscan_post_warp_batch(
               b, cfg, chunk=16)["clean"].astype(jnp.int32).sum(),
           "lean8  ": lean8}
    for name, op in ops.items():
        try:
            dt = chained(op, batch, perturb)
            print(f"chunkscale[b32 {name}] {dt*1e3:7.2f} ms  "
                  f"{mp/dt:7.1f} MP/s", flush=True)
        except Exception as e:
            print(f"chunkscale[b32 {name}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def sec_landnf():
    """VERDICT r4 items 4 + 6: hardware numbers for the three table rows
    without current-default measurements — landscape enhance_image (the
    one reference workload with NO TPU number at all), night_rgb (stale
    r3 1008), face-denoise core (stale r2 56.7). Each with the cv2
    reference chain alongside (min-of-5; ±2x thread-pool variance)."""
    import cv2
    from PIL import Image

    def load(path, size=None):
        with Image.open(path) as im:
            im = im.convert("RGB")
            if size:
                im = im.resize(size, Image.BILINEAR)
            return np.asarray(im, np.uint8)

    def cpu_best(fn, n=5):
        fn()
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def perturb(b_, tok):
        return b_.at[:, 0, 0, 0].set((tok % 251).astype(jnp.uint8))

    # --- landscape enhance_image (Landscape.py:157-192, clean path) ---
    land = load("/root/reference/public/sample.jpg")
    mp1 = land.shape[0] * land.shape[1] / 1e6

    def cpu_land():
        bgr = land[..., ::-1].copy()
        den = cv2.bilateralFilter(bgr, 9, 75, 75)
        lab = cv2.cvtColor(den, cv2.COLOR_BGR2LAB)
        l_orig, a, b = cv2.split(lab)
        l_clahe = cv2.createCLAHE(clipLimit=2.2, tileGridSize=(8, 8)
                                  ).apply(l_orig)
        l_norm = l_orig.astype(np.float32) / 255.0
        wgt = (1.0 - np.power(l_norm, 2.0)) * 0.55
        l_fin = (l_clahe.astype(np.float32) * wgt
                 + l_orig.astype(np.float32) * (1.0 - wgt)).astype(np.uint8)
        enh = cv2.cvtColor(cv2.merge((l_fin, a, b)), cv2.COLOR_LAB2BGR)
        blur = cv2.GaussianBlur(enh, (0, 0), 1.0)
        cv2.addWeighted(enh, 1.8, blur, -0.8, 0)

    from tpuimage.pipelines.landscape import enhance_image
    lb = jnp.asarray(np.broadcast_to(land, (BATCH,) + land.shape).copy())
    try:
        dt = chained(lambda b: jax.vmap(enhance_image)(b)
                     .astype(jnp.int32).sum(), lb, perturb)
        cpu = cpu_best(cpu_land)
        print(f"landnf[landscape] tpu {dt*1e3:7.2f} ms/batch8 = "
              f"{BATCH*mp1/dt:7.1f} MP/s | cpu {mp1/cpu:5.1f} MP/s "
              f"(best {cpu*1e3:.1f} ms) | {BATCH*mp1/dt/(mp1/cpu):5.1f}x",
              flush=True)
    except Exception as e:
        print(f"landnf[landscape] FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # --- night_rgb re-measure (asm.py:63-103) ---
    night = load("/root/reference/public/nightview.png")
    mp2 = night.shape[0] * night.shape[1] / 1e6

    def cpu_night():
        bgr = night[..., ::-1].copy()
        den = cv2.medianBlur(bgr, 3)
        lab = cv2.cvtColor(den, cv2.COLOR_BGR2LAB)
        l2 = cv2.createCLAHE(2.0, (8, 8)).apply(lab[..., 0])
        cv2.cvtColor(np.concatenate([l2[..., None], lab[..., 1:]], -1),
                     cv2.COLOR_LAB2BGR)

    from tpuimage.pipelines.night import night_rgb_batch
    nb = jnp.asarray(np.broadcast_to(night, (BATCH,) + night.shape).copy())
    try:
        dt = chained(lambda b: night_rgb_batch(b)["enhanced"]
                     .astype(jnp.int32).sum(), nb, perturb)
        cpu = cpu_best(cpu_night)
        print(f"landnf[night_rgb ] tpu {dt*1e3:7.2f} ms/batch8 = "
              f"{BATCH*mp2/dt:7.1f} MP/s | cpu {mp2/cpu:5.1f} MP/s "
              f"(best {cpu*1e3:.1f} ms) | {BATCH*mp2/dt/(mp2/cpu):5.1f}x",
              flush=True)
    except Exception as e:
        print(f"landnf[night_rgb ] FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # --- face denoise core re-measure (FaceEnhancement.py:23-53 gaussian
    # branch through the glamour bilateral) ---
    face = load("/root/reference/public/facewithnoise.jpg")
    mp3 = face.shape[0] * face.shape[1] / 1e6

    def cpu_face():
        bgr = face[..., ::-1].copy()
        light = cv2.GaussianBlur(bgr, (5, 5), 0)
        strong = cv2.GaussianBlur(bgr, (9, 9), 0)
        ycrcb = cv2.cvtColor(light, cv2.COLOR_BGR2YCrCb)
        mask = cv2.inRange(ycrcb, (0, 133, 77), (255, 173, 127))
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, k)
        mask = cv2.dilate(mask, k, iterations=2)
        mask = cv2.GaussianBlur(mask, (21, 21), 0)
        m = mask.astype(np.float32)[..., None] / 255.0
        comb = (light * m + strong * (1 - m)).astype(np.uint8)
        cv2.bilateralFilter(comb, -1, 30, 10)

    from tpuimage.pipelines.face import face_pre_eyes
    fb = jnp.asarray(np.broadcast_to(face, (BATCH,) + face.shape).copy())
    try:
        dt = chained(lambda b: jax.vmap(
            lambda im: face_pre_eyes(im, noise_type="gaussian")
            ["skin_enhanced"])(b).astype(jnp.int32).sum(), fb, perturb)
        cpu = cpu_best(cpu_face)
        print(f"landnf[face_core ] tpu {dt*1e3:7.2f} ms/batch8 = "
              f"{BATCH*mp3/dt:7.1f} MP/s | cpu {mp3/cpu:5.1f} MP/s "
              f"(best {cpu*1e3:.1f} ms) | {BATCH*mp3/dt/(mp3/cpu):5.1f}x",
              flush=True)
    except Exception as e:
        print(f"landnf[face_core ] FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


def sec_roofline():
    edges = edge_batch()
    e0 = np.asarray(edges[0] > 0)
    n_edges = int(e0.sum())
    h, w = e0.shape
    flat = np.flatnonzero(e0.reshape(-1))
    bc = np.bincount(flat % 128, minlength=128)
    span = int(np.ceil(np.hypot(w - 1, h - 1)) / 64) + 2
    n_hi = span + 1
    trips = int(-(-bc.max() // 128))  # rows=128
    chunk = 128 * 128
    ktot = 180 * trips * chunk * BATCH
    print(f"edges/img {n_edges}  max_band {bc.max()}  trips(r128) {trips}")
    print(f"vote dims: M={n_hi} N=64 (pack2: M={2*n_hi} N=128), "
          f"K/chunk={chunk}")
    print(f"MXU K-cycles: grid {ktot/1e6:.1f}M, pack2 {ktot/2e6:.1f}M "
          f"(v5e ~6G K-cyc/s aggregate -> floors "
          f"{ktot/6e9*1e3:.2f} / {ktot/12e9*1e3:.2f} ms)")
    print(f"useful increments: {n_edges*180*BATCH/1e9:.2f}G "
          f"(occupancy {n_hi*64/16384:.1%} of the 128x128 tile)")


SECTIONS = {"compact": sec_compact, "vote": sec_vote, "canny": sec_canny,
            "fused": lambda: sec_fused((8,)),
            "scaling": lambda: sec_fused((8, 16, 32)),
            "votescale": sec_votescale,
            "stagescale": sec_stagescale,
            "chunkscale": sec_chunkscale,
            "votex": sec_votex,
            "landnf": sec_landnf,
            "prechain": sec_prechain,
            "morphseq": sec_morphseq,
            "roofline": sec_roofline}

if __name__ == "__main__":
    names = sys.argv[1:] or ["compact", "vote", "canny", "prechain",
                             "morphseq", "fused", "scaling", "votescale",
                             "roofline"]
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        t0 = time.time()
        SECTIONS[nm]()
        print(f"  ({time.time()-t0:.0f}s)", flush=True)
