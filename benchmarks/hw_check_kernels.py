"""Hardware smoke-check: compile + run the Pallas kernels on the real chip
and compare against the XLA formulations. Usage:
    python benchmarks/hw_check_kernels.py [bilateral|hough|gauss] ...
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

what = set(sys.argv[1:]) or {"bilateral", "hough", "lab", "clahe", "rank",
                             "pack2", "blackhat", "inkmask", "fusedpre",
                             "morphseq"}


def timeit(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    if "bilateral" in what:
        from tpuimage.ops.bilateral import bilateral_filter
        from tpuimage.ops.pallas_kernels import bilateral_pallas_applicable
        img = rng.integers(0, 256, (1200, 849), np.uint8)
        x = jnp.asarray(img)
        print("applicable:", bilateral_pallas_applicable(img, 9, 75.0))
        f_scan = jax.jit(lambda a: bilateral_filter(a, 9, 75.0, 75.0, impl="scan"))
        f_pal = jax.jit(lambda a: bilateral_filter(a, 9, 75.0, 75.0, impl="pallas"))
        a = np.asarray(f_scan(x))
        print("scan ok")
        b = np.asarray(f_pal(x))
        print("pallas ok")
        d = np.abs(a.astype(int) - b.astype(int))
        print("bilateral maxdiff", d.max(), "fracdiff", float((d > 0).mean()))
        ts = timeit(lambda: np.asarray(f_scan(x))[0, 0])
        tp = timeit(lambda: np.asarray(f_pal(x))[0, 0])
        print(f"bilateral scan {ts*1e3:.2f} ms  pallas {tp*1e3:.2f} ms")

    if "hough" in what:
        from tpuimage.ops.hough import hough_accumulator
        edges = (rng.random((1200, 849)) < 0.05).astype(np.uint8) * 255
        e = jnp.asarray(edges)
        f_x = jax.jit(lambda a: hough_accumulator(a, impl="xla"))
        f_p = jax.jit(lambda a: hough_accumulator(a, impl="pallas"))
        a = np.asarray(f_x(e))
        print("xla ok")
        b = np.asarray(f_p(e))
        print("pallas ok, equal:", np.array_equal(a, b))
        tx = timeit(lambda: np.asarray(f_x(e))[0, 0])
        tp = timeit(lambda: np.asarray(f_p(e))[0, 0])
        print(f"hough xla {tx*1e3:.2f} ms  pallas(int8+clip) {tp*1e3:.2f} ms")

    if "lab" in what:
        from tpuimage.ops import color as colorops
        img = rng.integers(0, 256, (853, 1280, 3), np.uint8)
        x = jnp.asarray(img)
        f_x = jax.jit(lambda a: colorops.rgb_to_lab(a, impl="xla"))
        f_p = jax.jit(lambda a: colorops.rgb_to_lab(a, impl="pallas"))
        a = np.asarray(f_x(x))
        print("lab xla ok")
        b = np.asarray(f_p(x))
        print("lab pallas ok, equal:", np.array_equal(a, b))
        tx = timeit(lambda: np.asarray(f_x(x))[0, 0, 0])
        tp = timeit(lambda: np.asarray(f_p(x))[0, 0, 0])
        print(f"lab xla {tx*1e3:.2f} ms  pallas {tp*1e3:.2f} ms")

    if "rank" in what:
        from tpuimage.ops.hough import band_compact_coords
        edges = (rng.random((1200, 849)) < 0.05).astype(np.uint8) * 255
        e = jnp.asarray(edges)
        k = min(max(131072, (1200 * 849 * 3) // 16), 524288)
        f_f = jax.jit(lambda a: band_compact_coords(a, k, impl="flat"))
        f_r = jax.jit(lambda a: band_compact_coords(a, k, impl="rank"))
        a = [np.asarray(v) for v in f_f(e)]
        print("flat ok")
        b = [np.asarray(v) for v in f_r(e)]
        eq = all(np.array_equal(x, y) for x, y in zip(a, b))
        print("rank ok, equal:", eq)
        tf = timeit(lambda: np.asarray(f_f(e)[2])[0])
        tr = timeit(lambda: np.asarray(f_r(e)[2])[0])
        print(f"compact flat {tf*1e3:.2f} ms  rank {tr*1e3:.2f} ms")

    if "pack2" in what:
        from tpuimage.ops.hough import band_compact_coords
        from tpuimage.ops.pallas_kernels import hough_votes_pallas
        h, w = 1200, 849
        edges = (rng.random((h, w)) < 0.05).astype(np.uint8) * 255
        xs_t, ys_t, counts = band_compact_coords(jnp.asarray(edges),
                                                 (h * w * 3) // 16)
        numrho = (h + w) * 2 + 1
        c_mid = (numrho - 1) // 2
        rho_base = max(c_mid - (w - 1) - 1, 0)
        rho_hi = min(c_mid + int(np.ceil(np.hypot(w - 1, h - 1))) + 1,
                     numrho - 1)
        kw = dict(numrho=numrho, rho_base=rho_base,
                  rho_bins=rho_hi - rho_base + 1, rows=128)
        f_g = jax.jit(lambda x, y, c: hough_votes_pallas(x, y, c, **kw))
        f_2 = jax.jit(lambda x, y, c: hough_votes_pallas(x, y, c,
                                                         theta_pack=2, **kw))
        a = np.asarray(f_g(xs_t, ys_t, counts))
        print("grid ok")
        b = np.asarray(f_2(xs_t, ys_t, counts))
        print("pack2 ok, equal:", np.array_equal(a, b))
        tg = timeit(lambda: np.asarray(f_g(xs_t, ys_t, counts))[0, 0])
        t2 = timeit(lambda: np.asarray(f_2(xs_t, ys_t, counts))[0, 0])
        print(f"vote grid {tg*1e3:.2f} ms  pack2 {t2*1e3:.2f} ms")
        f_u = jax.jit(lambda x, y, c: hough_votes_pallas(x, y, c,
                                                         unroll=2, **kw))
        u = np.asarray(f_u(xs_t, ys_t, counts))
        print("unroll2 ok, equal:", np.array_equal(a, u))
        tu = timeit(lambda: np.asarray(f_u(xs_t, ys_t, counts))[0, 0])
        print(f"vote unroll2 {tu*1e3:.2f} ms")

    if "blackhat" in what:
        from tpuimage.ops.morphology import morph_blackhat, structuring_element
        img = rng.integers(0, 256, (1200, 849), np.uint8)
        x = jnp.asarray(img)
        se = structuring_element("rect", (9, 19))
        f_x = jax.jit(lambda a: morph_blackhat(a, se, impl="xla"))
        f_p = jax.jit(lambda a: morph_blackhat(a, se, impl="pallas"))
        a = np.asarray(f_x(x))
        print("blackhat xla ok")
        b = np.asarray(f_p(x))
        print("blackhat pallas ok, equal:", np.array_equal(a, b))
        tx = timeit(lambda: np.asarray(f_x(x))[0, 0])
        tp = timeit(lambda: np.asarray(f_p(x))[0, 0])
        print(f"blackhat xla {tx*1e3:.2f} ms  pallas {tp*1e3:.2f} ms")

    if "inkmask" in what:
        from tpuimage.ops.threshold import threshold_binary
        from tpuimage.ops.arith import max_u8
        from tpuimage.ops.morphology import dilate, structuring_element
        from tpuimage.ops.pallas_kernels import inkmask_weighted_pallas
        h, w = 1200, 849
        sub = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
        bh = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
        adapt = jnp.asarray((rng.integers(0, 2, (h, w)) * 255).astype(np.uint8))

        def ops_path(s, b2, ad):
            m = max_u8(threshold_binary(s, 37.0), threshold_binary(b2, 101.0))
            m = dilate(m, structuring_element("rect", (2, 2)))
            return m, jnp.where(m == 0, jnp.uint8(255), ad)

        f_x = jax.jit(ops_path)
        f_p = jax.jit(lambda s, b2, ad: inkmask_weighted_pallas(
            s, b2, ad, jnp.float32(37.0), jnp.float32(101.0), iters=1))
        a = [np.asarray(v) for v in f_x(sub, bh, adapt)]
        print("inkmask xla ok")
        b = [np.asarray(v) for v in f_p(sub, bh, adapt)]
        print("inkmask pallas ok, equal:",
              all(np.array_equal(x_, y_) for x_, y_ in zip(a, b)))
        tx = timeit(lambda: np.asarray(f_x(sub, bh, adapt)[1])[0, 0])
        tp = timeit(lambda: np.asarray(f_p(sub, bh, adapt)[1])[0, 0])
        print(f"inkmask xla {tx*1e3:.2f} ms  pallas {tp*1e3:.2f} ms")

    if "fusedpre" in what:
        # whole pre-deskew block, ops vs fused epilogue+blackhat, on the
        # real golden-config page geometry (random content exercises the
        # same program shapes)
        from tpuimage.pipelines import docscan
        cfg = docscan.GUI_DOCUMENT_CONFIG
        page = jnp.asarray(rng.integers(0, 256, (1200, 849, 3), np.uint8))
        f_x = jax.jit(lambda a: docscan._pre_deskew_stages(a, cfg,
                                                           impl="xla"))
        f_p = jax.jit(lambda a: docscan._pre_deskew_stages(a, cfg,
                                                           impl="pallas"))
        a = {k: np.asarray(v) for k, v in f_x(page).items()}
        print("fusedpre xla ok")
        b = {k: np.asarray(v) for k, v in f_p(page).items()}
        for k in a:
            d = (a[k].astype(int) != b[k].astype(int))
            print(f"  stage {k:9s} equal: {not d.any()}"
                  + ("" if not d.any() else f"  ({d.mean():.2e} frac)"))
        tx = timeit(lambda: np.asarray(f_x(page)["weighted"])[0, 0])
        tp = timeit(lambda: np.asarray(f_p(page)["weighted"])[0, 0])
        print(f"pre-deskew ops {tx*1e3:.2f} ms  fused {tp*1e3:.2f} ms "
              f"(single image, RTT-bound — see r3_battery for in-jit reps)")

    if "morphseq" in what:
        from tpuimage.pipelines import morphseq
        from PIL import Image
        with Image.open("/root/reference/public/sample.jpg") as im:
            rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
        x = jnp.asarray(rgb)
        f_x = jax.jit(lambda a: morphseq.morphseq_stages(a, impl="xla"))
        f_p = jax.jit(lambda a: morphseq.morphseq_stages(a, impl="pallas"))
        a = {k: np.asarray(v) for k, v in f_x(x).items()}
        print("morphseq xla ok")
        b = {k: np.asarray(v) for k, v in f_p(x).items()}
        print("morphseq pallas ok, equal:",
              all(np.array_equal(a[k], b[k]) for k in a))
        tx = timeit(lambda: np.asarray(f_x(x)["step4_closed"])[0, 0])
        tp = timeit(lambda: np.asarray(f_p(x)["step4_closed"])[0, 0])
        print(f"morphseq ops {tx*1e3:.2f} ms  fused {tp*1e3:.2f} ms "
              f"(single image, RTT-bound — see r3_battery morphseq)")

    if "clahe" in what:
        from tpuimage.ops.histogram import clahe
        img = rng.integers(0, 256, (853, 1280), np.uint8)
        x = jnp.asarray(img)
        f_m = jax.jit(lambda a: clahe(a, 2.0, 8, 8, impl="mxu"))
        f_p = jax.jit(lambda a: clahe(a, 2.0, 8, 8, impl="pallas"))
        a = np.asarray(f_m(x))
        print("clahe mxu ok")
        b = np.asarray(f_p(x))
        d = np.abs(a.astype(int) - b.astype(int))
        print("clahe pallas ok, maxdiff", d.max(), "fracdiff",
              float((d > 0).mean()))
        tm = timeit(lambda: np.asarray(f_m(x))[0, 0])
        tp = timeit(lambda: np.asarray(f_p(x))[0, 0])
        print(f"clahe mxu {tm*1e3:.2f} ms  pallas {tp*1e3:.2f} ms")


if __name__ == "__main__":
    main()
