"""Benchmark: fused DocScanner post-warp pipeline, megapixels/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

- value: steady-state throughput of tpuimage's fused stages-04-08 program
  (illumination, stretch, ink mask w/ 2 Otsu solves, adaptive threshold,
  mask weighting, Hough-deskew, cleanup) on A4@1200 pages, batch 8, on the
  default JAX device (the TPU chip under the driver).
- vs_baseline: ratio against the reference's CPU implementation of the
  same stages (cv2 calls mirroring DocScanner.py:316-346 with the
  AI_classification.py:645-663 override config), measured in-process.
"""
from __future__ import annotations

import json
import time

import numpy as np


BATCH = 8
WARM = 2
ITERS = 5


def _load_page() -> np.ndarray:
    """A real 849x1200 A4 page: document1.jpeg resized on host."""
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        return np.asarray(im.convert("RGB").resize((849, 1200), Image.BILINEAR),
                          dtype=np.uint8)


def bench_tpu(page: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpuimage.pipelines import docscan

    cfg = docscan.GUI_DOCUMENT_CONFIG
    batch = jnp.asarray(np.broadcast_to(page, (BATCH,) + page.shape).copy())
    # block_until_ready is not a reliable sync on the tunneled axon backend
    # (returns before execution completes) — use a device->host scalar fetch
    # as the barrier. The ~30 ms tunnel round-trip and its variance would
    # swamp a per-dispatch timing, so the program is repeated REPS times
    # INSIDE one jit with a data dependency chained through each iteration
    # (a one-pixel perturbation derived from the previous output — prevents
    # CSE, keeps the workload identical); one scalar comes back per
    # dispatch and the measured RTT of a trivial program is subtracted.
    REPS = 8

    @jax.jit
    def chained(b):
        def body(i, carry):
            b_, acc = carry
            clean = docscan.docscan_post_warp_batch(b_, cfg)["clean"]
            # token depends on EVERY output element, and the perturbation
            # touches EVERY batch element — a sampled token lets XLA slice
            # away elementwise tails, and a single-element perturbation
            # lets it hoist the other elements' loop-invariant work
            tok = clean.astype(jnp.int32).sum()
            b_next = b_.at[:, 0, 0, 0].set((tok % 251).astype(jnp.uint8))
            return b_next, acc + tok
        return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0, 0])
    int(np.asarray(triv(batch)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        int(np.asarray(triv(batch)))
    rtt = (time.perf_counter() - t0) / ITERS
    int(np.asarray(chained(batch)))  # compile + warm
    best = float("inf")
    for _ in range(max(WARM, 3)):
        t0 = time.perf_counter()
        int(np.asarray(chained(batch)))
        best = min(best, time.perf_counter() - t0)
    dt = max((best - rtt) / REPS, 1e-9)
    mp = BATCH * page.shape[0] * page.shape[1] / 1e6
    return mp / dt


def bench_cpu_reference(page: np.ndarray) -> float:
    """The same stages in cv2 (reference DocScanner.py math, GUI config)."""
    import cv2

    def run_once(rgb):
        gray = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
        h, w = gray.shape
        base = max(15, int(round(min(h, w) * 0.05)))
        base += base % 2 == 0
        bg = cv2.GaussianBlur(gray, (base, base), 0)
        illum = cv2.normalize(cv2.divide(gray, bg, scale=255), None, 0, 255,
                              cv2.NORM_MINMAX)
        stretch = cv2.normalize(illum, None, 0, 255, cv2.NORM_MINMAX)
        bg2 = cv2.GaussianBlur(stretch, (51, 51), 0)
        ink = cv2.normalize(cv2.subtract(bg2, stretch), None, 0, 255, cv2.NORM_MINMAX)
        t, _ = cv2.threshold(ink, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        _, ms = cv2.threshold(ink, max(0, int(round(t - 8))), 255, cv2.THRESH_BINARY)
        kv = cv2.getStructuringElement(cv2.MORPH_RECT, (9, 19))
        bh = cv2.normalize(cv2.morphologyEx(stretch, cv2.MORPH_BLACKHAT, kv),
                           None, 0, 255, cv2.NORM_MINMAX)
        t2, _ = cv2.threshold(bh, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        _, mb = cv2.threshold(bh, max(0, int(round(t2 - 8))), 255, cv2.THRESH_BINARY)
        mask = cv2.dilate(cv2.max(ms, mb),
                          cv2.getStructuringElement(cv2.MORPH_RECT, (2, 2)))
        ab = cv2.adaptiveThreshold(stretch, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                   cv2.THRESH_BINARY, 31, 3)
        wt = ab.copy()
        wt[mask == 0] = 255
        edges = cv2.Canny(wt, 30, 100)
        lines = cv2.HoughLines(edges, 1, np.pi / 180, 150)
        angle = 0.0
        if lines is not None and len(lines):
            th = lines.reshape(-1, 2)[:, 1]
            a = (th * 180.0 / np.pi + 90.0) % 180.0 - 90.0
            angle = float(np.median(a))
            if abs(angle) > 10.0:
                angle = 0.0
        M = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, 1.0)
        return cv2.warpAffine(wt, M, (w, h), flags=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_REPLICATE)

    run_once(page)  # warm cv2's thread pool
    # min-of-5 (NOT a mean): this 1-core host's cv2 timings vary ±2x with
    # thread-pool/THP noise, and a single slow run dragging a mean down
    # INFLATES vs_baseline. The fastest CPU run is the conservative
    # denominator (matches the BASELINE.md reporting stance).
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        run_once(page)
        dt = min(dt, time.perf_counter() - t0)
    return (page.shape[0] * page.shape[1] / 1e6) / dt


def _claim_device_or_die(timeout_s: int = 900) -> None:
    """The tunneled TPU worker has outages where the backend claim hangs
    indefinitely (interpreter startup and ``import jax`` stay fine — only
    ``jax.devices()`` blocks). Rather than hang the driver, claim in a
    daemon thread with a deadline and emit an honest error metric line."""
    import os
    import threading

    ok = threading.Event()

    def claim():
        import jax
        jax.devices()
        ok.set()

    threading.Thread(target=claim, daemon=True).start()
    if not ok.wait(timeout_s):
        print(json.dumps({
            "metric": "fused_docscan_post_warp_throughput",
            "value": 0.0,
            "unit": "MP/s/chip",
            "vs_baseline": 0.0,
            "error": f"TPU worker unreachable: device claim hung >{timeout_s}s"
                     " (worker outage; see CLAUDE.md probe notes)",
        }), flush=True)
        os._exit(2)


def _tunnel_stats() -> dict:
    """Direct tunnel health numbers so any e2e reading is diagnosable from
    the record alone (VERDICT r4 item 1: the driver captured 0.6x serial
    while the builder measured 1.35x, and nothing in the artifact could
    attribute the gap — the serve path's floor is ~1 MB/img of raw RGB
    over this tunnel, so its bandwidth IS the serial number's scale)."""
    import jax
    import jax.numpy as jnp

    buf = np.zeros((4 << 20,), np.uint8)   # 4 MiB
    dev = jnp.asarray(buf)                  # warm the transfer path
    del dev
    best_up = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jnp.asarray(buf)
        _ = int(np.asarray(dev[0]))         # barrier (block_until_ready lies)
        best_up = min(best_up, time.perf_counter() - t0)
    triv = jax.jit(lambda b: b.astype(jnp.int32)[0])
    int(np.asarray(triv(jnp.asarray(buf[:8]))))
    best_rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        int(np.asarray(triv(jnp.asarray(buf[:8]))))
        best_rtt = min(best_rtt, time.perf_counter() - t0)
    mb = buf.nbytes / 1e6
    return {"upload_mbps": round(mb / max(best_up - best_rtt, 1e-9), 1),
            "rtt_ms": round(best_rtt * 1e3, 1)}


def bench_e2e_serve():
    """BASELINE.json:2's SECOND metric: batch images/sec at parity over the
    FULL reference path (load -> localize -> warp -> post-warp -> fetch;
    /root/reference/DocScanner.py:262-365) via scan_batch, against the same
    chain composed from cv2 calls (benchmarks/e2e_docscan.py's harness).

    Returns a dict of attribution fields (VERDICT r4 item 1a): min-of-N on
    BOTH sides, per-phase ms of the best serial run, pipelined-serial and
    stream numbers, raw samples, and tunnel bandwidth/RTT."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "e2e_docscan",
        __import__("os").path.join(__import__("os").path.dirname(
            __import__("os").path.abspath(__file__)),
            "benchmarks", "e2e_docscan.py"))
    e2e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e2e)
    from tpuimage.pipelines import docscan

    rgb = e2e.load_doc()
    inputs = [rgb.copy() for _ in range(8)]
    n = len(inputs)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    out = docscan.scan_batch(inputs, cfg)  # compile + warm
    assert all("binary" in r for r in out), [r.get("error") for r in out]

    # serial scan_batch, min-of-5, per-phase attribution of the BEST run
    best, samples, phases = float("inf"), [], None
    for _ in range(5):
        t0 = time.perf_counter()
        st = docscan._scan_load_localize(inputs, cfg)
        t1 = time.perf_counter()
        docscan._scan_quad_fit(st, cfg, False)
        t2 = time.perf_counter()
        docscan._scan_postwarp_dispatch(st, cfg, None)
        t3 = time.perf_counter()
        docscan._scan_fetch(st)
        t4 = time.perf_counter()
        samples.append(round((t4 - t0) / n * 1e3, 1))
        if t4 - t0 < best:
            best = t4 - t0
            # NOTE: buckets are DISPATCH boundaries, not device-sync'd
            # costs — the async upload + localize program complete inside
            # the quad_fit_warp bucket (its first localize-buffer fetch
            # blocks on them). Sync'd per-phase attribution lives in
            # benchmarks/e2e_docscan.py --profile.
            phases = {"load_localize_dispatch": round((t1 - t0) * 1e3, 1),
                      "quad_fit_warp_incl_upload_sync":
                          round((t2 - t1) * 1e3, 1),
                      "postwarp_dispatch": round((t3 - t2) * 1e3, 1),
                      "fetch": round((t4 - t3) * 1e3, 1)}
    tpu_ms = best / n * 1e3

    # pipelined serial (intra-batch overlap via pipeline_chunk; compiles
    # the sub-batch program once, excluded by the warm call)
    docscan.scan_batch(inputs, cfg, pipeline_chunk=4)
    best_p = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        docscan.scan_batch(inputs, cfg, pipeline_chunk=4)
        best_p = min(best_p, time.perf_counter() - t0)
    piped_ms = best_p / n * 1e3

    # CPU reference: min-of-5 (mean-of-3 let one slow run deflate the
    # denominator; VERDICT r4 item 1a)
    e2e.cpu_e2e_once(rgb)  # warm cv2 thread pool
    cpu_best, cpu_samples = float("inf"), []
    for _ in range(5):
        t0 = time.perf_counter()
        e2e.cpu_e2e_once(rgb)
        dt = time.perf_counter() - t0
        cpu_samples.append(round(dt * 1e3, 1))
        cpu_best = min(cpu_best, dt)
    cpu_ms = cpu_best * 1e3

    # pipelined steady-state serving (scan_stream): host contour work and
    # the next batch's upload overlap the in-flight post-warp program
    n_batches = 4
    stream_in = [[im.copy() for im in inputs] for _ in range(n_batches)]
    best_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _res in docscan.scan_stream(iter(stream_in), cfg):
            pass
        best_s = min(best_s, time.perf_counter() - t0)
    stream_ms = best_s / (n_batches * n) * 1e3
    return {"tpu_ms": tpu_ms, "piped_ms": piped_ms, "cpu_ms": cpu_ms,
            "stream_ms": stream_ms, "phases": phases,
            "samples_ms": samples, "cpu_samples_ms": cpu_samples}


# CPU reference band recorded across rounds 2-4 for the fused post-warp
# stages on this host (BASELINE.md; cv2 thread-pool variance is ±2x, so a
# single run's denominator can swing vs_baseline — the band makes any
# capture self-checking from the record alone; VERDICT r4 items 5/6)
CPU_RECORDED_BAND_MPS = (11.9, 14.5)


def main():
    page = _load_page()
    _claim_device_or_die()
    tpu_mps = bench_tpu(page)
    try:
        cpu_mps = bench_cpu_reference(page)
    except Exception:
        cpu_mps = float("nan")
    ratio = tpu_mps / cpu_mps if cpu_mps == cpu_mps else None
    lo, hi = CPU_RECORDED_BAND_MPS
    rec = {
        "metric": "fused_docscan_post_warp_throughput",
        "value": round(tpu_mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(ratio, 3) if ratio is not None else None,
        # denominator pinned in the artifact: this run's CPU reference and
        # the ratio against the recorded cross-round band
        "cpu_mps": round(cpu_mps, 2) if cpu_mps == cpu_mps else None,
        "vs_recorded_band": [round(tpu_mps / hi, 1), round(tpu_mps / lo, 1)],
    }
    # second BASELINE.json:2 metric (end-to-end serve); best-effort — the
    # headline metric above must survive any failure here
    try:
        rec.update(_tunnel_stats())
    except Exception:
        pass
    try:
        e = bench_e2e_serve()
        tpu_ms, cpu_ms = e["tpu_ms"], e["cpu_ms"]
        rec["e2e_ms_per_img"] = round(tpu_ms, 1)
        rec["e2e_img_per_s"] = round(1e3 / tpu_ms, 2)
        rec["e2e_cpu_ms_per_img"] = round(cpu_ms, 1)
        rec["e2e_vs_baseline"] = round(cpu_ms / tpu_ms, 2)
        rec["e2e_piped_ms_per_img"] = round(e["piped_ms"], 1)
        rec["e2e_piped_vs_baseline"] = round(cpu_ms / e["piped_ms"], 2)
        rec["e2e_stream_img_per_s"] = round(1e3 / e["stream_ms"], 2)
        rec["e2e_stream_vs_baseline"] = round(cpu_ms / e["stream_ms"], 2)
        rec["e2e_phase_ms"] = e["phases"]
        rec["e2e_samples_ms"] = e["samples_ms"]
        rec["e2e_cpu_samples_ms"] = e["cpu_samples_ms"]
    except Exception:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
