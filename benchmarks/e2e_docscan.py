"""End-to-end DocScanner benchmark: images/sec at parity (BASELINE.json:2
second metric; round-2 VERDICT item 3).

Times the FULL path the reference's process_document runs
(/root/reference/DocScanner.py:262-365): load -> preprocess (bilateral) ->
localize (Canny + Hough segments + host contour walk) -> perspective warp ->
fused post-warp stages 04-08 -> fetch binary. Wall-clock, nothing excluded:
host contour tracing, homography solves, every device dispatch and the
result fetch all count.

- CPU reference: the same chain composed from cv2 calls (reference math,
  GUI override config). OpenCV 5.0's HoughLinesP returns (N, 4) — the
  composition handles it (the unpatched reference crashes here, CLAUDE.md).
- tpuimage: scan_batch over B in-memory copies (the serving path: one
  batched localize dispatch, grouped batched warps, one fused post-warp
  program).

Usage: python benchmarks/e2e_docscan.py [batch]
Prints per-side images/sec and MP/s plus the speedup ratio.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def load_doc() -> np.ndarray:
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def cpu_e2e_once(rgb: np.ndarray) -> np.ndarray:
    """Reference process_document chain in cv2 (GUI override config:
    scale_long 1200, divide, blur_frac 0.05, block 31, C 3, canny 30/100,
    morph_ksize 1 -> no cleanup)."""
    import cv2

    bgr = rgb[..., ::-1].copy()
    # preprocess (DocScanner.py:39-45)
    gray0 = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    cv2.bilateralFilter(gray0, 9, 75, 75)
    # localize (:76-109)
    edges = cv2.Canny(gray0, 30, 100)
    lines = cv2.HoughLinesP(edges, 1, np.pi / 180, threshold=80,
                            minLineLength=80, maxLineGap=10)
    line_img = np.zeros_like(edges)
    if lines is not None:
        for l in np.asarray(lines).reshape(-1, 4):
            x1, y1, x2, y2 = (int(v) for v in l)
            cv2.line(line_img, (x1, y1), (x2, y2), 255, 2)
    combined = cv2.bitwise_or(edges, line_img)
    contours, _ = cv2.findContours(combined, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    img_area = rgb.shape[0] * rgb.shape[1]
    filtered = [c for c in contours
                if 0.2 <= abs(cv2.contourArea(c)) / max(img_area, 1) <= 0.98]
    quad, max_area = None, 0.0
    for c in (filtered if filtered else contours):
        peri = cv2.arcLength(c, True)
        approx = cv2.approxPolyDP(c, 0.02 * peri, True)
        if len(approx) == 4:
            area = abs(cv2.contourArea(approx))
            if area > max_area:
                max_area, quad = area, approx.reshape(4, 2).astype(np.float32)
    if quad is None and contours:
        quad = cv2.boxPoints(cv2.minAreaRect(
            max(contours, key=cv2.contourArea))).astype(np.float32)
    # order + warp (:48-57, :117-144) or resize fallback
    use_whole = quad is None or (
        abs(cv2.contourArea(quad.reshape(-1, 1, 2))) / max(img_area, 1) < 0.15)
    if not use_whole:
        s = quad.sum(axis=1)
        d = quad[:, 1] - quad[:, 0]
        q = np.stack([quad[np.argmin(s)], quad[np.argmin(d)],
                      quad[np.argmax(s)], quad[np.argmax(d)]])
        tl, tr, br, bl = q
        width = max(int(np.linalg.norm(tr - tl)), int(np.linalg.norm(br - bl)))
        height = max(int(np.linalg.norm(bl - tl)), int(np.linalg.norm(br - tr)))
        if height >= width:
            th, tw = 1200, int(round(1200 / np.sqrt(2.0)))
        else:
            tw, th = 1200, int(round(1200 * np.sqrt(2.0)))
        dst = np.array([[0, 0], [tw - 1, 0], [tw - 1, th - 1], [0, th - 1]],
                       np.float32)
        M = cv2.getPerspectiveTransform(q, dst)
        warped = cv2.warpPerspective(bgr, M, (tw, th))
    else:
        h0, w0 = rgb.shape[:2]
        sc = 1200 / max(h0, w0)
        warped = cv2.resize(bgr, (int(round(w0 * sc)), int(round(h0 * sc))),
                            interpolation=cv2.INTER_AREA) if sc < 1 else bgr
    # post-warp stages 04-08 (:147-259 with the GUI overrides)
    g = cv2.cvtColor(warped, cv2.COLOR_BGR2GRAY)
    h, w = g.shape
    base = max(15, int(round(min(h, w) * 0.05)))
    base += base % 2 == 0
    bg = cv2.GaussianBlur(g, (base, base), 0)
    illum = cv2.normalize(cv2.divide(g, bg, scale=255), None, 0, 255,
                          cv2.NORM_MINMAX)
    stretch = cv2.normalize(illum, None, 0, 255, cv2.NORM_MINMAX)
    bg2 = cv2.GaussianBlur(stretch, (51, 51), 0)
    ink = cv2.normalize(cv2.subtract(bg2, stretch), None, 0, 255,
                        cv2.NORM_MINMAX)
    t, _ = cv2.threshold(ink, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    _, ms = cv2.threshold(ink, max(0, int(round(t - 8))), 255,
                          cv2.THRESH_BINARY)
    kv = cv2.getStructuringElement(cv2.MORPH_RECT, (9, 19))
    bh = cv2.normalize(cv2.morphologyEx(stretch, cv2.MORPH_BLACKHAT, kv),
                       None, 0, 255, cv2.NORM_MINMAX)
    t2, _ = cv2.threshold(bh, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    _, mb = cv2.threshold(bh, max(0, int(round(t2 - 8))), 255,
                          cv2.THRESH_BINARY)
    mask = cv2.dilate(cv2.max(ms, mb),
                      cv2.getStructuringElement(cv2.MORPH_RECT, (2, 2)))
    ab = cv2.adaptiveThreshold(stretch, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                               cv2.THRESH_BINARY, 31, 3)
    wt = ab.copy()
    wt[mask == 0] = 255
    e2 = cv2.Canny(wt, 30, 100)
    hl = cv2.HoughLines(e2, 1, np.pi / 180, 150)
    angle = 0.0
    if hl is not None and len(hl):
        a = (hl.reshape(-1, 2)[:, 1] * 180.0 / np.pi + 90.0) % 180.0 - 90.0
        angle = float(np.median(a))
        if abs(angle) > 10.0:
            angle = 0.0
    Mr = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, 1.0)
    return cv2.warpAffine(wt, Mr, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REPLICATE)


def main():
    rgb = load_doc()
    mp_in = rgb.shape[0] * rgb.shape[1] / 1e6
    inputs = [rgb.copy() for _ in range(BATCH)]

    # --- CPU reference ---
    cpu_e2e_once(rgb)  # warm cv2 thread pool
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        for im in inputs:
            cpu_e2e_once(im)
    cpu_dt = (time.perf_counter() - t0) / (n * BATCH)
    print(f"cpu  e2e {cpu_dt*1e3:8.1f} ms/img  {1.0/cpu_dt:6.2f} img/s  "
          f"{mp_in/cpu_dt:7.1f} MP/s")

    # --- tpuimage scan_batch (serving path) ---
    from tpuimage.pipelines import docscan
    cfg = docscan.GUI_DOCUMENT_CONFIG
    out = docscan.scan_batch(inputs, cfg)  # compile + warm
    assert all("binary" in r for r in out), [r.get("error") for r in out]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        docscan.scan_batch(inputs, cfg)
        best = min(best, time.perf_counter() - t0)
    tpu_dt = best / BATCH
    print(f"tpui e2e {tpu_dt*1e3:8.1f} ms/img  {1.0/tpu_dt:6.2f} img/s  "
          f"{mp_in/tpu_dt:7.1f} MP/s   speedup {cpu_dt/tpu_dt:5.1f}x")

    # --- tpuimage scan_stream (pipelined serving over a batch stream) ---
    # Steady-state serve throughput: host contour/homography work and the
    # next batch's upload overlap the in-flight fused post-warp program.
    n_batches = 6
    stream_in = [[im.copy() for im in inputs] for _ in range(n_batches)]
    for res in docscan.scan_stream(iter(stream_in[:2]), cfg):  # warm
        # identical inputs -> every streamed result must equal the
        # scan_batch result bit for bit (validates the prefetch thread's
        # dispatch interleaving on the real backend, not just on CPU)
        for r in res:
            assert "binary" in r
            np.testing.assert_array_equal(r["binary"], out[0]["binary"])
    best_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _res in docscan.scan_stream(iter(stream_in), cfg):
            pass
        best_s = min(best_s, time.perf_counter() - t0)
    st_dt = best_s / (n_batches * BATCH)
    print(f"tpui stream {st_dt*1e3:5.1f} ms/img  {1.0/st_dt:6.2f} img/s  "
          f"{mp_in/st_dt:7.1f} MP/s   speedup {cpu_dt/st_dt:5.1f}x  "
          f"({n_batches} batches of {BATCH})")

    if "profile" in sys.argv:
        profile_phases(inputs, cfg)


def profile_phases(inputs, cfg):
    """Attribute the per-batch serve cost to the four serving phases (each
    phase forced to completion with a sync so async dispatch doesn't hide
    in a later phase) plus a raw upload probe for the tunnel bandwidth.
    The SUM exceeds the pipelined stream time — this is the attribution
    view, not the schedule."""
    import jax.numpy as jnp
    from tpuimage.pipelines import docscan
    from tpuimage.runtime.profiling import sync

    nb = len(inputs)
    stack = np.stack(inputs)
    mb = stack.nbytes / 1e6
    best_up = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jnp.asarray(stack)
        sync(dev)
        best_up = min(best_up, time.perf_counter() - t0)
        del dev
    print(f"phase upload      {best_up*1e3:7.1f} ms/batch "
          f"({mb:.1f} MB -> {mb/best_up:.0f} MB/s)")

    names = ["load+localize(run)", "locbuf fetch", "host quadfit",
             "warp dispatch+run", "postwarp run", "result fetch+parse"]
    best = [float("inf")] * len(names)
    for _ in range(3):
        t0 = time.perf_counter()
        state = docscan._scan_load_localize(inputs, cfg)
        for buf in state["loc_bufs"].values():
            sync(buf)   # localize program has EXECUTED; buffer on device
        t1 = time.perf_counter()
        # split phase 2 by hand (mirrors _scan_quad_fit's structure)
        host_bufs = {shape: np.asarray(buf)
                     for shape, buf in state["loc_bufs"].items()}
        t2 = time.perf_counter()
        quad_s = 0.0
        for shape, buf in host_bufs.items():
            q0 = time.perf_counter()
            docscan._localize_parse_buf(buf, int(shape[0]), int(shape[1]),
                                        cfg)
            quad_s += time.perf_counter() - q0
        t2b = t2 + quad_s
        docscan._scan_quad_fit(state, cfg, False)   # re-runs parse + warps
        last = [p for p in state["pages"] if p is not None]
        if last:
            sync(last[-1])   # queue is FIFO: one sync drains all warps
        t3 = time.perf_counter() - quad_s - (t2 - t1)  # charge re-runs out
        docscan._scan_postwarp_dispatch(state, cfg, None)
        if state["groups"]:
            sync(state["groups"][-1][5]["buf"])
        t4 = time.perf_counter() - quad_s - (t2 - t1)
        docscan._scan_fetch(state)
        t5 = time.perf_counter() - quad_s - (t2 - t1)
        for i, d in enumerate(np.diff([t0, t1, t2, t2b, t3, t4, t5])):
            best[i] = min(best[i], d)
    for nm, d in zip(names, best):
        print(f"phase {nm:23s} {d*1e3:7.1f} ms/batch ({d/nb*1e3:5.1f} ms/img)")


if __name__ == "__main__":
    main()
