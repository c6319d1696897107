"""Phase breakdown of the scan_batch serving path on the real device.

Each phase is bounded by a scalar fetch (block_until_ready is not a sync
on the axon backend). Usage: python benchmarks/e2e_phases.py [batch]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def sync(x):
    return int(np.asarray(x.astype(jnp.int32).reshape(-1)[0]))


def main():
    from PIL import Image
    from tpuimage.pipelines import docscan
    from tpuimage.ops import geometry

    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    cfg = docscan.GUI_DOCUMENT_CONFIG
    inputs = [rgb.copy() for _ in range(BATCH)]

    # full warm-up (compiles every program)
    out = docscan.scan_batch(inputs, cfg)
    assert all("binary" in r for r in out)

    for trial in range(2):
        t = {}
        t0 = time.perf_counter()
        stack = np.stack(inputs)
        stack_dev = jnp.asarray(stack)
        sync(stack_dev)
        t["upload"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        buf_d = docscan._localize_device_batch_packed(
            stack_dev, cfg.canny_low, cfg.canny_high)
        sync(buf_d)
        t["localize_dev"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        buf = np.asarray(buf_d)
        t["edge_fetch"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        h0, w0 = rgb.shape[:2]
        ne = h0 * (-(-w0 // 8))
        edges_b = docscan._unpack_bits_host(
            buf[:, :ne].reshape(BATCH, h0, -1), w0)
        n_segs = (buf.shape[1] - ne) // 17
        segs_b = buf[:, ne:ne + n_segs * 16].copy().view(np.float32
                                                         ).reshape(BATCH, n_segs, 4)
        ok_b = buf[:, ne + n_segs * 16:].astype(bool)
        quads = [docscan._quad_from_localize(edges_b[i], segs_b[i], ok_b[i],
                                             rgb.shape[:2], cfg)
                 for i in range(BATCH)]
        t["host_quads"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        th, tw = docscan._warp_target_size(quads[0], cfg.page, cfg.scale_long)
        dst = np.array([[0, 0], [tw - 1, 0], [tw - 1, th - 1], [0, th - 1]],
                       np.float32)
        minvs = np.stack([np.linalg.inv(geometry.get_perspective_transform(
            q.astype(np.float32), dst)) for q in quads])
        t["host_homography"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        warped = geometry.warp_perspective_batch(
            stack_dev, jnp.asarray(minvs, jnp.float32), th, tw)
        sync(warped)
        t["warp_dev"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        post = docscan.docscan_post_warp_batch_serve(warped, cfg)
        sync(post["buf"])
        t["postwarp_dev"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        pbuf = np.asarray(post["buf"])
        angles = pbuf[:4 * BATCH].copy().view(np.float32)
        clean = docscan._unpack_bits_host(
            pbuf[5 * BATCH:].reshape(BATCH, th, -1), tw)
        t["clean_fetch"] = time.perf_counter() - t0

        total = sum(t.values())
        if trial:
            for k, v in t.items():
                print(f"{k:16s} {v*1e3:8.1f} ms")
            print(f"{'TOTAL':16s} {total*1e3:8.1f} ms   "
                  f"{total/BATCH*1e3:6.1f} ms/img")
        assert clean.shape[0] == BATCH and angles.shape[0] == BATCH


if __name__ == "__main__":
    main()
