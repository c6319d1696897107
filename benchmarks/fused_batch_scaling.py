"""Precise fused-docscan throughput at several batch sizes.

Tunnel RTT (~30 ms) and its variance swamp per-dispatch timings, so the
program is repeated N times INSIDE one jit with a data dependency chained
through each iteration (a one-pixel perturbation derived from the previous
output — prevents CSE, keeps the workload identical), and one scalar comes
back per dispatch: per-iter time = (t_dispatch - rtt) / N.

Usage: python benchmarks/fused_batch_scaling.py [reps] [batches...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BATCHES = [int(x) for x in sys.argv[2:]] or [8, 16, 32]
ROUNDS = 3


def _load_page() -> np.ndarray:
    from PIL import Image
    with Image.open("/root/reference/public/DIP test/document1.jpeg") as im:
        return np.asarray(im.convert("RGB").resize((849, 1200), Image.BILINEAR),
                          dtype=np.uint8)


def main():
    from tpuimage.pipelines import docscan
    cfg = docscan.GUI_DOCUMENT_CONFIG
    page = _load_page()

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0, 0])

    for batch_n in BATCHES:
        batch = jnp.asarray(np.broadcast_to(page, (batch_n,) + page.shape).copy())
        mp = batch_n * page.shape[0] * page.shape[1] / 1e6

        @jax.jit
        def chained(b):
            def body(i, carry):
                b_, acc = carry
                clean = docscan.docscan_post_warp_batch(b_, cfg)["clean"]
                # full-sum token + all-batch perturbation: a sampled token
                # lets XLA slice away elementwise tails, and perturbing one
                # element lets it hoist the others' loop-invariant work
                tok = clean.astype(jnp.int32).sum()
                b_next = b_.at[:, 0, 0, 0].set((tok % 251).astype(jnp.uint8))
                return b_next, acc + tok
            _, acc = lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))
            return acc

        int(np.asarray(triv(batch)))
        t0 = time.perf_counter()
        for _ in range(5):
            int(np.asarray(triv(batch)))
        rtt = (time.perf_counter() - t0) / 5

        int(np.asarray(chained(batch)))  # compile + warm
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            int(np.asarray(chained(batch)))
            best = min(best, time.perf_counter() - t0)
        per_iter = (best - rtt) / REPS
        print(f"batch {batch_n:3d}: {per_iter*1e3:7.2f} ms/iter  "
              f"{mp/per_iter:7.1f} MP/s  (rtt {rtt*1e3:.1f} ms, reps {REPS})",
              flush=True)


if __name__ == "__main__":
    main()
