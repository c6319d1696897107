"""Warp gather variants on the real device (chained-rep timing).

v0: current production — RGB packed into u32, 4 single-element gathers.
v1: per-channel 2x2-neighborhood pack (c[y,x] | c[y,x+1]<<8 | c[y+1,x]<<16
    | c[y+1,x+1]<<24) — 3 gathers per output pixel total, one per channel.
v2: row gather from the (h*w, 3) u8 layout (the pre-round-3 form).

All three produce identical u8 outputs (channel values are exact integers
in every packing; the f32 blend is the same expression).

Usage: python benchmarks/micro_warp.py [batch]
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
SRC_H, SRC_W = 478, 672
TH, TW = 1200, 849


def f32(x):
    return x.astype(jnp.float32)


def saturate_u8(x):
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def make_maps(A):
    ys, xs = jnp.meshgrid(jnp.arange(TH, dtype=jnp.float32),
                          jnp.arange(TW, dtype=jnp.float32), indexing="ij")
    denom = A[2, 0] * xs + A[2, 1] * ys + A[2, 2]
    denom = jnp.where(denom != 0, denom, 1e-20)
    sx = (A[0, 0] * xs + A[0, 1] * ys + A[0, 2]) / denom
    sy = (A[1, 0] * xs + A[1, 1] * ys + A[1, 2]) / denom
    return sx, sy


def blend(taps, fx, fy):
    t00, t01, t10, t11 = taps
    return (t00 * ((1 - fy) * (1 - fx))[..., None]
            + t01 * ((1 - fy) * fx)[..., None]
            + t10 * (fy * (1 - fx))[..., None]
            + t11 * (fy * fx)[..., None])


def mask4(yi, xi, h, w):
    return (((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
            .astype(jnp.float32)[..., None])


def warp_v0(img, A):
    h, w = img.shape[:2]
    sx, sy = make_maps(A)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    fl = img.reshape(h * w, 3).astype(jnp.uint32)
    packed = fl[:, 0] | (fl[:, 1] << 8) | (fl[:, 2] << 16)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h - 1); xc = jnp.clip(xi, 0, w - 1)
        v = jnp.take(packed, yc * w + xc, axis=0)
        v3 = f32(jnp.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], -1))
        return v3 * mask4(yi, xi, h, w)

    taps = (tap(y0i, x0i), tap(y0i, x0i + 1),
            tap(y0i + 1, x0i), tap(y0i + 1, x0i + 1))
    return saturate_u8(blend(taps, fx, fy))


def warp_v1(img, A):
    h, w = img.shape[:2]
    sx, sy = make_maps(A)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    # per-channel 2x2 pack over a zero-padded source: Q[y,x] holds the 4
    # u8 neighbours of base (y-1, x-1), so a base coordinate of -1 (left/
    # top edge taps) reads the zero guard instead of a wrong neighbour
    P = jnp.pad(img.astype(jnp.uint32), ((1, 1), (1, 1), (0, 0)))
    q = (P[:-1, :-1] | (P[:-1, 1:] << 8)
         | (P[1:, :-1] << 16) | (P[1:, 1:] << 24))    # (h+1, w+1, 3)
    qf = q.reshape((h + 1) * (w + 1), 3)
    yc = jnp.clip(y0i, -1, h - 1) + 1
    xc = jnp.clip(x0i, -1, w - 1) + 1
    idx = yc * (w + 1) + xc
    taps = []
    vals = [jnp.take(qf[:, ch], idx, axis=0) for ch in range(3)]
    t00 = f32(jnp.stack([v & 0xFF for v in vals], -1))
    t01 = f32(jnp.stack([(v >> 8) & 0xFF for v in vals], -1))
    t10 = f32(jnp.stack([(v >> 16) & 0xFF for v in vals], -1))
    t11 = f32(jnp.stack([(v >> 24) & 0xFF for v in vals], -1))
    # border masks: the pack's edge-pad means clipped reads replicate,
    # but out-of-image taps must still zero (constant border)
    t00 = t00 * mask4(y0i, x0i, h, w)
    t01 = t01 * mask4(y0i, x0i + 1, h, w)
    t10 = t10 * mask4(y0i + 1, x0i, h, w)
    t11 = t11 * mask4(y0i + 1, x0i + 1, h, w)
    return saturate_u8(blend((t00, t01, t10, t11), fx, fy))


def warp_v2(img, A):
    h, w = img.shape[:2]
    sx, sy = make_maps(A)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    fl = img.reshape(h * w, 3)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h - 1); xc = jnp.clip(xi, 0, w - 1)
        return f32(jnp.take(fl, yc * w + xc, axis=0)) * mask4(yi, xi, h, w)

    taps = (tap(y0i, x0i), tap(y0i, x0i + 1),
            tap(y0i + 1, x0i), tap(y0i + 1, x0i + 1))
    return saturate_u8(blend(taps, fx, fy))


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (BATCH, SRC_H, SRC_W, 3),
                                    dtype=np.uint8))
    # a mild document homography (inverse map target->source)
    quad = np.array([[40, 30], [630, 55], [610, 450], [25, 440]], np.float32)
    dst = np.array([[0, 0], [TW - 1, 0], [TW - 1, TH - 1], [0, TH - 1]],
                   np.float32)
    import cv2
    Minv = np.linalg.inv(cv2.getPerspectiveTransform(quad, dst))
    A = jnp.asarray(np.broadcast_to(Minv, (BATCH, 3, 3)).copy(), jnp.float32)

    fns = {"v0_u32rgb": warp_v0, "v1_2x2pack": warp_v1, "v2_rowgather": warp_v2}
    outs = {}
    for name, fn in fns.items():
        out = jax.jit(jax.vmap(fn))(imgs, A)
        outs[name] = np.asarray(out[0])
    for name in ("v1_2x2pack", "v2_rowgather"):
        same = np.array_equal(outs["v0_u32rgb"], outs[name])
        print(f"{name} identical to v0: {same}")

    triv = jax.jit(lambda b: b.astype(jnp.int32)[0, 0, 0, 0])
    int(np.asarray(triv(imgs)))
    t0 = time.perf_counter()
    for _ in range(5):
        int(np.asarray(triv(imgs)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms")

    for name, fn in fns.items():
        @jax.jit
        def chained(b, fn=fn):
            def body(i, carry):
                b_, acc = carry
                out = jax.vmap(fn)(b_, A)
                tok = out.astype(jnp.int32).sum()
                return (b_.at[:, 0, 0, :].set((tok % 251).astype(jnp.uint8)),
                        acc + tok)
            return lax.fori_loop(0, REPS, body, (b, jnp.int32(0)))[1]
        int(np.asarray(chained(imgs)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(chained(imgs)))
            best = min(best, time.perf_counter() - t0)
        dt = (best - rtt) / REPS
        print(f"{name:14s} {dt*1e3:7.2f} ms/warp-batch")


if __name__ == "__main__":
    main()
