"""LUT application without per-pixel gathers (TPU-native).

Per-pixel table lookups (sRGB gamma, Lab cube-root, CLAHE tile LUTs,
equalizeHist CDFs) are gathers — measured ~25-30 ms per megapixel-image on
this TPU, and they dominate the colorspace/histogram pipelines. This module
reformulates a lookup as hi/lo one-hot contractions on the MXU:

    idx = hi*64 + lo
    val = onehot_hi(idx) @ T2d  then row-dot with onehot_lo(idx)

with float32 HIGHEST-precision contractions, which select (not blend)
exact table values, so results are bit-identical to the gather.

The lookup is one flat op over all pixels: XLA fuses the iota-compare
one-hot construction into the matmul's tiles, so the (pixels, n_hi)
indicator never materializes to HBM. An earlier version processed pixels
in 64k lax.map chunks to bound a feared one-hot working set — measured
3.2x SLOWER on v5e (0.73 vs 0.23 ms for 2.2 MP of 4.4k-entry lookups):
the chunk loop blocks exactly that fusion.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_LO = 64


def lut_lookup(table: jnp.ndarray, idx: jnp.ndarray,
               impl: str = "auto") -> jnp.ndarray:
    """table: (N,) numeric; idx: any-shape int in [0, N). Returns
    table[idx] with the same shape as idx, computed via one-hot
    contractions (exact).

    impl: "auto" picks gather on CPU / one-hot MXU contraction elsewhere;
    "gather" / "mxu" force a path (tests assert both agree on CPU)."""
    import jax
    if impl == "auto":
        impl = "gather" if jax.default_backend() == "cpu" else "mxu"
    if impl == "gather":
        # gathers are cheap on CPU (and the one-hot contraction is not) —
        # both paths select exact table values, results are identical
        return table[jnp.clip(idx.astype(jnp.int32), 0, table.shape[0] - 1)]
    n = int(table.shape[0])
    n_hi = (n + _LO - 1) // _LO
    pad = n_hi * _LO - n
    t2d = jnp.pad(table.astype(jnp.float32), (0, pad)).reshape(n_hi, _LO)
    hi_iota = jnp.arange(n_hi, dtype=jnp.int32)
    lo_iota = jnp.arange(_LO, dtype=jnp.int32)

    shape = idx.shape
    v = idx.reshape(-1).astype(jnp.int32)
    hi = v // _LO
    lo = v % _LO

    # The row-select matmul does P x n MACs — selection by dense
    # contraction inherently costs table-size MACs per pixel. (A bf16
    # byte-split of integer tables — 2-3 bf16 matmuls replacing this one
    # f32-HIGHEST matmul — measured 1.8x SLOWER end-to-end on v5e, night
    # pipeline 51 vs 29 ms at batch 8: the extra matmuls re-stage the
    # one-hot operand and break its construction fusion. f32 stays.)
    oh_hi = (hi[:, None] == hi_iota[None, :]).astype(jnp.float32)
    rows = jnp.matmul(oh_hi, t2d, precision=lax.Precision.HIGHEST)
    oh_lo = (lo[:, None] == lo_iota[None, :]).astype(jnp.float32)
    out = jnp.sum(rows * oh_lo, axis=-1)
    return out.reshape(shape).astype(table.dtype)


def lut_lookup_u8(table256: jnp.ndarray, values_u8: jnp.ndarray) -> jnp.ndarray:
    """table256[values] for uint8 values (the cv2.LUT pattern)."""
    return lut_lookup(table256, values_u8.astype(jnp.int32))
