"""LUT application without per-pixel gathers (TPU-native).

Per-pixel table lookups (sRGB gamma, Lab cube-root, CLAHE tile LUTs,
equalizeHist CDFs) are gathers — measured ~25-30 ms per megapixel-image on
this TPU, and they dominate the colorspace/histogram pipelines. This module
reformulates a lookup as hi/lo one-hot contractions on the MXU:

    idx = hi*64 + lo
    val = onehot_hi(idx) @ T2d  then row-dot with onehot_lo(idx)

with float32 HIGHEST-precision contractions, which select (not blend)
exact table values, so results are bit-identical to the gather.
~0.5-6 GMACs per megapixel depending on table size — fractions of a ms.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_LO = 64


_CHUNK = 65536


def lut_lookup(table: jnp.ndarray, idx: jnp.ndarray,
               impl: str = "auto") -> jnp.ndarray:
    """table: (N,) numeric; idx: any-shape int in [0, N). Returns
    table[idx] with the same shape as idx, computed via one-hot
    contractions (exact). Pixels are processed in 64k chunks to bound the
    one-hot working set (a megapixel x 48-row one-hot would be ~200 MB).

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
    total = v.shape[0]
    cpad = (-total) % _CHUNK
    vp = jnp.pad(v, (0, cpad)).reshape(-1, _CHUNK)

    def one_chunk(chunk):
        hi = chunk // _LO
        lo = chunk % _LO
        oh_hi = (hi[:, None] == hi_iota[None, :]).astype(jnp.float32)
        rows = jnp.matmul(oh_hi, t2d, precision=lax.Precision.HIGHEST)
        oh_lo = (lo[:, None] == lo_iota[None, :]).astype(jnp.float32)
        return jnp.sum(rows * oh_lo, axis=-1)

    out = lax.map(one_chunk, vp).reshape(-1)[:total]
    return out.reshape(shape).astype(table.dtype)


def lut_lookup_u8(table256: jnp.ndarray, values_u8: jnp.ndarray) -> jnp.ndarray:
    """table256[values] for uint8 values (the cv2.LUT pattern)."""
    return lut_lookup(table256, values_u8.astype(jnp.int32))
