"""Device mesh, sharding rules, and halo exchange — the scale-out layer.

The reference has no parallelism at all (SURVEY.md §2.3): its batch loop is
a serial Python ``for`` (Landscape.py:227) and its only concurrency is a Tk
worker thread. This module is the TPU-native replacement: data parallelism
over the batch dim via ``jax.sharding`` (collectives ride ICI), and spatial
parallelism (the image-processing analog of context/sequence parallelism)
for single images too large for one chip — H-axis sharding with
``ppermute`` halo exchange so stencil ops stay local.

No NCCL/MPI analog is needed: meshes + XLA collectives ARE the
communication backend on TPU (SURVEY.md §5 last bullet).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a Mesh over the first n available devices.

    1-axis default ("data",) for DP; pass axis_names=("data", "space") and
    a shape like (2, 4) for combined batch+spatial sharding.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NamedSharding that splits the leading (batch) dim across ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Place an NHWC (or N...) batch with the batch dim split over the mesh."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad the batch dim up to a multiple (jit/sharding need static shapes).
    Returns (padded, real_count)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n


def run_data_parallel(fn: Callable, images: np.ndarray,
                      mesh: Optional[Mesh] = None) -> np.ndarray:
    """Run a per-image jitted fn over a uint8 NHWC batch, DP-sharded.

    The replacement for the reference's serial batch loop: one jit of
    vmap(fn) with the batch dim split across the mesh; XLA partitions
    everything else automatically (no collectives needed for image-wise
    independent work — pure scale-out).
    """
    mesh = mesh or make_mesh()
    ndev = int(np.prod(list(mesh.shape.values())))
    padded, n = pad_to_multiple(np.asarray(images), ndev)
    x = shard_batch(jnp.asarray(padded), mesh)
    out = jax.jit(jax.vmap(fn))(x)
    return jax.tree_util.tree_map(lambda a: np.asarray(a)[:n], out)


# ---------------------------------------------------------------------------
# spatial sharding with halo exchange (context-parallel analog)
# ---------------------------------------------------------------------------

def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a local H-shard with ``halo`` rows from each neighbor shard.

    Inside shard_map: each device sends its top rows up and bottom rows
    down via two ``ppermute`` rings (ICI neighbor traffic only — the
    idiomatic TPU halo). Outer boundaries get zero rows (callers handle
    real border semantics by padding the global image first).
    """
    if halo == 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    top = x[:halo]
    bot = x[-halo:]
    # neighbor above receives my top rows; neighbor below my bottom rows
    from_below = lax.ppermute(top, axis_name,
                              [(i, i - 1) for i in range(1, n)])
    from_above = lax.ppermute(bot, axis_name,
                              [(i, i + 1) for i in range(n - 1)])
    zero = jnp.zeros_like(top)
    upper = jnp.where(idx > 0, from_above, zero)
    lower = jnp.where(idx < n - 1, from_below, zero)
    return jnp.concatenate([upper, x, lower], axis=0)


def spatial_map(fn: Callable, img: jnp.ndarray, mesh: Mesh, halo: int,
                axis: str = "space") -> jnp.ndarray:
    """Apply a stencil fn(local_with_halo) -> local_with_halo to an image
    H-sharded across ``axis``; fn's output is cropped back by ``halo``.

    fn must be shape-preserving and use only radius<=halo neighborhoods
    (e.g. a fused blur/morphology chain). The global image H must divide
    by the axis size.
    """
    def local(x):
        xh = halo_exchange(x, halo, axis)
        y = fn(xh)
        return y[halo:-halo] if halo else y

    spec = P(axis, *([None] * (img.ndim - 1)))
    mapped = jax.shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return mapped(img)
