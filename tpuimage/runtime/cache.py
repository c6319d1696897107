"""Persistent XLA compilation cache for serving.

First compiles over the tunneled TPU backend cost 20-60 s per program
(CLAUDE.md); jax's persistent compilation cache makes every later
PROCESS reuse them from disk. Opt-in: CLIs call
:func:`maybe_enable_compile_cache`, which activates only when the
``TPUIMAGE_XLA_CACHE`` env var is set (to a directory path, or to ``1``
for the default ``~/.cache/tpuimage-xla``) — cache writes are a
behavior change, so the library never turns it on silently.
"""
from __future__ import annotations

import os
from typing import Optional


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Point jax's persistent compilation cache at ``cache_dir`` (created
    if missing) and lower the min-compile-time gate so the big pipeline
    programs qualify. Must run before the first jit compilation."""
    import jax

    cache_dir = cache_dir or os.path.expanduser("~/.cache/tpuimage-xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def maybe_enable_compile_cache() -> Optional[str]:
    """Honor ``TPUIMAGE_XLA_CACHE`` (unset/empty/0 = off; 1 = default
    location; anything else = explicit directory)."""
    val = os.environ.get("TPUIMAGE_XLA_CACHE", "")
    if val in ("", "0"):
        return None
    return enable_compile_cache(None if val == "1" else val)
