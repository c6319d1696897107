"""Device-health fail-fast for serving.

The tunneled TPU backend here has worker outages during which the very
first device claim (``jax.devices()``) blocks forever — ``import jax``
and interpreter startup stay fine (measured; see CLAUDE.md). A serving
process should fail loudly with a diagnosis instead of hanging, so the
claim runs in a daemon thread with a deadline (the thread cannot be
cancelled, but the process can exit or fall back).
"""
from __future__ import annotations

import threading
from typing import Optional

_claim_ok = threading.Event()
_claim_started = False
_claim_lock = threading.Lock()


def _start_claim() -> None:
    global _claim_started
    with _claim_lock:
        if _claim_started:
            return
        _claim_started = True

    def claim():
        import jax
        jax.devices()
        _claim_ok.set()

    threading.Thread(target=claim, daemon=True, name="tpuimage-device-claim"
                     ).start()


def device_available(timeout_s: float = 120.0) -> bool:
    """True once the default jax backend's devices are claimable; False if
    the claim has not completed within ``timeout_s`` (worker outage or a
    very slow tunnel). Safe to call repeatedly — one claim thread total."""
    _start_claim()
    return _claim_ok.wait(timeout_s)


def require_device(timeout_s: float = 600.0,
                   what: Optional[str] = None) -> None:
    """Raise RuntimeError if the device claim does not complete within
    ``timeout_s``. Call before the first jit dispatch on paths that must
    not hang (CLIs, serving loops)."""
    if not device_available(timeout_s):
        raise RuntimeError(
            f"jax device claim did not complete within {timeout_s:.0f}s"
            + (f" (needed for {what})" if what else "")
            + " — the TPU worker is likely down (its claim hangs during"
            " outages; import succeeds). Retry later or run on CPU with"
            " JAX_PLATFORMS=cpu / jax.config.update('jax_platforms','cpu').")
