"""Tracing / profiling / observability (SURVEY.md §5 first bullet).

The reference has none (its only progress signal is a Tk progressbar and
tqdm); here every pipeline can be wrapped with jax.profiler trace
annotations, and `Throughput` provides per-stage wall-clock and MP/s
counters with correct device synchronization on backends where
``block_until_ready`` is unreliable (the tunneled axon PJRT).
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Dict, Optional

import jax

log = logging.getLogger("tpuimage")


def sync(tree) -> None:
    """Force completion of a device computation by fetching one scalar
    (block_until_ready returns early on the tunneled axon backend).
    Indexes on-device first so only one element crosses the link."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[0]
        if hasattr(leaf, "reshape"):
            leaf = leaf.reshape(-1)[0]
        jax.device_get(leaf)


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler.TraceAnnotation wrapper (no-op if profiling is off)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Throughput:
    """Per-stage wall-clock + megapixels/sec counters.

    >>> tp = Throughput()
    >>> with tp.stage("docscan", megapixels=8.15):
    ...     out = fused(batch); sync(out)
    >>> tp.report()
    """

    def __init__(self):
        self.stages: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, megapixels: Optional[float] = None,
              images: Optional[int] = None):
        t0 = time.perf_counter()
        with trace_annotation(name):
            yield
        dt = time.perf_counter() - t0
        rec = self.stages.setdefault(
            name, {"calls": 0, "seconds": 0.0, "megapixels": 0.0, "images": 0})
        rec["calls"] += 1
        rec["seconds"] += dt
        if megapixels:
            rec["megapixels"] += megapixels
        if images:
            rec["images"] += images

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, r in self.stages.items():
            row = dict(r)
            if r["seconds"] > 0:
                if r["megapixels"]:
                    row["mp_per_s"] = r["megapixels"] / r["seconds"]
                if r["images"]:
                    row["images_per_s"] = r["images"] / r["seconds"]
            out[name] = row
            log.info("stage %s: %s", name, json.dumps(row))
        return out


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
