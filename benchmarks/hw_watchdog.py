"""TPU-worker watchdog: probe until the axon worker answers, then run the
full round-3 hardware measurement battery automatically.

Context: the worker has been unreachable for most of round 3 (CLAUDE.md
"Pending hardware measurements"); every interpret-verified lever is
waiting on one live-chip session. This script exists so the measurements
are captured the moment the worker recovers, even unattended.

Probe design: `jax.devices()` itself HANGS inside sitecustomize's device
claim while the worker is down (observed 13+ h), so each probe is a
SUBPROCESS with a hard timeout — the parent never touches jax. A probe
passes only when a trivial jitted reduction round-trips a value.

On success it runs, in order, each as its own subprocess (the worker can
crash mid-battery; partial output is still captured):
  1. benchmarks/r3_battery.py            (all sections, incremental prints)
  2. benchmarks/hw_check_kernels.py rank pack2 blackhat inkmask fusedpre
  3. python bench.py
  4. benchmarks/e2e_docscan.py 8  and  32
  5. benchmarks/micro_classify.py
Everything lands in --outdir (default /tmp/hw_battery), one log per step
plus watchdog.log. Flipping production defaults on the winners stays a
HUMAN step (see CLAUDE.md runbook) — this script only measures.

Usage: python benchmarks/hw_watchdog.py [--interval 600] [--outdir DIR]
"""
from __future__ import annotations

import argparse
import datetime
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE_SRC = """
import time, sys
t0 = time.time()
import jax
d = jax.devices()
import jax.numpy as jnp
v = float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((8, 8))))
print(f"PROBE_OK {v} {time.time()-t0:.1f}s {d}", flush=True)
"""

STEPS = [
    ("battery", [sys.executable, "benchmarks/r3_battery.py"], 5400),
    ("hwcheck", [sys.executable, "benchmarks/hw_check_kernels.py",
                 "rank", "pack2", "blackhat", "inkmask", "fusedpre",
                 "morphseq"], 3600),
    ("bench", [sys.executable, "bench.py"], 2400),
    ("e2e8", [sys.executable, "benchmarks/e2e_docscan.py", "8"], 2400),
    ("e2e32", [sys.executable, "benchmarks/e2e_docscan.py", "32"], 2400),
    ("classify", [sys.executable, "benchmarks/micro_classify.py"], 2400),
]


def log(outdir: str, msg: str) -> None:
    line = f"{datetime.datetime.now().isoformat(timespec='seconds')} {msg}"
    print(line, flush=True)
    with open(os.path.join(outdir, "watchdog.log"), "a") as f:
        f.write(line + "\n")


def probe(outdir: str, timeout: int = 570) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_SRC], cwd=REPO,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        log(outdir, f"probe TIMEOUT after {timeout}s (claim hang)")
        return False
    ok = r.returncode == 0 and "PROBE_OK" in r.stdout
    tail = (r.stdout + r.stderr).strip().splitlines()[-1:] or [""]
    log(outdir, f"probe {'OK' if ok else 'FAIL'}: {tail[0][:200]}")
    return ok


def run_step(outdir: str, name: str, cmd: list, timeout: int) -> int:
    path = os.path.join(outdir, f"{name}.log")
    log(outdir, f"step {name}: {' '.join(cmd[1:])}")
    with open(path, "w") as f:
        try:
            r = subprocess.run(cmd, cwd=REPO, stdout=f,
                               stderr=subprocess.STDOUT, timeout=timeout)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = -9
    log(outdir, f"step {name}: exit={rc} -> {path}")
    return rc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=int, default=600,
                    help="seconds between probes while the worker is down")
    ap.add_argument("--outdir", default="/tmp/hw_battery")
    ap.add_argument("--max-hours", type=float, default=11.0)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    deadline = time.time() + args.max_hours * 3600
    log(args.outdir, "watchdog started")
    pause_marker = os.path.join(args.outdir, "PAUSE")
    while time.time() < deadline:
        if os.path.exists(pause_marker):
            # host-quiesce window (pytest mesh suite / benchmarking on this
            # one-core box): skip the probe subprocess entirely
            time.sleep(60)
            continue
        if probe(args.outdir):
            log(args.outdir, "worker UP — running battery")
            for name, cmd, to in STEPS:
                run_step(args.outdir, name, cmd, to)
                if not probe(args.outdir, timeout=300):
                    log(args.outdir, "worker dropped mid-battery; "
                                     "resuming probe loop")
                    break
            else:
                log(args.outdir, "battery COMPLETE")
                return
        time.sleep(args.interval)
    log(args.outdir, "deadline reached; worker never recovered")


if __name__ == "__main__":
    main()
