"""TPU-worker watchdog: probe until the axon worker answers, then run the
full round-3/4 hardware measurement battery automatically.

Context: the worker has been unreachable for most of rounds 3-4 (CLAUDE.md
"Pending hardware measurements"); every interpret-verified lever is
waiting on one live-chip session. This script exists so the measurements
are captured the moment the worker recovers, even unattended.

Probe design: `jax.devices()` itself HANGS inside sitecustomize's device
claim while the worker is down (observed 13+ h), so each probe is a
SUBPROCESS in its OWN SESSION with a hard timeout and file-redirected
output — the parent never touches jax, never reads a pipe (a hung child
holding a pipe is exactly how the round-3 watchdog wedged silently for
78 min: capture_output=True + TimeoutExpired blocks in communicate()),
and kills the whole process group so no claim thread/grandchild lingers.

On success it runs, in order, each as its own process-group subprocess
(the worker can crash mid-battery; partial output is still captured):
  1. benchmarks/r3_battery.py            (all sections, incremental prints)
  2. benchmarks/hw_check_kernels.py rank pack2 blackhat inkmask fusedpre
  3. python bench.py
  4. benchmarks/e2e_docscan.py 8  and  32
  5. benchmarks/micro_classify.py
Everything lands in --outdir (default /tmp/hw_battery), one log per step
plus watchdog.log; a DONE marker file is written when the battery
completes. Flipping production defaults on the winners stays a HUMAN
step (see CLAUDE.md runbook) — this script only measures.

Usage: python benchmarks/hw_watchdog.py [--interval 600] [--outdir DIR]
By default it runs FOREVER (round-3 lesson: an 11 h self-deadline died
before a 13+ h outage ended); pass --max-hours > 0 to bound it.
Touch <outdir>/PAUSE to quiesce (pytest / benchmarking on this 1-core
host), remove it to resume. Touch <outdir>/STOP to exit cleanly.
"""
from __future__ import annotations

import argparse
import datetime
import os
import signal
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

# Default battery for a cold round. The full default r3_battery section
# list, hwcheck parity sweep, e2e8 and classify all completed on hardware
# 2026-08-19 (logs /tmp/hw_battery, /tmp/hw_battery2/battery.log); what
# remains unmeasured is the stagescale batch-32 attribution, plus cheap
# re-confirms of the headline and the b32 serve number.
STEPS = [
    ("chunkscale", [sys.executable, "benchmarks/r3_battery.py",
                    "chunkscale"], 3600),
    ("votex", [sys.executable, "benchmarks/r3_battery.py", "votex"], 4800),
    ("landnf", [sys.executable, "benchmarks/r3_battery.py", "landnf"], 3600),
    ("bench1", [sys.executable, "bench.py"], 2400),
    ("bench2", [sys.executable, "bench.py"], 2400),
    ("bench3", [sys.executable, "bench.py"], 2400),
    ("e2e32", [sys.executable, "benchmarks/e2e_docscan.py", "32"], 2400),
]


def log(outdir: str, msg: str) -> None:
    line = f"{datetime.datetime.now().isoformat(timespec='seconds')} {msg}"
    print(line, flush=True)
    with open(os.path.join(outdir, "watchdog.log"), "a") as f:
        f.write(line + "\n")


def _run_pgroup(cmd: list, out_path: str, timeout: int) -> int:
    """Run cmd in its own session, stdout+stderr to a file (never a pipe),
    SIGKILL the whole process group on timeout. Returns exit code (-9 on
    timeout kill)."""
    with open(out_path, "a") as f:
        p = subprocess.Popen(cmd, cwd=REPO, stdout=f,
                             stderr=subprocess.STDOUT,
                             start_new_session=True)
        try:
            return p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pass
            return -9


def probe(outdir: str, timeout: int = 570) -> bool:
    out_path = os.path.join(outdir, "probe_last.log")
    try:
        os.remove(out_path)
    except FileNotFoundError:
        pass
    log(outdir, f"probe start (timeout {timeout}s)")
    rc = _run_pgroup([sys.executable, "-c", PROBE_SRC], out_path, timeout)
    if rc == -9:
        log(outdir, f"probe TIMEOUT after {timeout}s (claim hang)")
        return False
    try:
        with open(out_path) as f:
            txt = f.read()
    except OSError:
        txt = ""
    ok = rc == 0 and "PROBE_OK" in txt
    tail = txt.strip().splitlines()[-1:] or [""]
    log(outdir, f"probe {'OK' if ok else 'FAIL'} rc={rc}: {tail[0][:200]}")
    return ok


def run_step(outdir: str, name: str, cmd: list, timeout: int) -> int:
    path = os.path.join(outdir, f"{name}.log")
    log(outdir, f"step {name}: {' '.join(cmd[1:])}")
    rc = _run_pgroup(cmd, path, timeout)
    log(outdir, f"step {name}: exit={rc} -> {path}")
    return rc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=int, default=600,
                    help="seconds between probes while the worker is down")
    ap.add_argument("--outdir", default="/tmp/hw_battery")
    ap.add_argument("--max-hours", type=float, default=0.0,
                    help="<=0 (default) runs forever")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    deadline = (time.time() + args.max_hours * 3600
                if args.max_hours > 0 else float("inf"))
    log(args.outdir, f"watchdog started (pid {os.getpid()}, "
                     f"interval {args.interval}s, "
                     f"{'no deadline' if deadline == float('inf') else 'deadline set'})")
    pause_marker = os.path.join(args.outdir, "PAUSE")
    stop_marker = os.path.join(args.outdir, "STOP")
    done_marker = os.path.join(args.outdir, "DONE")
    while time.time() < deadline:
        try:
            if os.path.exists(stop_marker):
                log(args.outdir, "STOP marker found; exiting")
                return
            if os.path.exists(pause_marker):
                # host-quiesce window (pytest mesh suite / benchmarking on
                # this one-core box): skip the probe subprocess entirely
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
                    with open(done_marker, "w") as f:
                        f.write(datetime.datetime.now().isoformat())
                    return
            time.sleep(args.interval)
        except Exception as e:  # never die silently — log and keep probing
            log(args.outdir, f"watchdog loop EXCEPTION: {e!r}")
            time.sleep(args.interval)
    log(args.outdir, "deadline reached; worker never recovered")


if __name__ == "__main__":
    main()
