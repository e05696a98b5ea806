"""Timestamped TPU-tunnel health probe (VERDICT r2 item 1).

Two stages, cheapest first:

1. TCP connect to the axon relay ports on 127.0.0.1 (:8083 carries
   jax.devices(), :8082 the stateful session — see
   /root/.axon_site/axon/register/pjrt.py:187-188).  No TPU client is
   created, so a dead tunnel costs ~1 s and cannot wedge anything
   (round-2 lesson: SIGKILLing a hung TPU client wedged the relay for
   7+ hours).
2. Only if the ports are open: spawn a subprocess that runs a tiny
   jax program under a deadline.  The subprocess is given a grace
   SIGTERM, never SIGKILL, and only when it has not yet acquired a
   device (it prints a sentinel once devices() returns).

Every attempt appends one JSON line to TPU_PROBES.jsonl at the repo
root so a dead-all-round tunnel leaves an auditable log.

Usage:  python scripts/tpu_probe.py [--deadline 120] [--tcp-only]
Exit 0 = tunnel healthy (or tcp-only and ports open), 1 = down.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "TPU_PROBES.jsonl")
RELAY_PORTS = (8083, 8082)

_TINY = r"""
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
d = jax.devices()
print("DEVICES_OK", time.time() - t0, flush=True)
x = jnp.ones((128, 128), jnp.float32)
y = (x @ x).block_until_ready()
print("COMPUTE_OK", float(y[0, 0]), time.time() - t0, flush=True)
"""


def tcp_check(port: int, timeout: float = 2.0) -> bool:
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=timeout):
            return True
    except OSError:
        return False


def log_attempt(rec: dict) -> None:
    rec["ts"] = time.time()
    rec["iso"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


def probe(deadline: float, tcp_only: bool) -> int:
    ports = {p: tcp_check(p) for p in RELAY_PORTS}
    if not any(ports.values()):
        log_attempt({"stage": "tcp", "ok": False, "ports": ports})
        print(f"tunnel DOWN: relay ports closed {ports}")
        return 1
    if tcp_only:
        log_attempt({"stage": "tcp", "ok": True, "ports": ports})
        print(f"relay ports open {ports} (tcp-only probe)")
        return 0

    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", _TINY],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    out_lines: list[str] = []
    try:
        out, _ = proc.communicate(timeout=deadline)
        out_lines = out.strip().splitlines()
    except subprocess.TimeoutExpired:
        # Grace SIGTERM only — never SIGKILL a client that may hold a lease.
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            pass  # leave it; do not SIGKILL
        log_attempt(
            {"stage": "client", "ok": False, "ports": ports,
             "error": f"tiny program timed out after {deadline}s"}
        )
        print(f"tunnel DOWN: ports open but tiny program hung >{deadline}s")
        return 1
    ok = any(line.startswith("COMPUTE_OK") for line in out_lines)
    log_attempt(
        {"stage": "client", "ok": ok, "ports": ports,
         "elapsed_s": round(time.time() - t0, 1),
         "tail": out_lines[-3:]}
    )
    print("tunnel UP" if ok else f"tunnel DOWN: {out_lines[-3:]}")
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline", type=float, default=120.0)
    ap.add_argument("--tcp-only", action="store_true")
    args = ap.parse_args()
    sys.exit(probe(args.deadline, args.tcp_only))
