#!/usr/bin/env python3
"""Probe allocatable device HBM, one fresh client process per attempt.

The tunneled v5e exposes no telemetry (`device.memory_stats()` is None), so
when a crashed client leaks device memory (the round-4 big_flops blocker:
RESOURCE_EXHAUSTED on even a PRNGKey transfer after a crashed 16384^3
attempt), the only way to quantify the state is to measure what can be
allocated.

Design notes (both measured on the axon transport):
- A failed over-size allocation WEDGES ITS OWN CLIENT PROCESS -- every
  later allocation in that process fails too, however small. So each
  attempt runs in a fresh subprocess.
- Attempts ascend from small to large and stop at the first failure, so
  the worker is never left holding a poisoned client at exit.

Prints one line per attempt and a final JSON summary. Strictly one TPU
client at a time -- never run while another bench owns the device.

Usage: python tools/probe_hbm.py [--max-gb 16] [--start-gb 1]
"""
import argparse
import json
import subprocess
import sys

CHILD = r"""
import sys
import jax
import jax.numpy as jnp
n = int(sys.argv[1]) // 4
x = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
x.block_until_ready()
print(float(x[0]))          # force materialization past dispatch-ack
"""


def try_alloc(nbytes: int) -> bool:
    r = subprocess.run([sys.executable, "-c", CHILD, str(nbytes)],
                       capture_output=True, text=True, timeout=600)
    ok = r.returncode == 0
    if not ok:
        tail = [ln for ln in r.stderr.splitlines() if ln.strip()][-1:]
        print(f"  alloc {nbytes / (1 << 30):.2f} GiB failed: "
              f"{tail[0][:120] if tail else 'no stderr'}", file=sys.stderr)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-gb", type=float, default=16.0)
    ap.add_argument("--start-gb", type=float, default=1.0)
    args = ap.parse_args()

    size = int(args.start_gb * (1 << 30))
    best = 0
    while size <= int(args.max_gb * (1 << 30)):
        print(f"trying {size / (1 << 30):.2f} GiB ...", file=sys.stderr)
        if not try_alloc(size):
            break
        best = size
        size *= 2
    # refine one step: halfway between best and the first failure
    if best and size <= int(args.max_gb * (1 << 30)) * 2:
        mid = best + best // 2
        print(f"trying {mid / (1 << 30):.2f} GiB ...", file=sys.stderr)
        if try_alloc(mid):
            best = mid
    print(json.dumps({"allocatable_gib": round(best / (1 << 30), 2),
                      "probe": "ascending, fresh process per attempt"}))


if __name__ == "__main__":
    main()
