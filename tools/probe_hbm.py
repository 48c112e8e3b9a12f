#!/usr/bin/env python3
"""Probe allocatable device HBM by bisection.

The tunneled v5e exposes no telemetry (`device.memory_stats()` is None), so
when a crashed client leaks device memory (the round-4 big_flops blocker:
RESOURCE_EXHAUSTED on even a PRNGKey transfer after a crashed 16384^3
attempt), the only way to quantify the leak is to measure what can still be
allocated: bisect on a single f32 buffer, then report the largest success.

Prints one line per attempt and a final JSON summary. Strictly one TPU
client at a time -- never run while another bench owns the device.

Usage: python tools/probe_hbm.py [--max-gb 16] [--resolution-mb 64]
"""
import argparse
import gc
import json
import sys


def try_alloc(nbytes: int) -> bool:
    import jax
    import jax.numpy as jnp

    n = max(nbytes // 4, 1)
    try:
        x = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
        x.block_until_ready()
        # force materialization past dispatch-ack: fetch a scalar
        float(x[0])
        del x
        gc.collect()
        return True
    except Exception as e:  # noqa: BLE001 - RESOURCE_EXHAUSTED et al.
        print(f"  alloc {nbytes / (1 << 30):.2f} GiB failed: "
              f"{type(e).__name__}", file=sys.stderr)
        gc.collect()
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-gb", type=float, default=16.0)
    ap.add_argument("--resolution-mb", type=float, default=64.0)
    args = ap.parse_args()

    import jax
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    lo, hi = 0, int(args.max_gb * (1 << 30))
    res = int(args.resolution_mb * (1 << 20))
    # quick ceiling check first
    if try_alloc(hi):
        lo = hi
    while hi - lo > res:
        mid = (lo + hi) // 2
        print(f"trying {mid / (1 << 30):.2f} GiB ...", file=sys.stderr)
        if try_alloc(mid):
            lo = mid
        else:
            hi = mid
    print(json.dumps({
        "device_kind": dev.device_kind,
        "allocatable_gib": round(lo / (1 << 30), 2),
        "probe_resolution_mib": args.resolution_mb,
    }))


if __name__ == "__main__":
    main()
