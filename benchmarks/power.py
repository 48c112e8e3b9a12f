#!/usr/bin/env python3
"""Power/efficiency benchmark: watts + GFLOPS/W for the emulated GEMM.

Mirrors the reference's power protocol (testing/test_watt.hpp +
getWatt.hpp:94-121): a sampling thread polls device power every 100 ms while a
>= `--seconds` GEMM loop runs; energy is the trapezoidal integral of the
samples; efficiency = total FLOPs / energy.

Power sources, auto-detected in order (TPUs expose no NVML; the tunneled v5e
terminal exposes no power telemetry at all, in which case the harness reports
the protocol result with watts = n/a rather than inventing numbers):
  1. `tpu-info` / libtpu metrics service (TPU VMs)
  2. Linux RAPL (/sys/class/powercap) -- CPU-only runs
  3. none -> watts/gflops_per_watt reported as NaN

Usage: python benchmarks/power.py [--size 4096] [--nu 16] [--seconds 10]
"""
import argparse
import datetime
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import re


def parse_tpu_info_power(text: str) -> float:
    """Sum per-chip power draw (watts) from `tpu-info` output.

    Handles the formats the CLI emits (unit-tested against fixtures in
    tests/test_power_parsers.py):
      * rich-table rows with "<current> W / <limit> W" -- take only the
        CURRENT draw, never the limit (the old token-sniffing parser summed
        both, doubling the number);
      * bare "<value> W" occurrences;
      * "power_draw: <value>"-style key/value metrics lines.
    Returns NaN when no power figure is present.
    """
    total = 0.0
    found = False
    for line in text.splitlines():
        # "45.25 W / 250.00 W" -> current draw only
        m = re.search(r"([0-9]+(?:\.[0-9]+)?)\s*W\s*/\s*[0-9]+(?:\.[0-9]+)?\s*W",
                      line)
        if m:
            total += float(m.group(1))
            found = True
            continue
        m = re.search(r"power[_ ]?draw\s*[:=]\s*([0-9]+(?:\.[0-9]+)?)", line,
                      re.IGNORECASE)
        if m:
            total += float(m.group(1))
            found = True
            continue
        # bare-wattage fallback: take only the FIRST figure per line -- a
        # line stating draw plus a limit in another format (e.g.
        # "45 W (limit 250 W)") must not double-count
        m = re.search(r"([0-9]+(?:\.[0-9]+)?)\s*W\b", line)
        if m:
            total += float(m.group(1))
            found = True
    return total if found else float("nan")


class TpuInfoSampler:
    """Polls libtpu's metrics endpoint via the `tpu-info` CLI (TPU VMs)."""

    @staticmethod
    def available() -> bool:
        try:
            r = subprocess.run(["tpu-info", "--metric", "power"], timeout=5,
                               capture_output=True, text=True)
            import math
            return (r.returncode == 0
                    and not math.isnan(parse_tpu_info_power(r.stdout)))
        except Exception:
            return False

    def sample(self) -> float:
        r = subprocess.run(["tpu-info", "--metric", "power"], timeout=5,
                           capture_output=True, text=True)
        return parse_tpu_info_power(r.stdout)


class RaplSampler:
    """Linux RAPL energy counters (CPU packages): watts from dE/dt."""

    BASE = "/sys/class/powercap"

    @classmethod
    def _zones(cls):
        import glob
        return sorted(glob.glob(os.path.join(cls.BASE, "intel-rapl:?")))

    @classmethod
    def available(cls) -> bool:
        zones = cls._zones()
        if not zones:
            return False
        try:
            open(os.path.join(zones[0], "energy_uj")).read()
            return True
        except Exception:
            return False

    def __init__(self):
        self._last = None

    def sample(self) -> float:
        now = time.time()
        uj = sum(int(open(os.path.join(z, "energy_uj")).read())
                 for z in self._zones())
        if self._last is None:
            self._last = (now, uj)
            return float("nan")   # no baseline yet: not a real 0 W reading
        t0, e0 = self._last
        self._last = (now, uj)
        return rapl_watts(e0, uj, now - t0)


def rapl_watts(e0_uj: int, e1_uj: int, dt: float) -> float:
    """Watts from two RAPL energy_uj readings. The counter WRAPS at
    max_energy_range_uj; a wrapped interval (e1 < e0) cannot be recovered
    without the range, so report NaN for that sample -- it is dropped
    before the energy integral -- instead of a huge negative wattage
    (unit-tested in tests/test_power_parsers.py)."""
    if e1_uj < e0_uj:
        return float("nan")   # dropped before integrating, not a real 0 W
    return (e1_uj - e0_uj) * 1e-6 / max(dt, 1e-6)


def pick_sampler():
    if TpuInfoSampler.available():
        return TpuInfoSampler(), "tpu-info"
    if RaplSampler.available():
        return RaplSampler(), "rapl"
    return None, "none"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--nu", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--period", type=float, default=0.1,
                    help="sampling period (reference: 100 ms)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from gemmul8_tpu import core

    m = n = k = args.size
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)))
    b = jnp.asarray(rng.standard_normal((k, n)))

    inner = 8

    @jax.jit
    def loop(a, b):
        def body(i, carry):
            s, a = carry
            a = a.at[0, 0].set(a[0, 0] + s * 1e-30)
            c = core.emulate_matmul(a, b, num_moduli=args.nu)
            return (jnp.sum(c).astype(a.dtype), a)
        s, _ = jax.lax.fori_loop(0, inner, body, (jnp.zeros((), a.dtype), a))
        return s

    np.asarray(loop(a, b))  # compile + warm up

    sampler, source = pick_sampler()
    samples = []  # (t, watts)
    stop = threading.Event()

    sample_errors = [0]

    def poll():
        while not stop.is_set():
            # a single failed read (tpu-info subprocess timeout, transient
            # RAPL error) must not kill the sampler thread mid-run -- that
            # would silently truncate the energy window while flops keep
            # counting, inflating GFLOPS/W
            try:
                w = sampler.sample() if sampler else float("nan")
            except Exception:
                sample_errors[0] += 1
                w = float("nan")
            samples.append((time.time(), w))
            stop.wait(args.period)

    th = threading.Thread(target=poll, daemon=True)
    th.start()

    calls = 0
    t0 = time.time()
    while time.time() - t0 < args.seconds:
        np.asarray(loop(a, b))
        calls += inner
    elapsed = time.time() - t0
    stop.set()
    th.join(timeout=2)

    flops = 2.0 * m * n * k * calls
    tflops = flops / elapsed / 1e12
    # snapshot ONCE: the poll thread can still append after join(timeout=2)
    # returns (a tpu-info subprocess may be in flight); building ts and ws
    # from the live list separately could give mismatched lengths
    snap = [s for s in list(samples) if s[1] == s[1]]   # drop NaN samples
    if sample_errors[0]:
        print(f"power: {sample_errors[0]} failed sample(s) dropped",
              file=sys.stderr)
    trapezoid = getattr(np, "trapezoid", None) or np.trapz  # numpy < 2.0
    if sampler and len(snap) >= 2:
        # trapezoidal energy integral (reference: getWatt.hpp:94-121)
        ts = np.array([s[0] for s in snap])
        ws = np.array([s[1] for s in snap])
        energy_j = float(trapezoid(ws, ts))
        watts = energy_j / (ts[-1] - ts[0])
        gflops_per_watt = flops / 1e9 / max(energy_j, 1e-9)
    else:
        watts = float("nan")
        gflops_per_watt = float("nan")

    def _j(v):
        # NaN is not valid JSON: report the no-telemetry path explicitly
        return None if isinstance(v, float) and v != v else v

    result = {
        "size": args.size, "num_moduli": args.nu, "seconds": round(elapsed, 2),
        "gemm_calls": calls, "tflops": round(tflops, 3),
        "power_source": source, "watts": _j(watts),
        "gflops_per_watt": _j(gflops_per_watt),
        "device": jax.devices()[0].device_kind,
        "timestamp": datetime.datetime.now().isoformat(timespec="seconds"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
