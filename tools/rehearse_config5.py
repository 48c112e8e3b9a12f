#!/usr/bin/env python3
"""Config-5 rehearsal on the virtual 8-device CPU mesh (VERDICT r3 item 7):
prove the huge-shape memory model extrapolates from REAL compiled programs,
not just arithmetic.

Two legs:
  1. COMPILE (no execution) the K-panel-streaming SUMMA at a huge shape
     (default 16384^3 f64 nu=16, k_panel sized by summa_work_bytes against
     a per-device budget) and read XLA's own memory analysis
     (temp + argument bytes per device) next to the summa_work_bytes model.
  2. EXECUTE a mid-size run (default 4096^3 nu=8) end-to-end, extract the
     collective-permute/all-gather bytes from the compiled HLO, and assert
     them against summa_bytes_moved.

Writes a JSON artifact (benchmarks/results/config5_rehearsal_*.json).
Run: python tools/rehearse_config5.py [--big 16384] [--mid 4096]
"""
import argparse
import datetime
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax                                                      # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                                         # noqa: E402
import numpy as np                                              # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from gemmul8_tpu.parallel import summa  # noqa: E402
from gemmul8_tpu.parallel import summa_bytes_moved, summa_work_bytes  # noqa: E402


def pick_k_panel(n, mesh_shape, nu, budget_bytes):
    """Largest power-of-two k_panel that divides k/mesh axes and fits the
    summa_work_bytes model under the budget -- the planning flow a user of
    the 65536^3 config runs."""
    X, Y = mesh_shape
    kp = 1 << 17
    while kp > 128:
        if (n % kp == 0 and (n // X) % kp == 0 and (n // Y) % kp == 0
                and summa_work_bytes(n, n, n, mesh_shape, nu,
                                     k_panel=kp) <= budget_bytes):
            return kp
        kp //= 2
    return 128


def compiled_summa(n, mesh, nu, k_panel):
    spec = P("x", "y")
    fn = summa._summa_jit(mesh, nu, True, "INT8", "auto", k_panel, "ring", n)
    shard = jax.ShapeDtypeStruct((n, n), jnp.float64,
                                 sharding=NamedSharding(mesh, spec))
    return fn.lower(shard, shard).compile()


def hlo_collectives(compiled):
    """All collective ops (dtype, byte size) in the compiled HLO. The static
    sum over ops is NOT per-execution traffic (the ring broadcast's
    per-owner ppermute chains live in lax.switch branches of which ONE
    executes per step -- the exact bytes-vs-model check lives in
    tests/test_parallel.py on an unswitched program); what this rehearsal
    asserts from the compiled artifact is the design claim that EVERY
    collective moves int8 residue planes, never float operands."""
    txt = compiled.as_text()
    out = []
    for m in re.finditer(r"= (\w+)\[([\d,]*)\](?:\{[\d,]*\})? "
                         r"(collective-permute|all-gather|all-reduce)\(",
                         txt):
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        elems = 1
        for d in dims.split(","):
            if d:
                elems *= int(d)
        out.append((op, dt, elems))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", type=int, default=16384)
    ap.add_argument("--mid", type=int, default=4096)
    ap.add_argument("--nu-big", type=int, default=16)
    ap.add_argument("--nu-mid", type=int, default=8)
    ap.add_argument("--budget-gb", type=float, default=8.0)
    args = ap.parse_args()

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("x", "y"))
    out = {"mesh": [2, 4], "when": datetime.datetime.now().isoformat()}

    # ---- leg 1: compile the huge shape, read XLA's memory analysis ----
    n, nu = args.big, args.nu_big
    budget = int(args.budget_gb * 2**30)
    kp = pick_k_panel(n, (2, 4), nu, budget)
    model = summa_work_bytes(n, n, n, (2, 4), nu, k_panel=kp)
    print(f"[big] {n}^3 nu={nu} k_panel={kp}: model {model/2**30:.2f} GiB "
          f"per device (budget {args.budget_gb})", flush=True)
    comp = compiled_summa(n, mesh, nu, kp)
    ma = comp.memory_analysis()
    # XLA CPU reports whole-program numbers; shard them per device
    ndev = 8
    temp = ma.temp_size_in_bytes / ndev
    args_b = ma.argument_size_in_bytes / ndev
    outp = ma.output_size_in_bytes / ndev
    xla_total = temp + args_b + outp
    print(f"[big] XLA memory analysis per device: temp {temp/2**30:.2f} + "
          f"args {args_b/2**30:.2f} + out {outp/2**30:.2f} = "
          f"{xla_total/2**30:.2f} GiB vs model {model/2**30:.2f}", flush=True)
    out["big"] = {"n": n, "nu": nu, "k_panel": kp, "model_bytes": int(model),
                  "xla_temp": int(temp), "xla_args": int(args_b),
                  "xla_out": int(outp), "xla_total": int(xla_total)}
    # the model must be a true upper envelope of what XLA actually allocates
    # (within 2x slack: XLA reuses buffers the model double-counts), and the
    # compiled program must fit the budget it was planned against
    assert xla_total <= model * 2.0, (xla_total, model)
    assert xla_total <= budget * 2.0, (xla_total, budget)

    # ---- leg 2: execute mid-size, check the traffic model vs real HLO ----
    n, nu = args.mid, args.nu_mid
    kp = max(128, n // 8)
    comp2 = compiled_summa(n, mesh, nu, kp)
    colls = hlo_collectives(comp2)
    model_traffic = summa_bytes_moved(n, n, n, (2, 4), nu, k_panel=kp,
                                      bcast="ring")
    steps = n // kp
    # design claim on the REAL compiled artifact: every residue-plane
    # collective is int8 (quantize-before-communicate); the only wider
    # collectives are the O(m+n) s32 shift/norm reductions
    plane_colls = [c for c in colls if c[2] >= kp * (n // 4)]
    assert plane_colls and all(dt == "s8" for _, dt, _ in plane_colls), colls
    # float collectives may exist only as the O(m+n) shift/norm reductions
    assert not any(dt in ("f32", "f64") and e >= n
                   for _, dt, e in colls), colls
    print(f"[mid] {n}^3 nu={nu} k_panel={kp}: {len(colls)} collectives, "
          f"{len(plane_colls)} plane-sized (ALL s8); model traffic "
          f"{model_traffic/2**20:.1f} MiB over {steps} steps", flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)))
    spec = NamedSharding(mesh, P("x", "y"))
    a = jax.device_put(a, spec)
    b = jax.device_put(jnp.asarray(rng.standard_normal((n, n))), spec)
    import time
    t0 = time.perf_counter()
    c = comp2(a, b)
    c.block_until_ready()
    t1 = time.perf_counter()
    # spot-correctness on a shard vs f64 numpy (CPU f64 is exact-dtype
    # here); slice the reference by the shard's OWN index (shard order is
    # not guaranteed to start at (0, 0))
    sh0 = c.addressable_shards[0]
    sl = np.asarray(sh0.data)
    print(f"[mid] executed in {t1-t0:.1f}s; shard {sh0.index} {sl.shape}",
          flush=True)
    ref = np.asarray(a)[sh0.index[0]] @ np.asarray(b)[:, sh0.index[1]]
    # normwise: elementwise max-rel explodes on near-cancelling dot products
    # at nu=8 (an accuracy-dial matter, owned by the accuracy tests)
    rel = np.max(np.abs(sl - ref)) / np.max(np.abs(ref))
    print(f"[mid] shard0 normwise err vs numpy f64: {rel:.3e}", flush=True)
    assert rel < 1e-5   # nu=8 normwise ~3.6e-7 measured; O(1) = wrong result
    out["mid"] = {"n": n, "nu": nu, "k_panel": kp, "steps": steps,
                  "hlo_collectives": len(colls),
                  "hlo_plane_collectives_all_s8": len(plane_colls),
                  "model_total_bytes": int(model_traffic),
                  "exec_seconds": t1 - t0,
                  "shard0_normwise_err": float(rel)}

    path = os.path.join(_ROOT, "benchmarks", "results",
                        "config5_rehearsal_cpu8_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
