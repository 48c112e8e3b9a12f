"""Cross-platform bit-identity probe (NUMERICS.md §3, round-5 verification).

Runs the same emulated GEMMs on the real device and on CPU (subprocesses —
the sitecustomize pins JAX_PLATFORMS, so CPU must be forced in-process) and
compares output bits.

Expected:
  * f32 inputs: BIT-IDENTICAL across platforms for every config probed
    (INT8 fast/accurate, FP8 fast), including the shift vectors — the
    compute path is f32+int32 with identical IEEE semantics.
  * f64 inputs (even with f32-exact values): agree to ~f64 roundoff but NOT
    bit-for-bit — the final f64 output construction runs in the platform's
    f64 (IEEE on CPU; the ~48-bit f32-pair format on TPU).

Measured 2026-08-20 on v5e: all three f32 configs bitwise-equal (max diff
exactly 0.0, shift vectors equal); f64 legs differ at 1e-16-relative scale.
"""
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEG = '''
import sys
import jax
if sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
sys.path.insert(0, {root!r})
import gemmul8_tpu as g8
from gemmul8_tpu import quantize, tables
rng = np.random.default_rng(99)
a = (rng.standard_normal((96, 700)) * np.exp(rng.standard_normal((96, 700)) * 2.0)).astype(np.float32)
b = (rng.standard_normal((700, 80)) * np.exp(rng.standard_normal((700, 80)) * 2.0)).astype(np.float32)
for fm, be, tag in ((True, "INT8", "fast_int8"), (False, "INT8", "accu_int8"), (True, "FP8", "fast_fp8")):
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=9, fastmode=fm, backend=be, epilogue="ff"))
    np.save("/tmp/probe_bitid_" + tag + "_" + sys.argv[1] + ".npy", c)
sA = np.asarray(quantize.shift_fast(jnp.asarray(a), 9, tables.Backend.INT8, 1))
np.save("/tmp/probe_bitid_shiftA_" + sys.argv[1] + ".npy", sA)
a64, b64 = a.astype(np.float64), b.astype(np.float64)
c64 = np.asarray(g8.gemm(jnp.asarray(a64), jnp.asarray(b64), num_moduli=14, epilogue="ff"))
np.save("/tmp/probe_bitid_f64_" + sys.argv[1] + ".npy", c64)
print("leg done", sys.argv[1], jax.devices()[0].device_kind)
'''


def main():
    import numpy as np
    code = _LEG.format(root=_ROOT)
    for leg in ("device", "cpu"):
        arg = "cpu" if leg == "cpu" else "dev"
        r = subprocess.run([sys.executable, "-c", code, arg],
                           capture_output=True, text=True, timeout=1200)
        print(r.stdout.strip() or r.stderr[-400:])
        if r.returncode:
            sys.exit(f"{leg} leg failed rc={r.returncode}")
    ok = True
    for tag in ("fast_int8", "accu_int8", "fast_fp8", "shiftA"):
        t = np.load(f"/tmp/probe_bitid_{tag}_dev.npy")
        c = np.load(f"/tmp/probe_bitid_{tag}_cpu.npy")
        eq = np.array_equal(t, c)
        ok &= eq
        print(f"f32 {tag}: bitwise equal = {eq}")
    t = np.load("/tmp/probe_bitid_f64_dev.npy")
    c = np.load("/tmp/probe_bitid_f64_cpu.npy")
    rel = float(np.max(np.abs(t - c) / np.maximum(np.abs(c), 1e-300)))
    print(f"f64 (f32-exact values): bitwise equal = {np.array_equal(t, c)} "
          f"(expected False), max rel diff = {rel:.3e} "
          f"(expect ~1e-10..1e-15: output-side f64 representation)")
    print("PROBE", "OK" if ok else "FAILED: f32 path must be bit-identical")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
