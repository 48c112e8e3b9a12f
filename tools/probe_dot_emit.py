"""A/B the GEMMUL8_DOT_EMIT lever on hardware.

"hi" (default): the batched int8 dot materializes the int32 C_hi
(4 bytes/elem) for the fused epilogue to read.
"mid": XLA fuses the per-modulus wrap into the dot's consumer and
materializes the int8 c_mid instead (1 byte/elem -- 4x less HBM read for
the epilogue, ~3% slower dot per the fused-reduce probe). Bit-identity is
CPU-tested (tests/test_round3_fixes.py::test_dot_emit_mid_value_identity);
this probe answers which side the HBM/TOPS trade lands on.

Run on TPU: python tools/probe_dot_emit.py [m] [nu]
"""
import functools
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "benchmarks"))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from _timing import ping_seconds, timed_loop  # noqa: E402
    from gemmul8_tpu import core

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nu = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    print("device:", jax.devices()[0].device_kind, flush=True)
    ping = ping_seconds()
    print(f"ping {ping*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, m)))
    b = jnp.asarray(rng.standard_normal((m, m)))
    ops = 2.0 * m * m * m

    for emit in ("hi", "mid"):
        os.environ["GEMMUL8_DOT_EMIT"] = emit
        jax.clear_caches()   # the env is read at trace time
        fn = functools.partial(core.emulate_matmul, num_moduli=nu)
        t = timed_loop(fn, a, b, iters=4, ping=ping)
        print(f"emit={emit}: {t*1e3:8.2f} ms  {ops / t / 1e12:6.2f} TF/s",
              flush=True)
    os.environ.pop("GEMMUL8_DOT_EMIT", None)


if __name__ == "__main__":
    main()
