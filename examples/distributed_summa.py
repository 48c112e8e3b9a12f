"""Distributed emulated DGEMM: 2D SUMMA over a device mesh.

Runs on an 8-virtual-device CPU mesh by default (works on any TPU slice the
same way). Shows the three distributed modes and the memory model:
  * full-K gather (fastest when the gathered planes fit HBM)
  * K-panel streaming (bounded memory -- the 65536^3-class configuration)
  * distributed accurate mode (two-phase product-magnitude estimation)
All three produce BIT-IDENTICAL results on every mesh shape: shifts are
order-free (pmax + exact int32 piece sums) and partial products accumulate
in residue space, where addition commutes mod p.

Run: python examples/distributed_summa.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# force the CPU mesh BEFORE any backend use (calling jax.default_backend()
# first would initialize the platform and make this a no-op); delete this
# line to run on a real TPU slice
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gemmul8_tpu.parallel import summa_gemm, summa_work_bytes

rng = np.random.default_rng(0)
m = n = k = 256
a = jnp.asarray(rng.standard_normal((m, k)))
b = jnp.asarray(rng.standard_normal((k, n)))
ref = np.asarray(a) @ np.asarray(b)

devs = np.asarray(jax.devices())
nx = 2 if len(devs) >= 8 else 1
mesh = Mesh(devs[: nx * (len(devs) // nx)].reshape(nx, -1), ("x", "y"))
print(f"mesh: {mesh.devices.shape} on {jax.default_backend()}")

c_gather = summa_gemm(a, b, mesh=mesh, num_moduli=14)
c_stream = summa_gemm(a, b, mesh=mesh, num_moduli=14, k_panel=32)
c_accu = summa_gemm(a, b, mesh=mesh, num_moduli=14, fastmode=False)

print("gather  max err:", float(np.max(np.abs(np.asarray(c_gather) - ref))))
print("stream == gather bitwise:",
      bool(np.array_equal(np.asarray(c_stream), np.asarray(c_gather))))
print("accurate max err:", float(np.max(np.abs(np.asarray(c_accu) - ref))))

GiB = 1 << 30
for msh in [(2, 4), (4, 8), (8, 16)]:
    s = summa_work_bytes(65536, 65536, 65536, msh, 16, k_panel=4096) / GiB
    g = summa_work_bytes(65536, 65536, 65536, msh, 16) / GiB
    print(f"65536^3 nu=16 on {msh}: streaming {s:5.1f} GiB/device "
          f"(gather would need {g:5.1f})")
