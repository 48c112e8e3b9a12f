"""Worker process for the multi-process SUMMA tests (run via subprocess, not
collected by pytest): joins a jax.distributed 2-process x 4-CPU-device
cluster, builds the process-spanning global mesh, runs summa_gemm on
globally-sharded arrays constructed WITHOUT any cross-process device_put,
and checks every locally-addressable C shard bit-equals the single-device
emulation of the same problem. Prints MP_OK on success.

Env contract (set by tests/test_multiprocess.py):
  G8_COORD  coordinator address host:port
  G8_NPROC  number of processes
  G8_PID    this process id
  G8_MODE   gather | stream | accurate | robust | complex | getrf | qr
"""
import os
import sys

import numpy as np

import jax

# this image's sitecustomize pins JAX_PLATFORMS at boot; override in-script
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

jax.distributed.initialize(
    coordinator_address=os.environ["G8_COORD"],
    num_processes=int(os.environ["G8_NPROC"]),
    process_id=int(os.environ["G8_PID"]),
)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from gemmul8_tpu.parallel import make_mesh, summa_gemm  # noqa: E402

mode = os.environ["G8_MODE"]
nproc = int(os.environ["G8_NPROC"])
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc
assert jax.local_device_count() == 4

mesh = make_mesh()  # global (2, 4) mesh spanning both processes

if mode in ("getrf", "qr"):
    # solver-layer cross-process run: the O(n^3) factorization updates run
    # through SUMMA over the PROCESS-SPANNING mesh; inputs replicated (the
    # factorization's host loop slices panels eagerly), outputs must
    # bit-equal the single-device mesh=1x1 factorization on every process
    import importlib
    from gemmul8_tpu import solvers  # noqa: E402
    # the package re-exports the qr FUNCTION under the submodule's name
    qrmod = importlib.import_module("gemmul8_tpu.qr")
    rng = np.random.default_rng(0)
    n = 64
    a_h = rng.standard_normal((n, n)) + (n * np.eye(n) if mode == "getrf"
                                         else 0.0)
    mesh1 = Mesh(np.asarray(jax.local_devices()[:1]).reshape(1, 1),
                 ("x", "y"))
    def _equal(got, want):
        """Bit-compare a possibly process-spanning array against the local
        reference via its addressable shards (can't fetch global values)."""
        want = np.asarray(want)
        if got.is_fully_addressable:
            return np.array_equal(np.asarray(got), want)
        return all(np.array_equal(np.asarray(s.data), want[s.index])
                   for s in got.addressable_shards)

    if mode == "getrf":
        lu_g, perm_g = solvers.getrf(jnp.asarray(a_h), num_moduli=10,
                                     block=32, mesh=mesh)
        lu_r, perm_r = solvers.getrf(jnp.asarray(a_h), num_moduli=10,
                                     block=32, mesh=mesh1)
        ok = _equal(lu_g, lu_r) and _equal(perm_g, perm_r)
    else:
        q_g, r_g = qrmod.qr(jnp.asarray(a_h), num_moduli=10, block=32,
                            mesh=mesh)
        q_r, r_r = qrmod.qr(jnp.asarray(a_h), num_moduli=10, block=32,
                            mesh=mesh1)
        ok = _equal(q_g, q_r) and _equal(r_g, r_r)
    if not ok:
        print(f"MISMATCH proc={os.environ['G8_PID']} mode={mode}")
        sys.exit(1)
    print("MP_OK", flush=True)
    sys.exit(0)

if mode == "complex":
    # planar-complex SUMMA cross-process: the 3M lane plane sets shard over
    # the process-spanning mesh; every addressable (Cr, Ci) shard must
    # bit-equal the single-device planar run
    from gemmul8_tpu.parallel import summa_gemm_planar  # noqa: E402
    rng = np.random.default_rng(0)
    m = k = n = 64
    planes_h = [rng.standard_normal((m, k)), rng.standard_normal((m, k)),
                rng.standard_normal((k, n)), rng.standard_normal((k, n))]
    sh = NamedSharding(mesh, P("x", "y"))
    planes = [jax.make_array_from_callback(p.shape, sh,
                                           lambda idx, p=p: p[idx])
              for p in planes_h]
    assert not planes[0].is_fully_addressable
    cr, ci = summa_gemm_planar(*planes, mesh=mesh, num_moduli=12)
    jax.block_until_ready(cr)
    mesh1 = Mesh(np.asarray(jax.local_devices()[:1]).reshape(1, 1),
                 ("x", "y"))
    rr, ri = summa_gemm_planar(*[jnp.asarray(p) for p in planes_h],
                               mesh=mesh1, num_moduli=12)
    rr, ri = np.asarray(rr), np.asarray(ri)
    for got, want in ((cr, rr), (ci, ri)):
        for shard in got.addressable_shards:
            if not np.array_equal(np.asarray(shard.data), want[shard.index]):
                print(f"MISMATCH proc={os.environ['G8_PID']} "
                      f"shard={shard.index}")
                sys.exit(1)
    print("MP_OK", flush=True)
    sys.exit(0)

rng = np.random.default_rng(0)  # same seed everywhere: same global inputs
m = k = n = 64
a_h = rng.standard_normal((m, k))
b_h = rng.standard_normal((k, n))
sh = NamedSharding(mesh, P("x", "y"))
# each process materializes only ITS addressable shards of the global arrays
a = jax.make_array_from_callback((m, k), sh, lambda idx: a_h[idx])
b = jax.make_array_from_callback((k, n), sh, lambda idx: b_h[idx])
assert not a.is_fully_addressable  # genuinely process-spanning

kw = {"num_moduli": 10, "fastmode": True}
if mode == "stream":
    kw["k_panel"] = 8
elif mode == "accurate":
    kw["fastmode"] = False
elif mode == "robust":
    kw["fastmode"] = "robust"
c = summa_gemm(a, b, mesh=mesh, **kw)
jax.block_until_ready(c)

# single-DEVICE reference: the same SUMMA on a local 1x1 mesh, computed
# independently by each process on its own device 0. Cross-process
# bit-identity with this is the order-free design's whole claim.
mesh1 = Mesh(np.asarray(jax.local_devices()[:1]).reshape(1, 1), ("x", "y"))
ref = np.asarray(summa_gemm(jnp.asarray(a_h), jnp.asarray(b_h), mesh=mesh1,
                            num_moduli=10, fastmode=kw["fastmode"]))

for shard in c.addressable_shards:
    got = np.asarray(shard.data)
    want = ref[shard.index]
    if not np.array_equal(got, want):
        print(f"MISMATCH proc={os.environ['G8_PID']} shard={shard.index}: "
              f"max abs diff {np.max(np.abs(got - want))}")
        sys.exit(1)

print("MP_OK", flush=True)
