"""Distributed SUMMA GEMM on a virtual 8-device CPU mesh: correctness vs the
single-device emulator and bit-identical results across mesh shapes
(BASELINE config 5's CPU-testable core)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import gemmul8_tpu as g8
from gemmul8_tpu.parallel import summa_gemm
from oracle import max_median_relerr, matmul_longdouble, phi_matrix

RNG = np.random.default_rng(99)


def mesh_of(x, y):
    devs = np.asarray(jax.devices()[: x * y]).reshape(x, y)
    return Mesh(devs, ("x", "y"))


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_summa_matches_quality(dtype):
    m, k, n = 64, 256, 64
    a = phi_matrix(RNG, m, k, 0.5, dtype)
    b = phi_matrix(RNG, k, n, 0.5, dtype)
    ref = matmul_longdouble(a, b)
    c = np.asarray(summa_gemm(jnp.asarray(a), jnp.asarray(b),
                              mesh=mesh_of(2, 4), num_moduli=8))
    err, _ = max_median_relerr(c, ref)
    c1, _ = max_median_relerr(
        np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=8)), ref)
    assert err < c1 * 16 + 1e-30  # same quality class as single-device


def test_summa_bit_identical_across_meshes():
    """The headline invariant: 1x1 == 2x1 == 2x4 == 8x1 bitwise."""
    m, k, n = 64, 128, 64
    a = jnp.asarray(phi_matrix(RNG, m, k, 1.0))
    b = jnp.asarray(phi_matrix(RNG, k, n, 1.0))
    outs = {}
    for shape in [(1, 1), (2, 1), (1, 2), (2, 4), (8, 1)]:
        c = np.asarray(summa_gemm(a, b, mesh=mesh_of(*shape), num_moduli=10))
        outs[shape] = c
    base = outs[(1, 1)].view(np.int64)
    for shape, c in outs.items():
        assert np.array_equal(c.view(np.int64), base), f"mesh {shape} differs"


def test_summa_exact_integer():
    a = RNG.integers(-40, 40, (32, 64)).astype(np.float64)
    b = RNG.integers(-40, 40, (64, 16)).astype(np.float64)
    c = np.asarray(summa_gemm(jnp.asarray(a), jnp.asarray(b),
                              mesh=mesh_of(4, 2), num_moduli=8))
    np.testing.assert_array_equal(c, a @ b)


def test_summa_reproducible_run_to_run():
    a = jnp.asarray(phi_matrix(RNG, 32, 64, 0.0))
    b = jnp.asarray(phi_matrix(RNG, 64, 32, 0.0))
    m = mesh_of(2, 2)
    c1 = np.asarray(summa_gemm(a, b, mesh=m, num_moduli=12))
    c2 = np.asarray(summa_gemm(a, b, mesh=m, num_moduli=12))
    assert np.array_equal(c1.view(np.int64), c2.view(np.int64))


def test_summa_collectives_are_int8():
    """Design claim check on the COMPILED artifact: the SUMMA all-gathers move
    int8 residue planes (8x cheaper than f64 operands); no f64 collective
    exists anywhere in the lowered module."""
    import functools
    from gemmul8_tpu.parallel import summa
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_of(2, 4)
    m = k = n = 64
    a = jnp.zeros((m, k))
    b = jnp.zeros((k, n))
    spec = P("x", "y")
    fn = jax.shard_map(
        functools.partial(summa._summa_local, num_moduli=8, fastmode=True,
                          backend="INT8", epilogue="auto"),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec)
    a = jax.device_put(a, NamedSharding(mesh, spec))
    b = jax.device_put(b, NamedSharding(mesh, spec))
    hlo = jax.jit(fn).lower(a, b).compile().as_text()
    gathers = [ln for ln in hlo.splitlines() if "all-gather" in ln]
    assert gathers, "expected all-gather collectives in the SUMMA module"
    assert any("s8[" in ln for ln in gathers), \
        f"plane all-gathers must be int8, got: {gathers[:3]}"
    assert not any("f64[" in ln or "f32[" in ln for ln in gathers), \
        f"no float operand may be all-gathered: {gathers[:3]}"


def test_summa_fp8_backend():
    """FP8-backend SUMMA: the bf16 plane collectives gather the correct axis
    (FP8 planes carry an extra slot dimension) and match single-device
    quality."""
    m, k, n = 64, 128, 64
    a = jnp.asarray(phi_matrix(RNG, m, k, 0.5))
    b = jnp.asarray(phi_matrix(RNG, k, n, 0.5))
    ref = matmul_longdouble(a, b)
    c = np.asarray(summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=8,
                              backend="FP8"))
    err, _ = max_median_relerr(c, ref)
    c1, _ = max_median_relerr(
        np.asarray(g8.gemm(a, b, num_moduli=8, backend="FP8")), ref)
    assert err < c1 * 16 + 1e-30
    # cross-mesh bit-identity holds for FP8 too
    c2 = np.asarray(summa_gemm(a, b, mesh=mesh_of(1, 1), num_moduli=8,
                               backend="FP8"))
    c3 = np.asarray(summa_gemm(a, b, mesh=mesh_of(8, 1), num_moduli=8,
                               backend="FP8"))
    np.testing.assert_array_equal(c, c2)
    np.testing.assert_array_equal(c, c3)


def test_summa_stream_bit_identical_to_gather():
    """K-panel streaming SUMMA: no full-K gather, residue-space panel
    accumulation -- must be bit-identical to the gather algorithm and across
    mesh shapes (order-free accumulation makes this structural)."""
    m = n = k = 64
    a = jnp.asarray(phi_matrix(RNG, m, k, 0.5))
    b = jnp.asarray(phi_matrix(RNG, k, n, 0.5))
    g = np.asarray(summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=12))
    for mesh, panel in [(mesh_of(2, 4), 8), (mesh_of(2, 4), 16),
                        (mesh_of(8, 1), 8), (mesh_of(1, 1), 32)]:
        s = np.asarray(summa_gemm(a, b, mesh=mesh, num_moduli=12,
                                  k_panel=panel))
        np.testing.assert_array_equal(g, s)


def test_summa_ring_vs_psum_broadcast_bit_identical():
    """The pipelined ppermute-ring panel broadcast (half the link bytes of
    the masked psum) delivers identical integers: ring and psum streaming
    match the gather path bitwise on every mesh shape, for INT8 and FP8."""
    m = n = k = 64
    a = jnp.asarray(phi_matrix(RNG, m, k, 0.5))
    b = jnp.asarray(phi_matrix(RNG, k, n, 0.5))
    for backend in ("INT8", "FP8"):
        g = np.asarray(summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=8,
                                  backend=backend))
        for shape, panel in [((2, 4), 8), ((8, 1), 8), ((1, 2), 16)]:
            ring = np.asarray(summa_gemm(a, b, mesh=mesh_of(*shape),
                                         num_moduli=8, backend=backend,
                                         k_panel=panel, bcast="ring"))
            ps = np.asarray(summa_gemm(a, b, mesh=mesh_of(*shape),
                                       num_moduli=8, backend=backend,
                                       k_panel=panel, bcast="psum"))
            np.testing.assert_array_equal(g, ring)
            np.testing.assert_array_equal(g, ps)


def test_summa_ring_uses_collective_permute_and_halves_bytes():
    """Design checks: (1) the ring path lowers to collective-permute (not an
    all-reduce) for the panel payloads; (2) the traffic model says ring
    moves half of psum's panel bytes and both beat gathered full-K planes
    for small panels."""
    import functools
    from gemmul8_tpu.parallel import summa, summa_bytes_moved
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_of(2, 4)
    m = k = n = 64
    spec = P("x", "y")
    a = jax.device_put(jnp.zeros((m, k)), NamedSharding(mesh, spec))
    b = jax.device_put(jnp.zeros((k, n)), NamedSharding(mesh, spec))
    fn = jax.shard_map(
        functools.partial(summa._summa_stream_local, num_moduli=8,
                          fastmode=True, backend="INT8", epilogue="auto",
                          k_panel=8, k=k, x_size=2, y_size=4, bcast="ring"),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec, check_vma=False)
    hlo = jax.jit(fn).lower(a, b).compile().as_text()
    assert "collective-permute" in hlo
    # no int8 panel all-reduce remains (the norm-piece s32 psums do remain)
    assert not any("all-reduce" in ln and "s8[" in ln
                   for ln in hlo.splitlines())

    ring = summa_bytes_moved(4096, 4096, 4096, (2, 4), 16, k_panel=512)
    ps = summa_bytes_moved(4096, 4096, 4096, (2, 4), 16, k_panel=512,
                           bcast="psum")
    gather = summa_bytes_moved(4096, 4096, 4096, (2, 4), 16)
    assert ring * 2 == ps
    # ring streaming matches the gather's optimal traffic (each byte crosses
    # each link once) while bounding memory; psum pays 2x
    assert ring == gather


def test_summa_fast_large_k_bit_identity():
    """k = 2^19 -- beyond the old fast-mode k <= 2^18 cap: the two-tier
    norm-piece reduction keeps the shifts exact and order-free, so results
    stay bit-identical across mesh shapes (and the ValueError is gone)."""
    m = n = 8
    k = 1 << 19
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((m, k)))
    b = jnp.asarray(rng.standard_normal((k, n)))
    base = np.asarray(summa_gemm(a, b, mesh=mesh_of(1, 1), num_moduli=8))
    for shape in [(2, 4), (8, 1), (1, 2)]:
        c = np.asarray(summa_gemm(a, b, mesh=mesh_of(*shape), num_moduli=8))
        np.testing.assert_array_equal(base, c)


def test_summa_stream_validation():
    a = jnp.zeros((16, 24))
    b = jnp.zeros((24, 16))
    with pytest.raises(ValueError, match="k_panel"):
        summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=8, k_panel=5)


def test_summa_stream_fp8():
    """FP8-backend streaming: bf16 lane-plane panel broadcasts + per-panel
    reassembly, bit-identical to the FP8 gather path across meshes."""
    m = n = 32
    k = 48
    a = jnp.asarray(phi_matrix(RNG, m, k, 0.5))
    b = jnp.asarray(phi_matrix(RNG, k, n, 0.5))
    g = np.asarray(summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=8,
                              backend="FP8"))
    s = np.asarray(summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=8,
                              backend="FP8", k_panel=6))
    s81 = np.asarray(summa_gemm(a, b, mesh=mesh_of(8, 1), num_moduli=8,
                                backend="FP8", k_panel=6))
    np.testing.assert_array_equal(g, s)
    np.testing.assert_array_equal(g, s81)


def test_summa_accurate_mode():
    """Distributed ACCURATE mode (two-phase estimation, extract GEMM sharded
    over the mesh): bit-identical across meshes and to the single-device
    accurate path; must beat fast mode on hard (large phi) inputs."""
    m = n = k = 64
    a = jnp.asarray(phi_matrix(RNG, m, k, 2.0))
    b = jnp.asarray(phi_matrix(RNG, k, n, 2.0))
    ref = matmul_longdouble(a, b)
    acc = np.asarray(summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=10,
                                fastmode=False))
    acc11 = np.asarray(summa_gemm(a, b, mesh=mesh_of(1, 1), num_moduli=10,
                                  fastmode=False))
    acc81 = np.asarray(summa_gemm(a, b, mesh=mesh_of(8, 1), num_moduli=10,
                                  fastmode=False))
    core = np.asarray(g8.gemm(a, b, num_moduli=10, fastmode=False))
    np.testing.assert_array_equal(acc, acc11)
    np.testing.assert_array_equal(acc, acc81)
    np.testing.assert_array_equal(acc11, core)
    e_accu, _ = max_median_relerr(acc, ref)
    fast = np.asarray(summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=10))
    e_fast, _ = max_median_relerr(fast, ref)
    assert e_accu < e_fast

    # streaming + accurate mode compose
    sacc = np.asarray(summa_gemm(a, b, mesh=mesh_of(2, 4), num_moduli=10,
                                 fastmode=False, k_panel=8))
    np.testing.assert_array_equal(acc, sacc)


def test_summa_stream_memory_model_config5():
    """The 65536^3 (BASELINE config 5) footprint: full-K gathers exceed any
    single-chip HBM on small meshes, while K-panel streaming fits a v5p
    slice -- the capability the streaming algorithm exists for."""
    from gemmul8_tpu.parallel import summa_work_bytes
    GiB = 1 << 30
    v5p = 95 * GiB
    # 8-chip v5p slice: streaming fits, gather does not
    stream8 = summa_work_bytes(65536, 65536, 65536, (2, 4), 16, k_panel=4096)
    gather8 = summa_work_bytes(65536, 65536, 65536, (2, 4), 16)
    # streaming (78 GiB) fits the slice with working headroom; the full-K
    # gather (88 GiB) grazes the 95-GiB limit with < 8 GiB left for XLA
    # temps/fragmentation
    assert stream8 < v5p - 10 * GiB
    assert gather8 > v5p - 8 * GiB
    assert stream8 < gather8
    # 32-chip slice: comfortable margin
    stream32 = summa_work_bytes(65536, 65536, 65536, (4, 8), 16, k_panel=4096)
    assert stream32 < 24 * GiB
    # streaming panel term is O(nu * m_loc * k_panel), independent of k
    p1 = summa_work_bytes(1 << 16, 1 << 16, 1 << 16, (4, 8), 16, k_panel=1024)
    p2 = summa_work_bytes(1 << 16, 1 << 16, 1 << 17, (4, 8), 16, k_panel=1024)
    inputs_planes_delta = p2 - p1
    gather_delta = (summa_work_bytes(1 << 16, 1 << 16, 1 << 17, (4, 8), 16)
                    - summa_work_bytes(1 << 16, 1 << 16, 1 << 16, (4, 8), 16))
    assert inputs_planes_delta < gather_delta  # gather grows much faster in k


def test_memory_models_backend_and_fastmode_terms():
    """Round-3 review fixes: summa_work_bytes models FP8's 6 B/elem planes
    and int16 c_mid (it used to silently assume INT8 -- a 'fits HBM'
    conclusion ~6x low); summa_bytes_moved counts accurate mode's ub-plane
    all-gathers; the gather path charges the chunked int32 accumulator
    beyond the exact-dot K bound."""
    from gemmul8_tpu.parallel import summa_bytes_moved, summa_work_bytes
    i8 = summa_work_bytes(8192, 8192, 8192, (2, 4), 10, k_panel=1024)
    f8 = summa_work_bytes(8192, 8192, 8192, (2, 4), 10, k_panel=1024,
                          backend="FP8")
    assert f8 > 2 * i8  # 6x plane + 2x c_mid bytes (f64 inputs are shared)
    # gather path: crossing the K_CHUNK bound adds the int32 accumulator
    lo = summa_work_bytes(1024, 1024, 1 << 17, (1, 1), 10)
    hi = summa_work_bytes(1024, 1024, (1 << 17) + 1024, (1, 1), 10)
    assert hi - lo > 4 * 10 * 1024 * 1024  # >= acc term, not just planes
    fast = summa_bytes_moved(4096, 4096, 4096, (2, 4), 16)
    accu = summa_bytes_moved(4096, 4096, 4096, (2, 4), 16, fastmode=False)
    assert accu > fast
    # the accurate-mode surcharge is ~1/nu of the plane traffic per operand
    assert (accu - fast) * 10 < fast


def test_summa_compiled_program_is_cached():
    """summa_gemm must reuse ONE jitted shard_map wrapper per config --
    a fresh wrapper per call would XLA-recompile every solver-layer block
    step (jit caches key on function identity)."""
    from gemmul8_tpu.parallel import summa
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((32, 32)))
    b = jnp.asarray(rng.standard_normal((32, 32)))
    mesh = mesh_of(2, 2)
    kw = dict(mesh=mesh, num_moduli=7)
    c1 = summa.summa_gemm(a, b, **kw)
    info1 = summa._summa_jit.cache_info()
    c2 = summa.summa_gemm(a + 1, b, **kw)
    info2 = summa._summa_jit.cache_info()
    assert info2.hits > info1.hits, (info1, info2)
    np.testing.assert_array_equal(
        np.asarray(summa.summa_gemm(a, b, **kw)), np.asarray(c1))
