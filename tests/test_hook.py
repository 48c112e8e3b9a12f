"""Hook-mode tests: transparent dot_general interception, env-var config,
native fallthrough, MLP end-to-end with bitwise-identical logits
(mirrors reference debug/test_hijack.cu + BASELINE config 4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu.models import mlp


@pytest.fixture(autouse=True)
def _clean_hook():
    yield
    g8.uninstall()
    for k in list(os.environ):
        if k.startswith("GEMMUL8_"):
            del os.environ[k]


def test_context_manager_intercepts_matmul():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((32, 64)), jnp.float64)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((64, 16)), jnp.float64)
    direct = g8.gemm(a, b, num_moduli=10)
    with g8.emulate(num_moduli=10):
        hooked = jnp.matmul(a, b)
    native = jnp.matmul(a, b)
    np.testing.assert_array_equal(np.asarray(hooked), np.asarray(direct))
    assert not np.array_equal(np.asarray(hooked), np.asarray(native))


def test_env_var_config_and_fallthrough():
    a = jnp.asarray(np.random.default_rng(2).standard_normal((16, 32)), jnp.float64)
    b = jnp.asarray(np.random.default_rng(3).standard_normal((32, 8)), jnp.float64)
    native = jnp.matmul(a, b)
    g8.install()  # env-driven; no env vars set -> everything native
    assert np.array_equal(np.asarray(jnp.matmul(a, b)), np.asarray(native))
    os.environ["GEMMUL8_NUM_MOD_D"] = "9"
    g8.refresh()  # env changes take effect at re-trace (see hook docstring)
    hooked = jnp.matmul(a, b)
    assert np.array_equal(np.asarray(hooked),
                          np.asarray(g8.gemm(a, b, num_moduli=9)))
    # out-of-range -> native fallthrough (reference hook.cu:625-629)
    os.environ["GEMMUL8_NUM_MOD_D"] = "25"
    g8.refresh()
    assert np.array_equal(np.asarray(jnp.matmul(a, b)), np.asarray(native))
    # f32 unaffected (no GEMMUL8_NUM_MOD_S)
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    assert np.array_equal(np.asarray(jnp.matmul(a32, b32)),
                          np.asarray(jnp.matmul(a32, b32)))


def test_einsum_and_batched_shapes():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.standard_normal((3, 24, 32)), jnp.float64)
    b = jnp.asarray(rng.standard_normal((3, 32, 8)), jnp.float64)
    with g8.emulate(num_moduli=12):
        hooked = jnp.einsum("bij,bjk->bik", a, b)
    want = jnp.stack([g8.gemm(a[i], b[i], num_moduli=12) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(hooked), np.asarray(want))
    # (batch, m, k) @ (k, n) broadcast form
    b2 = jnp.asarray(rng.standard_normal((32, 8)), jnp.float64)
    with g8.emulate(num_moduli=12):
        hooked2 = jnp.matmul(a, b2)
    want2 = jnp.stack([g8.gemm(a[i], b2, num_moduli=12) for i in range(3)])
    np.testing.assert_allclose(np.asarray(hooked2), np.asarray(want2), rtol=1e-13)


def test_hook_under_jit():
    """Functions traced AFTER install must route through the emulator."""
    a = jnp.asarray(np.random.default_rng(5).standard_normal((16, 48)), jnp.float64)
    b = jnp.asarray(np.random.default_rng(6).standard_normal((48, 16)), jnp.float64)

    with g8.emulate(num_moduli=11):
        f = jax.jit(lambda x, y: jnp.matmul(x, y))
        hooked = np.asarray(f(a, b))
    np.testing.assert_array_equal(hooked, np.asarray(g8.gemm(a, b, num_moduli=11)))


def test_mlp_logits_bitwise_reproducible():
    """BASELINE config 4: FP32 MLP inference through the hook, rerun -> identical
    bits; and the hook must actually change the computation."""
    key = jax.random.PRNGKey(0)
    params = mlp.init_params(key, [64, 128, 128, 10])
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 64), jnp.float32)
    native = np.asarray(mlp.forward(params, x))
    with g8.emulate(num_moduli=8):
        l1 = np.asarray(mlp.forward(params, x))
        l2 = np.asarray(mlp.forward(params, x))
    assert np.array_equal(l1.view(np.int32), l2.view(np.int32))
    assert not np.array_equal(l1, native)
    # and accuracy stays sane
    np.testing.assert_allclose(l1, native, rtol=0, atol=1e-3)


def test_hooked_matmul_is_differentiable():
    """The emulated path carries a custom VJP whose backward GEMMs are emulated
    too (the raw emulator graph contains non-differentiable bit ops)."""
    rng = np.random.default_rng(8)
    a = jnp.asarray(rng.standard_normal((8, 16)), jnp.float64)
    b = jnp.asarray(rng.standard_normal((16, 4)), jnp.float64)

    def loss(a, b):
        return jnp.sum(jnp.matmul(a, b) ** 2)

    with g8.emulate(num_moduli=14):
        ga = jax.grad(loss)(a, b)
    ga_native = jax.grad(loss)(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_native),
                               rtol=1e-9, atol=1e-9)


def test_precompute_skip_scal():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((24, 64)), jnp.float64)
    qa = g8.precompute(a, "A", num_moduli=10)
    for _ in range(2):
        b = jnp.asarray(rng.standard_normal((64, 12)), jnp.float64)
        qb = g8.precompute(b, "B", num_moduli=10)
        got = g8.gemm_quantized(qa, qb, out_dtype=jnp.float64)
        want = g8.gemm(a, b, num_moduli=10)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_hook_batched_attention_shapes():
    """Batched dot_generals (attention-style BHSD contractions) route through
    the emulator: bit-identical reruns, einsum == matmul, plausible values."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 4, 8, 16)), jnp.float32)
    with g8.emulate(num_moduli=8):
        s1 = np.asarray(jnp.matmul(x, y))
        s2 = np.asarray(jnp.matmul(x, y))
        e = np.asarray(jnp.einsum("bhsd,bhdk->bhsk", x, y))
    assert np.array_equal(s1, s2)
    assert np.array_equal(s1, e)
    ref = np.asarray(x) @ np.asarray(y)
    assert np.max(np.abs(s1 - ref)) < 1e-4


def test_hook_integer_matmuls_stay_native():
    """Integer dot_generals are not emulation candidates: they must pass
    through untouched (and exactly) while the hook is installed."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.integers(-100, 100, (16, 32)), jnp.int8)
    y = jnp.asarray(rng.integers(-100, 100, (32, 8)), jnp.int8)
    ref = np.asarray(x, np.int32) @ np.asarray(y, np.int32)
    with g8.emulate(num_moduli=8):
        got = np.asarray(jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    np.testing.assert_array_equal(got, ref)


def test_hook_complex_gradients():
    """The hook's custom VJP covers complex matmuls: gradients flow and are
    bit-reproducible."""
    rng = np.random.default_rng(10)
    a = jnp.asarray(rng.standard_normal((8, 12)) + 1j * rng.standard_normal((8, 12)))
    b = jnp.asarray(rng.standard_normal((12, 6)) + 1j * rng.standard_normal((12, 6)))

    def loss(b):
        with g8.emulate(num_moduli=12):
            return jnp.sum(jnp.abs(a @ b) ** 2)

    g1 = np.asarray(jax.grad(loss)(b))
    g2 = np.asarray(jax.grad(loss)(b))
    assert np.array_equal(g1, g2)
    # must match native autodiff to emulation precision: the custom VJP has
    # to mirror dot_general's LINEAR transpose rule (no conjugation) --
    # conjugating inside the VJP corrupts complex gradients (regression test
    # for exactly that bug)
    gn = np.asarray(jax.grad(lambda b: jnp.sum(jnp.abs(a @ b) ** 2))(b))
    scale = np.max(np.abs(gn))
    assert np.max(np.abs(g1 - gn)) / scale < 1e-8


def test_eager_plane_cache(monkeypatch):
    """Eager-mode skip-scal cache (the reference hook's Info_t analog):
    repeated DIRECT lax.dot_general calls with the same array objects reuse
    quantized planes and stay bit-identical to the uncached path. (jnp
    operators trace under implicit jit and never reach the eager path --
    traced programs requantize inside the compiled executable instead; use
    g8.precompute for explicit reuse there.)"""
    from gemmul8_tpu import hook as hook_mod
    dn = (((1,), (0,)), ((), ()))
    rng = np.random.default_rng(12)
    a = jnp.asarray(rng.standard_normal((24, 96)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((96, 16)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((96, 16)), jnp.float32)

    monkeypatch.setenv("GEMMUL8_EAGER_CACHE", "0")
    with g8.emulate(num_moduli=9):
        ref1 = np.asarray(jax.lax.dot_general(a, b1, dn))
        ref2 = np.asarray(jax.lax.dot_general(a, b2, dn))

    monkeypatch.setenv("GEMMUL8_EAGER_CACHE", "1")
    hook_mod.clear_plane_cache()
    h0 = hook_mod.cache_hits
    with g8.emulate(num_moduli=9):
        c1 = np.asarray(jax.lax.dot_general(a, b1, dn))
        c2 = np.asarray(jax.lax.dot_general(a, b2, dn))  # A planes reused
        c1b = np.asarray(jax.lax.dot_general(a, b1, dn))  # both reused
    assert hook_mod.cache_hits - h0 >= 3
    np.testing.assert_array_equal(c1, ref1)
    np.testing.assert_array_equal(c2, ref2)
    np.testing.assert_array_equal(c1b, ref1)
    hook_mod.clear_plane_cache()
