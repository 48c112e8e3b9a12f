"""Quantizer correctness: exact power-of-two ops, residue consistency vs a big-int
CRT oracle, and shift-formula safety (no wraparound past P/2)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemmul8_tpu import quantize, tables


def crt_bigint(planes: np.ndarray, nu: int, backend: str = "INT8") -> np.ndarray:
    """Exact CRT reconstruction of the integers encoded by residue planes."""
    mods = tables.moduli(backend)[:nu]
    P = math.prod(mods)
    v = np.zeros(planes.shape[1:], dtype=object)
    for i, p in enumerate(mods):
        Pi = P // p
        q = pow(Pi % p, -1, p)
        v = v + (q * Pi) * (planes[i].astype(object) % p)
    v = v % P
    return np.where(v > P // 2, v - P, v)


def test_pow2_exact():
    for dt in (jnp.float32, jnp.float64):
        e = jnp.arange(-120, 121, dtype=jnp.int32)
        got = np.asarray(quantize.pow2(e, dt), np.float64)
        np.testing.assert_array_equal(got, np.exp2(np.arange(-120, 121, dtype=np.float64)))


def test_pow2_scale_exact_extremes():
    # note: results must stay in the NORMAL range -- XLA CPU flushes subnormal
    # f64 results to zero (FTZ), unlike IEEE-strict hosts
    x = jnp.asarray([1.5, -3.25, 2.0 ** -1000, 2.0 ** 900], jnp.float64)
    s = jnp.asarray([1000, -1018, 1050, -890], jnp.int32)
    got = np.asarray(quantize.pow2_scale(x, s))
    want = np.asarray([math.ldexp(1.5, 1000), math.ldexp(-3.25, -1018),
                       math.ldexp(2.0 ** -1000, 1050), math.ldexp(2.0 ** 900, -890)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("nu", [2, 8, 20])
def test_residues_match_bigint_oracle(dtype, nu):
    """Planes must encode ONE integer v with |v - x*2^sft| <= 2 per element."""
    if dtype == np.float32 and nu > 13:
        pytest.skip("f32 valid range")
    rng = np.random.default_rng(42)
    x = (rng.standard_normal((16, 32)) * np.exp(rng.standard_normal((16, 32)) * 2)
         ).astype(dtype)
    x[0, 0] = 0.0
    x[1, :] = 0.0  # all-zero row
    sft = np.asarray(quantize.shift_fast(jnp.asarray(x), nu, "INT8", 1))
    planes = np.asarray(quantize.encode_planes(
        jnp.asarray(x), jnp.asarray(sft), 0, nu, "INT8"))
    assert planes.dtype == np.int8
    v = crt_bigint(planes, nu)
    y = x.astype(np.float64) * np.exp2(sft.astype(np.float64))[:, None]
    diff = np.abs(v - np.vectorize(lambda t: t)(y.astype(object)))
    assert float(np.max(diff)) <= 2.0


@pytest.mark.parametrize("nu", [2, 6, 13, 20])
def test_shift_safety_bound(nu):
    """Scaled rows must keep |<a_row, b_col>| < P/2 (CRT non-overflow).
    Adversarial-ish inputs: wide exponent spread."""
    rng = np.random.default_rng(7)
    k = 512
    a = rng.standard_normal((8, k)) * np.exp(rng.standard_normal((8, k)) * 4)
    b = rng.standard_normal((k, 8)) * np.exp(rng.standard_normal((k, 8)) * 4)
    sa = np.asarray(quantize.shift_fast(jnp.asarray(a), nu, "INT8", 1))
    sb = np.asarray(quantize.shift_fast(jnp.asarray(b), nu, "INT8", 0))
    P = math.prod(tables.moduli("INT8")[:nu])
    va = np.floor(np.abs(a) * np.exp2(sa.astype(np.float64))[:, None]) + 1
    vb = np.floor(np.abs(b) * np.exp2(sb.astype(np.float64))[None, :]) + 1
    prod = va @ vb  # upper bound on |sum v_a v_b|
    assert prod.max() < P / 2


def test_zero_rows_give_zero_planes():
    x = jnp.zeros((4, 8), jnp.float64)
    sft = quantize.shift_fast(x, 8, "INT8", 1)
    planes = np.asarray(quantize.encode_planes(x, sft, 0, 8, "INT8"))
    assert np.all(planes == 0)
    assert np.all(np.asarray(sft) == 0)


def test_extract_ub_is_upper_bound():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, 32)) * np.exp(rng.standard_normal((16, 32)) * 3)
    ub, pre = quantize.extract_ub_plane(jnp.asarray(x), "INT8", scale_axis=0)
    ub, pre = np.asarray(ub), np.asarray(pre)
    y = np.abs(x) * np.exp2(pre.astype(np.float64))[:, None]
    assert np.all(ub >= y - 1e-9)          # true upper bound
    assert ub.max() <= 65                  # 2^(maxUFP+1) + 1
    assert np.all((ub == 0) == (x == 0))
