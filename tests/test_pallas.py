"""Pallas fused encode kernel: interpret-mode bit-equality vs the jnp path.

The kernel (gemmul8_tpu/pallas_kernels.py) is the production encoder on TPU;
interpret mode executes the identical kernel logic on CPU, so equality here
plus the on-device equality check (run on v5e) pins both down."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from unittest import mock

from gemmul8_tpu import quantize, pallas_kernels as pk

RNG = np.random.default_rng(77)


def _ref_2comp(x, sft, scale_axis, nu):
    """jnp reference with the TPU component count (2 for f64, 1 for f32)."""
    n = 1 if x.dtype == jnp.float32 else 2
    with mock.patch.object(quantize, "_n_comp", lambda dt: n):
        return np.asarray(
            quantize.residues_wrapped(x, sft, scale_axis, nu, "INT8")
        ).astype(np.int8)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("nu", [4, 12, 20])
def test_encode_kernel_bit_identical(dtype, nu):
    x = jnp.asarray((RNG.standard_normal((64, 256))
                     * np.exp(RNG.standard_normal((64, 256)))).astype(dtype))
    for scale_axis in (0, 1):
        sft = quantize.shift_fast(x, nu, "INT8", 1 - scale_axis)
        comps = quantize.f32_components(x, 2)
        c1 = comps[1] if len(comps) > 1 else None
        got = np.asarray(pk.encode_planes_tiles(comps[0], c1, sft,
                                                scale_axis, nu, "INT8"))
        ref = _ref_2comp(x, sft, scale_axis, nu)
        np.testing.assert_array_equal(got, ref)


def test_encode_supported_gate():
    x = jnp.zeros((64, 256), jnp.float32)
    assert pk.encode_supported(x, 8, "INT8")
    assert pk.encode_supported(x, 8, "FP8")
    assert not pk.encode_supported(jnp.zeros((65, 256), jnp.float32), 8, "INT8")
    assert not pk.encode_supported(jnp.zeros((64, 250), jnp.float32), 8, "INT8")


def test_zero_and_edge_values():
    """Zero rows, subnormal-adjacent and sign-boundary values."""
    x = np.zeros((32, 128))
    x[1] = 2.0 ** -120
    x[2] = -(2.0 ** 100)
    x[3, ::2] = np.pi
    xj = jnp.asarray(x)
    sft = quantize.shift_fast(xj, 10, "INT8", 1)
    comps = quantize.f32_components(xj, 2)
    got = np.asarray(pk.encode_planes_tiles(comps[0], comps[1], sft, 0, 10,
                                            "INT8"))
    ref = _ref_2comp(xj, sft, 0, 10)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("nu", [5, 9, 13])
@pytest.mark.parametrize("scale_axis", [0, 1])
def test_fp8_encode_kernel_bit_identical(nu, scale_axis):
    """The FP8 Pallas encoder emits the (3*nu) batched-GEMM stack bit-
    identically to fp8 split + stack of the jnp residues."""
    from gemmul8_tpu import fp8
    x = jnp.asarray(RNG.standard_normal((64, 256)))
    sft = quantize.shift_fast(x, nu, "FP8", 1 - scale_axis)
    with mock.patch.object(quantize, "_n_comp", lambda dt: 2):
        res = quantize.residues_wrapped(x, sft, scale_axis, nu, "FP8")
    side = "lhs" if scale_axis == 0 else "rhs"
    ref = np.asarray(fp8._gemm_stack(fp8.split_planes(res, nu), nu, side),
                     np.float32)
    comps = quantize.f32_components(x, 2)
    got = np.asarray(pk.encode_planes_fp8_tiles(comps[0], comps[1], sft,
                                                scale_axis, nu), np.float32)
    np.testing.assert_array_equal(got, ref)
