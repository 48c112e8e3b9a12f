"""accuracy_model: the calibrated error model and the num_moduli chooser.

The end-to-end tests are the point: the nu the chooser picks must actually
achieve the requested error on protocol-style data (the model is calibrated
on the committed accuracy sweeps; these tests catch calibration drift if the
quantizer or tables ever change)."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu import accuracy_model, tables


def _max_rel_err(c, a, b):
    ref = a.astype(np.longdouble) @ b.astype(np.longdouble)
    den = np.maximum(np.abs(ref), np.finfo(np.longdouble).tiny)
    return float(np.max(np.abs(np.asarray(c, ref.dtype) - ref) / den))


def test_choose_native_f64_matches_known_guidance():
    # the paper/NUMERICS guidance: native-f64 quality at nu ~ 14-16; the
    # 3-bit margin may push one step higher
    nu = g8.choose_moduli(dtype=np.float64)
    assert 14 <= nu <= 18


def test_choose_monotonic_in_target():
    prev = 2
    for bits in range(-6, -45, -2):
        nu = g8.choose_moduli(2.0 ** bits, dtype=np.float64)
        assert nu >= prev
        prev = nu


def test_choose_respects_valid_range_and_raises():
    # a target below the output dtype's floor raises, naming the floor
    with pytest.raises(ValueError, match="output floor"):
        g8.choose_moduli(2.0 ** -60, dtype=np.float64)
    # a representable target that no valid nu reaches (because of a large
    # spread demand) raises with the best achievable error in the message
    with pytest.raises(ValueError, match="best modeled"):
        g8.choose_moduli(2.0 ** -42, dtype=np.float64, spread_bits=14.0)
    # an f32 target below the f32 output floor raises too (refuse rather
    # than silently under-deliver), pointing at a wider output dtype
    with pytest.raises(ValueError, match="output floor"):
        g8.choose_moduli(2.0 ** -20, dtype=np.float32)
    nu = g8.choose_moduli(2.0 ** -5, dtype=np.float32)
    assert tables.VALID_RANGE["float32"][0] <= nu <= 13


def test_modeled_err_floors_at_dtype_eps():
    e = accuracy_model.modeled_max_rel_err(20, out_dtype=np.float64)
    assert e >= np.finfo(np.float64).eps


@pytest.mark.parametrize("backend", [tables.Backend.INT8, tables.Backend.FP8])
@pytest.mark.parametrize("target_bits", [-18, -30])
def test_chosen_nu_achieves_target(backend, target_bits):
    target = 2.0 ** target_bits
    nu = g8.choose_moduli(target, dtype=np.float64, backend=backend)
    rng = np.random.default_rng(42)
    k = 2048
    a = rng.standard_normal((96, k))
    b = rng.standard_normal((k, 96))
    c = g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu,
                fastmode=True, backend=backend)
    err = _max_rel_err(c, a, b)
    assert err <= target, f"nu={nu} err=2^{math.log2(err):.1f}"
    # and the chooser is not wastefully conservative: two fewer moduli
    # should NOT be modeled to reach the target (the margin allows one)
    if nu - 2 >= tables.VALID_RANGE["float64"][0]:
        assert accuracy_model.modeled_max_rel_err(
            nu - 2, backend=backend) > target


def test_spread_bits_demands_more_moduli():
    nu0 = g8.choose_moduli(2.0 ** -24, dtype=np.float64)
    nu1 = g8.choose_moduli(2.0 ** -24, dtype=np.float64, spread_bits=11.0)
    assert nu1 > nu0
