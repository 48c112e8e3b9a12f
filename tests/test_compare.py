"""Alternative-emulation comparison baselines (reference:
test_accuracy.hpp:84-156, ozaki1.hpp:8-50): the context rows the accuracy
and flops harnesses report next to the Ozaki-II emulator."""
import jax.numpy as jnp
import numpy as np

import gemmul8_tpu as g8
from gemmul8_tpu import compare

RNG = np.random.default_rng(77)


def test_bf16x9_beats_plain_f32():
    a = jnp.asarray(RNG.standard_normal((96, 1024)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((1024, 64)), jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    e9 = np.max(np.abs(np.asarray(compare.matmul_bf16x9(a, b)) - ref)
                / np.abs(ref))
    en = np.max(np.abs(np.asarray(a) @ np.asarray(b) - ref) / np.abs(ref))
    assert e9 <= en
    assert e9 < 1e-3


def test_os1_int8_accuracy_and_oz2_context():
    """OS1 (36 int8 GEMMs at d=8) must land near f64 quality, and the
    Ozaki-II row (16 GEMMs at nu=16) must be at least as accurate -- the
    scheme-II-vs-scheme-I story the comparison exists to show."""
    a = jnp.asarray(RNG.standard_normal((80, 2048)))
    b = jnp.asarray(RNG.standard_normal((2048, 64)))
    ref = np.asarray(a, np.longdouble) @ np.asarray(b, np.longdouble)
    e1 = float(np.max(np.abs(np.asarray(compare.matmul_os1_int8(a, b, d=8))
                             - ref) / np.abs(ref)))
    e2 = float(np.max(np.abs(np.asarray(g8.gemm(a, b, num_moduli=16)) - ref)
                      / np.abs(ref)))
    assert e1 < 1e-10
    assert e2 <= e1 * 2          # scheme II >= scheme I quality at 16 vs 36 GEMMs
    # accuracy dial: fewer slices -> worse
    e_lo = float(np.max(np.abs(np.asarray(compare.matmul_os1_int8(a, b, d=5))
                               - ref) / np.abs(ref)))
    assert e_lo > e1


def test_baselines_reproducible():
    a = jnp.asarray(RNG.standard_normal((64, 256)))
    b = jnp.asarray(RNG.standard_normal((256, 64)))
    c1 = np.asarray(compare.matmul_os1_int8(a, b))
    c2 = np.asarray(compare.matmul_os1_int8(a, b))
    np.testing.assert_array_equal(c1, c2)
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    d1 = np.asarray(compare.matmul_bf16x9(a32, b32))
    d2 = np.asarray(compare.matmul_bf16x9(a32, b32))
    np.testing.assert_array_equal(d1, d2)
