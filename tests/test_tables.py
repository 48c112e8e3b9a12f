"""CRT table invariants, recomputed from first principles with exact arithmetic."""
import math
from fractions import Fraction

import numpy as np
import pytest

from gemmul8_tpu import tables


@pytest.mark.parametrize("backend", ["INT8", "FP8"])
def test_moduli_pairwise_coprime(backend):
    mods = tables.moduli(backend)
    assert len(mods) == 20
    for i in range(20):
        for j in range(i + 1, 20):
            assert math.gcd(mods[i], mods[j]) == 1


@pytest.mark.parametrize("backend", ["INT8", "FP8"])
@pytest.mark.parametrize("nu", range(2, 21))
def test_P_invP_exact(backend, nu):
    mods = tables.moduli(backend)[:nu]
    P = math.prod(mods)
    hi, lo = tables.P_dd(nu, backend)
    # hi is RN(-P), hi+lo == -P to double-double precision
    assert hi == float(-P)
    assert float(Fraction(-P) - Fraction(hi)) == lo
    assert tables.invP(nu, backend) == float(Fraction(1, P))
    pa, pb, pc = tables.P_q26(nu, backend)
    # Pa, Pb are exact 26-bit chunks; sum approximates -P to ~105 bits
    assert Fraction(pa).denominator == 1 or pa == 0
    rem = Fraction(-P) - Fraction(pa) - Fraction(pb)
    assert float(rem) == pc
    assert abs(int(pa)) >> max(int(abs(pa)).bit_length() - 26, 0) << \
        max(int(abs(pa)).bit_length() - 26, 0) == abs(int(pa))


@pytest.mark.parametrize("backend", ["INT8", "FP8"])
@pytest.mark.parametrize("nu", range(2, 21))
def test_qPi_crt_property(backend, nu):
    """q_i * P/p_i must be == 1 (mod p_i) and == 0 (mod p_j, j != i)."""
    mods = tables.moduli(backend)[:nu]
    P = math.prod(mods)
    qdd = tables.qPi_dd(nu, backend)
    q1 = tables.qPi_f64(nu, backend)
    for i, p in enumerate(mods):
        Pi = P // p
        q = pow(Pi % p, -1, p)
        qPi = q * Pi
        assert qPi % p == 1
        for j, pj in enumerate(mods):
            if j != i:
                assert qPi % pj == 0
        assert q1[i] == float(qPi)
        hi, lo = qdd[i]
        # hi exact integer chunk of qPi; hi+lo == qPi within RN
        assert float(Fraction(qPi) - Fraction(hi)) == lo


@pytest.mark.parametrize("backend", ["INT8", "FP8"])
def test_mod_pow2(backend):
    mods = tables.moduli(backend)
    t = tables.mod_pow2(backend)
    for i, p in enumerate(mods):
        for j in (0, 1, 7, 23, 57, tables.MAX_EXP):
            r = int(t[i, j])
            assert (r - pow(2, j, p)) % p == 0
            assert -p // 2 <= r <= p // 2


@pytest.mark.parametrize("backend", ["INT8", "FP8"])
@pytest.mark.parametrize("nu", range(2, 21))
def test_qPi_dd_common_grid(backend, nu):
    """The hi parts must share a power-of-two grid coarse enough that
    sum_i hi_i * r_i (|r_i| <= p_i/2) accumulates error-free in f64."""
    mods = tables.moduli(backend)[:nu]
    qdd = tables.qPi_dd(nu, backend)
    rho = sum(p // 2 for p in mods)
    grids = []
    for i in range(nu):
        hi = int(qdd[i, 0])
        assert float(hi) == qdd[i, 0]
        if hi:
            grids.append(hi & -hi)  # lowest set bit
    g = min(grids)
    total_max = sum(int(qdd[i, 0]) * (mods[i] // 2) for i in range(nu))
    # error-free: worst-case |sum| fits in 53 bits of the common grid
    assert total_max // g < (1 << 53)


def test_qPi_f32x_expansion():
    q = tables.qPi_f32x(8, "INT8")
    q1 = tables.qPi_f64(8, "INT8")
    # 4-term f32 expansion reproduces the f64 value to ~2^-96 relative
    s = q.astype(np.float64).sum(axis=1)
    np.testing.assert_allclose(s, q1, rtol=1e-18)


def test_num_mat():
    assert tables.num_mat(8, "INT8") == 8
    assert tables.num_mat(6, "FP8") == 12
    assert tables.num_mat(8, "FP8") == 2 * 6 + 3 * 2


def test_native_dd_oracle_matches_exact():
    """native/ddgemm.cpp (the eval.hpp analog) vs exact rational arithmetic."""
    import oracle
    from fractions import Fraction
    import numpy as np
    rng = np.random.default_rng(4)
    a = rng.standard_normal((6, 200))
    b = rng.standard_normal((200, 5))
    dd = oracle.matmul_dd(a, b)
    if dd is None:
        import pytest
        pytest.skip("no C++ toolchain")
    hi, lo = dd
    af = np.vectorize(Fraction)(a)
    bf = np.vectorize(Fraction)(b)
    exact = af @ bf
    worst = max(abs(float((Fraction(hi[i, j]) + Fraction(lo[i, j]) - exact[i, j])
                          / exact[i, j]))
                for i in range(6) for j in range(5))
    assert worst < 1e-28
