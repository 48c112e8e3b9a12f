"""accuracy_model v2: the per-mode calibrated error model and the
(num_moduli, fastmode) chooser.

Two kinds of tests:
  * end-to-end: the setting the chooser picks must actually achieve the
    requested error on protocol-style data (catches calibration drift if
    the quantizer or tables ever change);
  * envelope: the model must upper-bound EVERY committed calibration-sweep
    row within its declared domain (benchmarks/results/oz2_calib_*_r4.csv
    and the round-2 fast/robust sweeps)."""
import csv
import glob
import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu import accuracy_model, tables

RESULTS = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "results")


def _max_rel_err(c, a, b):
    ref = a.astype(np.longdouble) @ b.astype(np.longdouble)
    den = np.maximum(np.abs(ref), np.finfo(np.longdouble).tiny)
    return float(np.max(np.abs(np.asarray(c, ref.dtype) - ref) / den))


def test_choose_native_f64_matches_known_guidance():
    # the paper/NUMERICS guidance: native-f64 quality at nu ~ 14-16; the
    # 3-bit margin may push one step higher
    ch = g8.choose_moduli(dtype=np.float64)
    assert 14 <= ch.num_moduli <= 18
    assert ch.fastmode in (True, "robust")
    assert ch.modeled_rel_err <= 2.0 ** -36


def test_choose_monotonic_in_target():
    prev = 2
    for bits in range(-6, -45, -2):
        ch = g8.choose_moduli(2.0 ** bits, dtype=np.float64)
        assert ch.num_moduli >= prev
        prev = ch.num_moduli


def test_choose_respects_valid_range_and_raises():
    # a target below the output dtype's floor raises, naming the floor
    with pytest.raises(ValueError, match="output floor"):
        g8.choose_moduli(2.0 ** -60, dtype=np.float64)
    # a representable target that no valid setting reaches (because of a
    # huge spread demand) raises with the best achievable in the message
    with pytest.raises(ValueError, match="best modeled"):
        g8.choose_moduli(2.0 ** -38, dtype=np.float64, spread_bits=25.0)
    # below the (spread-lifted) output floor: a different, named refusal
    with pytest.raises(ValueError, match="output floor"):
        g8.choose_moduli(2.0 ** -41, dtype=np.float64, spread_bits=25.0)
    # an f32 target below the f32 output floor raises too (refuse rather
    # than silently under-deliver), pointing at a wider output dtype
    with pytest.raises(ValueError, match="output floor"):
        g8.choose_moduli(2.0 ** -20, dtype=np.float32)
    ch = g8.choose_moduli(2.0 ** -5, dtype=np.float32)
    assert tables.VALID_RANGE["float32"][0] <= ch.num_moduli <= 13


def test_modeled_err_floors_at_dtype_eps():
    e = accuracy_model.modeled_max_rel_err(20, out_dtype=np.float64)
    assert e >= np.finfo(np.float64).eps
    # fast mode outside its calibrated spread domain is declared invalid
    assert accuracy_model.modeled_max_rel_err(
        20, spread_bits=20.0, fastmode=True) == math.inf
    # robust stays finite there
    assert accuracy_model.modeled_max_rel_err(
        20, spread_bits=20.0, fastmode="robust") < 1e-3


@pytest.mark.parametrize("backend", [tables.Backend.INT8, tables.Backend.FP8])
@pytest.mark.parametrize("target_bits", [-18, -30])
def test_chosen_setting_achieves_target(backend, target_bits):
    target = 2.0 ** target_bits
    ch = g8.choose_moduli(target, dtype=np.float64, backend=backend)
    rng = np.random.default_rng(42)
    k = 2048
    a = rng.standard_normal((96, k))
    b = rng.standard_normal((k, 96))
    c = g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=ch.num_moduli,
                fastmode=ch.fastmode, backend=backend)
    err = _max_rel_err(c, a, b)
    assert err <= target, f"{ch} err=2^{math.log2(err):.1f}"
    # and the chooser is not wastefully conservative: two fewer moduli
    # should NOT be modeled to reach the target (the margin allows one)
    if ch.num_moduli - 2 >= tables.VALID_RANGE["float64"][0]:
        assert accuracy_model.modeled_max_rel_err(
            ch.num_moduli - 2, backend=backend,
            fastmode=ch.fastmode) > target


def test_spread_bits_demands_more_moduli_or_robust():
    ch0 = g8.choose_moduli(2.0 ** -24, dtype=np.float64)
    ch1 = g8.choose_moduli(2.0 ** -24, dtype=np.float64, spread_bits=11.0)
    assert (ch1.num_moduli > ch0.num_moduli
            or (ch1.fastmode == "robust" and ch0.fastmode is True))
    # past fast mode's calibrated domain the chooser must pick robust
    ch2 = g8.choose_moduli(2.0 ** -20, dtype=np.float64, spread_bits=20.0)
    assert ch2.fastmode == "robust"


def test_chooser_promise_on_hard_spread_data():
    """The phi=2 case the round-3 VERDICT called out: the fast formula's
    errors blow past any model at heavy spread; the chooser must hand back
    a setting that still delivers."""
    phi, target = 2.0, 2.0 ** -20
    ch = g8.choose_moduli(target, dtype=np.float64,
                          spread_bits=accuracy_model.BITS_PER_PHI * phi)
    rng = np.random.default_rng(12345)
    k = 2048
    u, z = rng.random((96, k)), rng.standard_normal((96, k))
    a = (u - 0.5) * np.exp(z * phi)
    u, z = rng.random((k, 96)), rng.standard_normal((k, 96))
    b = (u - 0.5) * np.exp(z * phi)
    c = g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=ch.num_moduli,
                fastmode=ch.fastmode)
    err = _max_rel_err(c, a, b)
    assert err <= target, f"{ch} err=2^{math.log2(err):.1f}"


# ---------------------------------------------------------------------------
# envelope validation against EVERY committed calibration row
# ---------------------------------------------------------------------------

_MODE_OF = {"oz2-fast": True, "oz2-robust": "robust", "oz2-accu": False,
            "oz2-fast-fp8": True, "oz2-robust-fp8": "robust",
            "oz2-accu-fp8": False}


def _sweep_rows():
    out = []
    for path in sorted(
            glob.glob(os.path.join(RESULTS, "oz2_calib_*_r4.csv"))
            + glob.glob(os.path.join(RESULTS, "oz2_results_INT8_f??_accuracy_cpu_round2*.csv"))):
        fname = os.path.basename(path)
        backend = "FP8" if "_FP8_" in fname else "INT8"
        dt = np.float32 if "_f32_" in fname else np.float64
        for r in csv.DictReader(open(path)):
            mode = _MODE_OF.get(r["method"])
            if mode is None or not r["num_moduli"]:
                continue
            try:
                err = float(r["err_max"])
            except ValueError:
                continue        # 'skipped' annotations
            out.append((fname, backend, dt, mode, int(r["num_moduli"]),
                        float(r["phi"]), err))
    return out


def test_model_is_upper_envelope_of_committed_sweeps():
    rows = _sweep_rows()
    assert len(rows) > 200, "calibration CSVs missing?"
    checked = 0
    for fname, backend, dt, mode, nu, phi, err in rows:
        spread = max(0.0, phi) * accuracy_model.BITS_PER_PHI
        if mode is True and spread > accuracy_model.FAST_SPREAD_LIMIT:
            continue            # fast mode is declared invalid there
        modeled = accuracy_model.modeled_max_rel_err(
            nu, backend=backend, spread_bits=spread, out_dtype=dt,
            fastmode=mode)
        if modeled >= 0.25:
            # the model already declares this setting useless (no correct
            # digits); the exact magnitude of garbage is out of scope
            continue
        assert err <= modeled, (
            f"{fname}: {mode}/{backend} nu={nu} phi={phi}: measured "
            f"2^{math.log2(err):.1f} > modeled 2^{math.log2(modeled):.1f}")
        checked += 1
    assert checked > 150
