"""Calibrated accuracy model and num_moduli chooser.

The reference exposes ``num_moduli`` as a raw dial and leaves picking it to
the user (include/gemmul8.hpp:30 documents only the valid range; guidance
lives in the paper: ~14-16 moduli for FP64-grade DGEMM). This module adds
what the reference lacks: a measured model of the fast-mode max relative
error as a function of ``num_moduli`` and an inverse -- "give me the cheapest
setting that hits this accuracy".

Model
-----
For standard-normal-ish data (the phi = -1 rows of the reference accuracy
protocol, testing/test_accuracy.hpp:20-30)::

    log2(max_rel_err)  ~=  C  -  log2(P_nu) / 2  +  spread_bits

where ``P_nu`` is the product of the first ``nu`` moduli (each INT8 modulus
contributes ~8 bits, each FP8 modulus ~9-10) and ``C`` is an empirical
constant. The 1/2 is structural: the integer budget log2(P) is split evenly
between the two operands' quantizations (NUMERICS.md section 2), so each
extra modulus buys ~4 bits of result accuracy on the INT8 backend.

Calibration: C = 22.4 .. 24.5 across k in [2^10, 2^13], nu in [6, 18], both
backends, on the committed CPU sweeps (benchmarks/results/
oz2_results_INT8_f64_accuracy_cpu_*.csv phi=-1 rows plus an FP8 spot sweep);
stable to +-1.5 bits until the output-dtype roundoff floor. We use the worst
observed C (24.5) plus a default 3-bit safety margin.

``spread_bits`` widens the budget for data with a large exponent spread: the
protocol's phi = 2 sweep (elements (U-0.5)*e^(2N)) sits ~11 bits above the
phi = -1 rows in fast mode. For strongly spread data prefer
``fastmode="robust"`` (scale-invariant shifts, NUMERICS.md section 3b) or
accurate mode, whose errors track the same model without the blow-up the
reference fast formula suffers at phi >= 4.

The model is advisory: it predicts the protocol's max elementwise relative
error on random data, not a rigorous bound for adversarial inputs.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

from . import tables

#: worst empirical intercept observed in calibration (see module docstring)
CALIBRATED_C = 24.5

#: modeled native-GEMM max relative error per output dtype on protocol data:
#: f64 ~ 2^-36 (CPU f64 sweeps, k-independent: small-denominator entries
#: dominate), f32 ~ 2^-10 (CPU f32 native row; also conservative for the TPU
#: native f32 path, which is a single bf16 pass at ~2^-13 .. 2^-10).
NATIVE_ERR_BITS = {"float64": -36.0, "float32": -10.0,
                   "complex128": -36.0, "complex64": -10.0}

#: the emulation's output-dtype floor sits ~5-6.5 bits above eps on protocol
#: data (rounding of the inverse-scaled result is amplified on entries whose
#: |c| is small relative to their row/col scale): measured f32 floor 2^-18.4
#: (eps 2^-23.25), f64 floor 2^-45.9 .. -48.9 (eps 2^-52.4). 6 bits is the
#: conservative allowance.
FLOOR_AMPLIFICATION_BITS = 6.0


def log2_P(num_moduli: int, backend: str = tables.Backend.INT8) -> float:
    """log2 of the product of the first ``num_moduli`` moduli.

    NOT the same quantity as tables.log2P, which is the reference's shift
    constant log2(P-1)/2 - 0.5 (halved and offset, f32-rounded-down)."""
    mods = tables.moduli(backend)
    if not 1 <= num_moduli <= len(mods):
        raise ValueError(f"num_moduli must be in [1, {len(mods)}]")
    return sum(math.log2(p) for p in mods[:num_moduli])


def modeled_max_rel_err(num_moduli: int, *,
                        backend: str = tables.Backend.INT8,
                        spread_bits: float = 0.0,
                        out_dtype=np.float64) -> float:
    """Modeled fast-mode max elementwise relative error at ``num_moduli``.

    Floored at the output dtype's roundoff (the emulation cannot beat the
    precision of the dtype it returns).
    """
    bits = CALIBRATED_C - log2_P(num_moduli, backend) / 2.0 + spread_bits
    floor_bits = (math.log2(np.finfo(np.dtype(out_dtype)).eps)
                  + FLOOR_AMPLIFICATION_BITS)
    return 2.0 ** max(bits, floor_bits)


def choose_moduli(target_rel_err: Optional[float] = None, *,
                  dtype=np.float64,
                  backend: str = tables.Backend.INT8,
                  spread_bits: float = 0.0,
                  margin_bits: float = 3.0) -> int:
    """Smallest ``num_moduli`` whose modeled error beats ``target_rel_err``.

    Args:
      target_rel_err: desired max elementwise relative error. ``None`` means
        "match the native GEMM of ``dtype``" (f64: ~2^-36; f32: ~2^-10 --
        the measured native max-rel-err on protocol data, which is what the
        reference's accuracy tables compare against).
      dtype: output dtype; bounds the valid num_moduli range
        (tables.VALID_RANGE, reference include/gemmul8.hpp:30) and the
        roundoff floor.
      backend: "INT8" (default) or "FP8".
      spread_bits: extra bits demanded for data with wide exponent spread
        (~11 for the protocol's phi = 2; 0 for normal-ish data). For heavy
        spread use fastmode="robust" instead of inflating this.
      margin_bits: safety margin on top of the calibrated model (default 3).

    Raises:
      ValueError: if no valid ``num_moduli`` reaches the target; the message
        reports the best achievable modeled error (consider accurate mode,
        the FP8 backend's wider moduli, or a float128-style post-refinement
        outside this library's scope).
    """
    dname = np.dtype(dtype).name
    if dname not in tables.VALID_RANGE:
        raise TypeError(f"unsupported dtype {dname}")
    lo, hi = tables.VALID_RANGE[dname]
    real = {"complex64": "float32", "complex128": "float64"}.get(dname, dname)
    if target_rel_err is None:
        target_rel_err = 2.0 ** NATIVE_ERR_BITS[dname]
    if target_rel_err <= 0:
        raise ValueError("target_rel_err must be positive")
    target_bits = math.log2(target_rel_err)
    # the output dtype's own rounding (plus its protocol-data amplification)
    # caps what any num_moduli can deliver: refuse rather than under-deliver
    floor_bits = (math.log2(np.finfo(np.dtype(real)).eps)
                  + FLOOR_AMPLIFICATION_BITS)
    if target_bits < floor_bits:
        raise ValueError(
            f"target 2^{target_bits:.1f} is below the {real} output floor "
            f"(~2^{floor_bits:.1f}: dtype roundoff plus protocol-data "
            f"amplification); use a float64/complex128 output dtype")
    for nu in range(lo, hi + 1):
        bits = (CALIBRATED_C - log2_P(nu, backend) / 2.0
                + spread_bits + margin_bits)
        if bits <= target_bits:
            return nu
    best = (CALIBRATED_C - log2_P(hi, backend) / 2.0
            + spread_bits + margin_bits)
    raise ValueError(
        f"no num_moduli in [{lo}, {hi}] reaches target 2^{target_bits:.1f} "
        f"for {dname}/{backend} (best modeled: 2^{best:.1f}); consider "
        f"fastmode=False (accurate mode) or relaxing the target")
