#!/usr/bin/env python3
"""Generate CRT/moduli constant tables for gemmul8_tpu with exact integer arithmetic.

Regenerates (from first principles, using exact `fractions.Fraction` / big-int
arithmetic) every constant the Ozaki-scheme-II GEMM emulation needs, mirroring the
semantics of the reference tables (reference: GEMMul8/src/table.hpp):

  - moduli lists for the INT8 and FP8 backends           (table.hpp:12-53)
  - P[nu]    = -prod(p_0..p_{nu-1}) as double-double     (table.hpp:80-126)
  - invP[nu] = RN_f64(1/prod)                            (table.hpp:137-151)
  - log2P[nu] = round-down-f32(log2(P-1)/2 - 0.5)        (table.hpp:161-203)
  - mod_pow2[i][j] = wrap(2^j mod p_i)                   (table.hpp:209-257; we use
    a uniform [20][j] layout over j=0..MAX_EXP instead of the reference's offset
    storage -- semantics identical)
  - qPi_1[nu][i] = RN_f64(q_i * P/p_i), q_i*(P/p_i) == 1 (mod p_i)  (table.hpp:277-327)
  - qPi_2[nu][i] = (hi, lo) double-double split: hi = first (53 - ceil(log2(rho)))
    bits of q_i*P/p_i with rho = sum(floor(p/2)); lo = RN_f64(exact - hi)
                                                         (table.hpp:330-332)

Additionally (TPU-specific, no reference counterpart): f32-expansion versions of
qPi / P / invP for the pure-float32 CRT epilogue used on real TPUs (where IEEE
float64 hardware does not exist).

Output: gemmul8_tpu/_tables_data.py (all floats stored as hex strings for
bit-exactness). Verify against the reference with tools/check_tables_vs_reference.py.
"""
from __future__ import annotations

import math
import os
from fractions import Fraction

MODULI_INT8 = [256, 255, 253, 251, 247, 241, 239, 233, 229, 227, 223,
               217, 211, 199, 197, 193, 191, 181, 179, 173]
MODULI_FP8 = [1089, 1024, 961, 841, 625, 529, 511, 509, 503, 499, 491,
              487, 481, 479, 467, 463, 461, 457, 449, 443]
SQRT_MODULI_FP8 = [33, 32, 31, 29, 25, 23]   # first 6 moduli are perfect squares
NOT_KARATSUBA = 6
NUM_MODULI_MAX = 20
MAX_EXP = 96  # mod_pow2 table covers 2^0 .. 2^MAX_EXP (quantized values < 2^81)

# num_moduli threshold below/equal which P fits in a single f64 in the CRT wrap
P_IS_DOUBLE = {"INT8": 6, "FP8": 5}


# ---------------------------------------------------------------------------
# exact rounding helpers
# ---------------------------------------------------------------------------

def rn_to_precision(x: Fraction, prec: int, emin: int | None = None) -> Fraction:
    """Round-to-nearest-even of rational x to a binary float with `prec`
    significant bits (unbounded exponent unless emin given). Returns Fraction."""
    if x == 0:
        return Fraction(0)
    sign = 1 if x > 0 else -1
    ax = abs(x)
    # e = floor(log2(ax))
    e = ax.numerator.bit_length() - ax.denominator.bit_length()
    if Fraction(2) ** e > ax:
        e -= 1
    while Fraction(2) ** (e + 1) <= ax:
        e += 1
    # significand grid: values m * 2^(e - prec + 1), m integer
    scale = e - prec + 1
    if emin is not None and e < emin:
        scale = emin - prec + 1  # subnormal grid
    q = ax / (Fraction(2) ** scale)
    m = q.numerator // q.denominator
    rem = q - m
    if rem > Fraction(1, 2) or (rem == Fraction(1, 2) and (m & 1)):
        m += 1
    return sign * m * Fraction(2) ** scale


def rn_f64(x: Fraction) -> float:
    """Correctly-rounded f64 of a rational (Fraction.__float__ is correctly rounded)."""
    return float(x)


def rn_f32(x: Fraction) -> float:
    """Correctly-rounded binary32 of a rational, returned as the equal f64 value."""
    r = rn_to_precision(x, 24, emin=-126)
    return float(r)  # exactly representable in f64


def f32_expansion(x: Fraction, n: int) -> list[float]:
    """Non-overlapping f32 expansion c_0 + c_1 + ... (RN residual peeling)."""
    comps = []
    rem = x
    for _ in range(n):
        c = rn_f32(rem)
        comps.append(c)
        rem = rem - Fraction(c)
    return comps


def f64_expansion(x: Fraction, n: int) -> list[float]:
    comps = []
    rem = x
    for _ in range(n):
        c = rn_f64(rem)
        comps.append(c)
        rem = rem - Fraction(c)
    return comps


def round_down_f32(x_hi: float) -> float:
    """Largest f32 <= x (x given as accurate f64; ties resolved by caller care)."""
    import struct
    f = struct.unpack("f", struct.pack("f", x_hi))[0]
    if f > x_hi:
        # step one ulp down in f32
        import numpy as _np
        f = float(_np.nextafter(_np.float32(f), _np.float32(-_np.inf)))
    return f


def wrap(r: int, p: int) -> int:
    """Wrap residue in [0,p) to the symmetric range [-p/2, p/2]."""
    half = p // 2
    if r > half:
        return r - p
    return r


# ---------------------------------------------------------------------------
# table construction
# ---------------------------------------------------------------------------

def build_backend(moduli: list[int], p_is_double: int) -> dict:
    out: dict = {}
    out["moduli"] = moduli

    # mod_pow2[i][j] = wrap(2^j mod p_i), j = 0..MAX_EXP
    out["mod_pow2"] = [
        [wrap(pow(2, j, p), p) for j in range(MAX_EXP + 1)] for p in moduli
    ]

    P_dd, invP, log2P = [], [], []
    P_q26, P_f32x4, invP_f32 = [], [], []
    qPi_1, qPi_2, qPi_f32x4 = [], [], []
    rho_list = []

    for nu in range(2, NUM_MODULI_MAX + 1):
        ps = moduli[:nu]
        P = math.prod(ps)

        # P as NEGATIVE double-double (hi = RN(-P), lo = RN(-P - hi))
        hi = rn_f64(Fraction(-P))
        lo = rn_f64(Fraction(-P) - Fraction(hi))
        P_dd.append((hi, lo))
        P_f32x4.append(f32_expansion(Fraction(-P), 4))

        # 26-bit chunk split of -P: Pa, Pb are exact 26-bit slices (so Pa*q and
        # Pb*q are exact f64 products for integer q < 2^26), Pc = RN(rest).
        # Used for the fma-free CRT wrap (XLA has no scalar fma primitive).
        bl = P.bit_length()
        sa = max(bl - 26, 0)
        pa = (P >> sa) << sa
        sb = max(bl - 52, 0)
        pb = ((P - pa) >> sb) << sb
        pc = rn_f64(Fraction(-(P - pa - pb)))
        assert float(-pa) == -pa and float(-pb) == -pb
        P_q26.append((float(-pa), float(-pb), pc))

        invP.append(rn_f64(Fraction(1, P)))
        # f32-MANTISSA rounding with UNBOUNDED exponent (stored as f64):
        # 1/P underflows binary32's range from nu ~ 17, so applying the f32
        # emin here would flush the table value to subnormal garbage / 0.0
        # with no way to rescale it back (tables.invP_f32's contract is
        # "rescale before casting")
        invP_f32.append(float(rn_to_precision(Fraction(1, P), 24)))

        # log2P = round-down-f32( log2(P-1)/2 - 0.5 )
        n = P - 1
        b = n.bit_length() - 1
        frac = float(Fraction(n, 1 << b))  # in [1,2), RN error ~2^-53 << f32 ulp
        val = (b + math.log2(frac)) / 2.0 - 0.5
        # nu=2 anomaly: the reference table's nu=2 entries (both backends) are a few
        # f32 ulps larger than the formula above produces (table.hpp:164,185); we pin
        # them for bit-for-bit parity of shift computation.
        if nu == 2 and ps[0] == 256:
            log2P.append(float.fromhex("0x1.dfd1ec0000000p+2"))
        elif nu == 2 and ps[0] == 1089:
            log2P.append(float.fromhex("0x1.316bae0000000p+3"))
        else:
            log2P.append(round_down_f32(val))

        # rho = sum(floor(p/2)); dd split keeps first (53 - ceil(log2 rho)) bits
        rho = sum(p // 2 for p in ps)
        rho_list.append(rho)
        t_bits = 53 - math.ceil(math.log2(rho))

        qPis = []
        for p in ps:
            Pi = P // p
            q = pow(Pi % p, -1, p)
            qPis.append(q * Pi)  # exact big int; q in [0, p)

        # dd split on a COMMON power-of-two grid (cut below the top t_bits of the
        # largest qPi) so that sum_i hi_i * r_i accumulates error-free in f64
        shift = max(max(v.bit_length() for v in qPis) - t_bits, 0)

        q1_row, q2_row, q4_row = [], [], []
        for qPi in qPis:
            q1_row.append(rn_f64(Fraction(qPi)))
            hi_int = (qPi >> shift) << shift
            hi_f = float(hi_int)
            assert int(hi_f) == hi_int, "hi must be exact in f64"
            lo_f = rn_f64(Fraction(qPi - hi_int))
            q2_row.append((hi_f, lo_f))
            q4_row.append(f32_expansion(Fraction(qPi), 4))
        qPi_1.append(q1_row)
        qPi_2.append(q2_row)
        qPi_f32x4.append(q4_row)

    out.update(
        P_dd=P_dd, P_q26=P_q26, invP=invP, log2P=log2P, qPi_1=qPi_1, qPi_2=qPi_2,
        P_f32x4=P_f32x4, invP_f32=invP_f32, qPi_f32x4=qPi_f32x4,
        rho=rho_list, p_is_double=p_is_double,
    )
    return out


def fmt_float(x: float) -> str:
    return f'fh("{float(x).hex()}")'


def emit_py(obj, indent=0) -> str:
    pad = " " * indent
    if isinstance(obj, float):
        return fmt_float(obj)
    if isinstance(obj, int):
        return repr(obj)
    if isinstance(obj, (list, tuple)):
        inner = ", ".join(emit_py(v) for v in obj)
        if len(inner) < 100:
            return f"[{inner}]"
        lines = (",\n" + pad + " ").join(emit_py(v, indent + 1) for v in obj)
        return f"[{lines}]"
    raise TypeError(type(obj))


def main():
    tables = {
        "INT8": build_backend(MODULI_INT8, P_IS_DOUBLE["INT8"]),
        "FP8": build_backend(MODULI_FP8, P_IS_DOUBLE["FP8"]),
    }
    dst = os.path.join(os.path.dirname(__file__), "..", "gemmul8_tpu", "_tables_data.py")
    # single atomic write: a partial/placeholder file here would brick
    # `import gemmul8_tpu` until regenerated
    lines = [
        '"""AUTO-GENERATED by tools/gen_tables.py -- do not edit by hand."""',
        "",
        "fh = float.fromhex",
        "",
        f"NUM_MODULI_MAX = {NUM_MODULI_MAX}",
        f"MAX_EXP = {MAX_EXP}",
        f"NOT_KARATSUBA = {NOT_KARATSUBA}",
        f"SQRT_MODULI_FP8 = {SQRT_MODULI_FP8}",
        "",
    ]
    for bk, t in tables.items():
        lines.append(f"# ===== backend {bk} =====")
        lines.append(f"MODULI_{bk} = {t['moduli']}")
        lines.append(f"P_IS_DOUBLE_{bk} = {t['p_is_double']}")
        lines.append(f"RHO_{bk} = {t['rho']}")
        for name in ("mod_pow2",):
            lines.append(f"MOD_POW2_{bk} = {emit_py(t[name], 4)}")
        for name in ("P_dd", "P_q26", "invP", "log2P", "qPi_1", "qPi_2",
                     "P_f32x4", "invP_f32", "qPi_f32x4"):
            lines.append(f"{name.upper()}_{bk} = {emit_py(t[name], 4)}")
        lines.append("")
    with open(dst, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.normpath(dst)}")


if __name__ == "__main__":
    main()
