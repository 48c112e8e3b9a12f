#!/usr/bin/env python3
"""One-off validation: compare generated tables bit-for-bit against the reference's
hex literals (GEMMul8/src/table.hpp). Skips gracefully if the reference tree is
not present. Layout differences are normalized here:
  - reference mod_pow2 stores j offset by 7 (INT8) / 8 (FP8) and only rows i>=1
    (INT8) or i!=1 (FP8) -- we store the full [20][0..MAX_EXP] wrapped table.
  - reference qPi_2 rows exist only for num_moduli > P_is_double+? (idx arrays).
"""
import re
import sys

REF = "/root/reference/GEMMul8/src/table.hpp"

try:
    src = open(REF).read()
except OSError:
    print("reference not present; skipping")
    sys.exit(0)

sys.path.insert(0, ".")
import gemmul8_tpu._tables_data as T

HEXF = r"[-+]?0x[0-9a-fA-F]+\.?[0-9a-fA-F]*p[-+]?\d+"

def hexfloats(s):
    return [float.fromhex(m.rstrip("Ff")) for m in re.findall(HEXF + r"F?", s)]

def ints(s):
    return [int(m) for m in re.findall(r"-?\d+", s)]

def section(start_pat, end_pat, text=src):
    m = re.search(start_pat, text)
    assert m, start_pat
    rest = text[m.end():]
    e = re.search(end_pat, rest)
    return rest[: e.start()] if e else rest

fail = 0
def check(name, got, want):
    global fail
    if got != want:
        fail += 1
        print(f"MISMATCH {name}: got={got!r} want={want!r}")

# ---- moduli ----
for bk, tab in (("INT8", T.MODULI_INT8), ("FP8", T.MODULI_FP8)):
    vals = []
    for i in range(20):
        m = re.search(rf"moduli<gemmul8::Backend::{bk}, {i}>\s*=\s*(\d+)", src)
        vals.append(int(m.group(1)))
    check(f"moduli_{bk}", tab, vals)

# ---- P (double-double), invP ----
for bk in ("INT8", "FP8"):
    sec = section(rf"namespace {bk} {{\s*\nconstexpr double2 P\[19\]", r"\n}")
    ref = hexfloats(sec)
    assert len(ref) == 38, len(ref)
    mine = [x for pair in getattr(T, f"P_DD_{bk}") for x in pair]
    for i, (a, b) in enumerate(zip(mine, ref)):
        check(f"P_dd_{bk}[{i}]", a.hex(), b.hex())

    sec = section(rf"namespace {bk} {{\s*\nconstexpr double invP\[19\]", r"\n}")
    ref = hexfloats(sec)
    mine = getattr(T, f"INVP_{bk}")
    for i, (a, b) in enumerate(zip(mine, ref)):
        check(f"invP_{bk}[{i}]", a.hex(), b.hex())

# ---- log2P ----
for bk in ("INT8", "FP8"):
    mine = getattr(T, f"LOG2P_{bk}")
    for nu in range(2, 21):
        m = re.search(
            rf"log2P<gemmul8::Backend::{bk}, {nu}>\s*=\s*({HEXF})F", src)
        check(f"log2P_{bk}[{nu}]", mine[nu - 2].hex(), float.fromhex(m.group(1)).hex())

# ---- mod_pow2 ----
# INT8: ref mod_pow2_h[19][57]: rows for moduli index 1..19, cols j -> 2^(j+7) mod p
sec = section(r"constexpr int8_t mod_pow2_h\[19\]\[57\] = \{", r"\n\};")
ref_rows = [ints(r) for r in re.findall(r"\{([^}]*)\}", sec)]
assert len(ref_rows) == 19
for i, row in enumerate(ref_rows):  # moduli index i+1
    mine = T.MOD_POW2_INT8[i + 1][7 : 7 + 57]
    check(f"mod_pow2_INT8[p={T.MODULI_INT8[i+1]}]", mine, row)

sec = section(r"constexpr int16_t mod_pow2_h\[19\]\[64\] = \{", r"\n\};")
ref_rows = [ints(r) for r in re.findall(r"\{([^}]*)\}", sec)]
assert len(ref_rows) == 19
# FP8: row 0 is moduli[0]=1089; rows 1.. are moduli[2..] (moduli[1]=1024 handled by bitmask)
fp8_map = [0] + list(range(2, 20))
for r, mi in enumerate(fp8_map):
    mine = T.MOD_POW2_FP8[mi][8 : 8 + 64]
    check(f"mod_pow2_FP8[p={T.MODULI_FP8[mi]}]", mine, ref_rows[r])

# ---- qPi_1 ----
for bk in ("INT8", "FP8"):
    sec = section(rf"namespace {bk} \{{\s*\n\n// qPi_1\[i\] = double", r"\n\};")
    sec = section(r"qPi_1\[19\]\[20\] = \{", r"\n\};", sec + "\n};")
    rows = [hexfloats(r) for r in re.findall(r"\{([^{}]*)\}", sec)]
    assert len(rows) == 19, len(rows)
    mine = getattr(T, f"QPI_1_{bk}")
    for nu_i, (mrow, rrow) in enumerate(zip(mine, rows)):
        check(f"qPi_1_{bk}[nu={nu_i+2}] len", len(mrow), len(rrow))
        for i, (a, b) in enumerate(zip(mrow, rrow)):
            check(f"qPi_1_{bk}[nu={nu_i+2}][{i}]", a.hex(), b.hex())

# ---- qPi_2 ----
for bk in ("INT8", "FP8"):
    n_start = {"INT8": 7, "FP8": 6}[bk]  # first nu with dd split table
    m = re.search(rf"namespace {bk}[^\n]*\n(?:.*\n)*?inline constexpr double2 qPi_2\[14\]\[20\] = \{{", src)
    # simpler: find the two qPi_2 blocks in order INT8 then FP8
    pass
blocks = re.findall(r"qPi_2\[\d+\]\[20\] = \{(.*?)\n\};", src, re.S)
assert len(blocks) == 2, len(blocks)
for bk, blk in zip(("INT8", "FP8"), blocks):
    n_start = {"INT8": 7, "FP8": 6}[bk]
    groups = re.findall(r"\{((?:\s*\{[^{}]*\},?)+)\s*\}", blk)
    mine = getattr(T, f"QPI_2_{bk}")
    for g_i, g in enumerate(groups):
        nu = n_start + g_i
        if nu > 20:
            break
        pairs = [hexfloats(p) for p in re.findall(r"\{([^{}]*)\}", g)]
        mrow = mine[nu - 2]
        check(f"qPi_2_{bk}[nu={nu}] len", len(mrow), len(pairs))
        for i, (mp, rp) in enumerate(zip(mrow, pairs)):
            check(f"qPi_2_{bk}[nu={nu}][{i}].hi", mp[0].hex(), rp[0].hex())
            check(f"qPi_2_{bk}[nu={nu}][{i}].lo", mp[1].hex(), rp[1].hex())

print("FAILURES:" if fail else "ALL TABLES MATCH", fail if fail else "")
sys.exit(1 if fail else 0)
