"""Runtime configuration: env-var driven defaults, mirroring the reference hook's
GEMMUL8_* environment contract (reference: src/hook.cu:20-38, 283-310).

Env vars (read at call time from Python; unlike the CUDA hook these affect only
calls made after a change because config participates in jit static args):

  GEMMUL8_NUM_MOD_S / _D / _C / _Z : num_moduli per dtype (f32/f64/c64/c128)
  GEMMUL8_FASTMODE_S / _D / _C / _Z: 1 = fast (norm-based shifts), 0 = accurate,
                                     2|robust = scale-invariant fast shifts
  GEMMUL8_BACKEND                  : INT8 (default) or FP8
  GEMMUL8_EPILOGUE                 : auto (default) | ff | f64
  GEMMUL8_SKIP_SCALE_A / _B        : per-side operand-plane reuse in hook mode
                                     (1 = cache, 0 = requantize every call);
                                     unset sides follow GEMMUL8_EAGER_CACHE
                                     (default 1 -- safe: jax.Arrays are
                                     immutable, unlike the reference's raw
                                     pointers). Reference: hook.cu:20-38.
"""
from __future__ import annotations

import dataclasses
import os

from . import tables

_DTYPE_SUFFIX = {"float32": "S", "float64": "D", "complex64": "C", "complex128": "Z"}

# Native fallthrough (the hook's dlsym analog, reference hook.cu:625-629) is
# signalled by env_config returning None -- out-of-range num_moduli only.


@dataclasses.dataclass(frozen=True)
class GemmConfig:
    num_moduli: int = 8
    fastmode: bool | str = True
    backend: str = tables.Backend.INT8
    epilogue: str = "auto"

    def validate(self, dtype_name: str) -> bool:
        lo, hi = tables.VALID_RANGE[dtype_name]
        return lo <= self.num_moduli <= hi


def env_config(dtype_name: str) -> GemmConfig | None:
    """Build a GemmConfig for `dtype_name` from GEMMUL8_* env vars.

    Returns None (meaning: native fallthrough) if the configured num_moduli is
    out of the valid range for the dtype, like the reference hook.
    """
    sfx = _DTYPE_SUFFIX[dtype_name]
    nm = os.environ.get(f"GEMMUL8_NUM_MOD_{sfx}")
    if nm is None:
        return None
    nm = int(nm)
    fm_raw = os.environ.get(f"GEMMUL8_FASTMODE_{sfx}", "1").lower()
    fastmode: bool | str
    if fm_raw in ("0", "false", "accurate", "accu"):
        fastmode = False
    elif fm_raw in ("2", "robust"):
        fastmode = "robust"
    elif fm_raw in ("1", "true", "fast"):
        fastmode = True
    else:
        # an unknown spelling must not silently pick fast mode -- e.g.
        # GEMMUL8_FASTMODE_D=exact would run norm-based shifts while the
        # user believes they asked for the accurate two-phase mode
        raise ValueError(
            f"GEMMUL8_FASTMODE_{sfx}={fm_raw!r}: use 1/fast, 0/accurate, "
            f"or 2/robust")
    cfg = GemmConfig(
        num_moduli=nm,
        fastmode=fastmode,
        backend=os.environ.get("GEMMUL8_BACKEND", tables.Backend.INT8).upper(),
        epilogue=os.environ.get("GEMMUL8_EPILOGUE", "auto").lower(),
    )
    if not cfg.validate(dtype_name):
        return None
    return cfg
