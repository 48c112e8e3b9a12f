"""gemmul8-tpu: TPU-native high-precision GEMM emulation (Ozaki scheme II / CRT).

Emulates SGEMM/DGEMM/CGEMM/ZGEMM on the TPU's int8 MXU with bit-reproducible
results and a selectable num_moduli accuracy/speed dial. A from-scratch
JAX/XLA/Pallas design with the capabilities of RIKEN-RCCS/GEMMul8 (see SURVEY.md).
"""
from . import compare, compat, tables
from .accuracy_model import choose_moduli, modeled_max_rel_err
from .config import GemmConfig, env_config
from .complex_gemm import gemm_planar, herk, herk_planar
from .core import (QuantizedOperand, gemm, gemm_batched, gemm_quantized,
                   gemm_with_phases, matmul, precompute, syrk, work_bytes)
from .hook import emulate, install, refresh, uninstall
from .eig import eigh, svd
from .qr import geqrf, lstsq, ormqr, qr
from .blas3 import (hemm, hemm_planar, her2k, her2k_planar, symm,
                    symm_planar, syr2k)
from .solvers import (getrf, inv, lu_solve, posv, potrf, potrs, solve, trmm,
                      trsm, trtri)
from .tables import Backend

__version__ = "0.2.0"

__all__ = [
    "gemm", "matmul", "syrk", "gemm_batched", "gemm_quantized", "precompute",
    "QuantizedOperand", "work_bytes", "gemm_with_phases", "gemm_planar",
    "herk", "herk_planar",
    "Backend", "GemmConfig", "env_config", "tables", "compare", "compat",
    "choose_moduli", "modeled_max_rel_err",
    "syr2k", "her2k", "symm", "hemm",
    "her2k_planar", "hemm_planar", "symm_planar",
    "trsm", "trmm", "getrf", "lu_solve", "solve", "potrf", "potrs", "posv",
    "inv", "trtri",
    "geqrf", "ormqr", "qr", "lstsq", "svd", "eigh",
    "emulate", "install", "refresh", "uninstall",
]
