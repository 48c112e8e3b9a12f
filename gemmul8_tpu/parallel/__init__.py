from .summa import summa_gemm, make_mesh  # noqa: F401
