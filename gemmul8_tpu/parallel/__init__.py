from .summa import (summa_gemm, summa_gemm_planar, make_mesh,  # noqa: F401
                    summa_work_bytes, summa_bytes_moved)
