from .summa import (summa_gemm, make_mesh, summa_work_bytes,  # noqa: F401
                    summa_bytes_moved)
