// Double-double reference GEMM for accuracy evaluation.
//
// Native analog of the reference's GPU double-double oracle
// (GEMMul8/testing/eval.hpp:29-65 two_sum/two_prod, 194-445 simple_gemm):
// each inner product is accumulated in error-free double-double arithmetic
// (~106-bit significand), giving an oracle ~2^-53 tighter than the emulated
// results being judged. OpenMP-parallel over output rows.
//
// Exported C ABI (ctypes-friendly, see tests/oracle.py):
//   dd_gemm(A, B, C_hi, C_lo, m, k, n)
//     A: m*k row-major, B: k*n row-major, C_hi/C_lo: m*n row-major with
//     C = C_hi + C_lo (non-overlapping double-double).
//   dd_gemm_err(A, B, C, err, m, k, n) -> double
//     writes the elementwise |C - C_dd| / |C_dd| field into err (m*n) and
//     returns its max -- a one-pass alternative to dd_gemm + host-side
//     error math for direct (A, B, C) workflows; tests/oracle.py binds
//     dd_gemm only (its callers hold a precomputed reference).

#include <cmath>
#include <cstdint>

namespace {

struct dd {
    double hi;
    double lo;
};

static inline dd two_sum(double a, double b) {
    double s = a + b;
    double v = s - a;
    double e = (a - (s - v)) + (b - v);
    return {s, e};
}

static inline dd quick_two_sum(double a, double b) {
    double s = a + b;
    double e = b - (s - a);
    return {s, e};
}

static inline dd two_prod(double a, double b) {
    double p = a * b;
    double e = std::fma(a, b, -p);   // exact with fused multiply-add
    return {p, e};
}

// dd += a * b, error-free product + compensated accumulation
static inline dd dd_fma_acc(dd acc, double a, double b) {
    dd p = two_prod(a, b);
    dd s = two_sum(acc.hi, p.hi);
    double lo = acc.lo + p.lo + s.lo;
    return quick_two_sum(s.hi, lo);
}

}  // namespace

extern "C" {

void dd_gemm(const double* A, const double* B, double* C_hi, double* C_lo,
             int64_t m, int64_t k, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < m; ++i) {
        for (int64_t j = 0; j < n; ++j) {
            dd acc{0.0, 0.0};
            const double* arow = A + i * k;
            for (int64_t t = 0; t < k; ++t) {
                acc = dd_fma_acc(acc, arow[t], B[t * n + j]);
            }
            C_hi[i * n + j] = acc.hi;
            C_lo[i * n + j] = acc.lo;
        }
    }
}

// elementwise |C - C_dd| / |C_dd| written into err (m*n); returns max
double dd_gemm_err(const double* A, const double* B, const double* C,
                   double* err, int64_t m, int64_t k, int64_t n) {
    double mx = 0.0;
#pragma omp parallel for schedule(static) reduction(max : mx)
    for (int64_t i = 0; i < m; ++i) {
        for (int64_t j = 0; j < n; ++j) {
            dd acc{0.0, 0.0};
            const double* arow = A + i * k;
            for (int64_t t = 0; t < k; ++t) {
                acc = dd_fma_acc(acc, arow[t], B[t * n + j]);
            }
            double denom = std::fabs(acc.hi);
            if (denom == 0.0) denom = 1.0;
            double d = C[i * n + j] - acc.hi;
            double e = std::fabs((d - acc.lo) / denom);
            err[i * n + j] = e;
            if (e > mx) mx = e;
        }
    }
    return mx;
}

}  // extern "C"
