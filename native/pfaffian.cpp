// Native batched Pfaffian of skew-symmetric matrices (Parlett-Reid with
// partial pivoting, cf. Wimmer, ACM TOMS 38, 30 (2012)).
//
// Plays the role pfapack's C library plays for the reference library
// (reference pfaffian.py:49,1425): an independent host implementation used
// to cross-validate the JAX/TPU kernel in temfpy_tpu/ops/pfaffian.py.
// Exposed through ctypes (temfpy_tpu/ops/native.py).
//
// Build:  make -C native   (g++ -O3 -shared -fPIC)

#include <complex>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

template <typename T>
T pfaffian_one(T* A, int n) {
    // A: row-major n x n skew-symmetric, destroyed in place.
    if (n % 2 == 1) return T(0);
    T pf(1);
    std::vector<T> tau(n);
    for (int k = 0; k + 1 < n; k += 2) {
        // pivot: largest |A[j, k]| for j > k
        int kp = k + 1;
        double best = std::abs(A[(k + 1) * n + k]);
        for (int j = k + 2; j < n; ++j) {
            double v = std::abs(A[j * n + k]);
            if (v > best) { best = v; kp = j; }
        }
        if (kp != k + 1) {
            for (int c = 0; c < n; ++c) std::swap(A[(k + 1) * n + c], A[kp * n + c]);
            for (int r = 0; r < n; ++r) std::swap(A[r * n + k + 1], A[r * n + kp]);
            pf = -pf;
        }
        T piv = A[(k + 1) * n + k];
        if (piv == T(0)) return T(0);
        pf *= A[k * n + k + 1];
        if (k + 2 < n) {
            // tau = A[k, k+2:] / A[k, k+1]
            T inv = T(1) / A[k * n + k + 1];
            for (int j = k + 2; j < n; ++j) tau[j] = A[k * n + j] * inv;
            // A[k+2:, k+2:] += outer(tau, A[k+2:, k+1]) - outer(A[k+2:, k+1], tau)
            for (int i = k + 2; i < n; ++i) {
                T ci = A[i * n + k + 1];
                for (int j = k + 2; j < n; ++j) {
                    A[i * n + j] += tau[i] * A[j * n + k + 1] - ci * tau[j];
                }
            }
        }
    }
    return pf;
}

}  // namespace

extern "C" {

// Batched real double Pfaffians: a has shape (batch, n, n) row-major and is
// NOT modified; out has shape (batch,).
void pfaffian_batch_d(const double* a, int n, long batch, double* out) {
    std::vector<double> work((size_t)n * n);
    for (long b = 0; b < batch; ++b) {
        std::memcpy(work.data(), a + (size_t)b * n * n, sizeof(double) * n * n);
        out[b] = pfaffian_one(work.data(), n);
    }
}

// Batched complex double Pfaffians: interleaved (re, im) layout.
void pfaffian_batch_z(const double* a, int n, long batch, double* out) {
    using C = std::complex<double>;
    std::vector<C> work((size_t)n * n);
    for (long b = 0; b < batch; ++b) {
        const double* src = a + (size_t)b * n * n * 2;
        for (size_t i = 0; i < (size_t)n * n; ++i) work[i] = C(src[2 * i], src[2 * i + 1]);
        C pf = pfaffian_one(work.data(), n);
        out[2 * b] = pf.real();
        out[2 * b + 1] = pf.imag();
    }
}

}  // extern "C"
