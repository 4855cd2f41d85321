// Native host kernels for the prioritized replay buffer.
//
// The reference accelerates its sum-tree hot path with three numba-JIT
// kernels (reference utils/replay_buffer.py:15-60); this is the equivalent
// native component for the host-side buffer: stratified priority sampling
// and priority maintenance over a dense priority array.
//
// rl6_stratified_sample resolves k ascending stratified draws against the
// running prefix sum of the priorities in ONE O(n + k) pass -- equivalent to
// k root-to-leaf descents of a binary sum-tree (replay_buffer.py:42-60) or a
// searchsorted over the cumulative sum, but without materializing either.
//
// Build: `make -C native` produces _rl6_sumtree.so next to the Python
// binding (rl6nimmt_tpu/buffers/); loaded via ctypes, no pybind11 needed.

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// Resolve ascending stratified draws `u[0..k)` against prefix sums of
// `pri[0..n)`; writes the selected leaf index per draw into `out`.
// Draws beyond the total priority clamp to the last leaf.
void rl6_stratified_sample(const double* pri, int64_t n, const double* u,
                           int64_t k, int64_t* out) {
    double cum = 0.0;
    int64_t j = 0;
    for (int64_t i = 0; i < n && j < k; ++i) {
        cum += pri[i];
        while (j < k && u[j] <= cum) {
            out[j++] = i;
        }
    }
    for (; j < k; ++j) {
        out[j] = n - 1;
    }
}

// Batch priority update: pri[idx[i]] = min(|err[i]| + eps, cap)^alpha.
void rl6_update_priorities(double* pri, const int64_t* idx, const double* abs_err,
                           int64_t k, double eps, double cap, double alpha) {
    for (int64_t i = 0; i < k; ++i) {
        double e = std::min(std::abs(abs_err[i]) + eps, cap);
        double p = 1.0;
        // pow is fine here, but alpha=0.6 is the common case; keep generic.
        p = std::pow(e, alpha);
        pri[idx[i]] = p;
    }
}

// Max over the first n priorities (max-priority insert rule).
double rl6_max_priority(const double* pri, int64_t n) {
    double m = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        m = std::max(m, pri[i]);
    }
    return m;
}

}  // extern "C"
