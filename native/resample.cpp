// Polyphase Kaiser-windowed-sinc resampler — native kernel.
//
// Computes y[n] = sum_j h[p_n + j*L] * x[k_n - j] where p_n and k_n are the
// polyphase phase / input anchor for output sample n (upfirdn with centered
// filter delay). Bit-identical to the numpy fallback in
// beat_this_tpu/ops/resample.py; this kernel exists so host-side audio
// preparation (the role soxr's C code plays for the reference,
// beat_this/inference.py:275) keeps up with the TPU during batched
// directory inference. OpenMP-parallel over output samples when available.
//
// Build: make -C native  (produces libbtnative.so; loaded via ctypes)

#include <cstdint>
#include <cstring>

extern "C" {

// Returns the number of output samples written, or -1 on error.
long long bt_resample_poly(const double* x, long long n_in,
                           const double* h, long long n_taps,
                           long long L, long long M,
                           double* y, long long n_out) {
  if (L <= 0 || M <= 0 || n_taps <= 0 || n_in < 0 || n_out < 0) return -1;
  const long long half = (n_taps - 1) / 2;

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (long long n = 0; n < n_out; ++n) {
    const long long pos = n * M + half;
    const long long phase = pos % L;
    const long long k0 = pos / L;
    double acc = 0.0;
    // taps of this phase: h[phase], h[phase+L], ... applied to x[k0 - j]
    long long j = 0;
    for (long long i = phase; i < n_taps; i += L, ++j) {
      const long long k = k0 - j;
      if (k < 0) break;           // earlier taps only hit x[<0] = 0
      if (k < n_in) acc += h[i] * x[k];
    }
    y[n] = acc;
  }
  return n_out;
}

}  // extern "C"
