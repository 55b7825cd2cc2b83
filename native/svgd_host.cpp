// Host-side native helpers for svgdcpp_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; these are the host-runtime pieces
// where native code genuinely wins over Python:
//
//   * selection (k-th element / median with the reference library's
//     even-count averaging semantics, cf. SVGDCpp
//     GaussianRBFKernel::ComputeMedian) over large host buffers — used to
//     cross-verify the on-device selection kernels against an exact host
//     answer at sizes where a NumPy full sort hurts;
//   * the intermediate-matrix debug log writer — formatting millions of
//     doubles through Python string formatting is ~50x slower than
//     std::to_chars.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// k-th smallest (0-indexed) of data[0..n). Operates in place (caller passes
// a scratch copy).
double svgd_kth_element_f64(double* data, int64_t n, int64_t k) {
  if (n <= 0 || k < 0 || k >= n) return 0.0;
  std::nth_element(data, data + k, data + n);
  return data[k];
}

// Median with even-count averaging: for even n, the mean of the two middle
// order statistics; for odd n, the middle one. In place.
double svgd_median_f64(double* data, int64_t n) {
  if (n <= 0) return 0.0;
  if (n % 2 == 0) {
    const int64_t hi_idx = n / 2;
    std::nth_element(data, data + hi_idx, data + n);
    const double hi = data[hi_idx];
    const double lo = *std::max_element(data, data + hi_idx);
    return 0.5 * (lo + hi);
  }
  const int64_t mid = n / 2;
  std::nth_element(data, data + mid, data + n);
  return data[mid];
}

namespace {

// Append a double in %.9g-equivalent form.
void append_double(std::vector<char>& buf, double v) {
  char tmp[64];
  const int len = std::snprintf(tmp, sizeof(tmp), "%.9g", v);
  buf.insert(buf.end(), tmp, tmp + len);
}

// Append a row-major (rows x cols) matrix as space-separated text rows.
void append_matrix(std::vector<char>& buf, const double* data, int64_t rows,
                   int64_t cols) {
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t c = 0; c < cols; ++c) {
      if (c) buf.push_back(' ');
      append_double(buf, data[r * cols + c]);
    }
    buf.push_back('\n');
  }
  if (!buf.empty() && buf.back() == '\n') buf.pop_back();
}

void append_str(std::vector<char>& buf, const char* s) {
  buf.insert(buf.end(), s, s + std::strlen(s));
}

}  // namespace

// Write the per-iteration intermediate-matrix log in the SVGDCpp text
// layout (cf. SVGD::Run / WriteIntermediateMatricesToFile). Inputs are
// host row-major f64 stacks, already in the REFERENCE orientation:
//   lmg:    (steps, m, n)        LogModelGrad
//   ker:    (steps, n, n)        Kernel, (j, i) indexing
//   kgrad:  (steps, m*n, n)      stacked KernelGrad blocks
//   coords: (steps, m, n)        CoordMat
// Returns 0 on success, nonzero on I/O failure.
int svgd_write_intermediate_log(const char* path, int64_t steps, int64_t n,
                                int64_t m, const double* lmg,
                                const double* ker, const double* kgrad,
                                const double* coords) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::vector<char> buf;
  buf.reserve(static_cast<size_t>(1) << 20);
  char header[128];
  for (int64_t t = 0; t < steps; ++t) {
    buf.clear();
    std::snprintf(header, sizeof(header),
                  "========== Step %lld ==========\nLogModelGrad=\n",
                  static_cast<long long>(t + 1));
    append_str(buf, header);
    append_matrix(buf, lmg + t * m * n, m, n);
    append_str(buf, "\n\nKernel=\n");
    append_matrix(buf, ker + t * n * n, n, n);
    append_str(buf, "\n\nKernelGrad=\n");
    append_matrix(buf, kgrad + t * m * n * n, m * n, n);
    append_str(buf, "\n\nCoordMat=\n");
    append_matrix(buf, coords + t * m * n, m, n);
    append_str(buf, "\n\n");
    if (std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
      std::fclose(f);
      return 2;
    }
  }
  return std::fclose(f) == 0 ? 0 : 3;
}

}  // extern "C"
