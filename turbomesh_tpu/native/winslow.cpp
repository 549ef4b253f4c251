// Native (C++/OpenMP) kernels for the host-side f64 refinement loop.
//
// The reference's runtime core is native (Zig stencil assembly,
// smooth.zig:923-992); here the host-resident piece of the mixed-precision
// solver — exact f64 interior-stencil application — is native C++ too.
// Boundary/connection rows are perimeter-sized and stay in NumPy.
//
// Built by turbomesh_tpu/native/build.py into libturbomesh_native.so and
// loaded via ctypes; everything degrades to vectorized NumPy when the
// library is unavailable.

#include <cstdint>
#include <cstddef>

extern "C" {

// Apply the interior 9-point Winslow stencil rows (coefficients frozen at
// `base`) to the field `v`, writing per-point residuals into `out`.
//
// base, cf, v, out: row-major (ni, nj, 2) float64 arrays for one block.
// Only interior rows (0 < i < ni-1, 0 < j < nj-1) are written; boundary
// rows of `out` are left untouched.
void winslow_interior_apply(const double* base, const double* cf,
                            const double* v, double* out,
                            int64_t ni, int64_t nj) {
  const int64_t s = nj * 2;  // i-stride in doubles
#pragma omp parallel for schedule(static)
  for (int64_t i = 1; i < ni - 1; ++i) {
    const double* b_im = base + (i - 1) * s;
    const double* b_i = base + i * s;
    const double* b_ip = base + (i + 1) * s;
    const double* v_im = v + (i - 1) * s;
    const double* v_i = v + i * s;
    const double* v_ip = v + (i + 1) * s;
    const double* cf_i = cf + i * s;
    double* o_i = out + i * s;
    for (int64_t j = 1; j < nj - 1; ++j) {
      const int64_t c = 2 * j;
      const double x_xi = 0.5 * (b_ip[c] - b_im[c]);
      const double y_xi = 0.5 * (b_ip[c + 1] - b_im[c + 1]);
      const double x_eta = 0.5 * (b_i[c + 2] - b_i[c - 2]);
      const double y_eta = 0.5 * (b_i[c + 3] - b_i[c - 1]);
      const double g11 = x_xi * x_xi + y_xi * y_xi;
      const double g22 = x_eta * x_eta + y_eta * y_eta;
      const double g12 = x_xi * x_eta + y_xi * y_eta;
      const double P = cf_i[c];
      const double Q = cf_i[c + 1];

      const double c_ij = -2.0 * g22 - 2.0 * g11;
      const double c_ip = g22 * (1.0 + 0.5 * P);
      const double c_im = g22 * (1.0 - 0.5 * P);
      const double c_jp = g11 * (1.0 + 0.5 * Q);
      const double c_jm = g11 * (1.0 - 0.5 * Q);
      const double h = 0.5 * g12;

      for (int64_t d = 0; d < 2; ++d) {
        o_i[c + d] = c_ij * v_i[c + d]
                   + c_ip * v_ip[c + d] + c_im * v_im[c + d]
                   + c_jp * v_i[c + 2 + d] + c_jm * v_i[c - 2 + d]
                   - h * v_ip[c + 2 + d] + h * v_ip[c - 2 + d]
                   + h * v_im[c + 2 + d] - h * v_im[c - 2 + d];
      }
    }
  }
}

}  // extern "C"
