// elasticdeform_tpu native host kernel (C++17, no external deps).
//
// A from-scratch CPU implementation of the elastic grid deformation and its
// exact adjoint, with the same semantics as the JAX/TPU tier (and therefore
// as the reference library, see SURVEY.md §2 C3-C9):
//   * dense displacement = separable order-3 B-spline interpolation of the
//     (prefiltered) control grid with mirror tap folding,
//   * per-voxel boundary-mode mapping (pre-SciPy-1.6 conventions),
//   * separable order-0..5 B-spline resampling with mirror tap folding,
//   * forward = gather, adjoint = scatter-add (single-threaded, race-free).
//
// Design differences from the reference C (this is not a port):
//   * displacement interpolation uses precomputed per-output-axis
//     control-index/weight tables (the coordinate along axis h depends only
//     on the output index along h), instead of per-voxel window searches,
//   * a single flat odometer drives the loop; no NumPy C API, no Python —
//     plain buffers over a ctypes ABI,
//   * channels are a trailing contiguous dimension, vectorizable by the
//     compiler.
//
// Exposed C ABI (see native/__init__.py for the Python wrapper):
//   ed_deform_grid(...)      forward (gradient=0) / adjoint (gradient=1)
//   ed_spline_filter1d(...)  in-place B-spline prefilter along axis 0
//   ed_version()

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kMaxDim = 6;
constexpr int kDispOrder = 3;

enum Mode {
  kNearest = 0,
  kWrap = 1,
  kReflect = 2,
  kMirror = 3,
  kConstant = 4,
};

// ---------------------------------------------------------------------------
// spline weights (standard B-spline polynomials, orders 0-5)

inline void spline_weights(double cc, int order, double* w) {
  double x = cc - std::floor(order & 1 ? cc : cc + 0.5);
  switch (order) {
    case 0:
      w[0] = 1.0;
      return;
    case 1:
      w[0] = 1.0 - x;
      w[1] = x;
      return;
    case 2: {
      w[1] = 0.75 - x * x;
      double y = 0.5 - x;
      w[0] = 0.5 * y * y;
      w[2] = 1.0 - w[0] - w[1];
      return;
    }
    case 3: {
      double z = 1.0 - x;
      w[1] = (x * x * (x - 2.0) * 3.0 + 4.0) / 6.0;
      w[2] = (z * z * (z - 2.0) * 3.0 + 4.0) / 6.0;
      w[0] = z * z * z / 6.0;
      w[3] = 1.0 - w[0] - w[1] - w[2];
      return;
    }
    case 4: {
      double t = x * x;
      w[2] = t * (t * 0.25 - 0.625) + 115.0 / 192.0;
      double y = 1.0 + x;
      w[1] = y * (y * (y * (5.0 - y) / 6.0 - 1.25) + 5.0 / 24.0) + 55.0 / 96.0;
      double z = 1.0 - x;
      w[3] = z * (z * (z * (5.0 - z) / 6.0 - 1.25) + 5.0 / 24.0) + 55.0 / 96.0;
      y = 0.5 - x;
      t = y * y;
      w[0] = t * t / 24.0;
      w[4] = 1.0 - w[0] - w[1] - w[2] - w[3];
      return;
    }
    case 5: {
      double z = 1.0 - x;
      double t = x * x;
      w[2] = t * (t * (0.25 - x / 12.0) - 0.5) + 0.55;
      t = z * z;
      w[3] = t * (t * (0.25 - z / 12.0) - 0.5) + 0.55;
      double y1 = 1.0 + x;
      w[1] = y1 * (y1 * (y1 * (y1 * (y1 / 24.0 - 0.375) + 1.25) - 1.75)
                   + 0.625) + 0.425;
      double z1 = 2.0 - x;
      w[4] = z1 * (z1 * (z1 * (z1 * (z1 / 24.0 - 0.375) + 1.25) - 1.75)
                   + 0.625) + 0.425;
      double y2 = 1.0 - x;
      t = y2 * y2;
      w[0] = y2 * t * t / 120.0;
      w[5] = 1.0 - w[0] - w[1] - w[2] - w[3] - w[4];
      return;
    }
  }
}

// integer mirror fold into [0, n-1], period 2n-2
inline int64_t mirror_fold(int64_t idx, int64_t n) {
  if (n <= 1) return 0;
  const int64_t s2 = 2 * n - 2;
  int64_t m = idx % s2;
  if (m < 0) m += s2;
  return m >= n ? s2 - m : m;
}

// boundary-mode mapping of a floating coordinate (pre-SciPy-1.6 semantics);
// returns false for constant-mode out-of-range samples
inline bool map_coordinate(double& in, int64_t len, int mode) {
  if (in >= 0 && in <= double(len - 1)) return true;
  switch (mode) {
    case kConstant:
      return false;
    case kNearest:
      in = in < 0 ? 0.0 : double(len - 1);
      return true;
    case kMirror: {
      if (len <= 1) { in = 0; return true; }
      const double s2 = double(2 * len - 2);
      if (in < 0) {
        in = s2 * std::trunc(-in / s2) + in;
        in = in <= double(1 - len) ? in + s2 : -in;
      } else {
        in -= s2 * std::trunc(in / s2);
        if (in >= double(len)) in = s2 - in;
      }
      return true;
    }
    case kReflect: {
      if (len <= 1) { in = 0; return true; }
      const double s2 = double(2 * len);
      if (in < 0) {
        if (in < -s2) in = s2 * std::trunc(-in / s2) + in;
        in = in < double(-len) ? in + s2 : -in - 1.0;
      } else {
        in -= s2 * std::trunc(in / s2);
        if (in >= double(len)) in = s2 - in - 1.0;
      }
      return true;
    }
    case kWrap: {
      if (len <= 1) { in = 0; return true; }
      const double s = double(len - 1);
      if (in < 0) {
        in += s * (std::trunc(-in / s) + 1.0);
      } else {
        in -= s * std::trunc(in / s);
      }
      return true;
    }
  }
  return true;
}

struct DispTables {
  // per axis h, per output index j: kDispOrder+1 folded control indices
  // (pre-multiplied by the control-grid stride) and weights
  std::vector<int64_t> idx[kMaxDim];
  std::vector<double> w[kMaxDim];
};

}  // namespace

extern "C" {

const char* ed_version() { return "elasticdeform-tpu-native 0.1"; }

// In-place 1-D B-spline prefilter along axis 0 of a C-contiguous (n, m)
// double array: the classic causal/anti-causal recursion with mirror
// initialization (same algorithm family as the Python twin
// ops/prefilter.py:_filter_lines), vectorized over columns.
void ed_spline_filter1d(double* data, int64_t n, int64_t m, int order) {
  if (order <= 1 || n <= 1) return;
  double poles[2];
  int npoles = 0;
  switch (order) {
    case 2: npoles = 1; poles[0] = std::sqrt(8.0) - 3.0; break;
    case 3: npoles = 1; poles[0] = std::sqrt(3.0) - 2.0; break;
    case 4:
      npoles = 2;
      poles[0] = std::sqrt(664.0 - std::sqrt(438976.0)) + std::sqrt(304.0) - 19.0;
      poles[1] = std::sqrt(664.0 + std::sqrt(438976.0)) - std::sqrt(304.0) - 19.0;
      break;
    case 5:
      npoles = 2;
      poles[0] = std::sqrt(67.5 - std::sqrt(4436.25)) + std::sqrt(26.25) - 6.5;
      poles[1] = std::sqrt(67.5 + std::sqrt(4436.25)) - std::sqrt(26.25) - 6.5;
      break;
    default: return;
  }
  double gain = 1.0;
  for (int k = 0; k < npoles; ++k)
    gain *= (1.0 - poles[k]) * (1.0 - 1.0 / poles[k]);
  for (int64_t i = 0; i < n * m; ++i) data[i] *= gain;

  std::vector<double> acc(m);
  for (int k = 0; k < npoles; ++k) {
    const double p = poles[k];
    const int64_t horizon =
        int64_t(std::ceil(std::log(1e-15) / std::log(std::fabs(p))));
    // causal init (mirror boundary)
    if (horizon < n) {
      double zn = p;
      std::memcpy(acc.data(), data, m * sizeof(double));
      for (int64_t r = 1; r < horizon; ++r) {
        const double* row = data + r * m;
        for (int64_t c = 0; c < m; ++c) acc[c] += zn * row[c];
        zn *= p;
      }
      std::memcpy(data, acc.data(), m * sizeof(double));
    } else {
      double zn = p;
      const double iz = 1.0 / p;
      double z2n = std::pow(p, double(n - 1));
      const double* last = data + (n - 1) * m;
      for (int64_t c = 0; c < m; ++c) acc[c] = data[c] + z2n * last[c];
      z2n *= z2n * iz;
      for (int64_t r = 1; r < n - 1; ++r) {
        const double* row = data + r * m;
        const double f = zn + z2n;
        for (int64_t c = 0; c < m; ++c) acc[c] += f * row[c];
        zn *= p;
        z2n *= iz;
      }
      const double denom = 1.0 - std::pow(p, double(2 * n - 2));
      for (int64_t c = 0; c < m; ++c) data[c] = acc[c] / denom;
    }
    // causal pass
    for (int64_t r = 1; r < n; ++r) {
      double* row = data + r * m;
      const double* prev = row - m;
      for (int64_t c = 0; c < m; ++c) row[c] += p * prev[c];
    }
    // anti-causal init
    {
      double* lastr = data + (n - 1) * m;
      const double* prev = lastr - m;
      const double f = p / (p * p - 1.0);
      for (int64_t c = 0; c < m; ++c) lastr[c] = f * (lastr[c] + p * prev[c]);
    }
    // anti-causal pass
    for (int64_t r = n - 2; r >= 0; --r) {
      double* row = data + r * m;
      const double* next = row + m;
      for (int64_t c = 0; c < m; ++c) row[c] = p * (next[c] - row[c]);
    }
  }
}

// Fused forward/adjoint deformation.
//
//   gradient = 0: y[out voxel] = interp(x at deformed coordinate)   (gather)
//   gradient = 1: x += scatter of y * weights                      (adjoint)
//
// x:    (S[0..nd-1], C) C-contiguous double  (spline coeffs if order>1)
// disp: (nd, ncp[0..nd-1])  order-3-prefiltered control grid
// y:    (O[0..nd-1], C)
// offsets: crop offsets per axis; affine: nd x (nd+1) row-major or null.
// Returns 0 on success.
int ed_deform_grid(int gradient,
                   double* x, const int64_t* S, int nd, int64_t C,
                   const double* disp, const int64_t* ncp,
                   double* y, const int64_t* O,
                   const int64_t* offsets,
                   int order, int mode, double cval,
                   const double* affine) {
  if (nd < 1 || nd > kMaxDim || order < 0 || order > 5) return 1;

  // strides over deformed axes of x (in units of C doubles)
  int64_t xs[kMaxDim];
  {
    int64_t s = 1;
    for (int h = nd - 1; h >= 0; --h) { xs[h] = s; s *= S[h]; }
  }
  int64_t total_out = 1;
  for (int h = 0; h < nd; ++h) total_out *= O[h];

  int64_t ncp_stride[kMaxDim];
  {
    int64_t s = 1;
    for (int h = nd - 1; h >= 0; --h) { ncp_stride[h] = s; s *= ncp[h]; }
  }
  int64_t disp_comp_stride = 1;
  for (int h = 0; h < nd; ++h) disp_comp_stride *= ncp[h];

  // precompute per-axis displacement interpolation tables
  DispTables dt;
  for (int h = 0; h < nd; ++h) {
    dt.idx[h].resize(O[h] * (kDispOrder + 1));
    dt.w[h].resize(O[h] * (kDispOrder + 1));
    for (int64_t j = 0; j < O[h]; ++j) {
      const double cp = S[h] > 1
          ? double(ncp[h] - 1) * double(j + offsets[h]) / double(S[h] - 1)
          : 0.0;
      const int64_t start = int64_t(std::floor(cp)) - kDispOrder / 2;
      double w4[kDispOrder + 1];
      spline_weights(cp, kDispOrder, w4);
      for (int l = 0; l <= kDispOrder; ++l) {
        dt.idx[h][j * (kDispOrder + 1) + l] =
            mirror_fold(start + l, ncp[h]) * ncp_stride[h];
        dt.w[h][j * (kDispOrder + 1) + l] = w4[l];
      }
    }
  }

  const int taps = order + 1;

  // Forward is per-voxel independent -> parallel over output voxels.
  // The adjoint scatter-adds into shared memory and stays single-threaded
  // (race-free by serialization, like the reference's GIL-released loop).
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (!gradient)
#endif
  for (int64_t v = 0; v < total_out; ++v) {
    // decompose the flat voxel index (replaces odometer state so the loop
    // body is self-contained for parallel execution)
    int64_t coord[kMaxDim];
    {
      int64_t rem = v;
      for (int h = nd - 1; h >= 0; --h) {
        coord[h] = rem % O[h];
        rem /= O[h];
      }
    }
    // dense displacement at this voxel: separable 4^nd accumulation
    double displ[kMaxDim];
    for (int h = 0; h < nd; ++h) displ[h] = 0.0;
    {
      int c4[kMaxDim] = {0};
      const int64_t combos = [&] {
        int64_t n = 1;
        for (int h = 0; h < nd; ++h) n *= (kDispOrder + 1);
        return n;
      }();
      for (int64_t u = 0; u < combos; ++u) {
        double wprod = 1.0;
        int64_t off = 0;
        for (int h = 0; h < nd; ++h) {
          const int64_t base = coord[h] * (kDispOrder + 1) + c4[h];
          wprod *= dt.w[h][base];
          off += dt.idx[h][base];
        }
        for (int h = 0; h < nd; ++h)
          displ[h] += wprod * disp[h * disp_comp_stride + off];
        for (int h = nd - 1; h >= 0; --h) {
          if (++c4[h] <= kDispOrder) break;
          c4[h] = 0;
        }
      }
    }

    // sample coordinate: affine(out) + crop offset + displacement
    double cc[kMaxDim];
    bool inside = true;
    int64_t tap_idx[kMaxDim][6];
    double tap_w[kMaxDim][6];
    for (int h = 0; h < nd && inside; ++h) {
      double c;
      if (affine) {
        c = affine[h * (nd + 1) + nd];
        for (int l = 0; l < nd; ++l)
          c += affine[h * (nd + 1) + l] * double(coord[l]);
      } else {
        c = double(coord[h]);
      }
      c += double(offsets[h]) + displ[h];
      if (!map_coordinate(c, S[h], mode)) { inside = false; break; }
      cc[h] = c;
      const int64_t start =
          int64_t(std::floor(order & 1 ? c : c + 0.5)) - order / 2;
      double w6[6];
      spline_weights(c, order, w6);
      for (int l = 0; l < taps; ++l) {
        tap_idx[h][l] = mirror_fold(start + l, S[h]) * xs[h];
        tap_w[h][l] = w6[l];
      }
    }

    double* yrow = y + v * C;
    if (!inside) {
      if (!gradient)
        for (int64_t c = 0; c < C; ++c) yrow[c] = cval;
      // adjoint: constant-region voxels contribute nothing
    } else {
      if (!gradient)
        for (int64_t c = 0; c < C; ++c) yrow[c] = 0.0;
      int tc[kMaxDim] = {0};
      int64_t tap_total = 1;
      for (int h = 0; h < nd; ++h) tap_total *= taps;
      for (int64_t u = 0; u < tap_total; ++u) {
        double wprod = 1.0;
        int64_t off = 0;
        for (int h = 0; h < nd; ++h) {
          wprod *= tap_w[h][tc[h]];
          off += tap_idx[h][tc[h]];
        }
        double* xrow = x + off * C;
        if (!gradient) {
          for (int64_t c = 0; c < C; ++c) yrow[c] += wprod * xrow[c];
        } else {
          for (int64_t c = 0; c < C; ++c) xrow[c] += wprod * yrow[c];
        }
        for (int h = nd - 1; h >= 0; --h) {
          if (++tc[h] < taps) break;
          tc[h] = 0;
        }
      }
    }

  }
  return 0;
}

// General resampler: sample x at caller-supplied coordinates (the scipy
// map_coordinates analogue; host twin of elasticdeform_tpu.map_coordinates).
//   gradient = 0: y[p] = interp(x at coords[:, p])          (gather)
//   gradient = 1: x += scatter of y[p] * weights            (adjoint)
// coords: (nd, P) C-contiguous, in voxel units of the deformed axes;
// x: (S[0..nd-1], C); y: (P, C). Same tap/boundary math as ed_deform_grid
// (reference deform.c:781-901 semantics), minus the displacement-grid
// interpolation — the coordinates come from the caller.
int ed_map_coordinates(int gradient,
                       double* x, const int64_t* S, int nd, int64_t C,
                       const double* coords, int64_t P,
                       double* y,
                       int order, int mode, double cval) {
  if (nd < 1 || nd > kMaxDim || order < 0 || order > 5) return 1;
  int64_t xs[kMaxDim];
  {
    int64_t s = 1;
    for (int h = nd - 1; h >= 0; --h) { xs[h] = s; s *= S[h]; }
  }
  const int taps = order + 1;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (!gradient)
#endif
  for (int64_t v = 0; v < P; ++v) {
    bool inside = true;
    int64_t tap_idx[kMaxDim][6];
    double tap_w[kMaxDim][6];
    for (int h = 0; h < nd && inside; ++h) {
      double c = coords[h * P + v];
      if (!map_coordinate(c, S[h], mode)) { inside = false; break; }
      const int64_t start =
          int64_t(std::floor(order & 1 ? c : c + 0.5)) - order / 2;
      double w6[6];
      spline_weights(c, order, w6);
      for (int l = 0; l < taps; ++l) {
        tap_idx[h][l] = mirror_fold(start + l, S[h]) * xs[h];
        tap_w[h][l] = w6[l];
      }
    }
    double* yrow = y + v * C;
    if (!inside) {
      if (!gradient)
        for (int64_t c = 0; c < C; ++c) yrow[c] = cval;
    } else {
      if (!gradient)
        for (int64_t c = 0; c < C; ++c) yrow[c] = 0.0;
      int tc[kMaxDim] = {0};
      int64_t tap_total = 1;
      for (int h = 0; h < nd; ++h) tap_total *= taps;
      for (int64_t u = 0; u < tap_total; ++u) {
        double wprod = 1.0;
        int64_t off = 0;
        for (int h = 0; h < nd; ++h) {
          wprod *= tap_w[h][tc[h]];
          off += tap_idx[h][tc[h]];
        }
        double* xrow = x + off * C;
        if (!gradient) {
          for (int64_t c = 0; c < C; ++c) yrow[c] += wprod * xrow[c];
        } else {
          for (int64_t c = 0; c < C; ++c) xrow[c] += wprod * yrow[c];
        }
        for (int h = nd - 1; h >= 0; --h) {
          if (++tc[h] < taps) break;
          tc[h] = 0;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
