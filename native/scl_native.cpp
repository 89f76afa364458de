// Native host-side kernels for ShapeClipper-TPU.
//
// The reference's native component is a CUDA chamfer kernel
// (reference external/chamfer3D/); its TPU equivalent lives on-device
// (shapeclipper_tpu/ops/chamfer.py). THIS library covers the host-side eval
// hot spots instead — the parts the reference delegated to C/C++-backed
// third-party packages (PyMCubes' C++ core, vigra's C++ distance transform):
//
//   * marching_tetrahedra: isosurface extraction from an N^3 scalar field
//     (6-tet cube decomposition, same topology as the numpy fallback in
//     shapeclipper_tpu/eval3d/isosurface.py)
//   * boundary_distance: exact squared-Euclidean distance transform
//     (Felzenszwalb-Huttenlocher two-pass parabolic method) to the mask
//     boundary, for ray-importance sampling
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

void scl_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// marching tetrahedra
// ---------------------------------------------------------------------------

namespace {

// corner bit order (x, y, z): corner = ix + 2*iy + 4*iz
const int TETS[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};
const int CORNER_OFF[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

struct Emitter {
  std::vector<float> verts;
  void edge_point(const float* pos, const float* val, int a, int b,
                  float iso) {
    float va = val[a], vb = val[b];
    float denom = vb - va;
    if (std::fabs(denom) < 1e-12f) denom = 1e-12f;
    float t = (iso - va) / denom;
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    for (int d = 0; d < 3; ++d)
      verts.push_back(pos[a * 3 + d] * (1.f - t) + pos[b * 3 + d] * t);
  }
  void tri(const float* pos, const float* val, float iso, int a0, int b0,
           int a1, int b1, int a2, int b2) {
    edge_point(pos, val, a0, b0, iso);
    edge_point(pos, val, a1, b1, iso);
    edge_point(pos, val, a2, b2, iso);
  }
};

void process_tet(Emitter& em, const float* pos, const float* val, float iso) {
  int inside[4], outside[4];
  int ni = 0, no = 0;
  for (int i = 0; i < 4; ++i) {
    if (val[i] < iso) inside[ni++] = i; else outside[no++] = i;
  }
  if (ni == 0 || ni == 4) return;
  if (ni == 1) {
    int a = inside[0];
    em.tri(pos, val, iso, a, outside[0], a, outside[1], a, outside[2]);
  } else if (ni == 3) {
    int a = outside[0];
    em.tri(pos, val, iso, inside[0], a, inside[2], a, inside[1], a);
  } else {  // ni == 2: quad split into two triangles
    int i0 = inside[0], i1 = inside[1];
    int o0 = outside[0], o1 = outside[1];
    em.tri(pos, val, iso, i0, o0, i1, o0, i1, o1);
    em.tri(pos, val, iso, i0, o0, i1, o1, i0, o1);
  }
}

}  // namespace

// level: [N*N*N] row-major (x-major like numpy [x][y][z]); returns a triangle
// soup (every 3 consecutive vertices form one face), vertex coords in index
// units [0, N-1]. Caller frees *out_verts with scl_free.
int marching_tetrahedra(const float* level, int N, float isovalue,
                        float** out_verts, long long* out_n_verts) {
  Emitter em;
  em.verts.reserve(1 << 16);
  const long long NN = (long long)N * N;
  float pos[8 * 3];
  float val[8];
  float tpos[4 * 3];
  float tval[4];
  for (int x = 0; x + 1 < N; ++x) {
    for (int y = 0; y + 1 < N; ++y) {
      for (int z = 0; z + 1 < N; ++z) {
        bool any_in = false, all_in = true;
        for (int c = 0; c < 8; ++c) {
          int cx = x + CORNER_OFF[c][0];
          int cy = y + CORNER_OFF[c][1];
          int cz = z + CORNER_OFF[c][2];
          float v = level[(long long)cx * NN + (long long)cy * N + cz];
          val[c] = v;
          pos[c * 3 + 0] = (float)cx;
          pos[c * 3 + 1] = (float)cy;
          pos[c * 3 + 2] = (float)cz;
          bool in = v < isovalue;
          any_in |= in;
          all_in &= in;
        }
        if (!any_in || all_in) continue;
        for (int t = 0; t < 6; ++t) {
          for (int k = 0; k < 4; ++k) {
            int c = TETS[t][k];
            tval[k] = val[c];
            std::memcpy(tpos + k * 3, pos + c * 3, 3 * sizeof(float));
          }
          process_tet(em, tpos, tval, isovalue);
        }
      }
    }
  }
  long long n = (long long)em.verts.size() / 3;
  float* buf = (float*)std::malloc(em.verts.size() * sizeof(float));
  if (!buf) return -1;
  std::memcpy(buf, em.verts.data(), em.verts.size() * sizeof(float));
  *out_verts = buf;
  *out_n_verts = n;
  return 0;
}

// ---------------------------------------------------------------------------
// exact Euclidean distance transform (Felzenszwalb-Huttenlocher)
// ---------------------------------------------------------------------------

namespace {

// 1-D squared distance transform of sampled function f, output into d.
void dt1d(const float* f, float* d, int n, int* v, float* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -std::numeric_limits<float>::infinity();
  z[1] = std::numeric_limits<float>::infinity();
  for (int q = 1; q < n; ++q) {
    float s;
    while (true) {
      s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2.f * q - 2.f * v[k]);
      if (s <= z[k]) { --k; } else break;
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = std::numeric_limits<float>::infinity();
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    float dq = q - v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

void edt2d(std::vector<float>& grid, int H, int W) {
  const float INF = 1e20f;
  std::vector<float> f(std::max(H, W)), d(std::max(H, W)), z(std::max(H, W) + 1);
  std::vector<int> v(std::max(H, W));
  // columns
  for (int x = 0; x < W; ++x) {
    for (int y = 0; y < H; ++y) f[y] = grid[(long long)y * W + x];
    dt1d(f.data(), d.data(), H, v.data(), z.data());
    for (int y = 0; y < H; ++y) grid[(long long)y * W + x] = d[y];
  }
  // rows
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) f[x] = grid[(long long)y * W + x];
    dt1d(f.data(), d.data(), W, v.data(), z.data());
    for (int x = 0; x < W; ++x) grid[(long long)y * W + x] = d[x];
  }
  (void)INF;
}

}  // namespace

// mask: [H*W] uint8 (nonzero = foreground). out: [H*W] float distance of
// every pixel to the fg/bg boundary, 0.5-px convention (>= 0).
int boundary_distance(const uint8_t* mask, int H, int W, float* out) {
  const float INF = 1e20f;
  long long n = (long long)H * W;
  bool any_fg = false, any_bg = false;
  for (long long i = 0; i < n; ++i) {
    if (mask[i]) any_fg = true; else any_bg = true;
  }
  if (!any_fg || !any_bg) {
    float big = (float)(H > W ? H : W);
    for (long long i = 0; i < n; ++i) out[i] = big;
    return 0;
  }
  std::vector<float> d_in(n), d_out(n);
  for (long long i = 0; i < n; ++i) {
    d_in[i] = mask[i] ? INF : 0.f;   // distance to background
    d_out[i] = mask[i] ? 0.f : INF;  // distance to foreground
  }
  edt2d(d_in, H, W);
  edt2d(d_out, H, W);
  for (long long i = 0; i < n; ++i) {
    float d2 = mask[i] ? d_in[i] : d_out[i];
    float d = std::sqrt(d2) - 0.5f;
    out[i] = d > 0.f ? d : 0.f;
  }
  return 0;
}

}  // extern "C"
