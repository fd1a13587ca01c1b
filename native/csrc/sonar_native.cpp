// sonar_native: host-side runtime kernels for sonar_slam_tpu.
//
// The reference's native layer does per-pixel CFAR and PCL point ops
// (bruce_slam/src/bruce_slam/cpp/{cfar,pcl}.cpp) because its compute path is
// CPU-bound. In this framework the compute path is the TPU; the native layer
// instead owns the HOST data path, where Python overhead actually hurts at
// production bag sizes:
//   * sensor-stream time alignment (the message_filters sync replacement)
//   * gamma decompression / framing of ping images into padded tensors
//   * golden CPU CFAR + voxel kernels for validating the TPU kernels
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// All algorithms are implemented fresh: CFAR uses per-column sliding prefix
// sums (O(R*C)), alignment uses binary search, voxel downsampling uses an
// open-addressing hash grid.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// time alignment
// ---------------------------------------------------------------------------

// Nearest ref index for each query (both ascending). out_dt = |t_ref - t_q|.
void align_nearest(const double* ref, int64_t n_ref, const double* query,
                   int64_t n_query, int64_t* out_idx, double* out_dt) {
  if (n_ref == 0) {
    for (int64_t i = 0; i < n_query; ++i) {
      out_idx[i] = 0;
      out_dt[i] = 1e300;
    }
    return;
  }
  for (int64_t i = 0; i < n_query; ++i) {
    const double t = query[i];
    const double* it = std::lower_bound(ref, ref + n_ref, t);
    int64_t hi = it - ref;
    int64_t lo = hi > 0 ? hi - 1 : 0;
    if (hi >= n_ref) hi = n_ref - 1;
    const int64_t best =
        std::fabs(ref[hi] - t) < std::fabs(ref[lo] - t) ? hi : lo;
    out_idx[i] = best;
    out_dt[i] = std::fabs(ref[best] - t);
  }
}

// Last ref index with ref[i] <= query (Cache.getLast semantics); -1 if none.
void align_last_before(const double* ref, int64_t n_ref, const double* query,
                       int64_t n_query, int64_t* out_idx) {
  for (int64_t i = 0; i < n_query; ++i) {
    const double* it = std::upper_bound(ref, ref + n_ref, query[i]);
    out_idx[i] = static_cast<int64_t>(it - ref) - 1;
  }
}

// ---------------------------------------------------------------------------
// ping framing
// ---------------------------------------------------------------------------

// Undo the sonar's on-device gamma (utils/conversions.py r2n semantics):
// out = clip(pow(in/255, 255/gamma) * 255). LUT-based, batch of frames.
void gamma_decompress_u8(const uint8_t* in, int64_t n, double gamma,
                         float* out) {
  float lut[256];
  const double e = 255.0 / gamma;
  for (int v = 0; v < 256; ++v) {
    double x = std::pow(v / 255.0, e) * 255.0;
    lut[v] = static_cast<float>(std::min(std::max(x, 0.0), 255.0));
  }
  for (int64_t i = 0; i < n; ++i) out[i] = lut[in[i]];
}

// ---------------------------------------------------------------------------
// golden CFAR kernels (validation oracles for the TPU kernels)
// ---------------------------------------------------------------------------
// Window semantics identical to the TPU kernels (kernels/cfar.py): training
// cells for row r in column c are rows i with guard < |i-r| <= guard+train.
// Implemented with per-column prefix sums rather than per-pixel rescans.

static inline void column_prefix(const float* img, int rows, int cols, int c,
                                 std::vector<double>& pre) {
  pre[0] = 0.0;
  for (int r = 0; r < rows; ++r) pre[r + 1] = pre[r] + img[r * cols + c];
}

// mode: 0=CA, 1=SOCA, 2=GOCA
void cfar_sum_modes(const float* img, int rows, int cols, int train_hs,
                    int guard_hs, double tau, int mode, uint8_t* det,
                    float* thr) {
  const int hw = train_hs + guard_hs;
  std::vector<double> pre(rows + 1);
  std::memset(det, 0, static_cast<size_t>(rows) * cols);
  if (thr) std::memset(thr, 0, sizeof(float) * rows * cols);
  for (int c = 0; c < cols; ++c) {
    column_prefix(img, rows, cols, c, pre);
    for (int r = hw; r < rows - hw; ++r) {
      const double lead = pre[r - guard_hs] - pre[r - hw];
      const double lag = pre[r + hw + 1] - pre[r + guard_hs + 1];
      double stat;
      if (mode == 0)
        stat = (lead + lag) / (2.0 * train_hs);
      else if (mode == 1)
        stat = std::min(lead, lag) / train_hs;
      else
        stat = std::max(lead, lag) / train_hs;
      const double t = tau * stat;
      if (thr) thr[r * cols + c] = static_cast<float>(t);
      det[r * cols + c] = img[r * cols + c] > t;
    }
  }
}

// OS-CFAR: k-th smallest (0-indexed) of the 2*train_hs training cells.
void cfar_os(const float* img, int rows, int cols, int train_hs, int guard_hs,
             int k, double tau, uint8_t* det, float* thr) {
  const int hw = train_hs + guard_hs;
  const int w = 2 * train_hs;
  std::vector<float> train(w);
  std::memset(det, 0, static_cast<size_t>(rows) * cols);
  if (thr) std::memset(thr, 0, sizeof(float) * rows * cols);
  for (int c = 0; c < cols; ++c) {
    for (int r = hw; r < rows - hw; ++r) {
      int n = 0;
      for (int i = r - hw; i < r - guard_hs; ++i) train[n++] = img[i * cols + c];
      for (int i = r + guard_hs + 1; i <= r + hw; ++i)
        train[n++] = img[i * cols + c];
      std::nth_element(train.begin(), train.begin() + k, train.end());
      const double t = tau * train[k];
      if (thr) thr[r * cols + c] = static_cast<float>(t);
      det[r * cols + c] = img[r * cols + c] > t;
    }
  }
}

// ---------------------------------------------------------------------------
// voxel-grid centroid downsampling (hash grid)
// ---------------------------------------------------------------------------

// Returns number of output points (<= max_out). Centroid per occupied cell,
// densest-first when capacity binds (same policy as cloud/voxel.py).
int64_t voxel_downsample(const float* pts, int64_t n, float resolution,
                         float x0, float y0, int nx, int ny, int64_t max_out,
                         float* out_pts) {
  struct Cell {
    double sx = 0, sy = 0;
    int64_t count = 0;
    int64_t id = -1;
  };
  const int64_t cap = std::max<int64_t>(64, n * 2);
  std::vector<Cell> table(cap);
  auto slot_of = [&](int64_t id) -> Cell* {
    uint64_t h = static_cast<uint64_t>(id) * 0x9E3779B97F4A7C15ull;
    for (int64_t probe = 0; probe < cap; ++probe) {
      Cell& cell = table[(h + probe) % cap];
      if (cell.id == -1 || cell.id == id) return &cell;
    }
    return nullptr;
  };
  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[2 * i], y = pts[2 * i + 1];
    const int ix = static_cast<int>(std::floor((x - x0) / resolution));
    const int iy = static_cast<int>(std::floor((y - y0) / resolution));
    if (ix < 0 || ix >= nx || iy < 0 || iy >= ny) continue;
    Cell* cell = slot_of(static_cast<int64_t>(iy) * nx + ix);
    if (!cell) continue;
    cell->id = static_cast<int64_t>(iy) * nx + ix;
    cell->sx += x;
    cell->sy += y;
    cell->count += 1;
  }
  std::vector<const Cell*> occ;
  occ.reserve(1024);
  for (const Cell& cell : table)
    if (cell.id != -1) occ.push_back(&cell);
  std::sort(occ.begin(), occ.end(), [](const Cell* a, const Cell* b) {
    if (a->count != b->count) return a->count > b->count;
    return a->id < b->id;
  });
  const int64_t m = std::min<int64_t>(max_out, occ.size());
  for (int64_t i = 0; i < m; ++i) {
    out_pts[2 * i] = static_cast<float>(occ[i]->sx / occ[i]->count);
    out_pts[2 * i + 1] = static_cast<float>(occ[i]->sy / occ[i]->count);
  }
  return m;
}

// LZ4 block decompression (format spec implementation) — the fast path for
// lz4-chunked rosbags; the pure-Python codec in sonar_slam_tpu/io/lz4.py is
// the reference/fallback (real bags are GBs, Python decodes ~MB/s).
// Returns bytes written, or -1 on malformed input / capacity overflow.
int64_t lz4_decompress_block(const uint8_t* src, int64_t n, uint8_t* dst,
                             int64_t cap) {
  int64_t i = 0, o = 0;
  while (i < n) {
    const uint8_t token = src[i++];
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        lit += b;
      } while (b == 255);
    }
    if (i + lit > n || o + lit > cap) return -1;
    std::memcpy(dst + o, src + i, static_cast<size_t>(lit));
    i += lit;
    o += lit;
    if (i >= n) break;  // last sequence: literals only
    if (i + 2 > n) return -1;
    const int64_t offset = src[i] | (static_cast<int64_t>(src[i + 1]) << 8);
    i += 2;
    if (offset == 0 || offset > o) return -1;
    int64_t ml = (token & 15) + 4;
    if ((token & 15) == 15) {
      uint8_t b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        ml += b;
      } while (b == 255);
    }
    if (o + ml > cap) return -1;
    if (offset >= ml) {
      std::memcpy(dst + o, dst + o - offset, static_cast<size_t>(ml));
      o += ml;
    } else {
      for (int64_t k = 0; k < ml; ++k, ++o) dst[o] = dst[o - offset];
    }
  }
  return o;
}

// XXH32 (frame-format checksums; same algorithm as io/lz4.py's reference)
uint32_t xxh32(const uint8_t* p, int64_t n, uint32_t seed) {
  const uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                 P4 = 668265263u, P5 = 374761393u;
  auto rotl = [](uint32_t x, int r) { return (x << r) | (x >> (32 - r)); };
  auto read32 = [](const uint8_t* q) {
    uint32_t v;
    std::memcpy(&v, q, 4);
    return v;  // little-endian hosts only (x86/ARM)
  };
  const uint8_t* end = p + n;
  uint32_t h;
  if (n >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 16;
    do {
      v1 = rotl(v1 + read32(p) * P2, 13) * P1; p += 4;
      v2 = rotl(v2 + read32(p) * P2, 13) * P1; p += 4;
      v3 = rotl(v3 + read32(p) * P2, 13) * P1; p += 4;
      v4 = rotl(v4 + read32(p) * P2, 13) * P1; p += 4;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
  } else {
    h = seed + P5;
  }
  h += static_cast<uint32_t>(n);
  while (p + 4 <= end) {
    h = rotl(h + read32(p) * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl(h + (*p) * P5, 11) * P1;
    ++p;
  }
  h ^= h >> 15;
  h *= P2;
  h ^= h >> 13;
  h *= P3;
  h ^= h >> 16;
  return h;
}

}  // extern "C"
