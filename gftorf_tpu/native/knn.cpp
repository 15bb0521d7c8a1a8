// Native mean-kNN-squared-distance for Gaussian scale initialization.
//
// CPU counterpart of the reference's simple-knn CUDA extension
// (simple_knn.cu:185-221): Morton-order the points, take a window of
// neighbors in Morton order as candidates to establish a rejection
// radius, then do an exact box-pruned scan. OpenMP-parallel over points.
//
// C ABI for ctypes:
//   void mean_knn_sq_dist(const float* pts, int64_t n, int k,
//                         int window, float* out);

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct MortonEntry {
  uint64_t code;
  int32_t idx;
  bool operator<(const MortonEntry& o) const { return code < o.code; }
};

inline uint64_t expand_bits21(uint64_t v) {
  v &= 0x1fffff;  // 21 bits
  v = (v | (v << 32)) & 0x1f00000000ffffULL;
  v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
  v = (v | (v << 8)) & 0x100f00f00f00f00fULL;
  v = (v | (v << 4)) & 0x10c30c30c30c30c3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

inline uint64_t morton3d(float x, float y, float z) {
  auto q = [](float f) {
    return static_cast<uint64_t>(std::min(std::max(f * 2097151.0f, 0.0f),
                                          2097151.0f));
  };
  return (expand_bits21(q(x)) << 2) | (expand_bits21(q(y)) << 1) |
         expand_bits21(q(z));
}

struct TopK {
  // max-heap over the k smallest squared distances
  float d[16];
  int k;
  int size = 0;
  explicit TopK(int kk) : k(kk) {}
  inline float worst() const { return size < k ? FLT_MAX : d[0]; }
  inline void push(float v) {
    if (size < k) {
      d[size++] = v;
      for (int i = size - 1; i > 0;) {
        int p = (i - 1) / 2;
        if (d[p] < d[i]) { std::swap(d[p], d[i]); i = p; } else break;
      }
    } else if (v < d[0]) {
      d[0] = v;
      int i = 0;
      for (;;) {
        int l = 2 * i + 1, r = 2 * i + 2, m = i;
        if (l < k && d[l] > d[m]) m = l;
        if (r < k && d[r] > d[m]) m = r;
        if (m == i) break;
        std::swap(d[m], d[i]);
        i = m;
      }
    }
  }
  inline float mean() const {
    float s = 0.0f;
    for (int i = 0; i < size; ++i) s += d[i];
    return size ? s / static_cast<float>(size) : 0.0f;
  }
};

}  // namespace

extern "C" {

void mean_knn_sq_dist(const float* pts, int64_t n, int k, int window,
                      float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    return;
  }
  if (k > 16) k = 16;

  // bounding box for Morton quantization
  float mn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
  float mx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      const float v = pts[3 * i + d];
      mn[d] = std::min(mn[d], v);
      mx[d] = std::max(mx[d], v);
    }
  }
  float inv[3];
  for (int d = 0; d < 3; ++d) {
    const float ext = mx[d] - mn[d];
    inv[d] = ext > 0.0f ? 1.0f / ext : 0.0f;
  }

  std::vector<MortonEntry> order(n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    order[i].code = morton3d((pts[3 * i] - mn[0]) * inv[0],
                             (pts[3 * i + 1] - mn[1]) * inv[1],
                             (pts[3 * i + 2] - mn[2]) * inv[2]);
    order[i].idx = static_cast<int32_t>(i);
  }
  std::sort(order.begin(), order.end());

  // box AABBs over fixed-size Morton runs for pruning
  const int box = 1024;
  const int64_t nboxes = (n + box - 1) / box;
  std::vector<float> bmin(nboxes * 3), bmax(nboxes * 3);
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nboxes; ++b) {
    float bmn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float bmx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    const int64_t end = std::min<int64_t>((b + 1) * box, n);
    for (int64_t j = b * box; j < end; ++j) {
      const float* p = pts + 3 * order[j].idx;
      for (int d = 0; d < 3; ++d) {
        bmn[d] = std::min(bmn[d], p[d]);
        bmx[d] = std::max(bmx[d], p[d]);
      }
    }
    for (int d = 0; d < 3; ++d) {
      bmin[3 * b + d] = bmn[d];
      bmax[3 * b + d] = bmx[d];
    }
  }

#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + 3 * order[i].idx;
    TopK heap(k);
    // candidate window in Morton order establishes the reject radius
    const int64_t lo = std::max<int64_t>(0, i - window);
    const int64_t hi = std::min<int64_t>(n, i + window + 1);
    for (int64_t j = lo; j < hi; ++j) {
      if (j == i) continue;
      const float* q = pts + 3 * order[j].idx;
      const float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      heap.push(dx * dx + dy * dy + dz * dz);
    }
    float reject = heap.worst();

    // exact box-pruned scan over everything outside the window
    for (int64_t b = 0; b < nboxes; ++b) {
      const int64_t bs = b * box, be = std::min<int64_t>(bs + box, n);
      if (bs >= lo && be <= hi) continue;  // fully inside window
      // distance from p to box AABB
      float dbox = 0.0f;
      for (int d = 0; d < 3; ++d) {
        const float lo_d = bmin[3 * b + d], hi_d = bmax[3 * b + d];
        const float v = p[d] < lo_d ? lo_d - p[d]
                        : (p[d] > hi_d ? p[d] - hi_d : 0.0f);
        dbox += v * v;
      }
      if (dbox > reject) continue;
      for (int64_t j = bs; j < be; ++j) {
        if (j >= lo && j < hi) continue;  // already considered
        const float* q = pts + 3 * order[j].idx;
        const float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        const float dist = dx * dx + dy * dy + dz * dz;
        if (dist < reject) {
          heap.push(dist);
          reject = heap.worst();
        }
      }
    }
    out[order[i].idx] = heap.mean();
  }
}

}  // extern "C"
