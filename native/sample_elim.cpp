// Weighted sample elimination for Poisson-disk point sets (Yuksel 2015,
// "Sample Elimination for Generating Poisson Disk Sample Sets") — the same
// algorithm Open3D's sample_points_poisson_disk uses, which the reference
// calls for mesh sampling (reference structures.py:3828-3853).
//
// Given M candidate points, eliminates the most-crowded samples one at a
// time (indexed max-heap keyed by a falloff-weighted neighbor sum) until n
// remain.  Neighbor queries run on a uniform hash grid with cell = r_e (the
// elimination radius, = 2*r_max).
//
// Exported C API (ctypes):
//   se_eliminate(points*, M, n, r_max, alpha, out_idx*) -> void
//     points: (M,3) float32, out_idx: (n,) int32 — indices of the survivors.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Grid {
  float cell;
  float origin[3];
  std::unordered_map<int64_t, std::vector<int>> cells;

  int64_t key(const float* p) const {
    int64_t ix = (int64_t)std::floor((p[0] - origin[0]) / cell);
    int64_t iy = (int64_t)std::floor((p[1] - origin[1]) / cell);
    int64_t iz = (int64_t)std::floor((p[2] - origin[2]) / cell);
    return (ix * 73856093LL) ^ (iy * 19349663LL) ^ (iz * 83492791LL) ^
           (ix << 40) ^ (iy << 20) ^ iz;
  }
};

inline float dist2(const float* a, const float* b) {
  float dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

// Indexed max-heap: heap of sample ids ordered by weight, with position map
// so any id's weight can be updated in O(log M).
struct IndexedHeap {
  std::vector<int> heap;      // heap[i] = id
  std::vector<int> pos;       // pos[id] = i or -1
  std::vector<double>* w;     // weights

  bool less(int a, int b) const { return (*w)[a] < (*w)[b]; }

  void swap_at(int i, int j) {
    std::swap(heap[i], heap[j]);
    pos[heap[i]] = i;
    pos[heap[j]] = j;
  }
  void up(int i) {
    while (i > 0) {
      int p = (i - 1) / 2;
      if (less(heap[p], heap[i])) { swap_at(p, i); i = p; } else break;
    }
  }
  void down(int i) {
    int n = (int)heap.size();
    for (;;) {
      int l = 2 * i + 1, r = l + 1, m = i;
      if (l < n && less(heap[m], heap[l])) m = l;
      if (r < n && less(heap[m], heap[r])) m = r;
      if (m == i) break;
      swap_at(i, m);
      i = m;
    }
  }
  int pop_max() {
    int id = heap[0];
    swap_at(0, (int)heap.size() - 1);
    heap.pop_back();
    pos[id] = -1;
    if (!heap.empty()) down(0);
    return id;
  }
  void update(int id) {
    int i = pos[id];
    if (i < 0) return;
    up(i);
    down(pos[id]);
  }
};

}  // namespace

extern "C" {

void se_eliminate(const float* pts, int64_t m, int64_t n, float r_max,
                  float alpha, int32_t* out_idx) {
  if (n >= m) {
    for (int64_t i = 0; i < n && i < m; ++i) out_idx[i] = (int32_t)i;
    return;
  }
  const float r_e = 2.0f * r_max;  // elimination radius
  const float r_e2 = r_e * r_e;

  Grid grid;
  grid.cell = r_e;
  grid.origin[0] = grid.origin[1] = grid.origin[2] = 0.f;
  for (int64_t i = 0; i < m; ++i) {
    for (int d = 0; d < 3; ++d)
      if (i == 0 || pts[i * 3 + d] < grid.origin[d])
        grid.origin[d] = pts[i * 3 + d];
  }
  grid.cells.reserve((size_t)m / 2);
  for (int64_t i = 0; i < m; ++i)
    grid.cells[grid.key(pts + i * 3)].push_back((int)i);

  // neighbor lists within r_e (symmetric)
  std::vector<std::vector<int>> nbrs(m);
  std::vector<double> weights(m, 0.0);
  for (int64_t i = 0; i < m; ++i) {
    const float* p = pts + i * 3;
    int64_t ix = (int64_t)std::floor((p[0] - grid.origin[0]) / grid.cell);
    int64_t iy = (int64_t)std::floor((p[1] - grid.origin[1]) / grid.cell);
    int64_t iz = (int64_t)std::floor((p[2] - grid.origin[2]) / grid.cell);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int64_t kx = ix + dx, ky = iy + dy, kz = iz + dz;
          int64_t k = (kx * 73856093LL) ^ (ky * 19349663LL) ^
                      (kz * 83492791LL) ^ (kx << 40) ^ (ky << 20) ^ kz;
          auto it = grid.cells.find(k);
          if (it == grid.cells.end()) continue;
          for (int j : it->second) {
            if (j <= i) continue;
            float d2 = dist2(p, pts + j * 3);
            if (d2 < r_e2) {
              nbrs[i].push_back(j);
              nbrs[j].push_back((int)i);
              // Yuksel eq. 2: w = (1 - d/(2 r_max))^alpha, d clamped below
              // by r_min = 0 (simplified form used by Open3D)
              double d = std::sqrt((double)d2);
              double wij = std::pow(1.0 - d / r_e, (double)alpha);
              weights[i] += wij;
              weights[j] += wij;
            }
          }
        }
  }

  IndexedHeap h;
  h.w = &weights;
  h.heap.resize(m);
  h.pos.resize(m);
  for (int64_t i = 0; i < m; ++i) { h.heap[i] = (int)i; h.pos[i] = (int)i; }
  for (int64_t i = m / 2; i >= 0; --i) h.down((int)i);

  std::vector<char> alive(m, 1);
  int64_t remaining = m;
  while (remaining > n) {
    int id = h.pop_max();
    alive[id] = 0;
    --remaining;
    const float* p = pts + (int64_t)id * 3;
    for (int j : nbrs[id]) {
      if (!alive[j]) continue;
      double d = std::sqrt((double)dist2(p, pts + (int64_t)j * 3));
      weights[j] -= std::pow(1.0 - d / r_e, (double)alpha);
      h.update(j);
    }
  }

  int64_t out = 0;
  for (int64_t i = 0; i < m && out < n; ++i)
    if (alive[i]) out_idx[out++] = (int32_t)i;
}

}  // extern "C"
