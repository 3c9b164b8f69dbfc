// BVH triangle-mesh ray caster — the framework's native replacement for the
// reference's Open3D/Embree RaycastingScene (structures.py:3489-3509,
// scene.cast_rays at :3737). Exposed to Python via ctypes (see
// gpcr_tpu/native_bindings/__init__.py).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC raytracer.cpp -o libgpcr_rt.so
//
// API (C):
//   void* rt_build(const float* verts, int n_verts, const int* tris, int n_tris);
//   void  rt_cast(void* h, const float* origins, const float* dirs, long n_rays,
//                 float* out_t, int* out_prim, float* out_u, float* out_v);
//   void  rt_free(void* h);

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Vec3 {
  float x, y, z;
};
static inline Vec3 sub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline Vec3 vmin(Vec3 a, Vec3 b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(Vec3 a, Vec3 b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  Vec3 lo{1e30f, 1e30f, 1e30f};
  Vec3 hi{-1e30f, -1e30f, -1e30f};
  void grow(Vec3 p) { lo = vmin(lo, p); hi = vmax(hi, p); }
  void grow(const AABB& b) { lo = vmin(lo, b.lo); hi = vmax(hi, b.hi); }
};

struct Node {
  AABB box;
  int left = -1;    // internal: left child (right = left + 1); leaf: -1
  int start = 0;    // leaf: first triangle index in order[]
  int count = 0;    // leaf: number of triangles
};

struct Scene {
  std::vector<Vec3> v0, e1, e2;   // per-triangle precomputed edges
  std::vector<int> order;         // triangle permutation (leaf ranges)
  std::vector<Node> nodes;
};

static AABB tri_box(const Scene& s, int t) {
  AABB b;
  Vec3 a = s.v0[t];
  Vec3 bb = {a.x + s.e1[t].x, a.y + s.e1[t].y, a.z + s.e1[t].z};
  Vec3 c = {a.x + s.e2[t].x, a.y + s.e2[t].y, a.z + s.e2[t].z};
  b.grow(a); b.grow(bb); b.grow(c);
  return b;
}

static int build_node(Scene& s, std::vector<Vec3>& centroids, int start, int count) {
  int idx = (int)s.nodes.size();
  s.nodes.emplace_back();
  AABB box;
  for (int i = start; i < start + count; i++) box.grow(tri_box(s, s.order[i]));
  s.nodes[idx].box = box;
  if (count <= 4) {
    s.nodes[idx].start = start;
    s.nodes[idx].count = count;
    return idx;
  }
  // split on the longest centroid axis at the median
  AABB cb;
  for (int i = start; i < start + count; i++) cb.grow(centroids[s.order[i]]);
  Vec3 ext = sub(cb.hi, cb.lo);
  int axis = 0;
  if (ext.y > ext.x) axis = 1;
  if (ext.z > (axis ? ext.y : ext.x)) axis = 2;
  int mid = start + count / 2;
  std::nth_element(
      s.order.begin() + start, s.order.begin() + mid,
      s.order.begin() + start + count,
      [&](int a, int b) {
        const float* ca = &centroids[a].x;
        const float* cb2 = &centroids[b].x;
        return ca[axis] < cb2[axis];
      });
  int l = build_node(s, centroids, start, mid - start);
  int r = build_node(s, centroids, mid, start + count - mid);
  (void)r;  // r == l + subtree size; we store l and rely on layout below
  s.nodes[idx].left = l;
  s.nodes[idx].count = 0;
  s.nodes[idx].start = r;  // store right child explicitly
  return idx;
}

static inline bool box_hit(const AABB& b, Vec3 o, Vec3 inv_d, float tmax) {
  float tx1 = (b.lo.x - o.x) * inv_d.x, tx2 = (b.hi.x - o.x) * inv_d.x;
  float tmin = std::min(tx1, tx2), tm = std::max(tx1, tx2);
  float ty1 = (b.lo.y - o.y) * inv_d.y, ty2 = (b.hi.y - o.y) * inv_d.y;
  tmin = std::max(tmin, std::min(ty1, ty2));
  tm = std::min(tm, std::max(ty1, ty2));
  float tz1 = (b.lo.z - o.z) * inv_d.z, tz2 = (b.hi.z - o.z) * inv_d.z;
  tmin = std::max(tmin, std::min(tz1, tz2));
  tm = std::min(tm, std::max(tz1, tz2));
  return tm >= std::max(tmin, 0.0f) && tmin <= tmax;
}

}  // namespace

extern "C" {

void* rt_build(const float* verts, int n_verts, const int* tris, int n_tris) {
  (void)n_verts;
  Scene* s = new Scene();
  s->v0.resize(n_tris);
  s->e1.resize(n_tris);
  s->e2.resize(n_tris);
  s->order.resize(n_tris);
  std::vector<Vec3> centroids(n_tris);
  for (int t = 0; t < n_tris; t++) {
    Vec3 a = {verts[3 * tris[3 * t] + 0], verts[3 * tris[3 * t] + 1],
              verts[3 * tris[3 * t] + 2]};
    Vec3 b = {verts[3 * tris[3 * t + 1] + 0], verts[3 * tris[3 * t + 1] + 1],
              verts[3 * tris[3 * t + 1] + 2]};
    Vec3 c = {verts[3 * tris[3 * t + 2] + 0], verts[3 * tris[3 * t + 2] + 1],
              verts[3 * tris[3 * t + 2] + 2]};
    s->v0[t] = a;
    s->e1[t] = sub(b, a);
    s->e2[t] = sub(c, a);
    centroids[t] = {(a.x + b.x + c.x) / 3, (a.y + b.y + c.y) / 3,
                    (a.z + b.z + c.z) / 3};
    s->order[t] = t;
  }
  s->nodes.reserve(2 * std::max(n_tris, 1));
  if (n_tris > 0) build_node(*s, centroids, 0, n_tris);
  return s;
}

void rt_cast(void* h, const float* origins, const float* dirs, long n_rays,
             float* out_t, int* out_prim, float* out_u, float* out_v) {
  const Scene& s = *static_cast<Scene*>(h);
  if (s.nodes.empty()) {
    for (long r = 0; r < n_rays; r++) {
      out_t[r] = INFINITY; out_prim[r] = -1; out_u[r] = 0; out_v[r] = 0;
    }
    return;
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 256)
#endif
  for (long r = 0; r < n_rays; r++) {
    Vec3 o = {origins[3 * r], origins[3 * r + 1], origins[3 * r + 2]};
    Vec3 d = {dirs[3 * r], dirs[3 * r + 1], dirs[3 * r + 2]};
    Vec3 inv_d = {1.0f / d.x, 1.0f / d.y, 1.0f / d.z};
    float best_t = INFINITY, best_u = 0, best_v = 0;
    int best_p = -1;
    int stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      const Node& node = s.nodes[stack[--sp]];
      if (!box_hit(node.box, o, inv_d, best_t)) continue;
      if (node.left < 0) {
        for (int i = node.start; i < node.start + node.count; i++) {
          int t = s.order[i];
          // Moller-Trumbore
          Vec3 p = cross(d, s.e2[t]);
          float det = dot(s.e1[t], p);
          if (std::fabs(det) < 1e-12f) continue;
          float inv_det = 1.0f / det;
          Vec3 tv = sub(o, s.v0[t]);
          float u = dot(tv, p) * inv_det;
          if (u < 0.0f || u > 1.0f) continue;
          Vec3 q = cross(tv, s.e1[t]);
          float v = dot(d, q) * inv_det;
          if (v < 0.0f || u + v > 1.0f) continue;
          float tt = dot(s.e2[t], q) * inv_det;
          if (tt > 1e-6f && tt < best_t) {
            best_t = tt; best_u = u; best_v = v; best_p = t;
          }
        }
      } else {
        stack[sp++] = node.left;
        stack[sp++] = node.start;  // right child
      }
    }
    out_t[r] = best_t;
    out_prim[r] = best_p;
    out_u[r] = best_u;
    out_v[r] = best_v;
  }
}

void rt_free(void* h) { delete static_cast<Scene*>(h); }

}  // extern "C"
