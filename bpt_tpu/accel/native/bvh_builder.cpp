// Native BVH builder — C++ twin of bpt_tpu/accel/builder.py.
//
// The reference's builder (js/BVH_Fast_Builder.js) is itself a port of a
// C++ CUDA renderer's builder; this is our native tier for large meshes
// (the pure-numpy builder is fine to ~100k triangles, this one holds
// 500k+ — the reference's stated capacity — at interactive latency).
//
// Identical algorithm and flat layout to builder.py:
//   * top-down, split at the spatial median of the ranked longest axis,
//   * next-best axis when a side comes up empty, even/odd fallback,
//   * preorder left-first emission => left child == parent + 1,
//   * right-child id patched into the parent, leaves hold one triangle.
// std::stable_partition mirrors numpy's order-preserving boolean selection,
// so native and numpy builds produce bit-identical trees (tested).
//
// C ABI for ctypes; no dependencies beyond the C++ standard library.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Frame {
  int64_t begin;
  int64_t end;     // exclusive
  int64_t parent;  // node id, -1 for root
  bool is_left;
  int32_t depth;
};

}  // namespace

extern "C" int bvh_build(const float* aabb_min, const float* aabb_max,
                         int64_t n_tris, int32_t* node_tri,
                         int32_t* node_right, float* node_min,
                         float* node_max, int32_t* out_max_depth) {
  if (n_tris < 1) return -1;
  std::vector<int64_t> ids(n_tris);
  for (int64_t i = 0; i < n_tris; ++i) ids[i] = i;
  std::vector<float> centroid(n_tris * 3);
  for (int64_t i = 0; i < n_tris; ++i)
    for (int c = 0; c < 3; ++c)
      centroid[i * 3 + c] = 0.5f * (aabb_min[i * 3 + c] + aabb_max[i * 3 + c]);

  std::vector<Frame> stack;
  stack.reserve(128);
  stack.push_back({0, n_tris, -1, true, 0});
  int64_t next_id = 0;
  int32_t max_depth = 0;

  while (!stack.empty()) {
    Frame f = stack.back();
    stack.pop_back();
    const int64_t my_id = next_id++;
    if (f.depth > max_depth) max_depth = f.depth;
    if (f.parent >= 0 && !f.is_left) node_right[f.parent] = (int32_t)my_id;

    float mn[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float mx[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int64_t i = f.begin; i < f.end; ++i) {
      const int64_t t = ids[i];
      for (int c = 0; c < 3; ++c) {
        mn[c] = std::min(mn[c], aabb_min[t * 3 + c]);
        mx[c] = std::max(mx[c], aabb_max[t * 3 + c]);
      }
    }
    for (int c = 0; c < 3; ++c) {
      node_min[my_id * 3 + c] = mn[c];
      node_max[my_id * 3 + c] = mx[c];
    }
    node_tri[my_id] = -1;
    node_right[my_id] = -1;

    const int64_t count = f.end - f.begin;
    if (count == 1) {
      node_tri[my_id] = (int32_t)ids[f.begin];
      continue;
    }

    // ranked axes, longest extent first (stable order like np.argsort(-e))
    float extent[3] = {mx[0] - mn[0], mx[1] - mn[1], mx[2] - mn[2]};
    int order[3] = {0, 1, 2};
    std::stable_sort(order, order + 3,
                     [&](int a, int b) { return extent[a] > extent[b]; });

    int64_t mid = -1;
    for (int oi = 0; oi < 3; ++oi) {
      const int axis = order[oi];
      const float split = 0.5f * (mn[axis] + mx[axis]);
      auto it = std::stable_partition(
          ids.begin() + f.begin, ids.begin() + f.end,
          [&](int64_t t) { return centroid[t * 3 + axis] < split; });
      const int64_t n_left = it - (ids.begin() + f.begin);
      if (n_left > 0 && n_left < count) {
        mid = f.begin + n_left;
        break;
      }
    }
    if (mid < 0) {
      // all centroids coincide: alternate even/odd assignment
      std::vector<int64_t> left, right;
      left.reserve((count + 1) / 2);
      right.reserve(count / 2);
      for (int64_t i = f.begin; i < f.end; ++i)
        (((i - f.begin) % 2 == 0) ? left : right).push_back(ids[i]);
      int64_t w = f.begin;
      for (int64_t t : left) ids[w++] = t;
      mid = w;
      for (int64_t t : right) ids[w++] = t;
    }

    // push right first so the left branch is emitted immediately after
    stack.push_back({mid, f.end, my_id, false, f.depth + 1});
    stack.push_back({f.begin, mid, my_id, true, f.depth + 1});
  }

  *out_max_depth = max_depth;
  return (next_id == 2 * n_tris - 1) ? 0 : -2;
}
