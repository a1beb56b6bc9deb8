// Native BVH builder: reference-topology median split, flattened to the
// DFS/skip-link layout consumed by plutracer_tpu.ops.bvh.
//
// Topology matches the reference builder (src/surfaces/bvh_tree.cpp:7-36):
// size-1 -> leaf, size-2 -> two leaf children without sorting, otherwise
// stable-sort by AABB-center on the cycling axis and split at n/2. The
// Python builder (ops/bvh.py) is the semantic oracle; this exists because
// building a 1M-triangle mesh BVH in Python is minutes, in C++ milliseconds.
//
// C ABI (see native/__init__.py for the ctypes binding):
//   plu_build_bvh(prims, P, node_min, node_max, node_skip, node_prim)
//     prims:    P x 10 floats [type ax ay az bx by bz cx cy cz]
//     outputs:  preallocated for exactly 2P-1 nodes
//     returns:  node count (2P-1) or -1 on error

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int kSphere = 0;
constexpr int kBox = 1;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Node {
  Vec3 mn, mx;
  int left = -1, right = -1;
  int prim = -1;
};

struct Builder {
  const float* prims;
  std::vector<Vec3> lo, hi;
  std::vector<float> cx, cy, cz;
  std::vector<Node> nodes;

  explicit Builder(const float* p, int P) : prims(p) {
    lo.resize(P);
    hi.resize(P);
    cx.resize(P);
    cy.resize(P);
    cz.resize(P);
    for (int i = 0; i < P; ++i) {
      const float* r = prims + i * 10;
      int t = static_cast<int>(r[0]);
      Vec3 a{r[1], r[2], r[3]}, b{r[4], r[5], r[6]}, c{r[7], r[8], r[9]};
      if (t == kSphere) {
        float rad = b.x;
        lo[i] = {a.x - rad, a.y - rad, a.z - rad};
        hi[i] = {a.x + rad, a.y + rad, a.z + rad};
      } else if (t == kBox) {
        lo[i] = a;
        hi[i] = b;
      } else {
        lo[i] = vmin(vmin(a, b), c);
        hi[i] = vmax(vmax(a, b), c);
      }
      cx[i] = (lo[i].x + hi[i].x) * 0.5f;
      cy[i] = (lo[i].y + hi[i].y) * 0.5f;
      cz[i] = (lo[i].z + hi[i].z) * 0.5f;
    }
    nodes.reserve(2 * P);
  }

  int add_leaf(int i) {
    nodes.push_back(Node{lo[i], hi[i], -1, -1, i});
    return static_cast<int>(nodes.size()) - 1;
  }

  int add_internal(int l, int r) {
    Node n;
    n.mn = vmin(nodes[l].mn, nodes[r].mn);
    n.mx = vmax(nodes[l].mx, nodes[r].mx);
    n.left = l;
    n.right = r;
    nodes.push_back(n);
    return static_cast<int>(nodes.size()) - 1;
  }

  const float* center(int axis) const {
    return axis == 0 ? cx.data() : (axis == 1 ? cy.data() : cz.data());
  }

  int build(int* idx, int n, int axis) {
    if (n == 1) return add_leaf(idx[0]);
    if (n == 2) {
      // reference special-cases 2 without sorting (bvh_tree.cpp:22-26)
      int l = add_leaf(idx[0]);
      int r = add_leaf(idx[1]);
      return add_internal(l, r);
    }
    const float* c = center(axis);
    std::stable_sort(idx, idx + n, [c](int a, int b) { return c[a] < c[b]; });
    int mid = n / 2;
    int nxt = (axis + 1) % 3;
    int l = build(idx, mid, nxt);
    int r = build(idx + mid, n - mid, nxt);
    return add_internal(l, r);
  }

  int subtree_size(int n) const {
    if (nodes[n].left < 0) return 1;
    return 1 + subtree_size(nodes[n].left) + subtree_size(nodes[n].right);
  }

  void layout(int n, int& counter, float* node_min, float* node_max,
              int32_t* node_skip, int32_t* node_prim) const {
    int me = counter++;
    node_min[me * 3 + 0] = nodes[n].mn.x;
    node_min[me * 3 + 1] = nodes[n].mn.y;
    node_min[me * 3 + 2] = nodes[n].mn.z;
    node_max[me * 3 + 0] = nodes[n].mx.x;
    node_max[me * 3 + 1] = nodes[n].mx.y;
    node_max[me * 3 + 2] = nodes[n].mx.z;
    node_skip[me] = me + subtree_size(n);
    node_prim[me] = nodes[n].prim;
    if (nodes[n].left >= 0) {
      layout(nodes[n].left, counter, node_min, node_max, node_skip, node_prim);
      layout(nodes[n].right, counter, node_min, node_max, node_skip, node_prim);
    }
  }
};

}  // namespace

extern "C" int plu_build_bvh(const float* prims, int P, float* node_min,
                             float* node_max, int32_t* node_skip,
                             int32_t* node_prim) {
  if (P <= 0) return -1;
  Builder b(prims, P);
  std::vector<int> idx(P);
  std::iota(idx.begin(), idx.end(), 0);
  int root = b.build(idx.data(), P, 0);
  int counter = 0;
  b.layout(root, counter, node_min, node_max, node_skip, node_prim);
  return counter;
}
