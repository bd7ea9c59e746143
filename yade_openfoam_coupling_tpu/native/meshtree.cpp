// Native runtime: k-d tree point locator + spatial hash binner.
//
// The reference's only non-OpenFOAM native subsystem is libMeshTree
// (/root/reference/FoamYade/meshtree/meshTree.{H,C}): a 3-D k-d tree over
// cell centres used to locate particles and collect the <=12 nearest cells
// within the Gaussian interpolation range. On a uniform grid that query is
// O(1) arithmetic and lives on-device (ops/coupling.py::locate), so the
// tree is NOT on the TPU hot path here. What remains native-worthy is the
// host-side runtime work the reference also does natively:
//
//   * locating points against ARBITRARY (non-uniform / future unstructured)
//     cell-centre clouds during case setup, checkpoint import, or
//     postprocessing — k-d tree build + nearest / range queries;
//   * initial spatial binning of large particle sets before device upload
//     (host-side data-loader work).
//
// Design notes (not a translation): iterative build over an index array
// with Hoare partitioning by the widest-spread axis (the reference
// recursively nth_element's alternating axes and heap-allocates a node per
// point); queries use an explicit stack, no recursion, no per-node malloc;
// results are written into caller-provided buffers across a C ABI for
// ctypes (no C++ types cross the boundary).
//
// Build: make -C yade_openfoam_coupling_tpu/native  (or via bindings.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct KDTree {
  // flattened, index-based tree: node i spans order[lo..hi) with split
  // stored implicitly by construction (median layout).
  std::vector<double> pts;   // (n, 3)
  std::vector<int32_t> order;
  int32_t n = 0;

  double coord(int32_t idx, int axis) const { return pts[3 * idx + axis]; }
};

struct Span {
  int32_t lo, hi;  // range in order[]
  int depth;
};

int widest_axis(const KDTree& t, int32_t lo, int32_t hi) {
  double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
  for (int32_t i = lo; i < hi; ++i) {
    for (int a = 0; a < 3; ++a) {
      double c = t.coord(t.order[i], a);
      mn[a] = std::min(mn[a], c);
      mx[a] = std::max(mx[a], c);
    }
  }
  int best = 0;
  double spread = -1.0;
  for (int a = 0; a < 3; ++a) {
    if (mx[a] - mn[a] > spread) {
      spread = mx[a] - mn[a];
      best = a;
    }
  }
  return best;
}

// median-layout build: order[] is arranged so that the median of each span
// sits at its midpoint, recursively — queries re-derive the structure from
// (lo, hi) alone. Axis choice is by widest spread, stored in axes[mid].
void build(KDTree& t, std::vector<int8_t>& axes) {
  std::vector<Span> stack{{0, t.n, 0}};
  while (!stack.empty()) {
    Span s = stack.back();
    stack.pop_back();
    if (s.hi - s.lo <= 1) continue;
    int axis = widest_axis(t, s.lo, s.hi);
    int32_t mid = (s.lo + s.hi) / 2;
    std::nth_element(
        t.order.begin() + s.lo, t.order.begin() + mid, t.order.begin() + s.hi,
        [&](int32_t a, int32_t b) { return t.coord(a, axis) < t.coord(b, axis); });
    axes[mid] = static_cast<int8_t>(axis);
    stack.push_back({s.lo, mid, s.depth + 1});
    stack.push_back({static_cast<int32_t>(mid + 1), s.hi, s.depth + 1});
  }
}

double dist2(const KDTree& t, int32_t idx, const double* q) {
  double d = 0.0;
  for (int a = 0; a < 3; ++a) {
    double dd = t.coord(idx, a) - q[a];
    d += dd * dd;
  }
  return d;
}

struct Tree {
  KDTree kd;
  std::vector<int8_t> axes;
};

}  // namespace

extern "C" {

void* yofc_tree_build(const double* points, int32_t n) {
  auto* tr = new Tree();
  tr->kd.n = n;
  tr->kd.pts.assign(points, points + 3 * static_cast<size_t>(n));
  tr->kd.order.resize(n);
  for (int32_t i = 0; i < n; ++i) tr->kd.order[i] = i;
  tr->axes.assign(n, 0);
  build(tr->kd, tr->axes);
  return tr;
}

void yofc_tree_free(void* handle) { delete static_cast<Tree*>(handle); }

// nearest neighbour of each query point; out: (nq,) indices.
void yofc_tree_nearest(void* handle, const double* queries, int32_t nq,
                       int32_t* out_idx, double* out_d2) {
  const Tree& tr = *static_cast<Tree*>(handle);
  const KDTree& t = tr.kd;
  for (int32_t qi = 0; qi < nq; ++qi) {
    const double* q = queries + 3 * static_cast<size_t>(qi);
    int32_t best = -1;
    double bestd = 1e300;
    std::vector<Span> stack{{0, t.n, 0}};
    while (!stack.empty()) {
      Span s = stack.back();
      stack.pop_back();
      if (s.lo >= s.hi) continue;
      int32_t mid = (s.lo + s.hi) / 2;
      int32_t idx = t.order[mid];
      double d = dist2(t, idx, q);
      if (d < bestd) {
        bestd = d;
        best = idx;
      }
      if (s.hi - s.lo == 1) continue;
      int axis = tr.axes[mid];
      double delta = q[axis] - t.coord(idx, axis);
      Span near{s.lo, mid, 0}, far{static_cast<int32_t>(mid + 1), s.hi, 0};
      if (delta > 0) std::swap(near, far);
      // visit near side first; far side only if the splitting plane is
      // closer than the current best
      if (delta * delta < bestd) stack.push_back(far);
      stack.push_back(near);
    }
    out_idx[qi] = best;
    if (out_d2) out_d2[qi] = bestd;
  }
}

// all points within radius r of each query, capped at `cap` per query
// (nearest-first NOT guaranteed; mirrors the reference's bounded result
// set, meshTree.C:148-238, without its 12-element priority queue cap).
// out_idx: (nq, cap) filled with -1 padding; returns counts in out_n.
void yofc_tree_range(void* handle, const double* queries, int32_t nq,
                     double r, int32_t cap, int32_t* out_idx, int32_t* out_n) {
  const Tree& tr = *static_cast<Tree*>(handle);
  const KDTree& t = tr.kd;
  const double r2 = r * r;
  for (int32_t qi = 0; qi < nq; ++qi) {
    const double* q = queries + 3 * static_cast<size_t>(qi);
    int32_t count = 0;
    int32_t* row = out_idx + static_cast<size_t>(qi) * cap;
    for (int32_t c = 0; c < cap; ++c) row[c] = -1;
    std::vector<Span> stack{{0, t.n, 0}};
    while (!stack.empty() && count < cap) {
      Span s = stack.back();
      stack.pop_back();
      if (s.lo >= s.hi) continue;
      int32_t mid = (s.lo + s.hi) / 2;
      int32_t idx = t.order[mid];
      if (dist2(t, idx, q) <= r2) row[count++] = idx;
      if (s.hi - s.lo == 1) continue;
      int axis = tr.axes[mid];
      double delta = q[axis] - t.coord(idx, axis);
      // descend both sides when the ball straddles the plane
      if (delta <= 0 || delta * delta <= r2)
        stack.push_back({s.lo, mid, 0});
      if (delta >= 0 || delta * delta <= r2)
        stack.push_back({static_cast<int32_t>(mid + 1), s.hi, 0});
    }
    out_n[qi] = count;
  }
}

// Spatial hash binning of points into a uniform grid: the host-side
// "data loader" for large particle sets (sorted order + per-cell offsets,
// CSR style). origin/spacing describe the grid; dims = (nx, ny, nz).
void yofc_bin_points(const double* points, int64_t n, const double* origin,
                     const double* spacing, const int32_t* dims,
                     int32_t* cell_of, int64_t* order, int64_t* cell_start) {
  const int64_t ncell =
      static_cast<int64_t>(dims[0]) * dims[1] * dims[2];
  std::vector<int64_t> count(ncell + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int32_t c[3];
    bool ok = true;
    for (int a = 0; a < 3; ++a) {
      double s = (points[3 * i + a] - origin[a]) / spacing[a];
      int32_t ci = static_cast<int32_t>(std::floor(s));
      if (ci < 0 || ci >= dims[a]) ok = false;
      c[a] = std::min(std::max(ci, 0), dims[a] - 1);
    }
    int64_t flat = ok ? (static_cast<int64_t>(c[0]) * dims[1] + c[1]) * dims[2] + c[2]
                      : ncell;  // out-of-domain scrap bin
    cell_of[i] = static_cast<int32_t>(std::min<int64_t>(flat, ncell));
    count[std::min<int64_t>(flat, ncell)]++;
  }
  // exclusive prefix sum -> cell_start (ncell+2 entries incl. scrap)
  int64_t acc = 0;
  for (int64_t c = 0; c <= ncell; ++c) {
    cell_start[c] = acc;
    acc += count[c];
  }
  cell_start[ncell + 1] = acc;
  std::vector<int64_t> cursor(cell_start, cell_start + ncell + 1);
  for (int64_t i = 0; i < n; ++i) {
    order[cursor[cell_of[i]]++] = i;
  }
}

}  // extern "C"
