// Native geometry kernel for the offline preprocessor.
//
// The proposal generator's per-proposal node-angle statistics
// (yolat_tpu/geom/proposals.py::_angle_stats; reference semantics
// Datasets/graph_dict3.py:649-688) are a pure Python triple loop and the
// hottest host-side code. This kernel computes them in C++; bound via
// ctypes (yolat_tpu/geom/_native.py), with the numpy path as fallback and
// equivalence oracle (tests/test_native.py).
//
// Build: g++ -O3 -shared -fPIC -o libgeomcore.so geomcore.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// edges_local: [n_edges, 2] int64 local node ids in [0, n_local)
// pos:         [n_local, 2] float64
// out:         [7] doubles: n_90, n_less90, n_more90, mean, max, min, std
// returns number of angle pairs (0 => proposal must be skipped)
long angle_stats(const int64_t* edges, long n_edges, const double* pos,
                 long n_local, double th, double* out) {
  std::vector<std::vector<int64_t>> nbr(n_local);
  for (long e = 0; e < n_edges; ++e) {
    int64_t a = edges[2 * e], b = edges[2 * e + 1];
    if (a < 0 || b < 0 || a >= n_local || b >= n_local) continue;
    nbr[a].push_back(b);
    nbr[b].push_back(a);
  }

  long n90 = 0, nless = 0, nmore = 0, count = 0;
  double sum = 0.0, sumsq = 0.0;
  double mx = -1e300, mn = 1e300;

  for (long anchor = 0; anchor < n_local; ++anchor) {
    auto& ns = nbr[anchor];
    if (ns.size() < 2) continue;
    std::sort(ns.begin(), ns.end());
    ns.erase(std::unique(ns.begin(), ns.end()), ns.end());
    const double ax = pos[2 * anchor], ay = pos[2 * anchor + 1];
    for (size_t i = 0; i < ns.size(); ++i) {
      const double v0x = pos[2 * ns[i]] - ax;
      const double v0y = pos[2 * ns[i] + 1] - ay;
      for (size_t j = i + 1; j < ns.size(); ++j) {
        const double v1x = pos[2 * ns[j]] - ax;
        const double v1y = pos[2 * ns[j] + 1] - ay;
        const double dot = v0x * v1x + v0y * v1y;
        if (dot <= -th) ++nmore;
        else if (dot >= th) ++nless;
        else if (std::fabs(dot) < th) ++n90;
        sum += dot;
        sumsq += dot * dot;
        if (dot > mx) mx = dot;
        if (dot < mn) mn = dot;
        ++count;
      }
    }
  }

  if (count == 0) return 0;
  const double mean = sum / count;
  double var = sumsq / count - mean * mean;
  if (var < 0) var = 0;
  out[0] = (double)n90;
  out[1] = (double)nless;
  out[2] = (double)nmore;
  out[3] = mean;
  out[4] = mx;
  out[5] = mn;
  out[6] = std::sqrt(var);
  return count;
}

// Batched rectangle point-membership for the grid sweep: for each rect r
// (bounds in value-index space) and each point p (xi/yi value indices),
// set hits[r * n_points + p]. Replaces the per-rect numpy mask churn.
void rect_membership(const int32_t* xi, const int32_t* yi, long n_points,
                     const int32_t* rects,  // [n_rects, 4]: x0, x1, y0, y1
                     long n_rects, uint8_t* hits) {
  for (long r = 0; r < n_rects; ++r) {
    const int32_t x0 = rects[4 * r], x1 = rects[4 * r + 1];
    const int32_t y0 = rects[4 * r + 2], y1 = rects[4 * r + 3];
    uint8_t* row = hits + r * n_points;
    for (long p = 0; p < n_points; ++p) {
      row[p] = (xi[p] >= x0) & (xi[p] <= x1) & (yi[p] >= y0) & (yi[p] <= y1);
    }
  }
}

}  // extern "C"
