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
#include <unordered_set>
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

// Full rectangle enumeration + point-set dedup for one connected component
// (the inner sweep of proposals._enumerate_subclusters). Points are given
// by their x/y value indices; rects by index bounds [x0, x1] x [y0, y1]
// (inclusive). Emits the distinct non-empty point-id sets in first-seen
// order, flattened into out_ids with out_offsets (CSR-style).
//
// Capacity contract: out_ids must hold max_total ids; out_offsets holds
// max_sets + 1 entries. Returns the number of distinct sets, or -1 if
// capacity was exhausted (caller falls back to the Python path).
long enumerate_rect_sets(const int32_t* xi, const int32_t* yi, long n_points,
                         const int32_t* rects, long n_rects,
                         int64_t* out_ids, long max_total,
                         int64_t* out_offsets, long max_sets) {
  std::unordered_set<uint64_t> seen;
  seen.reserve(n_rects * 2);
  std::vector<int64_t> ids;
  ids.reserve(n_points);

  long n_sets = 0;
  long total = 0;
  out_offsets[0] = 0;
  // collision handling: on hash match we accept the set as duplicate. To
  // make collisions negligible the hash is 64-bit FNV-1a over the id list.
  for (long r = 0; r < n_rects; ++r) {
    const int32_t x0 = rects[4 * r], x1 = rects[4 * r + 1];
    const int32_t y0 = rects[4 * r + 2], y1 = rects[4 * r + 3];
    ids.clear();
    uint64_t h = 1469598103934665603ull;
    for (long p = 0; p < n_points; ++p) {
      if (xi[p] >= x0 && xi[p] <= x1 && yi[p] >= y0 && yi[p] <= y1) {
        ids.push_back(p);
        h ^= (uint64_t)p + 0x9e3779b97f4a7c15ull;
        h *= 1099511628211ull;
      }
    }
    if (ids.empty()) continue;
    if (!seen.insert(h).second) continue;
    if (n_sets >= max_sets || total + (long)ids.size() > max_total) return -1;
    for (int64_t v : ids) out_ids[total++] = v;
    ++n_sets;
    out_offsets[n_sets] = total;
  }
  return n_sets;
}

// Full proposal-core sweep: rectangle enumeration + point-set dedup +
// induced-edge computation in one pass. Membership of a point in a window
// is a pure index-range check (the windows are value-index rectangles), so
// induced edges need only 4 comparisons per CC edge, and only for DISTINCT
// windows (the dedup guard runs first, on the O(n_points) membership scan).
//
// Inputs:
//   xi/yi [n_points]   point value-indices within the CC
//   rects [n_rects,4]  x0,x1,y0,y1 inclusive index bounds (reference order)
//   eu/ev [n_edges]    CC edge endpoints as local point indices
// Outputs (CSR): point ids / edge ids per distinct window.
// Returns n_sets, or -1 on capacity exhaustion (caller falls back).
long build_rect_proposals(const int32_t* xi, const int32_t* yi, long n_points,
                          const int32_t* rects, long n_rects,
                          const int64_t* eu, const int64_t* ev, long n_edges,
                          const int64_t* su, const int64_t* sv, long n_supers,
                          int64_t* out_ids, long max_total_ids,
                          int64_t* out_id_off,
                          int64_t* out_eids, long max_total_eids,
                          int64_t* out_eid_off,
                          int64_t* out_sids, long max_total_sids,
                          int64_t* out_sid_off, long max_sets) {
  std::unordered_set<uint64_t> seen;
  seen.reserve(n_rects * 2);
  std::vector<int64_t> ids;
  ids.reserve(n_points);

  long n_sets = 0, total_ids = 0, total_eids = 0, total_sids = 0;
  out_id_off[0] = 0;
  out_eid_off[0] = 0;
  out_sid_off[0] = 0;

  for (long r = 0; r < n_rects; ++r) {
    const int32_t x0 = rects[4 * r], x1 = rects[4 * r + 1];
    const int32_t y0 = rects[4 * r + 2], y1 = rects[4 * r + 3];
    ids.clear();
    uint64_t h = 1469598103934665603ull;
    for (long p = 0; p < n_points; ++p) {
      if (xi[p] >= x0 && xi[p] <= x1 && yi[p] >= y0 && yi[p] <= y1) {
        ids.push_back(p);
        h ^= (uint64_t)p + 0x9e3779b97f4a7c15ull;
        h *= 1099511628211ull;
      }
    }
    if (ids.empty()) continue;
    if (!seen.insert(h).second) continue;
    if (n_sets >= max_sets || total_ids + (long)ids.size() > max_total_ids)
      return -1;

    for (int64_t v : ids) out_ids[total_ids++] = v;

    auto inside = [&](int64_t p) {
      return xi[p] >= x0 && xi[p] <= x1 && yi[p] >= y0 && yi[p] <= y1;
    };
    for (long e = 0; e < n_edges; ++e) {
      if (inside(eu[e]) && inside(ev[e])) {
        if (total_eids >= max_total_eids) return -1;
        out_eids[total_eids++] = e;
      }
    }
    for (long e = 0; e < n_supers; ++e) {
      if (inside(su[e]) && inside(sv[e])) {
        if (total_sids >= max_total_sids) return -1;
        out_sids[total_sids++] = e;
      }
    }

    ++n_sets;
    out_id_off[n_sets] = total_ids;
    out_eid_off[n_sets] = total_eids;
    out_sid_off[n_sets] = total_sids;
  }
  return n_sets;
}

}  // extern "C"
