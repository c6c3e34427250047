// delaunay — constrained Delaunay triangulation + mesh-quality passes.
//
// The native mesh engine replacing the reference's MeshKernel (C++) and
// Triangle (C) dependencies (reference database/graph_creation.py:473-528
// `create_mesh_dhydro` / :456-471 `create_mesh_triangle`; SURVEY.md §2.3):
//
//   cdt_triangulate   : Bowyer-Watson incremental Delaunay + Sloan-style
//                       constrained-edge recovery (the polygon boundary and
//                       dike notches become hard edges, so no triangle ever
//                       straddles the domain boundary) + a global
//                       constrained Delaunay flip pass.
//   laplacian_smooth  : fixed-boundary Laplacian smoothing — the
//                       orthogonalization pass (MeshKernel's
//                       `mesh2d_compute_orthogonalization` analog); callers
//                       re-triangulate afterwards to restore Delaunay-ness.
//   refine_midpoint   : red (4-way) midpoint refinement for building the
//                       multiscale hierarchy top-down.
//
// Offline dataset-prep code: plain doubles with relative-epsilon filtered
// predicates (inputs are jittered lattices + resampled polygon boundaries,
// not adversarial degeneracies). C ABI (ctypes); buffers caller-allocated.
#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <array>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr double kEps = 1e-12;

struct CDT {
  // Vertices: user points (normalized) then 3 super-triangle vertices.
  std::vector<double> x, y;
  int64_t n_user = 0;
  // Triangles: vertices CCW; tn[t][i] = neighbor across the edge opposite
  // vertex i (i.e. sharing edge (tv[t][(i+1)%3], tv[t][(i+2)%3])), -1 = none.
  std::vector<std::array<int64_t, 3>> tv, tn;
  std::vector<uint8_t> dead;
  std::vector<int64_t> v2t;  // one alive incident triangle per vertex
  int64_t last = 0;          // walk start for point location
  std::unordered_set<uint64_t> constrained;

  static uint64_t ekey(int64_t a, int64_t b) {
    if (a > b) std::swap(a, b);
    return (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
  }

  int orient(int64_t a, int64_t b, int64_t c) const {
    double l = (x[b] - x[a]) * (y[c] - y[a]);
    double r = (y[b] - y[a]) * (x[c] - x[a]);
    double det = l - r, err = kEps * (std::fabs(l) + std::fabs(r));
    if (det > err) return 1;
    if (det < -err) return -1;
    return 0;
  }

  bool in_circle(int64_t a, int64_t b, int64_t c, int64_t d) const {
    // > 0 iff d strictly inside the circumcircle of CCW (a, b, c)
    double adx = x[a] - x[d], ady = y[a] - y[d];
    double bdx = x[b] - x[d], bdy = y[b] - y[d];
    double cdx = x[c] - x[d], cdy = y[c] - y[d];
    double ad = adx * adx + ady * ady;
    double bd = bdx * bdx + bdy * bdy;
    double cd = cdx * cdx + cdy * cdy;
    double det = adx * (bdy * cd - bd * cdy) - ady * (bdx * cd - bd * cdx)
               + ad * (bdx * cdy - bdy * cdx);
    double mag = std::fabs(adx) * (std::fabs(bdy) * cd + bd * std::fabs(cdy))
               + std::fabs(ady) * (std::fabs(bdx) * cd + bd * std::fabs(cdx))
               + ad * (std::fabs(bdx) * std::fabs(cdy)
                       + std::fabs(bdy) * std::fabs(cdx));
    return det > kEps * mag;
  }

  int64_t vertex_index(int64_t t, int64_t v) const {
    for (int i = 0; i < 3; ++i)
      if (tv[t][i] == v) return i;
    return -1;
  }

  int64_t neighbor_index(int64_t t, int64_t nb) const {
    for (int i = 0; i < 3; ++i)
      if (tn[t][i] == nb) return i;
    return -1;
  }

  void init(const double* pts, int64_t n) {
    n_user = n;
    double lo_x = 1e300, lo_y = 1e300, hi_x = -1e300, hi_y = -1e300;
    for (int64_t i = 0; i < n; ++i) {
      lo_x = std::min(lo_x, pts[2 * i]);     hi_x = std::max(hi_x, pts[2 * i]);
      lo_y = std::min(lo_y, pts[2 * i + 1]); hi_y = std::max(hi_y, pts[2 * i + 1]);
    }
    double cx = (lo_x + hi_x) / 2, cy = (lo_y + hi_y) / 2;
    double span = std::max({hi_x - lo_x, hi_y - lo_y, 1e-30});
    x.resize(n + 3);
    y.resize(n + 3);
    for (int64_t i = 0; i < n; ++i) {  // normalize into [-0.5, 0.5]
      x[i] = (pts[2 * i] - cx) / span;
      y[i] = (pts[2 * i + 1] - cy) / span;
    }
    const double R = 512.0;  // far super-triangle (keeps predicates in range)
    x[n] = 0;          y[n] = 2 * R;
    x[n + 1] = -2 * R; y[n + 1] = -R;
    x[n + 2] = 2 * R;  y[n + 2] = -R;
    tv.push_back({n, n + 1, n + 2});
    tn.push_back({-1, -1, -1});
    dead.push_back(0);
    v2t.assign(n + 3, -1);
    v2t[n] = v2t[n + 1] = v2t[n + 2] = 0;
  }

  int64_t locate(int64_t p) const {
    int64_t t = last;
    if (t < 0 || t >= (int64_t)tv.size() || dead[t]) {
      t = -1;
      for (int64_t i = (int64_t)tv.size() - 1; i >= 0; --i)
        if (!dead[i]) { t = i; break; }
    }
    int64_t limit = 4 * (int64_t)tv.size() + 64;
    int64_t prev = -1;
    while (limit-- > 0) {
      int64_t next = -1;
      for (int i = 0; i < 3; ++i) {
        int64_t a = tv[t][(i + 1) % 3], b = tv[t][(i + 2) % 3];
        if (orient(a, b, p) < 0 && tn[t][i] != -1 && tn[t][i] != prev) {
          next = tn[t][i];
          break;
        }
      }
      if (next == -1) return t;
      prev = t;
      t = next;
    }
    return t;  // walk cycled on a near-degenerate config; cavity BFS recovers
  }

  // Bowyer-Watson insertion. Returns false on an unrecoverable cavity.
  bool insert(int64_t p) {
    int64_t t0 = locate(p);
    std::vector<int64_t> cav = {t0};
    std::unordered_set<int64_t> in_cav = {t0};
    for (size_t h = 0; h < cav.size(); ++h) {
      int64_t t = cav[h];
      for (int i = 0; i < 3; ++i) {
        int64_t nb = tn[t][i];
        if (nb == -1 || dead[nb] || in_cav.count(nb)) continue;
        if (in_circle(tv[nb][0], tv[nb][1], tv[nb][2], p)) {
          cav.push_back(nb);
          in_cav.insert(nb);
        }
      }
    }
    // Visibility repair: every cavity-boundary edge must see p strictly on
    // its inner side (tolerance-filtered predicates can over-grow the cavity)
    for (bool changed = true; changed;) {
      changed = false;
      for (size_t h = 0; h < cav.size(); ++h) {
        int64_t t = cav[h];
        if (!in_cav.count(t)) continue;
        for (int i = 0; i < 3; ++i) {
          int64_t nb = tn[t][i];
          if (nb != -1 && in_cav.count(nb)) continue;  // interior edge
          int64_t a = tv[t][(i + 1) % 3], b = tv[t][(i + 2) % 3];
          if (orient(a, b, p) <= 0 && t != t0) {
            in_cav.erase(t);
            changed = true;
            break;
          }
        }
      }
    }
    // Collect boundary edges (a, b) with outer neighbor o, CCW around cavity
    struct BEdge { int64_t a, b, o; };
    std::vector<BEdge> bd;
    for (int64_t t : cav) {
      if (!in_cav.count(t)) continue;
      for (int i = 0; i < 3; ++i) {
        int64_t nb = tn[t][i];
        if (nb != -1 && in_cav.count(nb)) continue;
        bd.push_back({tv[t][(i + 1) % 3], tv[t][(i + 2) % 3], nb});
      }
    }
    if (bd.empty()) return false;
    for (auto& e : bd)
      if (orient(e.a, e.b, p) <= 0) return false;  // p not star-visible
    for (int64_t t : cav)
      if (in_cav.count(t)) dead[t] = 1;
    // Fan p->boundary; link siblings via edge-start/end vertex maps
    std::unordered_map<int64_t, int64_t> start_tri, end_tri;
    std::vector<int64_t> created;
    for (auto& e : bd) {
      int64_t t = (int64_t)tv.size();
      tv.push_back({p, e.a, e.b});
      tn.push_back({e.o, -1, -1});
      dead.push_back(0);
      created.push_back(t);
      start_tri[e.a] = t;
      end_tri[e.b] = t;
      if (e.o != -1) {
        int64_t j = -1;
        for (int i = 0; i < 3; ++i) {
          int64_t a2 = tv[e.o][(i + 1) % 3], b2 = tv[e.o][(i + 2) % 3];
          if ((a2 == e.b && b2 == e.a) || (a2 == e.a && b2 == e.b)) j = i;
        }
        if (j == -1) return false;
        tn[e.o][j] = t;
      }
      v2t[e.a] = t;
      v2t[e.b] = t;
      v2t[p] = t;
    }
    for (int64_t t : created) {
      int64_t a = tv[t][1], b = tv[t][2];
      // neighbor opposite a shares (b, p): the fan triangle starting at b;
      // neighbor opposite b shares (p, a): the fan triangle ending at a
      auto it1 = start_tri.find(b);
      auto it2 = end_tri.find(a);
      if (it1 == start_tri.end() || it2 == end_tri.end()) return false;
      tn[t][1] = it1->second;
      tn[t][2] = it2->second;
    }
    last = created.back();
    return true;
  }

  // All alive triangles incident to vertex v (BFS over shared-v neighbors).
  std::vector<int64_t> ring(int64_t v) const {
    std::vector<int64_t> out;
    if (v2t[v] < 0 || dead[v2t[v]]) return out;
    std::unordered_set<int64_t> seen = {v2t[v]};
    out.push_back(v2t[v]);
    for (size_t h = 0; h < out.size(); ++h) {
      int64_t t = out[h];
      for (int i = 0; i < 3; ++i) {
        int64_t nb = tn[t][i];
        if (nb == -1 || dead[nb] || seen.count(nb)) continue;
        if (vertex_index(nb, v) != -1) {
          seen.insert(nb);
          out.push_back(nb);
        }
      }
    }
    return out;
  }

  bool edge_exists(int64_t a, int64_t b) const {
    for (int64_t t : ring(a))
      if (vertex_index(t, b) != -1) return true;
    return false;
  }

  // Flip the edge shared by t1 (where c = tv[t1][(i1+1)%3], d = tv[t1][(i1+2)%3])
  // and tn[t1][i1]. Returns the new diagonal (x, y) triangles (ta, tb).
  bool flip(int64_t t1, int i1, int64_t* out_ta = nullptr,
            int64_t* out_tb = nullptr) {
    int64_t t2 = tn[t1][i1];
    if (t2 == -1 || dead[t2]) return false;
    int64_t xv = tv[t1][i1];
    int64_t c = tv[t1][(i1 + 1) % 3], d = tv[t1][(i1 + 2) % 3];
    int64_t i2 = neighbor_index(t2, t1);
    if (i2 == -1) return false;
    int64_t yv = tv[t2][i2];
    // strictly convex quad x-c-y-d required
    if (orient(xv, yv, c) * orient(xv, yv, d) >= 0) return false;
    if (orient(xv, c, yv) <= 0 || orient(xv, yv, d) <= 0) return false;
    int64_t A = tn[t1][(i1 + 1) % 3];  // across (d, x)
    int64_t B = tn[t1][(i1 + 2) % 3];  // across (x, c)
    int64_t C = tn[t2][(i2 + 1) % 3];  // across (c, y)
    int64_t D = tn[t2][(i2 + 2) % 3];  // across (y, d)
    // reuse slots: t1 := (x, c, y), t2 := (x, y, d)
    tv[t1] = {xv, c, yv};
    tn[t1] = {C, t2, B};
    tv[t2] = {xv, yv, d};
    tn[t2] = {D, A, t1};
    if (A != -1) { int64_t j = neighbor_index(A, t1); if (j != -1) tn[A][j] = t2; }
    if (C != -1) { int64_t j = neighbor_index(C, t2); if (j != -1) tn[C][j] = t1; }
    v2t[xv] = t1; v2t[c] = t1; v2t[yv] = t1; v2t[d] = t2;
    if (out_ta) *out_ta = t1;
    if (out_tb) *out_tb = t2;
    return true;
  }

  // proper interior crossing of segments (a,b) and (c,d)
  bool crosses(int64_t a, int64_t b, int64_t c, int64_t d) const {
    return orient(a, b, c) * orient(a, b, d) < 0 &&
           orient(c, d, a) * orient(c, d, b) < 0;
  }

  // Find an alive triangle having directed edge (c, d); returns (t, i) with
  // i the index of the vertex opposite that edge, or (-1, -1).
  std::pair<int64_t, int> find_edge(int64_t c, int64_t d) const {
    for (int64_t t : ring(c)) {
      for (int i = 0; i < 3; ++i) {
        int64_t u = tv[t][(i + 1) % 3], v = tv[t][(i + 2) % 3];
        if ((u == c && v == d) || (u == d && v == c)) return {t, i};
      }
    }
    return {-1, -1};
  }

  // Sloan-style recovery of segment (a, b): collect the edges crossing it,
  // then flip them with a retry queue — a non-convex quad is deferred (its
  // edge becomes flippable after neighboring flips), not a failure.
  bool recover(int64_t a, int64_t b, int depth = 0) {
    if (depth > 32) return false;
    if (a == b || edge_exists(a, b)) return true;

    // walk from a along the segment, collecting crossing edges; a vertex
    // exactly on the segment splits the recovery at that vertex
    std::vector<std::pair<int64_t, int64_t>> queue;
    {
      int64_t t = -1;
      int i = -1;
      for (int64_t rt : ring(a)) {
        int64_t ia = vertex_index(rt, a);
        int64_t c = tv[rt][(ia + 1) % 3], d = tv[rt][(ia + 2) % 3];
        for (int64_t v : {c, d}) {
          if (v == b || v == a || v >= n_user) continue;
          if (orient(a, b, v) == 0 &&
              (x[v] - x[a]) * (x[b] - x[a]) + (y[v] - y[a]) * (y[b] - y[a]) > 0 &&
              (x[v] - x[b]) * (x[a] - x[b]) + (y[v] - y[b]) * (y[a] - y[b]) > 0)
            return recover(a, v, depth + 1) && recover(v, b, depth + 1);
        }
        if (crosses(a, b, c, d)) { t = rt; i = (int)ia; break; }
      }
      if (t == -1) return edge_exists(a, b);
      int64_t guard = 4 * (int64_t)tv.size() + 64;
      while (guard-- > 0) {
        int64_t c = tv[t][(i + 1) % 3], d = tv[t][(i + 2) % 3];
        queue.emplace_back(c, d);
        int64_t t2 = tn[t][i];
        if (t2 == -1 || dead[t2]) return false;
        int64_t i2 = neighbor_index(t2, t);
        if (i2 == -1) return false;
        int64_t yv = tv[t2][i2];
        if (yv == b) break;  // reached the far endpoint
        if (yv < n_user && orient(a, b, yv) == 0)
          return recover(a, yv, depth + 1) && recover(yv, b, depth + 1);
        // the segment exits t2 through one of the two edges adjacent to yv
        int64_t e1 = (i2 + 1) % 3, e2 = (i2 + 2) % 3;
        int64_t c1 = tv[t2][(e1 + 1) % 3], d1 = tv[t2][(e1 + 2) % 3];
        if (crosses(a, b, c1, d1)) { t = t2; i = (int)e1; }
        else {
          int64_t c2 = tv[t2][(e2 + 1) % 3], d2 = tv[t2][(e2 + 2) % 3];
          if (!crosses(a, b, c2, d2)) return false;
          t = t2; i = (int)e2;
        }
      }
      if (guard <= 0) return false;
    }

    // flip queue with deferral; bounded by total attempts
    int64_t attempts = 16 * (int64_t)(queue.size() + 4) + 256;
    size_t h = 0;
    while (h < queue.size()) {
      if (--attempts < 0) return false;
      auto [c, d] = queue[h++];
      auto [t, i] = find_edge(c, d);
      if (t == -1) continue;                      // edge gone (flipped away)
      if (!crosses(a, b, c, d)) continue;         // no longer in the way
      int64_t t2 = tn[t][i];
      if (t2 == -1 || dead[t2]) return false;
      if (flip(t, i)) {
        // after flip(t, i): t = (x, c, y) — the new diagonal is (x, y) =
        // (tv[t][0], tv[t][2]); it may still cross the segment
        int64_t nx_ = tv[t][0], ny_ = tv[t][2];
        if (crosses(a, b, nx_, ny_)) queue.emplace_back(nx_, ny_);
      } else {
        queue.emplace_back(c, d);  // defer: flippable after neighbors flip
      }
    }
    return edge_exists(a, b);
  }

  // Global constrained-Delaunay flip pass (also cleans up recovery edges).
  void delaunay_pass() {
    for (int pass = 0; pass < 64; ++pass) {
      bool any = false;
      for (int64_t t = 0; t < (int64_t)tv.size(); ++t) {
        if (dead[t]) continue;
        for (int i = 0; i < 3; ++i) {
          int64_t nb = tn[t][i];
          if (nb == -1 || dead[nb] || nb < t) continue;  // each pair once
          int64_t c = tv[t][(i + 1) % 3], d = tv[t][(i + 2) % 3];
          if (constrained.count(ekey(c, d))) continue;
          int64_t i2 = neighbor_index(nb, t);
          if (i2 == -1) continue;
          if (in_circle(tv[t][0], tv[t][1], tv[t][2], tv[nb][i2]))
            any |= flip(t, i);
        }
      }
      if (!any) return;
    }
  }
};

}  // namespace

extern "C" {

// Constrained Delaunay triangulation of pts [n, 2] with hard segments
// segs [n_segs, 2] (vertex-id pairs). Writes CCW triangles to tris_out
// [cap, 3]. Returns n_tris, or -1 (cap too small), -2 (constraint recovery
// failed), -3 (degenerate insertion) — callers fall back to Qhull on < 0.
int64_t cdt_triangulate(const double* pts, int64_t n,
                        const int64_t* segs, int64_t n_segs,
                        int64_t* tris_out, int64_t cap) {
  if (n < 3) return -3;
  CDT cdt;
  cdt.init(pts, n);
  for (int64_t p = 0; p < n; ++p)
    if (!cdt.insert(p)) return -3;
  for (int64_t s = 0; s < n_segs; ++s)
    cdt.constrained.insert(CDT::ekey(segs[2 * s], segs[2 * s + 1]));
  for (int64_t s = 0; s < n_segs; ++s)
    if (!cdt.recover(segs[2 * s], segs[2 * s + 1])) return -2;
  cdt.delaunay_pass();
  // re-assert constraints (the pass never flips them, but verify)
  for (int64_t s = 0; s < n_segs; ++s)
    if (!cdt.edge_exists(segs[2 * s], segs[2 * s + 1])) return -2;
  int64_t m = 0;
  for (int64_t t = 0; t < (int64_t)cdt.tv.size(); ++t) {
    if (cdt.dead[t]) continue;
    auto& v = cdt.tv[t];
    if (v[0] >= n || v[1] >= n || v[2] >= n) continue;  // super-triangle fan
    if (m >= cap) return -1;
    tris_out[3 * m] = v[0];
    tris_out[3 * m + 1] = v[1];
    tris_out[3 * m + 2] = v[2];
    ++m;
  }
  return m;
}

// Fixed-boundary Laplacian smoothing, in place: each free vertex moves to
// the mean of its (deduplicated) mesh neighbors, n_iters times. The
// orthogonalization step of the mesh factory; re-triangulate afterwards.
void laplacian_smooth(double* pts, int64_t n, const int64_t* tris,
                      int64_t n_tris, const uint8_t* fixed_mask,
                      int64_t n_iters) {
  std::vector<std::vector<int64_t>> adj(n);
  std::unordered_set<uint64_t> seen;
  seen.reserve(static_cast<size_t>(n_tris) * 3);
  const int pairs[3][2] = {{0, 1}, {1, 2}, {2, 0}};
  for (int64_t t = 0; t < n_tris; ++t) {
    for (auto& p : pairs) {
      int64_t a = tris[3 * t + p[0]], b = tris[3 * t + p[1]];
      if (seen.insert(CDT::ekey(a, b)).second) {
        adj[a].push_back(b);
        adj[b].push_back(a);
      }
    }
  }
  std::vector<double> nx(n), ny(n);
  for (int64_t it = 0; it < n_iters; ++it) {
    for (int64_t v = 0; v < n; ++v) {
      if (fixed_mask[v] || adj[v].empty()) {
        nx[v] = pts[2 * v];
        ny[v] = pts[2 * v + 1];
        continue;
      }
      double sx = 0, sy = 0;
      for (int64_t u : adj[v]) {
        sx += pts[2 * u];
        sy += pts[2 * u + 1];
      }
      nx[v] = sx / adj[v].size();
      ny[v] = sy / adj[v].size();
    }
    for (int64_t v = 0; v < n; ++v) {
      pts[2 * v] = nx[v];
      pts[2 * v + 1] = ny[v];
    }
  }
}

// Red (4-way) midpoint refinement: each triangle splits into 4 via
// deduplicated edge midpoints. pts_out capacity n + 3*n_tris rows; tris_out
// capacity 4*n_tris rows. Returns the triangle count (4*n_tris) and writes
// the new vertex count to n_pts_out.
int64_t refine_midpoint(const double* pts, int64_t n, const int64_t* tris,
                        int64_t n_tris, double* pts_out, int64_t* tris_out,
                        int64_t* n_pts_out) {
  std::memcpy(pts_out, pts, sizeof(double) * 2 * n);
  std::unordered_map<uint64_t, int64_t> mid;
  mid.reserve(static_cast<size_t>(n_tris) * 2);
  int64_t np = n;
  auto midpoint = [&](int64_t a, int64_t b) {
    uint64_t k = CDT::ekey(a, b);
    auto it = mid.find(k);
    if (it != mid.end()) return it->second;
    pts_out[2 * np] = (pts[2 * a] + pts[2 * b]) / 2;
    pts_out[2 * np + 1] = (pts[2 * a + 1] + pts[2 * b + 1]) / 2;
    mid.emplace(k, np);
    return np++;
  };
  int64_t m = 0;
  for (int64_t t = 0; t < n_tris; ++t) {
    int64_t a = tris[3 * t], b = tris[3 * t + 1], c = tris[3 * t + 2];
    int64_t ab = midpoint(a, b), bc = midpoint(b, c), ca = midpoint(c, a);
    const int64_t quads[4][3] = {
        {a, ab, ca}, {ab, b, bc}, {ca, bc, c}, {ab, bc, ca}};
    for (auto& q : quads) {
      tris_out[3 * m] = q[0];
      tris_out[3 * m + 1] = q[1];
      tris_out[3 * m + 2] = q[2];
      ++m;
    }
  }
  *n_pts_out = np;
  return m;
}

}  // extern "C"
