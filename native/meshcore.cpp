// meshcore — native graph/mesh kernels for the mswe_gnn_tpu data pipeline.
//
// The reference leans on native code for its mesh machinery (MeshKernel C++,
// Triangle C, torch_scatter CUDA — reference env.yml / SURVEY.md §2.3). On
// the TPU build the *device* side is XLA; this library is the host-side
// native core: the O(E) graph-construction passes that are too slow in
// Python for multi-million-edge meshes.
//
//   dual_graph_from_triangles : triangle soup -> cell-adjacency edge list
//   build_ell_table           : dst-indexed incoming-edge slot table (ELL)
//   bfs_partition             : locality-preserving node partition (halo
//                               minimization for the `graph` mesh axis)
//
// C ABI (ctypes); all buffers caller-allocated. Build: make -C native
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <queue>
#include <algorithm>

extern "C" {

// Triangle soup [n_cells, 3] vertex ids -> directed dual edges (both
// directions per shared wall). Returns the number of directed edges written
// (caller sizes edge buffers at 6 * n_cells, an upper bound).
// wall_a/wall_b receive the shared wall's vertex ids per directed edge.
int64_t dual_graph_from_triangles(
    const int64_t* cells, int64_t n_cells,
    int64_t* src_out, int64_t* dst_out,
    int64_t* wall_a_out, int64_t* wall_b_out,
    uint8_t* boundary_face_out /* [n_cells] */) {
  std::unordered_map<uint64_t, int64_t> owner;
  owner.reserve(static_cast<size_t>(n_cells) * 2);
  std::memset(boundary_face_out, 0, static_cast<size_t>(n_cells));
  int64_t n_edges = 0;
  const int pairs[3][2] = {{0, 1}, {1, 2}, {2, 0}};
  for (int64_t f = 0; f < n_cells; ++f) {
    for (auto& p : pairs) {
      int64_t a = cells[f * 3 + p[0]], b = cells[f * 3 + p[1]];
      if (a > b) std::swap(a, b);
      uint64_t key = (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
      auto it = owner.find(key);
      if (it == owner.end()) {
        owner.emplace(key, f);
      } else {
        int64_t g = it->second;
        owner.erase(it);
        src_out[n_edges] = f;  dst_out[n_edges] = g;
        wall_a_out[n_edges] = a; wall_b_out[n_edges] = b;
        ++n_edges;
        src_out[n_edges] = g;  dst_out[n_edges] = f;
        wall_a_out[n_edges] = a; wall_b_out[n_edges] = b;
        ++n_edges;
      }
    }
  }
  for (auto& kv : owner) boundary_face_out[kv.second] = 1;  // unpaired walls
  return n_edges;
}

// ELL incoming-edge table: for each node, the ids of its real incoming
// edges, padded to d_max slots. Returns the max in-degree actually seen
// (call once with table_out == nullptr to size d_max, then again to fill).
int64_t build_ell_table(
    const int64_t* dst, const float* edge_mask, int64_t n_edges,
    int64_t n_nodes, int64_t d_max,
    int32_t* table_out /* [n_nodes, d_max] or null */,
    float* mask_out /* [n_nodes, d_max] or null */) {
  std::vector<int64_t> fill(static_cast<size_t>(n_nodes), 0);
  int64_t max_deg = 0;
  if (table_out == nullptr) {
    for (int64_t e = 0; e < n_edges; ++e)
      if (edge_mask[e] > 0.f) max_deg = std::max(max_deg, ++fill[dst[e]]);
    return max_deg;
  }
  std::memset(table_out, 0, sizeof(int32_t) * n_nodes * d_max);
  std::memset(mask_out, 0, sizeof(float) * n_nodes * d_max);
  for (int64_t e = 0; e < n_edges; ++e) {
    if (edge_mask[e] <= 0.f) continue;
    int64_t n = dst[e];
    int64_t slot = fill[n]++;
    if (slot >= d_max) return -1;  // caller under-sized d_max
    table_out[n * d_max + slot] = static_cast<int32_t>(e);
    mask_out[n * d_max + slot] = 1.f;
    max_deg = std::max(max_deg, slot + 1);
  }
  return max_deg;
}

// Locality-preserving partition: BFS (Cuthill-McKee-flavoured) node order,
// cut into n_parts equal contiguous blocks -> ownership array. Minimizes
// halo size for the edge-partitioned `graph` mesh axis without a METIS
// dependency.
void bfs_partition(
    const int64_t* src, const int64_t* dst, int64_t n_edges,
    int64_t n_nodes, int64_t n_parts,
    int32_t* owner_out /* [n_nodes] */,
    int32_t* order_out /* [n_nodes] BFS order (new id per old id) */) {
  // CSR of the undirected adjacency
  std::vector<int64_t> deg(static_cast<size_t>(n_nodes), 0);
  for (int64_t e = 0; e < n_edges; ++e) { ++deg[src[e]]; }
  std::vector<int64_t> ptr(static_cast<size_t>(n_nodes) + 1, 0);
  for (int64_t i = 0; i < n_nodes; ++i) ptr[i + 1] = ptr[i] + deg[i];
  std::vector<int64_t> adj(static_cast<size_t>(n_edges));
  std::vector<int64_t> cur(ptr.begin(), ptr.end() - 1);
  for (int64_t e = 0; e < n_edges; ++e) adj[cur[src[e]]++] = dst[e];

  std::vector<int32_t> order(static_cast<size_t>(n_nodes), -1);
  int64_t next_id = 0;
  std::queue<int64_t> q;
  for (int64_t seed = 0; seed < n_nodes; ++seed) {
    if (order[seed] != -1) continue;
    order[seed] = static_cast<int32_t>(next_id++);
    q.push(seed);
    while (!q.empty()) {
      int64_t u = q.front(); q.pop();
      for (int64_t k = ptr[u]; k < ptr[u + 1]; ++k) {
        int64_t v = adj[k];
        if (order[v] == -1) {
          order[v] = static_cast<int32_t>(next_id++);
          q.push(v);
        }
      }
    }
  }
  int64_t block = (n_nodes + n_parts - 1) / n_parts;
  for (int64_t i = 0; i < n_nodes; ++i) {
    order_out[i] = order[i];
    owner_out[i] = static_cast<int32_t>(order[i] / block);
  }
}

}  // extern "C"
