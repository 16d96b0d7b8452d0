// Connected components of a sparse undirected graph (union-find with path
// compression + union by rank).
//
// TPU-native framework counterpart of the reference's only native component
// (ca_source_extraction/utilities/graph_conn_comp_mex.cpp:38-116, an
// iterative DFS over CSC arrays, called by the merge family). The graphs
// here are tiny (K x K neuron-candidate adjacency), so this runs host-side;
// exposed via a C ABI for ctypes.
//
// Build: g++ -O2 -shared -fPIC graph_cc.cpp -o libgraph_cc.so

#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  std::vector<int32_t> rank_;

  explicit UnionFind(int32_t n) : parent(n), rank_(n, 0) {
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }

  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }

  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent[b] = a;
    if (rank_[a] == rank_[b]) ++rank_[a];
  }
};

}  // namespace

extern "C" {

// Edge-list connected components.
//   n:        number of nodes
//   n_edges:  number of edges
//   src,dst:  edge endpoints (int32, length n_edges)
//   labels:   out, length n (0-based component ids, compacted)
// Returns the number of components.
int32_t graph_connected_components(int32_t n, int64_t n_edges,
                                   const int32_t* src, const int32_t* dst,
                                   int32_t* labels) {
  UnionFind uf(n);
  for (int64_t e = 0; e < n_edges; ++e) {
    int32_t a = src[e], b = dst[e];
    if (a < 0 || b < 0 || a >= n || b >= n) continue;
    uf.unite(a, b);
  }
  std::vector<int32_t> remap(n, -1);
  int32_t next_label = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t root = uf.find(i);
    if (remap[root] < 0) remap[root] = next_label++;
    labels[i] = remap[root];
  }
  return next_label;
}

// Dense symmetric adjacency matrix (row-major, uint8), diagonal ignored.
int32_t graph_connected_components_dense(int32_t n, const uint8_t* adj,
                                         int32_t* labels) {
  UnionFind uf(n);
  for (int32_t i = 0; i < n; ++i) {
    const uint8_t* row = adj + static_cast<int64_t>(i) * n;
    for (int32_t j = i + 1; j < n; ++j) {
      if (row[j]) uf.unite(i, j);
    }
  }
  std::vector<int32_t> remap(n, -1);
  int32_t next_label = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t root = uf.find(i);
    if (remap[root] < 0) remap[root] = next_label++;
    labels[i] = remap[root];
  }
  return next_label;
}

}  // extern "C"
