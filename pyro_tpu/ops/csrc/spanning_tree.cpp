// Spanning-tree sampler hot loops (ref pyro/distributions/spanning_tree.cpp,
// 226 LoC of torch C++). Re-implemented from scratch as a plain-C-ABI
// shared library (no pybind11 in this image): the algorithms are
// sequential graph updates, so they run host-side and feed device arrays.
//
// Edge indexing convention (matches the reference's complete-graph layout):
// undirected edge (v1, v2) with v1 < v2 has index  k = v1 + v2*(v2-1)/2,
// enumerating edges (0,1), (0,2), (1,2), (0,3), ...

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

namespace {

inline int64_t edge_index(int64_t v1, int64_t v2) {
  if (v1 > v2) std::swap(v1, v2);
  return v1 + v2 * (v2 - 1) / 2;
}

struct UnionFind {
  std::vector<int64_t> parent;
  explicit UnionFind(int64_t n) : parent(n) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }
  int64_t find(int64_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  bool unite(int64_t a, int64_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return false;
    parent[a] = b;
    return true;
  }
};

// Sample an index from unnormalized log-weights (max-shifted).
int64_t sample_categorical(const std::vector<double>& logits,
                           std::mt19937_64& rng) {
  double mx = -INFINITY;
  for (double l : logits) mx = std::max(mx, l);
  double total = 0.0;
  std::vector<double> probs(logits.size());
  for (size_t i = 0; i < logits.size(); ++i) {
    probs[i] = std::exp(logits[i] - mx);
    total += probs[i];
  }
  std::uniform_real_distribution<double> unif(0.0, total);
  double u = unif(rng);
  for (size_t i = 0; i < probs.size(); ++i) {
    u -= probs[i];
    if (u <= 0) return static_cast<int64_t>(i);
  }
  return static_cast<int64_t>(probs.size()) - 1;
}

}  // namespace

extern "C" {

// Fill edges[2*K] with the (v1, v2) pairs of the complete graph on V
// vertices in canonical order. Returns K = V*(V-1)/2.
int64_t make_complete_graph(int64_t V, int64_t* edges) {
  int64_t k = 0;
  for (int64_t v2 = 0; v2 < V; ++v2) {
    for (int64_t v1 = 0; v1 < v2; ++v1) {
      edges[2 * k] = v1;
      edges[2 * k + 1] = v2;
      ++k;
    }
  }
  return k;
}

// Greedy approximate sampler (ref sample_tree_approx): grow the tree one
// vertex at a time, choosing the connecting edge ~ exp(logit).
// edge_logits has length K = V*(V-1)/2; out_edges gets 2*(V-1) entries.
void sample_tree_approx(int64_t V, const double* edge_logits,
                        uint64_t seed, int64_t* out_edges) {
  std::mt19937_64 rng(seed);
  std::vector<int64_t> in_tree;
  std::vector<int64_t> out_of_tree;
  std::uniform_int_distribution<int64_t> pick(0, V - 1);
  int64_t root = pick(rng);
  in_tree.push_back(root);
  for (int64_t v = 0; v < V; ++v)
    if (v != root) out_of_tree.push_back(v);

  for (int64_t e = 0; e < V - 1; ++e) {
    // candidate edges: every (u in tree, w out of tree)
    std::vector<double> logits;
    std::vector<std::pair<int64_t, int64_t>> cands;
    logits.reserve(in_tree.size() * out_of_tree.size());
    for (int64_t u : in_tree)
      for (int64_t w : out_of_tree) {
        logits.push_back(edge_logits[edge_index(u, w)]);
        cands.emplace_back(u, w);
      }
    int64_t c = sample_categorical(logits, rng);
    int64_t u = cands[c].first, w = cands[c].second;
    out_edges[2 * e] = std::min(u, w);
    out_edges[2 * e + 1] = std::max(u, w);
    in_tree.push_back(w);
    for (size_t i = 0; i < out_of_tree.size(); ++i)
      if (out_of_tree[i] == w) {
        out_of_tree.erase(out_of_tree.begin() + i);
        break;
      }
  }
}

// Single-site Gibbs sweep(s) over tree edges (ref sample_tree_mcmc):
// remove one edge, which splits the tree into two components, then
// resample the reconnecting edge among all cross-component edges
// proportional to exp(edge_logit). `edges` holds 2*(V-1) entries and is
// updated in place; `steps` full sweeps are performed.
void sample_tree_mcmc(int64_t V, const double* edge_logits,
                      int64_t* edges, int64_t steps, uint64_t seed) {
  std::mt19937_64 rng(seed);
  int64_t E = V - 1;
  for (int64_t step = 0; step < steps; ++step) {
    for (int64_t drop = 0; drop < E; ++drop) {
      // components after removing edge `drop`
      UnionFind uf(V);
      for (int64_t e = 0; e < E; ++e) {
        if (e == drop) continue;
        uf.unite(edges[2 * e], edges[2 * e + 1]);
      }
      int64_t rep = uf.find(edges[2 * drop]);
      std::vector<int64_t> side_a, side_b;
      for (int64_t v = 0; v < V; ++v) {
        if (uf.find(v) == rep)
          side_a.push_back(v);
        else
          side_b.push_back(v);
      }
      std::vector<double> logits;
      std::vector<std::pair<int64_t, int64_t>> cands;
      logits.reserve(side_a.size() * side_b.size());
      for (int64_t u : side_a)
        for (int64_t w : side_b) {
          logits.push_back(edge_logits[edge_index(u, w)]);
          cands.emplace_back(u, w);
        }
      int64_t c = sample_categorical(logits, rng);
      edges[2 * drop] = std::min(cands[c].first, cands[c].second);
      edges[2 * drop + 1] = std::max(cands[c].first, cands[c].second);
    }
  }
}

// Greedy maximum spanning tree by edge logit (ref find_best_tree):
// Kruskal with union-find. out_edges gets 2*(V-1) entries.
void find_best_tree(int64_t V, const double* edge_logits,
                    int64_t* out_edges) {
  int64_t K = V * (V - 1) / 2;
  std::vector<int64_t> order(K);
  for (int64_t k = 0; k < K; ++k) order[k] = k;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return edge_logits[a] > edge_logits[b];
  });
  UnionFind uf(V);
  int64_t e = 0;
  for (int64_t idx : order) {
    // invert edge index -> (v1, v2)
    int64_t v2 = static_cast<int64_t>(
        std::floor((1.0 + std::sqrt(1.0 + 8.0 * (double)idx)) / 2.0));
    while (v2 * (v2 - 1) / 2 > idx) --v2;
    while ((v2 + 1) * v2 / 2 <= idx) ++v2;
    int64_t v1 = idx - v2 * (v2 - 1) / 2;
    if (uf.unite(v1, v2)) {
      out_edges[2 * e] = v1;
      out_edges[2 * e + 1] = v2;
      ++e;
      if (e == V - 1) break;
    }
  }
}

}  // extern "C"
