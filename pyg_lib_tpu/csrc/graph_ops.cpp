// Host-side graph ops: induced subgraph and uniform random walks.
//
// TPU-native counterparts of the reference kernels
// (reference pyg_lib/csrc/sampler/cpu/subgraph_kernel.cpp:13-89 two-pass
// count/cumsum/fill; csrc/sampler/cpu/random_walk_kernel.cpp:12-51
// per-seed sequential walk under at::parallel_for). OpenMP parallel with
// counter-based RNG so walks are reproducible under any thread count.

#include <algorithm>
#include <cstring>
#include <omp.h>
#include <vector>

#include "sampling_core.h"

using namespace pygt;

extern "C" {

struct SubgraphResult {
  std::vector<int64_t> rowptr, col, eid;
};

// Induced subgraph on `nodes` (local ids = position in `nodes`): two-pass —
// parallel per-row degree count into rowptr, exclusive cumsum, parallel fill.
SubgraphResult* pygt_subgraph(const int64_t* rowptr, const int64_t* col,
                              int64_t num_nodes, const int64_t* nodes,
                              int64_t n_out, int32_t return_edge_id) {
  auto* r = new SubgraphResult();
  std::vector<int64_t> local((size_t)num_nodes, -1);
  for (int64_t i = 0; i < n_out; ++i)
    if (nodes[i] >= 0 && nodes[i] < num_nodes) local[(size_t)nodes[i]] = i;

  r->rowptr.assign((size_t)n_out + 1, 0);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_out; ++i) {
    const int64_t v = nodes[i];
    int64_t deg = 0;
    if (v >= 0 && v < num_nodes)
      for (int64_t e = rowptr[v]; e < rowptr[v + 1]; ++e)
        if (local[(size_t)col[e]] >= 0) deg++;
    r->rowptr[(size_t)i + 1] = deg;
  }
  for (int64_t i = 0; i < n_out; ++i)
    r->rowptr[(size_t)i + 1] += r->rowptr[(size_t)i];

  const int64_t total = r->rowptr[(size_t)n_out];
  r->col.resize((size_t)total);
  if (return_edge_id) r->eid.resize((size_t)total);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_out; ++i) {
    const int64_t v = nodes[i];
    if (v < 0 || v >= num_nodes) continue;
    int64_t off = r->rowptr[(size_t)i];
    for (int64_t e = rowptr[v]; e < rowptr[v + 1]; ++e) {
      const int64_t w = local[(size_t)col[e]];
      if (w >= 0) {
        r->col[(size_t)off] = w;
        if (return_edge_id) r->eid[(size_t)off] = e;
        off++;
      }
    }
  }
  return r;
}

int64_t pygt_subgraph_num_edges(SubgraphResult* r) {
  return (int64_t)r->col.size();
}

void pygt_subgraph_copy(SubgraphResult* r, int64_t* rowptr, int64_t* col,
                        int64_t* eid) {
  std::memcpy(rowptr, r->rowptr.data(), r->rowptr.size() * 8);
  if (!r->col.empty()) std::memcpy(col, r->col.data(), r->col.size() * 8);
  if (eid && !r->eid.empty())
    std::memcpy(eid, r->eid.data(), r->eid.size() * 8);
}

void pygt_subgraph_free(SubgraphResult* r) { delete r; }

// Uniform random walks: out[i, :] is the walk from seed[i]; dead ends
// repeat the current node (reference random_walk_kernel.cpp:32-43).
void pygt_random_walk(const int64_t* rowptr, const int64_t* col,
                      const int64_t* seed, int64_t n_seed,
                      int64_t walk_length, uint64_t rng_seed, int64_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_seed; ++i) {
    SplitMix64 rng = site_rng(rng_seed, 0, 0, (uint64_t)i,
                              (uint64_t)seed[i]);
    int64_t* walk = out + i * (walk_length + 1);
    int64_t cur = seed[i];
    walk[0] = cur;
    for (int64_t s = 1; s <= walk_length; ++s) {
      const int64_t lo = rowptr[cur], hi = rowptr[cur + 1];
      if (hi > lo) cur = col[lo + (int64_t)rng.bounded((uint64_t)(hi - lo))];
      walk[s] = cur;
    }
  }
}

// node2vec second-order walks via rejection sampling (Grover &
// Leskovec 2016, §3.2): candidate neighbors of the current node are
// drawn uniformly and accepted with probability w / w_max where w is
// 1/p (return to previous), 1 (common neighbor of previous), or 1/q
// (distance-2). BEYOND the reference, which rejects p != 1 || q != 1
// (reference csrc/sampler/cpu/random_walk_kernel.cpp:19-20). ``col``
// must be sorted within each row (the Python wrapper sorts once) so the
// distance-1 test is a binary search. Deterministic per (rng_seed, i).
void pygt_random_walk_pq(const int64_t* rowptr, const int64_t* col,
                         const int64_t* seed, int64_t n_seed,
                         int64_t walk_length, double p, double q,
                         uint64_t rng_seed, int64_t* out) {
  const double wp = 1.0 / p, wq = 1.0 / q;
  const double w_max = std::max(1.0, std::max(wp, wq));
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_seed; ++i) {
    SplitMix64 rng = site_rng(rng_seed, 1, 0, (uint64_t)i,
                              (uint64_t)seed[i]);
    int64_t* walk = out + i * (walk_length + 1);
    int64_t cur = seed[i], prev = -1;
    walk[0] = cur;
    for (int64_t s = 1; s <= walk_length; ++s) {
      const int64_t lo = rowptr[cur], hi = rowptr[cur + 1];
      if (hi <= lo) {  // dead end: repeat (reference contract)
        walk[s] = cur;
        prev = cur;
        continue;
      }
      int64_t nxt = cur;
      if (prev < 0) {
        nxt = col[lo + (int64_t)rng.bounded((uint64_t)(hi - lo))];
      } else {
        const int64_t plo = rowptr[prev], phi = rowptr[prev + 1];
        auto weight_of = [&](int64_t cand) -> double {
          if (cand == prev) return wp;
          if (std::binary_search(col + plo, col + phi, cand)) return 1.0;
          return wq;
        };
        bool accepted = false;
        for (int attempt = 0; attempt < 64; ++attempt) {
          const int64_t cand =
              col[lo + (int64_t)rng.bounded((uint64_t)(hi - lo))];
          nxt = cand;
          if (rng.uniform() * w_max <= weight_of(cand)) {
            accepted = true;
            break;
          }
        }
        if (!accepted) {
          // 64 rejections (extreme p/q at this node): draw EXACTLY from
          // the node2vec distribution via the weighted CDF — keeping
          // the last rejected uniform candidate would bias the walk.
          double total = 0.0;
          for (int64_t e = lo; e < hi; ++e) total += weight_of(col[e]);
          double r = rng.uniform() * total, acc = 0.0;
          nxt = col[hi - 1];
          for (int64_t e = lo; e < hi; ++e) {
            acc += weight_of(col[e]);
            if (r <= acc) {
              nxt = col[e];
              break;
            }
          }
        }
      }
      walk[s] = nxt;
      prev = cur;
      cur = nxt;
    }
  }
}

}  // extern "C"
