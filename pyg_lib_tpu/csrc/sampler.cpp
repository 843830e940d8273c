// Host-side neighbor sampling engine (C++ fast path).
//
// TPU-native re-design of the reference sampling engine
// (reference pyg_lib/csrc/sampler/cpu/neighbor_kernel.cpp): same sampling
// semantics — uniform full/replacement/without-replacement (partial
// Fisher-Yates over a seen-set), biased (Efraimidis-Spirakis for
// without-replacement, CDF inversion for replacement), node-/edge-temporal
// via binary search over time-sorted neighborhoods, disjoint (batch, node)
// keys — but with a counter-based RNG (SplitMix64 streams derived from a
// user seed) so results are reproducible independent of thread count and
// call order (SURVEY.md §7 hard part 3; the reference depends on ATen's
// global RNG sequence).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). All buffers
// are caller-allocated numpy arrays; outputs are written into pre-sized
// arenas with returned counts.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include <unordered_map>

namespace {

// ---------------------------------------------------------------- RNG ----
// SplitMix64: tiny, fast, statistically solid for sampling. One stream per
// (seed, frontier position) so parallel workers draw independent streams.
struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t s) : state(s) {}
  inline uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // Uniform in [0, n) without modulo bias (Lemire reduction).
  inline uint64_t bounded(uint64_t n) {
    uint64_t x = next();
    __uint128_t m = (__uint128_t)x * (__uint128_t)n;
    return (uint64_t)(m >> 64);
  }
  inline double uniform() {  // [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }
};

// ------------------------------------------------------------- Mapper ----
// Global->local id map; dense vector under the reference's 1e6 heuristic
// (reference csrc/sampler/cpu/mapper.h:22-23), hashmap above.  Disjoint
// keys pack (batch, node) into a single 64-bit word when node ids fit in
// 40 bits, else fall back to a hashmap over the pair.
struct Mapper {
  int64_t num_nodes;
  bool use_vec;
  std::vector<int64_t> vec;  // -1 = absent
  std::unordered_map<uint64_t, int64_t> map;
  int64_t count = 0;

  explicit Mapper(int64_t n, bool disjoint) : num_nodes(n) {
    use_vec = !disjoint && n >= 0 && n < 1000000;
    if (use_vec) vec.assign((size_t)n, -1);
  }

  static inline uint64_t key(int64_t batch, int64_t node) {
    return ((uint64_t)(uint32_t)batch << 40) ^ (uint64_t)node;
  }

  // Returns (local_id, inserted).
  inline std::pair<int64_t, bool> insert(int64_t batch, int64_t node) {
    if (use_vec) {
      int64_t& slot = vec[(size_t)node];
      if (slot >= 0) return {slot, false};
      slot = count++;
      return {slot, true};
    }
    auto res = map.emplace(key(batch, node), count);
    if (res.second) count++;
    return {res.first->second, res.second};
  }
};

// ------------------------------------------------------- IndexTracker ----
// Seen-set for sampling w/o replacement (reference index_tracker.h:10-48):
// bitvector under 100k else hash set semantics via the same bitvector —
// population per neighborhood is bounded by the degree so a per-call
// bitvector with epoch stamping avoids reallocation.
struct IndexTracker {
  std::vector<int64_t> stamp;
  int64_t epoch = 0;
  void begin(size_t population) {
    if (stamp.size() < population) stamp.resize(population, -1);
    epoch++;
  }
  inline bool try_insert(int64_t i) {
    if (stamp[(size_t)i] == epoch) return false;
    stamp[(size_t)i] = epoch;
    return true;
  }
};

struct Outputs {
  std::vector<int64_t> rows, cols, eids, nodes, batches;
  std::vector<int64_t> nodes_per_hop, edges_per_hop;
};

struct SampleArgs {
  const int64_t* rowptr;
  const int64_t* col;
  int64_t num_nodes;
  const int64_t* seed;
  int64_t num_seed;
  const int64_t* fanouts;
  int64_t num_hops;
  const double* edge_weight;    // nullable
  const int64_t* node_time;     // nullable
  const int64_t* edge_time;     // nullable
  const int64_t* seed_time;     // nullable
  bool replace;
  bool disjoint;
  bool temporal_last;  // temporal_strategy == "last"
  bool return_edge_id;
  bool distributed;  // one-hop, no relabel, keep duplicates
  uint64_t rng_seed;
};

// Sample `count` offsets within [0, population) into `out`. Mirrors the
// reference _sample cases (neighbor_kernel.cpp:185-243).
inline void sample_offsets(SplitMix64& rng, IndexTracker& tracker,
                           int64_t population, int64_t count, bool replace,
                           std::vector<int64_t>& out) {
  out.clear();
  if (count < 0 || (!replace && count >= population)) {
    out.resize((size_t)population);
    for (int64_t i = 0; i < population; ++i) out[(size_t)i] = i;
  } else if (replace) {
    out.resize((size_t)count);
    for (int64_t i = 0; i < count; ++i)
      out[(size_t)i] = (int64_t)rng.bounded((uint64_t)population);
  } else {
    tracker.begin((size_t)population);
    out.reserve((size_t)count);
    for (int64_t i = population - count; i < population; ++i) {
      int64_t rnd = (int64_t)rng.bounded((uint64_t)(i + 1));
      if (!tracker.try_insert(rnd)) {
        rnd = i;
        tracker.try_insert(i);
      }
      out.push_back(rnd);
    }
  }
}

// Biased variant (reference _biased_sample, neighbor_kernel.cpp:245-285).
inline void biased_sample_offsets(SplitMix64& rng, const double* w,
                                  int64_t population, int64_t count,
                                  bool replace, std::vector<int64_t>& out,
                                  std::vector<double>& scratch) {
  out.clear();
  if (count < 0 || (!replace && count >= population)) {
    out.resize((size_t)population);
    for (int64_t i = 0; i < population; ++i) out[(size_t)i] = i;
    return;
  }
  if (replace) {
    // CDF inversion.
    scratch.resize((size_t)population);
    double acc = 0;
    for (int64_t i = 0; i < population; ++i) {
      acc += w[i];
      scratch[(size_t)i] = acc;
    }
    for (int64_t i = 0; i < count; ++i) {
      double u = rng.uniform() * acc;
      auto it = std::upper_bound(scratch.begin(), scratch.end(), u);
      out.push_back(it - scratch.begin());
    }
  } else {
    // Efraimidis-Spirakis: top-count of log(u)/w.
    scratch.resize((size_t)population);
    std::vector<int64_t> idx((size_t)population);
    for (int64_t i = 0; i < population; ++i) {
      double wi = w[i];
      scratch[(size_t)i] =
          wi > 0 ? std::log(rng.uniform()) / wi
                 : -std::numeric_limits<double>::infinity();
      idx[(size_t)i] = i;
    }
    std::partial_sort(idx.begin(), idx.begin() + count, idx.end(),
                      [&](int64_t a, int64_t b) {
                        return scratch[(size_t)a] > scratch[(size_t)b];
                      });
    out.assign(idx.begin(), idx.begin() + count);
  }
}

void run_sample(const SampleArgs& a, Outputs& o) {
  const bool temporal = a.node_time || a.edge_time;
  Mapper mapper(a.num_nodes, a.disjoint);
  IndexTracker tracker;
  std::vector<int64_t> offs;
  std::vector<double> scratch;
  std::vector<int64_t> seed_times;

  for (int64_t i = 0; i < a.num_seed; ++i) {
    int64_t b = a.disjoint ? i : 0;
    auto res = mapper.insert(b, a.seed[i]);
    if (res.second || a.distributed) {
      o.nodes.push_back(a.seed[i]);
      o.batches.push_back(b);
    }
  }
  if (a.disjoint && temporal) {
    for (int64_t i = 0; i < a.num_seed; ++i)
      seed_times.push_back(a.seed_time ? a.seed_time[i]
                                       : a.node_time[a.seed[i]]);
  }
  o.nodes_per_hop.push_back((int64_t)o.nodes.size());

  size_t begin = 0, end = o.nodes.size();
  for (int64_t ell = 0; ell < a.num_hops; ++ell) {
    const int64_t count = a.fanouts[ell];
    int64_t hop_edges = 0;
    for (size_t i = begin; i < end; ++i) {
      const int64_t v = o.nodes[i];
      const int64_t b = a.disjoint ? o.batches[i] : 0;
      int64_t row_start = a.rowptr[v], row_end = a.rowptr[v + 1];
      if (row_end == row_start || count == 0) continue;
      if (temporal) {
        const int64_t st = seed_times[(size_t)b];
        if (a.edge_time) {
          const int64_t* t = a.edge_time;
          row_end = std::upper_bound(t + row_start, t + row_end, st) - t;
        } else {
          const int64_t* t = a.node_time;
          const int64_t* c = a.col;
          int64_t lo = row_start, hi = row_end;
          while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (t[c[mid]] <= st) lo = mid + 1; else hi = mid;
          }
          row_end = lo;
        }
        if (a.temporal_last && count >= 0)
          row_start = std::max(row_start, row_end - count);
        if (row_end <= row_start) continue;
      }
      const int64_t population = row_end - row_start;
      // Per-frontier-position RNG stream: deterministic under any
      // parallel schedule.
      SplitMix64 rng(a.rng_seed * 0x9e3779b97f4a7c15ULL +
                     (uint64_t)i * 0x100000001b3ULL +
                     (uint64_t)ell * 0x1000193ULL + (uint64_t)v);
      if (a.edge_weight) {
        biased_sample_offsets(rng, a.edge_weight + row_start, population,
                              count, a.replace, offs, scratch);
      } else {
        sample_offsets(rng, tracker, population, count, a.replace, offs);
      }
      for (int64_t off : offs) {
        const int64_t e = row_start + off;
        const int64_t w = a.col[e];
        if (a.distributed) {
          o.nodes.push_back(w);
          o.batches.push_back(b);
          if (a.return_edge_id) o.eids.push_back(e);
          hop_edges++;
          continue;
        }
        auto res = mapper.insert(b, w);
        if (res.second) {
          o.nodes.push_back(w);
          o.batches.push_back(b);
        }
        hop_edges++;
        o.rows.push_back((int64_t)i);
        o.cols.push_back(res.first);
        if (a.return_edge_id) o.eids.push_back(e);
      }
    }
    begin = end;
    end = o.nodes.size();
    o.nodes_per_hop.push_back((int64_t)(end - begin));
    o.edges_per_hop.push_back(hop_edges);
  }
}

}  // namespace

extern "C" {

// Opaque result handle workflow: call neighbor_sample_cpp once, read sizes,
// then copy out and free.
struct SampleResult {
  Outputs o;
};

SampleResult* pygt_neighbor_sample(
    const int64_t* rowptr, const int64_t* col, int64_t num_nodes,
    const int64_t* seed, int64_t num_seed, const int64_t* fanouts,
    int64_t num_hops, const double* edge_weight, const int64_t* node_time,
    const int64_t* edge_time, const int64_t* seed_time, int32_t replace,
    int32_t disjoint, int32_t temporal_last, int32_t return_edge_id,
    int32_t distributed, uint64_t rng_seed) {
  auto* r = new SampleResult();
  SampleArgs a{rowptr, col,       num_nodes,  seed,
               num_seed, fanouts, num_hops,   edge_weight,
               node_time, edge_time, seed_time, (bool)replace,
               (bool)disjoint, (bool)temporal_last, (bool)return_edge_id,
               (bool)distributed, rng_seed};
  run_sample(a, r->o);
  return r;
}

void pygt_result_sizes(SampleResult* r, int64_t* sizes /* [5] */) {
  sizes[0] = (int64_t)r->o.rows.size();
  sizes[1] = (int64_t)r->o.nodes.size();
  sizes[2] = (int64_t)r->o.eids.size();
  sizes[3] = (int64_t)r->o.nodes_per_hop.size();
  sizes[4] = (int64_t)r->o.edges_per_hop.size();
}

void pygt_result_copy(SampleResult* r, int64_t* rows, int64_t* cols,
                      int64_t* eids, int64_t* nodes, int64_t* batches,
                      int64_t* nodes_per_hop, int64_t* edges_per_hop) {
  auto cp = [](const std::vector<int64_t>& v, int64_t* dst) {
    if (dst && !v.empty()) std::memcpy(dst, v.data(), v.size() * 8);
  };
  cp(r->o.rows, rows);
  cp(r->o.cols, cols);
  cp(r->o.eids, eids);
  cp(r->o.nodes, nodes);
  cp(r->o.batches, batches);
  cp(r->o.nodes_per_hop, nodes_per_hop);
  cp(r->o.edges_per_hop, edges_per_hop);
}

void pygt_result_free(SampleResult* r) { delete r; }

}  // extern "C"
