// mdc_native: host-side native engine for mdcommunity_tpu.
//
// Two components, both plain C ABI for ctypes:
//
// 1. Duplex-cascade dismantling environment — the host-side eval hot path.
//    Semantics mirror mdcommunity_tpu/env/host_env.py (itself matching the
//    reference's MvcEnv + Mcc.MCC alternating sever loop, mvc_env.py:31-162 /
//    Mcc.py:30-38): covering a node kills its incident edges in both layers;
//    the cascade alternately severs layer-B edges that straddle distinct
//    layer-A components until the partitions agree; severed edges persist.
//    Connected components are computed by union-find over live edges —
//    O(E·alpha) per labeling, a handful of labelings per step — instead of
//    scipy CSR rebuild + csgraph BFS per labeling.
//
// 2. GMM pairwise connector — the O(N^2) inner loop of the geometric
//    multiplex generator (reference Hyperbolic.py:101-117): Fermi-Dirac
//    connection probability p = 1/(1 + (d/(mu*k*k'))^(1/T)) over all pairs.
//    Hidden-variable sampling (kappa/theta copulas) stays in numpy where
//    scipy's lambertw/erfinv live; only the pair loop is native.
//
// Build: g++ -O3 -shared -fPIC (see ../build.py). No external deps.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

using std::int32_t;
using std::int64_t;
using std::uint64_t;

// ---------------------------------------------------------------- union-find
struct UnionFind {
  std::vector<int32_t> parent;
  std::vector<int32_t> size;

  void reset(int32_t n) {
    parent.resize(n);
    size.assign(n, 1);
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {  // path compression
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  void merge(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (size[a] < size[b]) std::swap(a, b);
    parent[b] = a;
    size[a] += size[b];
  }
};

// ------------------------------------------------------------------ cascade
struct Layer {
  std::vector<int32_t> u, v;   // undirected edge endpoints
  std::vector<uint8_t> sever;  // persistent cascade-severed flag
  std::vector<uint8_t> alive;  // !sever && !covered[u] && !covered[v]
  int64_t alive_count = 0;
  std::vector<int64_t> new_sever;  // edge ids severed by the last cascade
  // compacting list of live edge ids: scans touch only edges still alive
  // (edges only ever die, so dead ids are swap-removed during traversal)
  std::vector<int64_t> live_ids;
  // CSR incidence: node -> incident edge ids (so covering a node touches
  // only its own edges, not the full edge table)
  std::vector<int64_t> inc_ptr;
  std::vector<int64_t> inc_ids;

  int64_t m() const { return (int64_t)u.size(); }

  void build_incidence(int32_t n) {
    inc_ptr.assign(n + 1, 0);
    for (int64_t i = 0; i < m(); ++i) {
      ++inc_ptr[u[i] + 1];
      ++inc_ptr[v[i] + 1];
    }
    for (int32_t i = 0; i < n; ++i) inc_ptr[i + 1] += inc_ptr[i];
    inc_ids.resize(2 * m());
    std::vector<int64_t> cur(inc_ptr.begin(), inc_ptr.end() - 1);
    for (int64_t i = 0; i < m(); ++i) {
      inc_ids[cur[u[i]]++] = i;
      inc_ids[cur[v[i]]++] = i;
    }
  }
};

struct DuplexEnv {
  int32_t n = 0;
  Layer layers[2];
  std::vector<uint8_t> covered;
  std::vector<double> weights;  // [2][n] node costs (degree-cost variant)
  double wsum[2] = {1.0, 1.0};
  int64_t rank = 0, max_rank = 0, t = 0;
  double score = 0.0;
  std::vector<double> curve;
  UnionFind uf;                 // scratch
  std::vector<int32_t> label;   // scratch component labels
  std::vector<int32_t> lab_store[2];  // cached per-layer labelings
  bool lab_dirty[2] = {true, true};   // stale since the layer last changed?
  std::vector<int64_t> sizes;   // scratch component sizes

  void refresh_alive(int l) {
    Layer& L = layers[l];
    int64_t cnt = 0;
    L.live_ids.clear();
    for (int64_t i = 0; i < L.m(); ++i) {
      uint8_t a = !L.sever[i] && !covered[L.u[i]] && !covered[L.v[i]];
      L.alive[i] = a;
      if (a) {
        L.live_ids.push_back(i);
        ++cnt;
      }
    }
    L.alive_count = cnt;
  }

  // Component labels of layer l over live edges (isolated nodes are their own
  // singleton components, like csgraph.connected_components on the full n).
  // Compacts the layer's live_ids in passing.
  void labels(int l) {
    uf.reset(n);
    Layer& L = layers[l];
    size_t w = 0;
    for (size_t r = 0; r < L.live_ids.size(); ++r) {
      int64_t i = L.live_ids[r];
      if (L.alive[i]) {
        uf.merge(L.u[i], L.v[i]);
        L.live_ids[w++] = i;
      }
    }
    L.live_ids.resize(w);
    label.resize(n);
    for (int32_t i = 0; i < n; ++i) label[i] = uf.find(i);
  }

  // Alternating MCC sever loop; fills layers[*].new_sever, sets rank.
  //
  // Per-side DIRTY flags skip redundant labelings: labels(side) depends
  // only on side's alive edge set, which changes only when (a) nodes are
  // covered (callers mark both sides dirty before cascade()) or (b) the
  // loop severs side's edges (marked below).  A side whose edges were
  // untouched since its last labeling keeps the identical partition, so
  // the sever scan reuses the cached labels — at 10^6 nodes each skipped
  // labeling saves an O(N + E_live) union-find pass (the 1M batched loop
  // is host-cascade-bound; RESULTS r04 attribution).
  void cascade() {
    layers[0].new_sever.clear();
    layers[1].new_sever.clear();
    bool changed = true;
    while (changed) {
      changed = false;
      for (int side = 0; side < 2; ++side) {
        // components of layer `side`, sever cross edges in the other layer
        if (lab_dirty[side]) {
          labels(side);
          lab_store[side] = label;
          lab_dirty[side] = false;
        }
        auto& lab = lab_store[side];
        Layer& other = layers[1 - side];
        bool any = false;
        size_t w = 0;
        for (size_t r = 0; r < other.live_ids.size(); ++r) {
          int64_t i = other.live_ids[r];
          if (!other.alive[i]) continue;  // killed by covering meanwhile
          if (lab[other.u[i]] != lab[other.v[i]]) {
            other.sever[i] = 1;
            other.alive[i] = 0;
            --other.alive_count;
            other.new_sever.push_back(i);
            any = true;
          } else {
            other.live_ids[w++] = i;
          }
        }
        other.live_ids.resize(w);
        if (any) {
          changed = true;
          lab_dirty[1 - side] = true;
        }
      }
    }
    // rank: largest layer-0 component counted over uncovered nodes (the
    // cached labeling is the converged one — dirty[0] is false here, since
    // the loop only exits after a full no-sever round)
    if (lab_dirty[0]) {
      labels(0);
      lab_store[0] = label;
      lab_dirty[0] = false;
    }
    auto& lab0 = lab_store[0];
    sizes.assign(n, 0);
    int64_t best = 0;
    for (int32_t i = 0; i < n; ++i) {
      if (!covered[i]) {
        int64_t s = ++sizes[lab0[i]];
        if (s > best) best = s;
      }
    }
    rank = best;
  }

  void reset() {
    std::fill(covered.begin(), covered.end(), 0);
    for (int l = 0; l < 2; ++l) {
      std::fill(layers[l].sever.begin(), layers[l].sever.end(), 0);
      refresh_alive(l);
    }
    lab_dirty[0] = lab_dirty[1] = true;
    cascade();
    score = 0.0;
    curve.assign(1, 1.0);
    t = 0;
  }

  int64_t step(int32_t a, bool degree_cost) {
    covered[a] = 1;
    // covering a node only kills its incident edges; O(deg(a)) refresh
    for (int l = 0; l < 2; ++l) {
      Layer& L = layers[l];
      for (int64_t k = L.inc_ptr[a]; k < L.inc_ptr[a + 1]; ++k) {
        int64_t i = L.inc_ids[k];
        if (L.alive[i]) {
          L.alive[i] = 0;
          --L.alive_count;
        }
      }
    }
    lab_dirty[0] = lab_dirty[1] = true;
    cascade();
    double norm = (double)rank / (double)std::max<int64_t>(max_rank, 1);
    if (degree_cost) {
      double cost = 0.5 * (weights[a] / wsum[0] + weights[n + a] / wsum[1]);
      score += norm * cost;
    } else {
      score += norm / (double)n;
    }
    curve.push_back(norm);
    ++t;
    return rank;
  }

  // Batched removal: cover up to k nodes, run ONE cascade, append the
  // post-batch norm once per removed node.  Already-covered / out-of-range
  // entries are skipped.  Returns the number of nodes actually removed.
  //
  // Approximation contract (the StepRatio amortization the 10^6-node path
  // needs — per-removal cascades make a full dismantling Θ(N²)): the FINAL
  // state (covered set, severed set, rank, terminal) is EXACTLY the
  // sequential result — the MCC fixed point after removing a set is
  // order-independent because components only ever split — but the k curve
  // entries all take the post-batch rank, so the score contribution of the
  // batch is underestimated by at most k·(rank_pre − rank_post)/(max_rank·n);
  // summed over a whole dismantling the bias is ≤ k/n (one part per
  // thousand at StepRatio 0.001).
  int64_t step_many(const int64_t* actions, int64_t k, bool degree_cost) {
    int64_t removed = 0;
    static thread_local std::vector<int32_t> done;
    done.clear();
    for (int64_t j = 0; j < k; ++j) {
      if (actions[j] < 0 || actions[j] >= n) continue;
      int32_t a = (int32_t)actions[j];
      if (covered[a]) continue;
      covered[a] = 1;
      done.push_back(a);
      for (int l = 0; l < 2; ++l) {
        Layer& L = layers[l];
        for (int64_t e = L.inc_ptr[a]; e < L.inc_ptr[a + 1]; ++e) {
          int64_t i = L.inc_ids[e];
          if (L.alive[i]) {
            L.alive[i] = 0;
            --L.alive_count;
          }
        }
      }
      ++removed;
    }
    if (!removed) return 0;
    lab_dirty[0] = lab_dirty[1] = true;
    cascade();
    double norm = (double)rank / (double)std::max<int64_t>(max_rank, 1);
    for (int32_t a : done) {
      if (degree_cost) {
        double cost =
            0.5 * (weights[a] / wsum[0] + weights[n + a] / wsum[1]);
        score += norm * cost;
      } else {
        score += norm / (double)n;
      }
      curve.push_back(norm);
    }
    t += removed;
    return removed;
  }

  bool terminal() const {
    return !(layers[0].alive_count > 0 && layers[1].alive_count > 0);
  }
};

// ---------------------------------------------------------------- GMM rng
// splitmix64 -> xoshiro256+ (public-domain constructions)
struct Xoshiro {
  uint64_t s[4];
  explicit Xoshiro(uint64_t seed) {
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9e3779b97f4a7c15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
  }
  inline uint64_t next() {
    uint64_t result = s[0] + s[3];
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  inline double uniform() {  // [0, 1)
    return (double)(next() >> 11) * 0x1.0p-53;
  }
};

}  // namespace

extern "C" {

// ---- duplex cascade env -----------------------------------------------

void* mdc_env_create(int64_t n, const int64_t* e0, int64_t m0,
                     const int64_t* e1, int64_t m1, const double* weights) {
  auto* env = new DuplexEnv();
  env->n = (int32_t)n;
  env->covered.assign(n, 0);
  const int64_t* es[2] = {e0, e1};
  int64_t ms[2] = {m0, m1};
  for (int l = 0; l < 2; ++l) {
    Layer& L = env->layers[l];
    L.u.resize(ms[l]);
    L.v.resize(ms[l]);
    for (int64_t i = 0; i < ms[l]; ++i) {
      L.u[i] = (int32_t)es[l][2 * i];
      L.v[i] = (int32_t)es[l][2 * i + 1];
    }
    L.sever.assign(ms[l], 0);
    L.alive.assign(ms[l], 0);
    L.build_incidence((int32_t)n);
  }
  if (weights) {
    env->weights.assign(weights, weights + 2 * n);
  } else {
    env->weights.assign(2 * n, 1.0);
  }
  for (int l = 0; l < 2; ++l) {
    double s = 0.0;
    for (int64_t i = 0; i < n; ++i) s += env->weights[l * n + i];
    env->wsum[l] = s;
  }
  env->reset();
  env->max_rank = env->rank;  // intact LMCC (reference graph.py ori_rank)
  return env;
}

void mdc_env_destroy(void* p) { delete (DuplexEnv*)p; }
void mdc_env_reset(void* p) { ((DuplexEnv*)p)->reset(); }

int64_t mdc_env_step(void* p, int64_t a, int32_t degree_cost) {
  return ((DuplexEnv*)p)->step((int32_t)a, degree_cost != 0);
}

// Batched removal (StepRatio amortization): ONE cascade for k removals.
// Returns the number of nodes actually removed (skips covered/oob).
int64_t mdc_env_step_many(void* p, const int64_t* actions, int64_t k,
                          int32_t degree_cost) {
  return ((DuplexEnv*)p)->step_many(actions, k, degree_cost != 0);
}

int64_t mdc_env_rank(void* p) { return ((DuplexEnv*)p)->rank; }
int64_t mdc_env_max_rank(void* p) { return ((DuplexEnv*)p)->max_rank; }
double mdc_env_score(void* p) { return ((DuplexEnv*)p)->score; }
int32_t mdc_env_terminal(void* p) { return ((DuplexEnv*)p)->terminal(); }
int64_t mdc_env_t(void* p) { return ((DuplexEnv*)p)->t; }

int64_t mdc_env_curve_len(void* p) {
  return (int64_t)((DuplexEnv*)p)->curve.size();
}
void mdc_env_curve(void* p, double* out) {
  auto& c = ((DuplexEnv*)p)->curve;
  std::memcpy(out, c.data(), c.size() * sizeof(double));
}

// Edge ids severed by the most recent reset/step cascade.
int64_t mdc_env_new_sever_count(void* p, int32_t layer) {
  return (int64_t)((DuplexEnv*)p)->layers[layer].new_sever.size();
}
void mdc_env_new_sever(void* p, int32_t layer, int64_t* out) {
  auto& env = *(DuplexEnv*)p;
  auto& ids = env.layers[layer].new_sever;
  auto& L = env.layers[layer];
  for (size_t i = 0; i < ids.size(); ++i) {
    out[2 * i] = L.u[ids[i]];
    out[2 * i + 1] = L.v[ids[i]];
  }
}

// Persistent severed-edge mask of a layer (uint8[m]).
void mdc_env_sever_mask(void* p, int32_t layer, uint8_t* out) {
  auto& L = ((DuplexEnv*)p)->layers[layer];
  std::memcpy(out, L.sever.data(), L.sever.size());
}

// Live-edge mask of a layer (for terminal/valid-action queries).
void mdc_env_alive_nodes(void* p, int32_t layer, uint8_t* out) {
  auto& env = *(DuplexEnv*)p;
  std::memset(out, 0, env.n);
  Layer& L = env.layers[layer];
  for (int64_t i = 0; i < L.m(); ++i) {
    if (L.alive[i]) {
      out[L.u[i]] = 1;
      out[L.v[i]] = 1;
    }
  }
}

// ---- GMM pairwise connector --------------------------------------------

// Fermi-Dirac pairwise connection over all i<j: dist = (n/2pi) * circular
// angular distance, chi = dist/(mu*k_i*k_j), p = 1/(1+chi^(1/T)).
// Returns the number of edges written, or -1 if cap was too small.
int64_t mdc_gmm_connect(int64_t n, const double* kappa, const double* theta,
                        double T, double mu, uint64_t seed, int32_t* out,
                        int64_t cap) {
  Xoshiro rng(seed);
  const double two_pi = 2.0 * M_PI;
  const double inv_T = 1.0 / T;
  const double scale = (double)n / two_pi;
  int64_t cnt = 0;
  for (int64_t i = 0; i < n; ++i) {
    const double ki = kappa[i], ti = theta[i];
    for (int64_t j = i + 1; j < n; ++j) {
      double dt = std::fabs(ti - theta[j]);
      double dist = scale * std::fabs(M_PI - std::fabs(M_PI - dt));
      double chi = dist / (mu * ki * kappa[j]);
      double p = 1.0 / (1.0 + std::pow(chi, inv_T));
      if (rng.uniform() < p) {
        if (cnt >= cap) return -1;
        out[2 * cnt] = (int32_t)i;
        out[2 * cnt + 1] = (int32_t)j;
        ++cnt;
      }
    }
  }
  return cnt;
}

}  // extern "C"
