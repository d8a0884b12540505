// Exact earth mover's distance for uniform marginals (dense bipartite
// transportation problem), solved by successive-shortest-path min-cost flow
// with Dijkstra + node potentials over an explicit super-source.
//
// This is the native backend behind eval/emd.py (the role POT's C++ network
// simplex plays for the reference, turbdiff/models/metrics.py:475-537).
// Supplies are 1/n per source, demands 1/m per sink; returns the optimal
// transport cost <P, M>, or a negative value on failure (caller falls back
// to the scipy solvers).
//
// Build: make -C native   (produces libemd.so, loaded via ctypes)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

namespace {

constexpr double kEps = 1e-12;
constexpr double kInf = std::numeric_limits<double>::infinity();

// Node ids: [0, n) sources, [n, n+m) sinks, n+m = super-source S.
// Arcs: S -> i (cap = supply, cost 0), i -> j (cap inf, cost c_ij), and the
// corresponding residual arcs.  Dijkstra runs on reduced costs
// rc(u, v) = cost(u, v) + pot[u] - pot[v], which stay >= 0 as long as the
// potentials of ALL nodes (including S) are updated with the (capped)
// shortest-path distances after every augmentation.
struct Solver {
  int n, m;
  const double* cost;
  std::vector<double> flow;      // n x m transported mass
  std::vector<double> supply;    // remaining supply per source
  std::vector<double> demand;    // remaining demand per sink
  std::vector<double> pot;       // node potentials (n + m + 1)

  std::vector<double> dist;
  std::vector<int> parent;
  std::vector<uint8_t> done;

  explicit Solver(const double* M, int n_, int m_)
      : n(n_), m(m_), cost(M),
        flow(static_cast<size_t>(n_) * m_, 0.0),
        supply(n_, 1.0 / n_), demand(m_, 1.0 / m_),
        pot(n_ + m_ + 1, 0.0),
        dist(n_ + m_ + 1), parent(n_ + m_ + 1), done(n_ + m_ + 1) {}

  double c(int i, int j) const { return cost[static_cast<size_t>(i) * m + j]; }
  double& f(int i, int j) { return flow[static_cast<size_t>(i) * m + j]; }

  // Dijkstra from S to the nearest sink with remaining demand (on reduced
  // costs).  Returns the sink id or -1.
  int shortest_path() {
    const int S = n + m;
    const int V = n + m + 1;
    std::fill(dist.begin(), dist.end(), kInf);
    std::fill(parent.begin(), parent.end(), -1);
    std::fill(done.begin(), done.end(), 0);

    using Item = std::pair<double, int>;
    std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;
    dist[S] = 0.0;
    pq.push({0.0, S});

    int target = -1;
    while (!pq.empty()) {
      auto [d, u] = pq.top();
      pq.pop();
      if (done[u]) continue;
      done[u] = 1;
      if (u >= n && u < S && demand[u - n] > kEps) {
        target = u;
        break;
      }
      if (u == S) {
        for (int i = 0; i < n; ++i) {
          if (done[i] || supply[i] <= kEps) continue;
          const double nd = d + (pot[S] - pot[i]);  // cost-0 arc S -> i
          if (nd < dist[i]) {
            dist[i] = nd;
            parent[i] = S;
            pq.push({nd, i});
          }
        }
      } else if (u < n) {
        const int i = u;
        for (int j = 0; j < m; ++j) {
          const int v = n + j;
          if (done[v]) continue;
          const double nd = d + (c(i, j) + pot[i] - pot[v]);
          if (nd < dist[v]) {
            dist[v] = nd;
            parent[v] = u;
            pq.push({nd, v});
          }
        }
        // residual arc i -> S when some of i's supply has been used
        if (!done[S] && supply[i] + kEps < 1.0 / n) {
          const double nd = d + (pot[i] - pot[S]);
          if (nd < dist[S]) {
            dist[S] = nd;
            parent[S] = u;
            pq.push({nd, S});
          }
        }
      } else {
        const int j = u - n;
        for (int i = 0; i < n; ++i) {
          if (done[i] || f(i, j) <= kEps) continue;
          const double nd = d - (c(i, j) + pot[i] - pot[u]);
          if (nd < dist[i]) {
            dist[i] = nd;
            parent[i] = u;
            pq.push({nd, i});
          }
        }
      }
    }
    if (target < 0) return -1;
    // Johnson potential update.  Finalized nodes have exact distances; any
    // node NOT finalized when the target popped has true distance >= dt
    // (its tentative label is only an upper bound), so it gets dt — using
    // the tentative label there would over-shift and break rc >= 0.
    const double dt = dist[target];
    for (int v = 0; v < V; ++v) {
      pot[v] += done[v] ? dist[v] : dt;
    }
    return target;
  }

  // Augment along the parent chain from S to sink `t`; returns moved mass.
  double augment(int t) {
    const int S = n + m;
    double amount = demand[t - n];
    for (int v = t; v != S; v = parent[v]) {
      const int u = parent[v];
      if (u == S) {
        amount = std::min(amount, supply[v]);  // S -> source arc
      } else if (v < n) {
        amount = std::min(amount, f(v, u - n));  // residual sink -> source
      }  // forward source -> sink arcs are uncapacitated
    }
    if (amount <= kEps) return 0.0;

    int source_root = -1;
    for (int v = t; v != S; v = parent[v]) {
      const int u = parent[v];
      if (u == S) {
        source_root = v;
      } else if (v >= n) {
        f(u, v - n) += amount;
      } else {
        f(v, u - n) -= amount;
      }
    }
    supply[source_root] -= amount;
    demand[t - n] -= amount;
    return amount;
  }

  double solve() {
    double remaining = 1.0;
    const long max_iters = 8L * (n + m) + 64;
    long iters = 0;
    while (remaining > 1e-9) {
      if (++iters > max_iters) return -1.0;
      const int t = shortest_path();
      if (t < 0) return -1.0;
      const double moved = augment(t);
      if (moved <= kEps) return -1.0;
      remaining -= moved;
    }
    double total = 0.0;
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < m; ++j) total += f(i, j) * c(i, j);
    return total;
  }
};

}  // namespace

extern "C" {

// Returns the optimal transport cost for uniform marginals, or -1 on failure.
double emd_uniform(const double* cost, int n, int m) {
  if (n <= 0 || m <= 0) return -1.0;
  for (long k = 0; k < static_cast<long>(n) * m; ++k) {
    if (!std::isfinite(cost[k])) return -1.0;
  }
  Solver solver(cost, n, m);
  return solver.solve();
}

}  // extern "C"
