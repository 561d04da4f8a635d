// QPBO (roof duality) solver — the rd_mex/QPBO-v1.3 equivalent, written from
// the published construction (Boros & Hammer's roof duality; Kolmogorov &
// Rother, "Minimizing Nonsubmodular Functions with Graph Cuts — A Review",
// PAMI 2007).  Not a port: Dinic's algorithm on a flat arc array instead of
// BK-style tree reuse, and a from-scratch symmetric doubled-graph builder.
//
// Construction.  Variables x_i in {0,1}; the network has nodes u_i ("x_i")
// and v_i ("~x_i") plus source/sink.  Convention: a node on the SINK side of
// the cut means its literal is 1.  Every energy term contributes half its
// weight to the u-side and half, mirrored, to the v-side, which keeps the
// network symmetric under (u_i <-> v_i, arc reversal) — the property roof
// duality needs.
//   unary  w*x_i   (w>=0):  s->u_i w/2,  v_i->t w/2
//          w*x_i   (w<0):   u_i->t -w/2, s->v_i -w/2, const += w
//   pairwise (a,b,c,d) = th(00),th(01),th(10),th(11):
//      B = b + c - a - d  (>= 0 iff submodular)
//      submodular:   th = a + (c-a)x_i + (d-c)x_j + B(1-x_i)x_j
//                    -> arcs u_i->u_j B/2, v_j->v_i B/2 + linear terms
//      supermodular: substitute z_j = ~x_j (table becomes submodular with
//                    B' = -B) -> arcs u_i->v_j B'/2, u_j->v_i B'/2
//                    (z_j's node IS v_j), linear terms rewritten in x_j.
// Lower bound = const + maxflow (the roof dual).  Strong persistency: after
// the cut, x_i is labeled iff u_i and v_i end on opposite sides of the
// residual reachability split.  Labeling all such nodes (others keep any
// value) never increases the energy (autarky) — the property binary fusion
// relies on (rd_mex.cpp:55-100, dispmap_super.m:83).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct MaxFlow {
  struct Arc {
    int32_t to;
    int32_t rev;
    double cap;
  };
  int n;
  std::vector<std::vector<Arc>> g;
  std::vector<int32_t> level, iter;

  explicit MaxFlow(int n_) : n(n_), g(n_), level(n_), iter(n_) {}

  void add_arc(int from, int to, double cap, double rcap = 0.0) {
    if (cap <= 0 && rcap <= 0) return;
    Arc a{to, (int32_t)g[to].size(), cap};
    Arc b{from, (int32_t)g[from].size(), rcap};
    g[from].push_back(a);
    g[to].push_back(b);
  }

  bool bfs(int s, int t) {
    std::fill(level.begin(), level.end(), -1);
    std::queue<int> q;
    level[s] = 0;
    q.push(s);
    while (!q.empty()) {
      int v = q.front();
      q.pop();
      for (const Arc& a : g[v]) {
        if (a.cap > 1e-12 && level[a.to] < 0) {
          level[a.to] = level[v] + 1;
          q.push(a.to);
        }
      }
    }
    return level[t] >= 0;
  }

  double dfs(int v, int t, double f) {
    if (v == t) return f;
    for (int32_t& i = iter[v]; i < (int32_t)g[v].size(); i++) {
      Arc& a = g[v][i];
      if (a.cap > 1e-12 && level[v] < level[a.to]) {
        double d = dfs(a.to, t, std::min(f, a.cap));
        if (d > 0) {
          a.cap -= d;
          g[a.to][a.rev].cap += d;
          return d;
        }
      }
    }
    return 0.0;
  }

  double run(int s, int t) {
    double flow = 0.0;
    while (bfs(s, t)) {
      std::fill(iter.begin(), iter.end(), 0);
      double f;
      while ((f = dfs(s, t, 1e300)) > 0) flow += f;
    }
    return flow;
  }

  // nodes reachable from s through residual arcs
  void reachable(int s, std::vector<uint8_t>& mark) const {
    mark.assign(n, 0);
    std::vector<int> stack{s};
    mark[s] = 1;
    while (!stack.empty()) {
      int v = stack.back();
      stack.pop_back();
      for (const Arc& a : g[v]) {
        if (a.cap > 1e-12 && !mark[a.to]) {
          mark[a.to] = 1;
          stack.push_back(a.to);
        }
      }
    }
  }
};

}  // namespace

extern "C" {

// Solve the binary MRF; returns 0 on success.
// labels_out: 0/1/-1 (unlabelled).  energy_out: energy of the labeling where
// unlabelled nodes take 0 (the fusion "keep current" completion, matching
// how rd_mex's result is consumed at dispmap_super.m:83).  lb_out: roof dual.
int qpbo_solve(int n_nodes, int n_edges,
               const double* U0, const double* U1,
               const int32_t* tails, const int32_t* heads,
               const double* E00, const double* E01, const double* E10,
               const double* E11,
               int improve,  // reserved; QPBO-I not yet implemented
               int32_t* labels_out, double* energy_out, double* lb_out,
               int32_t* n_unlabelled_out) {
  (void)improve;
  const int S = 2 * n_nodes;      // source
  const int T = 2 * n_nodes + 1;  // sink
  auto U = [&](int i) { return 2 * i; };
  auto V = [&](int i) { return 2 * i + 1; };

  MaxFlow mf(2 * n_nodes + 2);
  double constant = 0.0;
  std::vector<double> lin(n_nodes, 0.0);  // coefficient of x_i

  for (int i = 0; i < n_nodes; i++) {
    constant += U0[i];
    lin[i] += U1[i] - U0[i];
  }

  for (int e = 0; e < n_edges; e++) {
    int i = tails[e], j = heads[e];
    double a = E00[e], b = E01[e], c = E10[e], d = E11[e];
    constant += a;
    double B = b + c - a - d;
    if (B >= 0) {
      // th = a + (c-a)x_i + (d-c)x_j + B(1-x_i)x_j
      lin[i] += c - a;
      lin[j] += d - c;
      if (B > 0) {
        mf.add_arc(U(i), U(j), B / 2);
        mf.add_arc(V(j), V(i), B / 2);
      }
    } else {
      // z_j = ~x_j: table (a',b',c',d') = (b, a, d, c), B' = -B > 0
      // th = a' + (c'-a')x_i + (d'-c')z_j + B'(1-x_i)z_j
      // with z_j-linear weight w rewritten: w*z_j = w - w*x_j
      double ap = b, cp = d, dp = c;
      constant += ap - a;  // the complemented table's constant is a' = b
      lin[i] += cp - ap;
      constant += dp - cp;
      lin[j] -= dp - cp;
      double Bp = -B;
      mf.add_arc(U(i), V(j), Bp / 2);
      mf.add_arc(U(j), V(i), Bp / 2);
    }
  }

  for (int i = 0; i < n_nodes; i++) {
    double w = lin[i];
    if (w >= 0) {
      if (w > 0) {
        mf.add_arc(S, U(i), w / 2);
        mf.add_arc(V(i), T, w / 2);
      }
    } else {
      constant += w;
      mf.add_arc(U(i), T, -w / 2);
      mf.add_arc(S, V(i), -w / 2);
    }
  }

  double flow = mf.run(S, T);
  *lb_out = constant + flow;

  std::vector<uint8_t> src_side;
  mf.reachable(S, src_side);

  int n_unlab = 0;
  for (int i = 0; i < n_nodes; i++) {
    bool us = src_side[U(i)] != 0;  // source side -> literal 0
    bool vs = src_side[V(i)] != 0;
    if (us && !vs) {
      labels_out[i] = 0;
    } else if (!us && vs) {
      labels_out[i] = 1;
    } else {
      labels_out[i] = -1;
      n_unlab++;
    }
  }
  *n_unlabelled_out = n_unlab;

  // energy of the labeling with unlabelled -> 0
  double E = 0.0;
  for (int i = 0; i < n_nodes; i++)
    E += labels_out[i] == 1 ? U1[i] : U0[i];
  for (int e = 0; e < n_edges; e++) {
    int xi = labels_out[tails[e]] == 1;
    int xj = labels_out[heads[e]] == 1;
    E += xi ? (xj ? E11[e] : E10[e]) : (xj ? E01[e] : E00[e]);
  }
  *energy_out = E;
  return 0;
}

}  // extern "C"
