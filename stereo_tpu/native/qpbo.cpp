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

// Iterative Tarjan SCC over the residual graph restricted to a node subset.
// comp[v] = component id in *finalization order* (an SCC is numbered only
// once all its successors are numbered, so every residual arc goes from a
// higher or equal comp id to a lower or equal one).
struct SCC {
  const MaxFlow& mf;
  const std::vector<uint8_t>& active;
  std::vector<int32_t> comp, low, num, stack_;
  std::vector<uint8_t> on_stack;
  int32_t counter = 0, ncomp = 0;

  SCC(const MaxFlow& m, const std::vector<uint8_t>& act)
      : mf(m), active(act), comp(m.n, -1), low(m.n, 0), num(m.n, -1),
        on_stack(m.n, 0) {}

  void run() {
    for (int v = 0; v < mf.n; v++)
      if (active[v] && num[v] < 0) iterate(v);
  }

  void iterate(int root) {
    // explicit stack of (node, arc index)
    std::vector<std::pair<int32_t, int32_t>> call;
    call.push_back({root, 0});
    num[root] = low[root] = counter++;
    stack_.push_back(root);
    on_stack[root] = 1;
    while (!call.empty()) {
      auto& [v, ai] = call.back();
      if (ai < (int32_t)mf.g[v].size()) {
        const MaxFlow::Arc& a = mf.g[v][ai++];
        int w = a.to;
        if (a.cap <= 1e-12 || !active[w]) continue;
        if (num[w] < 0) {
          num[w] = low[w] = counter++;
          stack_.push_back(w);
          on_stack[w] = 1;
          call.push_back({w, 0});
        } else if (on_stack[w]) {
          low[v] = std::min(low[v], num[w]);
        }
      } else {
        if (low[v] == num[v]) {
          int32_t c = ncomp++;
          while (true) {
            int w = stack_.back();
            stack_.pop_back();
            on_stack[w] = 0;
            comp[w] = c;
            if (w == v) break;
          }
        }
        int32_t lv = low[v];
        call.pop_back();
        if (!call.empty())
          low[call.back().first] = std::min(low[call.back().first], lv);
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
               int improve,  // bit 0: QPBO-I (reserved); bit 1: skip weak
                             // persistency extension
               int32_t* labels_out, double* energy_out, double* lb_out,
               int32_t* n_unlabelled_out) {
  const bool use_weak = (improve & 2) == 0;
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

  // Weak persistency (the ComputeWeakPersistencies equivalent,
  // QPBO_postprocessing.cpp:11): on the residual graph restricted to
  // still-unlabeled literal nodes, condense strongly connected components;
  // a variable whose two literals land in *different* components takes the
  // label dictated by the condensation's topological order (the mate
  // symmetry of the network makes this assignment consistent and
  // non-increasing).  Variables whose literals share a component stay
  // unlabeled.
  if (use_weak && n_unlab > 0) {
    // all inner (literal) nodes participate — labeled nodes transit
    // implications; only unlabeled variables receive new labels
    std::vector<uint8_t> active(mf.n, 1);
    active[S] = 0;
    active[T] = 0;
    SCC scc(mf, active);
    scc.run();
    n_unlab = 0;
    for (int i = 0; i < n_nodes; i++) {
      if (labels_out[i] >= 0) continue;
      int32_t cu = scc.comp[U(i)], cv = scc.comp[V(i)];
      if (cu == cv || cu < 0 || cv < 0) {
        n_unlab++;
        continue;
      }
      // comp ids are in finalization (reverse-topological) order: the
      // component finalized first is downstream of every residual
      // implication; putting its literals at 1 satisfies all implications.
      labels_out[i] = (cu < cv) ? 0 : 1;
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
