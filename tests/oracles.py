"""Slow numpy oracles mirroring the reference's edge-list formulation.

These intentionally follow the MATLAB structure (flat 4xN assignments,
explicit ind1/ind2 directed edge lists, per-edge loops) so the dense
grid implementation in stereo_tpu can be tested against an independent
construction.  Column-major (Fortran) node numbering matches MATLAB's
``nodenr(:) = 1:N`` (dispmap_super.m:279-302).
"""

from __future__ import annotations

import numpy as np


def build_neighborhood(H: int, W: int):
    """Directed edge lists (ind1=tail, ind2=head), 0-based, column-major nodes.

    Mirrors construct_neighborhood (dispmap_super.m:279-302): vertical edges
    both directions first, then horizontal both directions.
    """
    nodenr = np.arange(H * W).reshape(W, H).T  # column-major numbering
    ind1, ind2 = [], []
    # vertical
    start = nodenr[:-1, :].flatten(order="F")
    finish = nodenr[1:, :].flatten(order="F")
    ind1 += [start, finish]
    ind2 += [finish, start]
    # horizontal
    start = nodenr[:, :-1].flatten(order="F")
    finish = nodenr[:, 1:].flatten(order="F")
    ind1 += [start, finish]
    ind2 += [finish, start]
    return np.concatenate(ind1), np.concatenate(ind2)


def points(H: int, W: int):
    """2 x N array of 1-based (x; y) coordinates, column-major order."""
    xx, yy = np.meshgrid(np.arange(1, W + 1), np.arange(1, H + 1))
    return np.stack([xx.flatten(order="F"), yy.flatten(order="F")], axis=0).astype(
        np.float64
    )


def planes_to_flat(planes):
    """[4, H, W] -> [4, N] with column-major pixel order (MATLAB linear index)."""
    p = np.asarray(planes)
    return np.stack([p[i].flatten(order="F") for i in range(4)], axis=0)


def disparity_from_assignment(assignment, pts, normalize=None):
    """-(a*x + b*y + d)/c (dispmap_super.m:318-328), optional (d_min, d_step)."""
    disps = -(assignment[0] * pts[0] + assignment[1] * pts[1] + assignment[3]) / (
        assignment[2]
    )
    if normalize is not None:
        d_min, d_step = normalize
        disps = (disps - d_min) / d_step
    return disps


def pairwise_cost(p, q, w, kernel, tol):
    if kernel == 1:
        return w * np.minimum(np.abs(p - q), tol)
    return w * np.minimum((p - q) ** 2, tol)


def edge_qs(assignment, ind1, ind2, pts, normalize=None):
    """q (head plane at head point) and qprim (tail plane at head point).

    Mirrors all_pairwise_costs (dispmap_super.m:243-244).
    """
    q = disparity_from_assignment(assignment[:, ind2], pts[:, ind2], normalize)
    qprim = disparity_from_assignment(assignment[:, ind1], pts[:, ind2], normalize)
    return q, qprim


def total_energy(unary_flat, assignment, H, W, weights_flat, kernel, tol, normalize=None):
    """Unary (per node, flat column-major) + directed-edge smoothness sum."""
    ind1, ind2 = build_neighborhood(H, W)
    pts = points(H, W)
    q, qprim = edge_qs(assignment, ind1, ind2, pts, normalize)
    E = pairwise_cost(q, qprim, weights_flat, kernel, tol)
    return float(np.sum(unary_flat) + np.sum(E))


def dense_weights_to_flat(weights_4hw):
    """[4, H, W] in-edge weight maps -> per-edge flat weights in oracle edge order.

    Oracle edge order: vertical (down-in then up-in), horizontal (right-in then
    left-in) — see build_neighborhood.  For a directed edge (tail->head), the
    dense map index is [direction of tail relative to head] at the head pixel.
    """
    w = np.asarray(weights_4hw)
    H, Wd = w.shape[1], w.shape[2]
    # DIRS order in stereo_tpu.geometry: left=(0,-1), right=(0,1), up=(-1,0), down=(1,0)
    out = []
    # vertical edges, first block: tail = upper (start), head = lower (finish):
    # at head, tail is the 'up' neighbor -> dense dir index 2, rows 1..H-1
    out.append(w[2, 1:, :].flatten(order="F"))
    # second block: tail = lower, head = upper: dense dir 'down' = 3, rows 0..H-2
    out.append(w[3, :-1, :].flatten(order="F"))
    # horizontal, first block: tail = left col, head = right col: dir 'left' = 0
    out.append(w[0, :, 1:].flatten(order="F"))
    # second block: tail = right, head = left: dir 'right' = 1
    out.append(w[1, :, :-1].flatten(order="F"))
    return np.concatenate(out)


class SequentialTRWS:
    """Sequential TRW-S oracle following minimize.cpp:31-116 structurally.

    Explicit node ordering, per-edge message vectors whose index meaning flips
    with direction, monotonic-chain gammas (treeProbabilities.cpp:12-47), LB
    accumulated on the backward pass, greedy conditioned decode
    (minimize.cpp:223-264).  Brute-force O(K^2) message updates — this is an
    oracle for tiny grids, not a solver.

    Edges: list of (tail, head, alpha, q_src[K], q_dst[K]) with potential
    V(k_t, k_h) = alpha * TR(|q_src[k_t] - q_dst[k_h]|).
    """

    def __init__(self, theta, edges, order, kernel, tol):
        self.theta = np.asarray(theta, dtype=np.float64)  # [K, N]
        self.K, self.N = self.theta.shape
        self.kernel, self.tol = kernel, tol
        self.order = list(order)
        pos = np.empty(self.N, dtype=int)
        for rank, node in enumerate(self.order):
            pos[node] = rank
        self.pos = pos
        self.edges = []
        for e in edges:
            if len(e) == 3:  # explicit table (t, h, V[k_t, k_h])
                t, h, V = e
                V = np.asarray(V, dtype=np.float64)
            else:
                t, h, alpha, qs, qd = e
                V = self._table(alpha, np.asarray(qs), np.asarray(qd))
            self.edges.append(dict(t=t, h=h, V=V, msg=np.zeros(self.K)))
        # incident edge lists
        self.inc = [[] for _ in range(self.N)]
        for eid, e in enumerate(self.edges):
            self.inc[e["t"]].append(eid)
            self.inc[e["h"]].append(eid)
        # gammas
        self.gamma = np.zeros(self.N)
        for i in range(self.N):
            nf = sum(1 for eid in self.inc[i] if self._other(eid, i) is not None
                     and pos[self._other(eid, i)] > pos[i])
            nb = len(self.inc[i]) - nf
            self.gamma[i] = 1.0 / max(nf, nb)

    def _table(self, alpha, qs, qd):
        diff = qs[:, None] - qd[None, :]
        if self.kernel == 1:
            return alpha * np.minimum(np.abs(diff), self.tol)
        return alpha * np.minimum(diff ** 2, self.tol)

    def _other(self, eid, i):
        e = self.edges[eid]
        return e["h"] if e["t"] == i else e["t"]

    def _beliefs(self, i):
        D = self.theta[:, i].copy()
        for eid in self.inc[i]:
            D += self.edges[eid]["msg"]
        return D

    def _send(self, eid, src, D):
        """UpdateMessage from node src with (already gamma-scaled) D."""
        e = self.edges[eid]
        H = D - e["msg"]
        if src == e["t"]:
            msg = (H[:, None] + e["V"]).min(axis=0)
        else:
            msg = (H[None, :] + e["V"]).min(axis=1)
        vmin = msg.min()
        e["msg"] = msg - vmin
        return vmin

    def iterate(self):
        # forward
        for i in self.order:
            D = self._beliefs(i)
            for eid in self.inc[i]:
                j = self._other(eid, i)
                if self.pos[j] > self.pos[i]:
                    self._send(eid, i, self.gamma[i] * D)
        # backward with LB
        lb = 0.0
        for i in reversed(self.order):
            D = self._beliefs(i)
            vmin = D.min()
            D -= vmin
            lb += vmin
            for eid in self.inc[i]:
                j = self._other(eid, i)
                if self.pos[j] < self.pos[i]:
                    lb += self._send(eid, i, self.gamma[i] * D)
        energy, labels = self.decode()
        return energy, lb, labels

    def decode(self):
        sol = np.zeros(self.N, dtype=int)
        E = 0.0
        for i in self.order:
            Db = self.theta[:, i].copy()
            for eid in self.inc[i]:
                j = self._other(eid, i)
                if self.pos[j] < self.pos[i]:
                    e = self.edges[eid]
                    if i == e["h"]:
                        Db += e["V"][sol[j], :]
                    else:
                        Db += e["V"][:, sol[j]]
            Di = Db.copy()
            for eid in self.inc[i]:
                j = self._other(eid, i)
                if self.pos[j] > self.pos[i]:
                    Di += self.edges[eid]["msg"]
            sol[i] = int(np.argmin(Di))
            E += Db[sol[i]]
        return E, sol


def grid_trws_inputs(rng, H, W, K, kernel=1, tol=1.0, alpha_scale=1.0):
    """Random solver inputs: theta [K,H,W], D0 [K,H,W], Q [4,K,H,W], alphas [4,H,W]."""
    theta = rng.uniform(0, 5, size=(K, H, W))
    D0 = rng.uniform(-3, 3, size=(K, H, W))
    Q = rng.uniform(-3, 3, size=(4, K, H, W))
    DIRS = ((0, -1), (0, 1), (-1, 0), (1, 0))
    alphas = np.zeros((4, H, W))
    for d, (dy, dx) in enumerate(DIRS):
        for y in range(H):
            for x in range(W):
                if 0 <= y + dy < H and 0 <= x + dx < W:
                    alphas[d, y, x] = alpha_scale * rng.uniform(0.5, 2.0)
    return theta, D0, Q, alphas


def grid_edges_for_oracle(theta, D0, Q, alphas):
    """Convert dense grid inputs to the oracle's edge list (row-major node ids)."""
    K, H, W = theta.shape
    DIRS = ((0, -1), (0, 1), (-1, 0), (1, 0))
    nid = lambda y, x: y * W + x
    edges = []
    for d, (dy, dx) in enumerate(DIRS):
        for y in range(H):
            for x in range(W):
                ny, nx = y + dy, x + dx
                if not (0 <= ny < H and 0 <= nx < W):
                    continue
                edges.append(
                    (nid(ny, nx), nid(y, x), alphas[d, y, x],
                     Q[d, :, y, x], D0[:, y, x])
                )
    theta_flat = theta.reshape(K, H * W)
    return theta_flat, edges


def bipartite_order(H, W):
    """Blacks (y+x even) in row-major order, then whites."""
    blacks, whites = [], []
    for y in range(H):
        for x in range(W):
            (blacks if (y + x) % 2 == 0 else whites).append(y * W + x)
    return blacks + whites


def edge_cost(alpha, qs, qd, kt, kh, kernel, tol):
    diff = qs[kt] - qd[kh]
    if kernel == 1:
        return alpha * min(abs(diff), tol)
    return alpha * min(diff ** 2, tol)


def labeling_energy(theta_flat, edges, lab, kernel, tol):
    E = sum(theta_flat[lab[i], i] for i in range(theta_flat.shape[1]))
    for (t, h, alpha, qs, qd) in edges:
        E += edge_cost(alpha, qs, qd, lab[t], lab[h], kernel, tol)
    return float(E)


def brute_force_min(theta_flat, edges, kernel, tol):
    """Exhaustive minimum over all K^N labelings (tiny N only)."""
    import itertools

    K, N = theta_flat.shape
    best, best_lab = np.inf, None
    for lab in itertools.product(range(K), repeat=N):
        E = labeling_energy(theta_flat, edges, lab, kernel, tol)
        if E < best:
            best, best_lab = E, lab
    return best, np.array(best_lab)
