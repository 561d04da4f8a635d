"""Checkerboard TRW-S / BP over *explicit pairwise tables*.

The vgg_trw_bp equivalent (imrender/vgg/vgg_trw_bp.m + the stock MRFEnergy
edge types instantiated in cpp/trw-s/instances.h: typeGeneral, typePotts,
typeTruncatedLinear, typeTruncatedQuadratic): instead of the stereo papers'
continuous-position potential family, each directed edge E(p, d) carries an
explicit K x K cost table V[d, k_tail, k_head, p].  Tables may be shared —
any shape broadcastable to [4, K, K, H, W] works (e.g. [1, K, K, 1, 1] for a
single homogeneous potential), so Potts and index-distance kernels cost no
per-pixel memory.

Same bipartite ordering, gammas, lower-bound bookkeeping, stopping rule and
decode as solvers/trws.py — only the message min-plus differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_tpu import geometry
from stereo_tpu.geometry import NUM_DIRS, OPP
from stereo_tpu.solvers.trws import (
    TRWSResult, _node_beliefs, checkerboard, node_gamma,
)


def potts_table(K: int, lam, dtype=jnp.float32) -> jax.Array:
    """lam * [k_i != k_j] (typePotts)."""
    eye = jnp.eye(K, dtype=dtype)
    return (lam * (1.0 - eye))[None, :, :, None, None]


def truncated_linear_table(K: int, alpha, tol, dtype=jnp.float32) -> jax.Array:
    """alpha * min(|k_i - k_j|, tol) (typeTruncatedLinear)."""
    ks = jnp.arange(K, dtype=dtype)
    t = alpha * jnp.minimum(jnp.abs(ks[:, None] - ks[None, :]), tol)
    return t[None, :, :, None, None]


def truncated_quadratic_table(K: int, alpha, tol, dtype=jnp.float32) -> jax.Array:
    """alpha * min((k_i - k_j)^2, tol) (typeTruncatedQuadratic)."""
    ks = jnp.arange(K, dtype=dtype)
    t = alpha * jnp.minimum((ks[:, None] - ks[None, :]) ** 2, tol)
    return t[None, :, :, None, None]


def _table_at(tables, d):
    """Direction-d table view, broadcast-compatible with [K, K, H, W]."""
    if tables.shape[0] == 1:
        return tables[0]
    return tables[d]


def _minplus_tables(H_src, T, source_is_tail: bool):
    """msg over the other endpoint's labels given a table T [K,K,...].

    source_is_tail: T indexed [k_tail, k_head]; reduce over the source axis.
    H_src: [K, H, W]."""
    K = H_src.shape[0]
    reduce_axis = 0 if source_is_tail else 1
    out = []
    for k in range(K):
        Tk = T[:, k] if source_is_tail else T[k, :]
        out.append(jnp.min(H_src + Tk, axis=0))
    return jnp.stack(out, axis=0)


def solve_tables(
    unary: jax.Array,  # [K, H, W]
    tables: jax.Array,  # broadcastable to [4, K, K, H, W]; [d, k_tail, k_head]
    *,
    maxiter: int = 100,
    max_relgap: float = 1e-4,
    mode: str = "trws",
    messages: jax.Array | None = None,
) -> TRWSResult:
    """TRW-S (or BP) with explicit tables; contract mirrors trws.solve."""
    K, H, W = unary.shape
    dtype = unary.dtype
    theta = unary
    cb = checkerboard(H, W)
    gamma = (jnp.ones((H, W), dtype) if mode == "bp"
             else node_gamma(H, W, dtype))
    valid = jnp.stack(
        [geometry.valid_mask(H, W, d, dtype=dtype) for d in range(NUM_DIRS)], 0
    )
    acc_t = jnp.promote_types(dtype, jnp.float32)

    if messages is None:
        messages = jnp.zeros((NUM_DIRS, K, H, W), dtype)

    def phase(M, color, accumulate_lb):
        Dall = _node_beliefs(theta, M)
        phase_mask = cb == color
        lb_nodes = jnp.zeros((), acc_t)
        if accumulate_lb:
            vminD = jnp.min(Dall, axis=0)
            Dall = Dall - vminD[None]
            lb_nodes = jnp.sum(jnp.where(phase_mask, vminD, 0.0), dtype=acc_t)
        gD = gamma[None] * Dall

        newM = []
        lb_msgs = jnp.zeros((), acc_t)
        for d in range(NUM_DIRS):
            T = _table_at(tables, d)
            H_A = geometry.shift_from_neighbor(gD, d, fill=0.0) - M[d]
            msgA = _minplus_tables(H_A, T, source_is_tail=True)
            H_B = gD - M[d]
            msgB = _minplus_tables(H_B, T, source_is_tail=False)
            msg = jnp.where(phase_mask[None], msgB, msgA)
            vmin = jnp.min(msg, axis=0)
            msg = (msg - vmin[None]) * valid[d][None]
            newM.append(msg)
            if accumulate_lb:
                lb_msgs = lb_msgs + jnp.sum(
                    jnp.where(valid[d] > 0, vmin, 0.0), dtype=acc_t
                )
        return jnp.stack(newM, 0), lb_nodes, lb_msgs

    def decode(M):
        D_black = _node_beliefs(theta, M)
        sol_black = jnp.argmin(D_black, axis=0).astype(jnp.int32)
        cost = theta
        for d in range(NUM_DIRS):
            sol_n = geometry.shift_from_neighbor(sol_black, d, fill=0)
            Tb = jnp.broadcast_to(_table_at(tables, d), (K, K, H, W))
            # in-edge E(p, d): V_d(sol_n, k_p) * valid
            col = geometry.take_plane(
                Tb, jnp.broadcast_to(sol_n[None], (K, H, W))
            )  # [K, H, W] over k_head
            cost = cost + valid[d][None] * col
            # out-edge E(n, OPP(d)) at the neighbor n = p + DIRS[d]:
            # V_{OPP(d)}(k_p, sol_n) evaluated at n, brought to p
            Tb_opp = jnp.broadcast_to(_table_at(tables, OPP[d]), (K, K, H, W))
            row_t = geometry.take_plane(
                jnp.swapaxes(Tb_opp, 0, 1),
                jnp.broadcast_to(sol_black[None], (K, H, W)),
            )  # [K, H, W] over k_tail
            cost = cost + geometry.shift_from_neighbor(
                valid[OPP[d]][None] * row_t, d, fill=0.0
            )
        sol_white = jnp.argmin(cost, axis=0).astype(jnp.int32)
        labels = jnp.where(cb == 0, sol_black, sol_white)

        # exact energy of the labeling
        u = geometry.take_plane(theta, labels)
        E = jnp.sum(u, dtype=acc_t)
        for d in range(NUM_DIRS):
            T = jnp.broadcast_to(_table_at(tables, d), (K, K, H, W))
            sol_n = geometry.shift_from_neighbor(labels, d, fill=0)
            v1 = geometry.take_plane(
                T, jnp.broadcast_to(sol_n[None], (K, H, W)))
            v2 = geometry.take_plane(v1, labels)
            E = E + jnp.sum(valid[d] * v2, dtype=acc_t)
        return labels, E

    accumulate = mode == "trws"

    def one_iteration(M):
        M, _, _ = phase(M, 0, False)
        M, lb_n, lb_m = phase(M, 1, accumulate)
        if accumulate:
            D_black = _node_beliefs(theta, M)
            lb = lb_n + lb_m + jnp.sum(
                jnp.where(cb == 0, jnp.min(D_black, axis=0), 0.0), dtype=acc_t
            )
        else:
            lb = jnp.zeros((), acc_t)
        labels, energy = decode(M)
        return M, energy, lb, labels

    def cond(state):
        M, it, energy, lb, labels = state
        relgap = jnp.where(energy != 0, (energy - lb) / energy, 0.0)
        return jnp.logical_and(
            it < maxiter, jnp.logical_or(it == 0, relgap >= max_relgap)
        )

    def body(state):
        M, it, _, _, _ = state
        M, energy, lb, labels = one_iteration(M)
        return (M, it + 1, energy, lb, labels)

    zero = jnp.zeros((), acc_t)
    state0 = (messages, jnp.zeros((), jnp.int32), zero, zero,
              jnp.zeros((H, W), jnp.int32))
    M, iters, energy, lb, labels = jax.lax.while_loop(cond, body, state0)
    return TRWSResult(labels, energy, lb, iters, M)
