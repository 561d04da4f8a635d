"""Wavefront (anti-diagonal) TRW-S: the reference's *raster ordering*, exactly,
data-parallel on TPU.

The host/reference serial TRW-S (cpp/trw-s/minimize.cpp:31-116) processes
pixels in raster order; its monotonic chains span whole rows *and* whole
columns, so the lower bound converges in a few hundred sweeps where the
checkerboard ordering (solvers/trws.py) — whose chains are single edges —
needs tens of thousands (see tools/race_report_r2_baseline.json).

Key observation: under raster order, pixel (y, x) depends only on (y, x-1)
and (y-1, x) — both on the previous anti-diagonal t-1 = y+x-1.  Two pixels on
the same anti-diagonal share no read/write buffers:

  (y, x) writes the in-buffers  M[LT] at (y, x+1)  and  M[UP] at (y+1, x)
  (both on diagonal t+1) plus its own M[RT]/M[DN]; the other diagonal-t pixel
  that touches (y, x+1) is (y-1, x+1), which writes M[UP] there — a different
  buffer.

So sweeping diagonals t = 0..H+W-2 with all of diagonal t updated in parallel
is *bitwise* the sequential raster sweep — the classic wavefront
parallelization of a scan.  This module implements it on *skewed* arrays
(S[y, t] = A[y, t-y], anti-diagonals become columns) with a `lax.scan` over
columns; every step is dense [K, H] work.  Exactness is pinned against
tests/oracles.SequentialTRWS with the raster order (tests/test_wavefront.py).

Message/edge conventions match solvers/trws.py: buffer M[d][k, y, x] holds the
message on edge E(p, d) = (tail = p + DIRS[d] -> head p), stored at the head;
potential V(k_t, k_h) = alpha_e * TR(|Q[d][k_t] - D0[k_h]|) with Q/D0/alpha
evaluated at the head pixel.  gamma(p) = 1/max(nFwd, nBwd)
(treeProbabilities.cpp:12-47): under raster order nFwd = 2·#(later nbrs),
nBwd = 2·#(earlier nbrs).

A fused Pallas kernel with the same semantics lives in
stereo_tpu/ops/wavefront_kernel.py; this file is its oracle and CPU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from stereo_tpu import geometry
from stereo_tpu.energy import truncated_kernel
from stereo_tpu.solvers.trws import TRWSResult

LT, RT, UP, DN = 0, 1, 2, 3


# ------------------------------------------------------------------ skewing
def skew(a: jax.Array, W: int) -> jax.Array:
    """[..., H, W] -> [..., H, T]: S[..., y, t] = A[..., y, t - y], zero
    where t - y is outside [0, W)."""
    H = a.shape[-2]
    T = H + W - 1
    y = jnp.arange(H)[:, None]
    t = jnp.arange(T)[None, :]
    x = t - y
    valid = (x >= 0) & (x < W)
    idx = jnp.clip(x, 0, W - 1)
    idx_b = jnp.broadcast_to(idx, a.shape[:-1] + (T,))
    out = jnp.take_along_axis(a, idx_b, axis=-1)
    return jnp.where(valid, out, jnp.zeros((), a.dtype))


def unskew(s: jax.Array, W: int) -> jax.Array:
    """Inverse of skew: [..., H, T] -> [..., H, W]."""
    H = s.shape[-2]
    y = jnp.arange(H)[:, None]
    x = jnp.arange(W)[None, :]
    idx = jnp.broadcast_to(x + y, s.shape[:-1] + (W,))
    return jnp.take_along_axis(s, idx, axis=-1)


def raster_gamma(H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """gamma = 1/max(nFwd, nBwd) under raster order. [H, W]."""
    ys = jnp.arange(H)[:, None] * jnp.ones((1, W), jnp.int32)
    xs = jnp.arange(W)[None, :] * jnp.ones((H, 1), jnp.int32)
    has_l = (xs >= 1).astype(dtype)
    has_r = (xs <= W - 2).astype(dtype)
    has_u = (ys >= 1).astype(dtype)
    has_d = (ys <= H - 2).astype(dtype)
    n_fwd = 2.0 * (has_r + has_d)
    n_bwd = 2.0 * (has_l + has_u)
    return 1.0 / jnp.maximum(jnp.maximum(n_fwd, n_bwd), 1.0)


# ---------------------------------------------------------- message updates
def _send_head(gD, Mold, Q, D0, alpha, kernel, tol):
    """Head-send: msg'[k_t] = min_{k_h}(gD[k_h] - Mold[k_h] + a·TR(Q[k_t]-D0[k_h])).

    gD/Mold/Q/D0: [K, H]; alpha: [H].  Returns (normalized msg, vmin)."""
    K = Q.shape[0]
    Hs = gD - Mold
    acc = None
    for j in range(K):
        t = Hs[j][None, :] + alpha[None, :] * truncated_kernel(
            Q - D0[j][None, :], kernel, tol)
        acc = t if acc is None else jnp.minimum(acc, t)
    vmin = jnp.min(acc, axis=0)
    return acc - vmin[None, :], vmin


def _send_tail(gD_tail, Mold, Q, D0, alpha, kernel, tol):
    """Tail-send: msg'[k_h] = min_{k_t}(gD_tail[k_t] - Mold[k_t] + a·TR(Q[k_t]-D0[k_h]))."""
    K = Q.shape[0]
    Hs = gD_tail - Mold
    out = []
    for j in range(K):
        t = Hs + alpha[None, :] * truncated_kernel(Q - D0[j][None, :],
                                                   kernel, tol)
        out.append(jnp.min(t, axis=0))
    msg = jnp.stack(out, axis=0)
    vmin = jnp.min(msg, axis=0)
    return msg - vmin[None, :], vmin


def _shift_down(v):
    """v[..., y] -> v[..., y-1] (row y reads row y-1), zero at y=0."""
    pads = [(0, 0)] * (v.ndim - 1) + [(1, 0)]
    return jnp.pad(v, pads)[..., :-1]


def _shift_up(v):
    """v[..., y] -> v[..., y+1], zero at y=H-1."""
    pads = [(0, 0)] * (v.ndim - 1) + [(0, 1)]
    return jnp.pad(v, pads)[..., 1:]


class _Skewed:
    """Skewed, column-padded problem data (one zero column each side)."""

    def __init__(self, theta, D0, Q, alphas, kernel, tol):
        K, H, W = theta.shape
        dtype = theta.dtype
        self.K, self.H, self.W = K, H, W
        self.T = H + W - 1
        self.kernel, self.tol = kernel, tol
        pad = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(1, 1)])
        sk = lambda a: pad(skew(a, W))
        self.theta = sk(theta)  # [K, H, T+2]
        self.D0 = sk(D0)
        self.Q = sk(Q)  # [4, K, H, T+2]
        self.alphas = sk(alphas)  # [4, H, T+2]
        valid = jnp.stack(
            [geometry.valid_mask(H, W, d, dtype=dtype) for d in range(4)], 0)
        self.vmask = sk(valid)  # [4, H, T+2]
        y = jnp.arange(H)[:, None]
        t = jnp.arange(self.T)[None, :]
        x = t - y
        self.pix = pad(((x >= 0) & (x < W)).astype(dtype))  # [H, T+2]
        self.gamma = sk(raster_gamma(H, W, dtype))  # [H, T+2]

    def col(self, a, c):
        return lax.dynamic_index_in_dim(a, c, axis=-1, keepdims=False)


def _beliefs_col(sk: _Skewed, M, c):
    """Beliefs of padded column c: theta + all 8 incident buffers. [K, H]."""
    D = sk.col(sk.theta, c)
    for d in range(4):
        D = D + sk.col(M[d], c)  # in-buffers at p
    # out-buffers at the neighbors (masked by neighbor existence = vmask of
    # the *stored* edge at the neighbor, which is zero-kept by construction)
    D = D + sk.col(M[RT], c - 1)                 # left nbr's E(l, RT), tail p
    D = D + _shift_down(sk.col(M[DN], c - 1))    # up nbr's E(u, DN), tail p
    D = D + sk.col(M[LT], c + 1)                 # right nbr's E(r, LT), tail p
    D = D + _shift_up(sk.col(M[UP], c + 1))      # down nbr's E(d, UP), tail p
    return D


def _set_col(M, d, c, value):
    return M[:d] + (lax.dynamic_update_index_in_dim(M[d], value, c, axis=-1),
                    ) + M[d + 1:]


def solve_wavefront(
    unary: jax.Array,  # [K, H, W]
    positions: jax.Array,  # D0 [K, H, W]
    nbr_positions: jax.Array,  # Q [4, K, H, W]
    alphas: jax.Array,  # [4, H, W]
    *,
    kernel: int,
    tol,
    maxiter: int = 1000,
    max_relgap: float = 1e-4,
    messages: jax.Array | None = None,  # [4, K, H, W] warm start
    check_every: int = 1,
    use_pallas: bool | None = None,
) -> TRWSResult:
    """Raster-order TRW-S via anti-diagonal wavefronts; drop-in for trws.solve.

    With use_pallas (auto on TPU) the per-sweep scan runs as the fused kernel
    of ops/wavefront_kernel; otherwise as a lax.scan over skewed columns.
    """
    K, H, W = unary.shape
    dtype = unary.dtype
    sk = _Skewed(unary, positions, nbr_positions, alphas, kernel, tol)
    T = sk.T
    acc_t = jnp.promote_types(dtype, jnp.float32)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if messages is None:
        messages = jnp.zeros((4, K, H, W), dtype)
    Mp = jnp.pad(skew(messages, W), [(0, 0), (0, 0), (0, 0), (1, 1)])
    M0 = (Mp[0], Mp[1], Mp[2], Mp[3])

    ktol = (kernel, tol)

    def fwd_col(M, t):
        c = t + 1  # padded column index
        D = _beliefs_col(sk, M, c)
        gD = sk.col(sk.gamma, c)[None, :] * D

        Qc = [sk.col(sk.Q[d], c) for d in range(4)]
        D0c = sk.col(sk.D0, c)
        ac = [sk.col(sk.alphas[d], c) for d in range(4)]
        vc = [sk.col(sk.vmask[d], c) for d in range(4)]

        # E(p, RT)/E(p, DN): head-sends at this column
        mRT, _ = _send_head(gD, sk.col(M[RT], c), Qc[RT], D0c, ac[RT], *ktol)
        newRT = jnp.where(vc[RT][None, :] > 0, mRT, sk.col(M[RT], c))
        mDN, _ = _send_head(gD, sk.col(M[DN], c), Qc[DN], D0c, ac[DN], *ktol)
        newDN = jnp.where(vc[DN][None, :] > 0, mDN, sk.col(M[DN], c))
        M = _set_col(M, RT, c, newRT)
        M = _set_col(M, DN, c, newDN)

        # E(rn, LT): tail-send into the right neighbor (same skew row, col c+1)
        Qn = sk.col(sk.Q[LT], c + 1)
        D0n = sk.col(sk.D0, c + 1)
        an = sk.col(sk.alphas[LT], c + 1)
        vn = sk.col(sk.vmask[LT], c + 1)
        mLT, _ = _send_tail(gD, sk.col(M[LT], c + 1), Qn, D0n, an, *ktol)
        newLT = jnp.where(vn[None, :] > 0, mLT, sk.col(M[LT], c + 1))
        M = _set_col(M, LT, c + 1, newLT)

        # E(dn, UP): tail-send into the down neighbor (skew row y+1, col c+1)
        Qn = sk.col(sk.Q[UP], c + 1)
        D0n = sk.col(sk.D0, c + 1)
        an = sk.col(sk.alphas[UP], c + 1)
        vn = sk.col(sk.vmask[UP], c + 1)
        mUP, _ = _send_tail(_shift_down(gD), sk.col(M[UP], c + 1), Qn, D0n,
                            an, *ktol)
        newUP = jnp.where(vn[None, :] > 0, mUP, sk.col(M[UP], c + 1))
        M = _set_col(M, UP, c + 1, newUP)
        return M, None

    def bwd_col(M, t):
        c = t + 1
        D = _beliefs_col(sk, M, c)
        pixc = sk.col(sk.pix, c)
        vminD = jnp.min(D, axis=0)
        lb = jnp.sum(jnp.where(pixc > 0, vminD, 0.0), dtype=acc_t)
        gD = sk.col(sk.gamma, c)[None, :] * (D - vminD[None, :])

        Qc = [sk.col(sk.Q[d], c) for d in range(4)]
        D0c = sk.col(sk.D0, c)
        ac = [sk.col(sk.alphas[d], c) for d in range(4)]
        vc = [sk.col(sk.vmask[d], c) for d in range(4)]

        # E(p, LT)/E(p, UP): head-sends at this column (earlier endpoints)
        mLT, vminL = _send_head(gD, sk.col(M[LT], c), Qc[LT], D0c, ac[LT],
                                *ktol)
        newLT = jnp.where(vc[LT][None, :] > 0, mLT, sk.col(M[LT], c))
        lb += jnp.sum(jnp.where(vc[LT] > 0, vminL, 0.0), dtype=acc_t)
        mUP, vminU = _send_head(gD, sk.col(M[UP], c), Qc[UP], D0c, ac[UP],
                                *ktol)
        newUP = jnp.where(vc[UP][None, :] > 0, mUP, sk.col(M[UP], c))
        lb += jnp.sum(jnp.where(vc[UP] > 0, vminU, 0.0), dtype=acc_t)
        M = _set_col(M, LT, c, newLT)
        M = _set_col(M, UP, c, newUP)

        # E(ln, RT): tail-send into the left neighbor (same row, col c-1)
        Qn = sk.col(sk.Q[RT], c - 1)
        D0n = sk.col(sk.D0, c - 1)
        an = sk.col(sk.alphas[RT], c - 1)
        vn = sk.col(sk.vmask[RT], c - 1)
        mRT, vminR = _send_tail(gD, sk.col(M[RT], c - 1), Qn, D0n, an, *ktol)
        newRT = jnp.where(vn[None, :] > 0, mRT, sk.col(M[RT], c - 1))
        lb += jnp.sum(jnp.where(vn > 0, vminR, 0.0), dtype=acc_t)
        M = _set_col(M, RT, c - 1, newRT)

        # E(un, DN): tail-send into the up neighbor (skew row y-1, col c-1)
        Qn = sk.col(sk.Q[DN], c - 1)
        D0n = sk.col(sk.D0, c - 1)
        an = sk.col(sk.alphas[DN], c - 1)
        vn = sk.col(sk.vmask[DN], c - 1)
        mDN, vminD2 = _send_tail(_shift_up(gD), sk.col(M[DN], c - 1), Qn, D0n,
                                 an, *ktol)
        newDN = jnp.where(vn[None, :] > 0, mDN, sk.col(M[DN], c - 1))
        lb += jnp.sum(jnp.where(vn > 0, vminD2, 0.0), dtype=acc_t)
        M = _set_col(M, DN, c - 1, newDN)
        return M, lb

    def decode(M):
        """Greedy conditioned decode in raster order + exact energy."""

        def step(carry, t):
            sol_prev, E = carry  # sol of padded column c-1, [H] int32
            c = t + 1
            th = sk.col(sk.theta, c)
            D0c = sk.col(sk.D0, c)
            pixc = sk.col(sk.pix, c)

            # conditioned terms from earlier neighbors (left, up)
            sol_l = sol_prev  # left nbr shares the skew row
            sol_u = _shift_down(sol_prev)  # up nbr is skew row y-1
            Db = th
            # E(p, LT): V[sol_l, k_p] at p
            Q_sel = jnp.take_along_axis(
                sk.col(sk.Q[LT], c), sol_l[None, :], axis=0)[0]
            Db = Db + sk.col(sk.alphas[LT], c)[None, :] * truncated_kernel(
                Q_sel[None, :] - D0c, kernel, tol) * (
                    sk.col(sk.vmask[LT], c)[None, :])
            # E(p, UP): V[sol_u, k_p] at p
            Q_sel = jnp.take_along_axis(
                sk.col(sk.Q[UP], c), sol_u[None, :], axis=0)[0]
            Db = Db + sk.col(sk.alphas[UP], c)[None, :] * truncated_kernel(
                Q_sel[None, :] - D0c, kernel, tol) * (
                    sk.col(sk.vmask[UP], c)[None, :])
            # E(ln, RT): V[k_p, sol_l] at the left neighbor (col c-1)
            D0_sel = jnp.take_along_axis(
                sk.col(sk.D0, c - 1), sol_l[None, :], axis=0)[0]
            tterm = sk.col(sk.alphas[RT], c - 1)[None, :] * truncated_kernel(
                sk.col(sk.Q[RT], c - 1) - D0_sel[None, :], kernel, tol) * (
                    sk.col(sk.vmask[RT], c - 1)[None, :])
            Db = Db + tterm
            # E(un, DN): V[k_p, sol_u] at the up neighbor — evaluate at the
            # neighbor's own skew row (y-1) of column c-1, where sol_prev
            # already holds its label, then shift down to row y.
            Q_un = sk.col(sk.Q[DN], c - 1)
            a_un = sk.col(sk.alphas[DN], c - 1)
            v_un = sk.col(sk.vmask[DN], c - 1)
            D0_un_sel = jnp.take_along_axis(
                sk.col(sk.D0, c - 1), sol_prev[None, :], axis=0)[0]
            t_un = a_un[None, :] * truncated_kernel(
                Q_un - D0_un_sel[None, :], kernel, tol) * v_un[None, :]
            Db = Db + _shift_down(t_un)

            # forward messages on later edges
            Di = Db + sk.col(M[RT], c) + sk.col(M[DN], c)
            Di = Di + sk.col(M[LT], c + 1) + _shift_up(sk.col(M[UP], c + 1))

            sol = jnp.argmin(Di, axis=0).astype(jnp.int32)
            E = E + jnp.sum(
                jnp.where(pixc > 0,
                          jnp.take_along_axis(Db, sol[None, :], axis=0)[0],
                          0.0), dtype=acc_t)
            return (sol, E), sol

        (last, E), sols = lax.scan(
            step, (jnp.zeros((H,), jnp.int32), jnp.zeros((), acc_t)),
            jnp.arange(T))
        # sols: [T, H] — column t holds labels of padded col t+1
        sols_sk = jnp.moveaxis(sols, 0, -1)  # [H, T]
        labels = unskew(sols_sk, W)
        return labels, E

    if use_pallas:
        from stereo_tpu.ops import wavefront_kernel as wfk

        sweep_fn = wfk.make_sweep(sk, M0)
    else:
        sweep_fn = None

    def sweep(M, _):
        if sweep_fn is not None:
            return sweep_fn(M)
        M, _ = lax.scan(fwd_col, M, jnp.arange(T))
        M, lbs = lax.scan(bwd_col, M, jnp.arange(T - 1, -1, -1))
        return M, jnp.sum(lbs, dtype=acc_t)

    def one_check(M):
        M, lbs = lax.scan(sweep, M, jnp.arange(check_every))
        lb = lbs[-1]
        labels, energy = decode(M)
        return M, energy, lb, labels

    def cond(state):
        M, it, energy, lb, labels = state
        relgap = jnp.where(energy != 0, (energy - lb) / energy, 0.0)
        return jnp.logical_and(
            it < maxiter, jnp.logical_or(it == 0, relgap >= max_relgap))

    def body(state):
        M, it, _, _, _ = state
        M, energy, lb, labels = one_check(M)
        return (M, it + check_every, energy, lb, labels)

    zero = jnp.zeros((), acc_t)
    state0 = (M0, jnp.zeros((), jnp.int32), zero, zero,
              jnp.zeros((H, W), jnp.int32))
    M, iters, energy, lb, labels = lax.while_loop(cond, body, state0)
    Mout = jnp.stack(M, axis=0)[:, :, :, 1:-1]  # drop pad cols
    return TRWSResult(labels, energy, lb, iters,
                      unskew(Mout, W))
