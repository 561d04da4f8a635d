"""Scanline TRW-S vs the sequential oracle with the same ordering."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu.solvers import scanline, trws

import oracles


def scanline_order(H, W):
    nodes = [(y, x % 2, x) for y in range(H) for x in range(W)]
    nodes.sort()
    return [y * W + x for (y, p, x) in nodes]


def trace(theta, D0, Q, alphas, kernel, tol, n_iters):
    out = []
    msgs = None
    for _ in range(n_iters):
        res = scanline.solve_scanline(
            jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q),
            jnp.asarray(alphas), kernel=kernel, tol=tol, maxiter=1,
            max_relgap=0.0, messages=msgs,
        )
        msgs = res.messages
        out.append((float(res.energy), float(res.lower_bound)))
    return out


@pytest.mark.parametrize("kernel", [1, 2])
@pytest.mark.parametrize("seed,H,W,K", [(0, 4, 5, 3), (1, 3, 6, 4), (2, 5, 4, 2)])
def test_matches_sequential_oracle(kernel, seed, H, W, K):
    rng = np.random.default_rng(seed)
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K, kernel=kernel)
    tol = 1.0
    theta_flat, edges = oracles.grid_edges_for_oracle(theta, D0, Q, alphas)
    oracle = oracles.SequentialTRWS(theta_flat, edges, scanline_order(H, W),
                                    kernel, tol)
    tr = trace(theta, D0, Q, alphas, kernel, tol, 4)
    for it in range(4):
        oE, oLB, _ = oracle.iterate()
        dE, dLB = tr[it]
        assert dLB == pytest.approx(oLB, rel=1e-10, abs=1e-9), f"iter {it}"
        assert dE == pytest.approx(oE, rel=1e-10, abs=1e-9), f"iter {it}"


def test_converges_faster_than_checkerboard():
    """On a smooth problem with long-range structure, the scanline bound
    should beat the checkerboard bound at an equal sweep budget."""
    rng = np.random.default_rng(5)
    H, W, K = 12, 40, 4
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K,
                                                    alpha_scale=4.0)
    tol = 2.0
    args = tuple(jnp.asarray(x) for x in (theta, D0, Q, alphas))
    sweeps = 10
    cb = trws.solve(*args, kernel=1, tol=tol, maxiter=sweeps, max_relgap=0.0)
    sl = scanline.solve_scanline(*args, kernel=1, tol=tol, maxiter=sweeps,
                                 max_relgap=0.0)
    assert float(sl.lower_bound) >= float(cb.lower_bound) - 1e-6
    assert float(sl.lower_bound) <= float(sl.energy) + 1e-9
