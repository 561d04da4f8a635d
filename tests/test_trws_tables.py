"""General-table TRW-S/BP vs the sequential oracle and known potentials."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu.solvers import trws, trws_tables

import oracles


def grid_table_edges(tables, H, W):
    """Dense per-direction tables -> oracle edge list (explicit V matrices)."""
    K = tables.shape[1]
    Tb = np.broadcast_to(np.asarray(tables), (4, K, K, H, W))
    DIRS = ((0, -1), (0, 1), (-1, 0), (1, 0))
    nid = lambda y, x: y * W + x
    edges = []
    for d, (dy, dx) in enumerate(DIRS):
        for y in range(H):
            for x in range(W):
                ny, nx = y + dy, x + dx
                if 0 <= ny < H and 0 <= nx < W:
                    edges.append((nid(ny, nx), nid(y, x), Tb[d, :, :, y, x]))
    return edges


@pytest.mark.parametrize("seed", [0, 1])
def test_random_tables_match_oracle(seed):
    rng = np.random.default_rng(seed)
    H, W, K = 4, 5, 3
    theta = rng.uniform(0, 4, (K, H, W))
    tables = rng.uniform(0, 2, (4, K, K, H, W))

    oracle = oracles.SequentialTRWS(
        theta.reshape(K, -1), grid_table_edges(tables, H, W),
        oracles.bipartite_order(H, W), 1, 1.0,
    )
    msgs = None
    for it in range(4):
        oE, oLB, _ = oracle.iterate()
        res = trws_tables.solve_tables(
            jnp.asarray(theta), jnp.asarray(tables), maxiter=1,
            max_relgap=0.0, messages=msgs,
        )
        msgs = res.messages
        assert float(res.lower_bound) == pytest.approx(oLB, rel=1e-9, abs=1e-9)
        assert float(res.energy) == pytest.approx(oE, rel=1e-9, abs=1e-9)


def test_potts_smooths_noisy_unaries():
    rng = np.random.default_rng(2)
    H, W, K = 10, 12, 4
    gt = (np.arange(W)[None, :] * K // W) * np.ones((H, 1), int)
    theta = rng.uniform(0, 1, (K, H, W))
    for k in range(K):
        theta[k] += 2.0 * (gt != k)
    res = trws_tables.solve_tables(
        jnp.asarray(theta), trws_tables.potts_table(K, 1.0, jnp.float64),
        maxiter=60, max_relgap=0.0,
    )
    assert (np.asarray(res.labels) == gt).mean() > 0.9
    assert float(res.lower_bound) <= float(res.energy) + 1e-9


def test_index_kernel_matches_position_solver():
    """Truncated-linear-on-index tables == the stereo solver with integer
    positions q[k] = k."""
    rng = np.random.default_rng(3)
    H, W, K = 5, 6, 4
    theta = rng.uniform(0, 4, (K, H, W))
    alpha, tol = 1.3, 2.0
    # stereo-form inputs with positions = label index, uniform weights
    D0 = np.tile(np.arange(K, dtype=float)[:, None, None], (1, H, W))
    Q = np.tile(D0[None], (4, 1, 1, 1))
    from stereo_tpu import energy as energy_mod

    w = np.asarray(energy_mod.default_weights(H, W, dtype=jnp.float64)) * alpha
    pos = trws.solve(jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q),
                     jnp.asarray(w), kernel=1, tol=tol, maxiter=8,
                     max_relgap=0.0)
    tab = trws_tables.solve_tables(
        jnp.asarray(theta),
        trws_tables.truncated_linear_table(K, alpha, tol, jnp.float64),
        maxiter=8, max_relgap=0.0,
    )
    assert float(tab.energy) == pytest.approx(float(pos.energy), rel=1e-10)
    assert float(tab.lower_bound) == pytest.approx(float(pos.lower_bound), rel=1e-10)


def test_bp_mode_tables():
    rng = np.random.default_rng(4)
    H, W, K = 5, 5, 3
    theta = rng.uniform(0, 3, (K, H, W))
    res = trws_tables.solve_tables(
        jnp.asarray(theta), trws_tables.potts_table(K, 0.5, jnp.float64),
        maxiter=10, max_relgap=0.0, mode="bp",
    )
    assert float(res.lower_bound) == 0.0
    assert int(res.iterations) == 10
