"""Checkerboard TRW-S: exact parity with a sequential oracle + invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_tpu.solvers import trws

import oracles


def run_dense_iters(theta, D0, Q, alphas, kernel, tol, n_iters):
    """Run exactly n_iters iterations of the dense solver, returning traces."""
    res = trws.solve(
        jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q), jnp.asarray(alphas),
        kernel=kernel, tol=tol, maxiter=n_iters, max_relgap=0.0,
    )
    return res


def per_iteration_trace(theta, D0, Q, alphas, kernel, tol, n_iters):
    """(energy, lb) after each iteration of the dense solver."""
    out = []
    msgs = None
    for _ in range(n_iters):
        res = trws.solve(
            jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q),
            jnp.asarray(alphas), kernel=kernel, tol=tol, maxiter=1,
            max_relgap=0.0, messages=msgs,
        )
        msgs = res.messages
        out.append((float(res.energy), float(res.lower_bound),
                    np.asarray(res.labels)))
    return out


@pytest.mark.parametrize("kernel", [1, 2])
@pytest.mark.parametrize("seed,H,W,K", [(0, 4, 5, 3), (1, 3, 6, 4), (2, 5, 5, 2)])
def test_matches_sequential_oracle(kernel, seed, H, W, K):
    """The parallel checkerboard solver IS TRW-S with the bipartite ordering:
    energy and lower bound must match the sequential oracle to fp roundoff,
    iteration by iteration."""
    rng = np.random.default_rng(seed)
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K, kernel=kernel)
    tol = 1.0

    theta_flat, edges = oracles.grid_edges_for_oracle(theta, D0, Q, alphas)
    order = oracles.bipartite_order(H, W)
    oracle = oracles.SequentialTRWS(theta_flat, edges, order, kernel, tol)

    dense_trace = per_iteration_trace(theta, D0, Q, alphas, kernel, tol, 5)
    for it in range(5):
        oE, oLB, oLab = oracle.iterate()
        dE, dLB, dLab = dense_trace[it]
        assert dLB == pytest.approx(oLB, rel=1e-10, abs=1e-10), f"iter {it}"
        assert dE == pytest.approx(oE, rel=1e-10, abs=1e-10), f"iter {it}"


@pytest.mark.parametrize("kernel", [1, 2])
def test_lower_bound_monotone_and_below_energy(kernel):
    rng = np.random.default_rng(3)
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, 8, 9, 5, kernel=kernel)
    tol = 0.8
    tr = per_iteration_trace(theta, D0, Q, alphas, kernel, tol, 12)
    lbs = [lb for _, lb, _ in tr]
    for a, b in zip(lbs, lbs[1:]):
        assert b >= a - 1e-9, f"LB decreased: {a} -> {b}"
    for e, lb, _ in tr:
        assert lb <= e + 1e-9


def test_chain_is_exact():
    """On a tree (single row) TRW-S converges to the exact MAP: E == LB == DP."""
    rng = np.random.default_rng(4)
    H, W, K = 1, 8, 4
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K)
    tol = 1.2
    res = trws.solve(
        jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q), jnp.asarray(alphas),
        kernel=1, tol=tol, maxiter=200, max_relgap=0.0,
    )
    theta_flat, edges = oracles.grid_edges_for_oracle(theta, D0, Q, alphas)
    best, best_lab = oracles.brute_force_min(theta_flat, edges, 1, tol)
    assert float(res.energy) == pytest.approx(best, rel=1e-9)
    assert float(res.lower_bound) == pytest.approx(best, rel=1e-6)


@pytest.mark.parametrize("kernel", [1, 2])
def test_small_grid_close_to_brute_force(kernel):
    """On small loopy grids the decoded energy is near-optimal and LB <= OPT."""
    rng = np.random.default_rng(5)
    H, W, K = 3, 3, 2
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K, kernel=kernel)
    tol = 1.0
    res = trws.solve(
        jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q), jnp.asarray(alphas),
        kernel=kernel, tol=tol, maxiter=300, max_relgap=0.0,
    )
    theta_flat, edges = oracles.grid_edges_for_oracle(theta, D0, Q, alphas)
    best, _ = oracles.brute_force_min(theta_flat, edges, kernel, tol)
    assert float(res.lower_bound) <= best + 1e-8
    assert float(res.energy) >= best - 1e-9
    # energy of decode must equal independent evaluation of that labeling
    lab_flat = np.asarray(res.labels).reshape(-1)
    E_indep = oracles.labeling_energy(theta_flat, edges, lab_flat, kernel, tol)
    assert float(res.energy) == pytest.approx(E_indep, rel=1e-10)
    # and should be close to optimal on such a small instance
    assert float(res.energy) <= best * 1.05 + 1e-6


def test_alpha_zero_edges_decouple():
    """With all alphas zero the solution is the per-pixel unary argmin."""
    rng = np.random.default_rng(6)
    H, W, K = 4, 4, 3
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K)
    alphas = np.zeros_like(alphas)
    res = trws.solve(
        jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q), jnp.asarray(alphas),
        kernel=1, tol=1.0, maxiter=5, max_relgap=0.0,
    )
    want = theta.min(axis=0).sum()
    assert float(res.energy) == pytest.approx(float(want), rel=1e-12)
    assert float(res.lower_bound) == pytest.approx(float(want), rel=1e-12)
    np.testing.assert_array_equal(np.asarray(res.labels), theta.argmin(axis=0))


def test_early_stop_on_relgap():
    rng = np.random.default_rng(7)
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, 6, 6, 3)
    res = trws.solve(
        jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q), jnp.asarray(alphas),
        kernel=1, tol=1.0, maxiter=500, max_relgap=1e-3,
    )
    assert int(res.iterations) < 500
    e, lb = float(res.energy), float(res.lower_bound)
    assert (e - lb) / e < 1e-3


def test_bp_mode_runs_and_decodes():
    """mode='bp' (Minimize_BP): gamma=1, lb stays 0, runs to maxiter."""
    rng = np.random.default_rng(8)
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, 6, 6, 3)
    res = trws.solve(
        jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q), jnp.asarray(alphas),
        kernel=1, tol=1.0, maxiter=15, max_relgap=1e-3, mode="bp",
    )
    assert int(res.iterations) == 15
    assert float(res.lower_bound) == 0.0
    theta_flat, edges = oracles.grid_edges_for_oracle(theta, D0, Q, alphas)
    lab = np.asarray(res.labels).reshape(-1)
    E_indep = oracles.labeling_energy(theta_flat, edges, lab, 1, 1.0)
    assert float(res.energy) == pytest.approx(E_indep, rel=1e-10)


def test_check_every_matches_per_iteration_schedule():
    """check_every only changes when convergence is tested, not the math:
    6 iterations with check_every=3 == 6 iterations with check_every=1."""
    rng = np.random.default_rng(9)
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, 6, 7, 4)
    args = tuple(jnp.asarray(x) for x in (theta, D0, Q, alphas))
    a = trws.solve(*args, kernel=1, tol=1.0, maxiter=6, max_relgap=0.0)
    b = trws.solve(*args, kernel=1, tol=1.0, maxiter=6, max_relgap=0.0,
                   check_every=3)
    assert int(b.iterations) == 6
    assert float(b.energy) == pytest.approx(float(a.energy), rel=1e-12)
    assert float(b.lower_bound) == pytest.approx(float(a.lower_bound), rel=1e-12)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))


@pytest.mark.parametrize("kernel", [1, 2])
def test_bf16_message_storage_drift_bounded(kernel):
    """Narrow (bfloat16) message *storage*: bounds stay valid (lb <= E, lb a
    true dual value), energies drift only by message rounding.  Exact parity
    is not expected — that's the f32 default's contract."""
    rng = np.random.default_rng(11)
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, 8, 9, 5, kernel=kernel)
    tol = 0.8
    f32 = trws.solve(
        jnp.asarray(theta, jnp.float32), jnp.asarray(D0, jnp.float32),
        jnp.asarray(Q, jnp.float32), jnp.asarray(alphas, jnp.float32),
        kernel=kernel, tol=tol, maxiter=20, max_relgap=0.0)
    b16 = trws.solve(
        jnp.asarray(theta, jnp.float32), jnp.asarray(D0, jnp.float32),
        jnp.asarray(Q, jnp.float32), jnp.asarray(alphas, jnp.float32),
        kernel=kernel, tol=tol, maxiter=20, max_relgap=0.0,
        message_dtype=jnp.bfloat16)
    assert b16.messages.dtype == jnp.bfloat16
    assert float(b16.lower_bound) <= float(b16.energy) + 1e-6
    # the bf16 lb is a valid dual value, so it cannot exceed the optimum;
    # the f32 run's energy upper-bounds the optimum
    assert float(b16.lower_bound) <= float(f32.energy) + 1e-6
    # drift stays at rounding scale, not solver-divergence scale
    assert float(b16.energy) == pytest.approx(float(f32.energy), rel=0.03)
    assert float(b16.lower_bound) == pytest.approx(float(f32.lower_bound),
                                                   rel=0.03)
    # warm-starting from bf16 messages round-trips
    cont = trws.solve(
        jnp.asarray(theta, jnp.float32), jnp.asarray(D0, jnp.float32),
        jnp.asarray(Q, jnp.float32), jnp.asarray(alphas, jnp.float32),
        kernel=kernel, tol=tol, maxiter=5, max_relgap=0.0,
        messages=b16.messages, message_dtype=jnp.bfloat16)
    assert float(cont.lower_bound) >= float(b16.lower_bound) - 1e-4
