"""Native serial TRW-S: envelope DT vs brute-force messages, parity with the
python sequential oracle and the device solver."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu.solvers import trws, trws_host

import oracles


def edge_arrays(theta, D0, Q, alphas):
    """Dense grid inputs -> flat edge arrays for the host solver."""
    K, H, W = theta.shape
    theta_flat, edges = oracles.grid_edges_for_oracle(theta, D0, Q, alphas)
    tails = np.array([e[0] for e in edges], np.int32)
    heads = np.array([e[1] for e in edges], np.int32)
    al = np.array([e[2] for e in edges])
    q_src = np.stack([e[3] for e in edges], axis=1)  # [K, E]
    q_dst = np.stack([e[4] for e in edges], axis=1)
    return theta_flat, tails, heads, q_src, q_dst, al


@pytest.mark.parametrize("kernel", [1, 2])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_python_sequential_oracle(kernel, seed):
    """The C++ envelope-DT solver must match the brute-force python oracle
    (same ordering) iteration by iteration — validating the O(K) transform."""
    rng = np.random.default_rng(seed)
    H, W, K = 4, 5, 6
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K, kernel=kernel)
    tol = 1.0
    theta_flat, tails, heads, q_src, q_dst, al = edge_arrays(theta, D0, Q, alphas)
    order = oracles.bipartite_order(H, W)

    py = oracles.SequentialTRWS(
        theta_flat,
        list(zip(tails, heads, al, q_src.T, q_dst.T)),
        order, kernel, tol,
    )
    for it in range(1, 5):
        oE, oLB, _ = py.iterate()
        labels, e, lb, iters = trws_host.solve(
            kernel, theta_flat, tails, heads, q_src, q_dst, al, tol,
            np.asarray(order, np.int32), maxiter=it, max_relgap=0.0,
        )
        assert lb == pytest.approx(oLB, rel=1e-10, abs=1e-9), f"iter {it}"
        assert e == pytest.approx(oE, rel=1e-10, abs=1e-9), f"iter {it}"


@pytest.mark.parametrize("kernel", [1, 2])
def test_matches_device_solver(kernel):
    """Host (bipartite order) == device checkerboard solver, full pipeline."""
    rng = np.random.default_rng(3)
    H, W, K = 6, 7, 5
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K, kernel=kernel)
    tol = 0.9
    n_iters = 7
    dev = trws.solve(
        jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q), jnp.asarray(alphas),
        kernel=kernel, tol=tol, maxiter=n_iters, max_relgap=0.0,
    )
    theta_flat, tails, heads, q_src, q_dst, al = edge_arrays(theta, D0, Q, alphas)
    labels, e, lb, iters = trws_host.solve(
        kernel, theta_flat, tails, heads, q_src, q_dst, al, tol,
        trws_host.bipartite_order(H, W), maxiter=n_iters, max_relgap=0.0,
    )
    assert e == pytest.approx(float(dev.energy), rel=1e-9)
    assert lb == pytest.approx(float(dev.lower_bound), rel=1e-9)


def test_raster_order_also_valid():
    """Any ordering gives a valid monotone bound; raster order should converge
    (much) faster per iteration than bipartite on a smooth problem."""
    rng = np.random.default_rng(4)
    H, W, K = 8, 8, 4
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K)
    tol = 1.0
    theta_flat, tails, heads, q_src, q_dst, al = edge_arrays(theta, D0, Q, alphas)
    raster = np.arange(H * W, dtype=np.int32)
    lbs = []
    for it in (1, 3, 6):
        _, e, lb, _ = trws_host.solve(
            1, theta_flat, tails, heads, q_src, q_dst, al, tol, raster,
            maxiter=it, max_relgap=0.0,
        )
        assert lb <= e + 1e-9
        lbs.append(lb)
    assert lbs[0] <= lbs[1] + 1e-9 <= lbs[2] + 2e-9
