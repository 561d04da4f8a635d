"""Parity of the fused Pallas banded kernel vs the banded scan path.

ops/banded_kernel.py must reproduce the lax.scan sweep of solvers/banded.py
— same interior messages, same seam buffers, same lower bound — since the
scan path is itself pinned per-iteration to the sequential oracle
(tests/test_banded.py).  Runs in pallas interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu.solvers import banded
from stereo_tpu.ops import banded_kernel as bdk


def _problem(K, H, W, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    theta = jnp.asarray(rng.uniform(0, 5, (K, H, W)), dtype)
    D0 = jnp.asarray(rng.uniform(0, 10, (K, H, W)), dtype)
    Q = jnp.asarray(
        np.expand_dims(np.asarray(D0), 0)
        + rng.normal(0, 0.3, (4, K, H, W)), dtype)
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (4, H, W)), dtype)
    return theta, D0, Q, alphas


def _assert_state_close(s1, s2, bp, rtol=1e-5, atol=1e-4):
    m1 = np.asarray(banded.state_to_messages(s1, bp))
    m2 = np.asarray(banded.state_to_messages(s2, bp))
    np.testing.assert_allclose(m1, m2, rtol=rtol, atol=atol)


@pytest.mark.parametrize("K,H,W,Bh,Bw,kernel", [
    (3, 8, 10, 4, 5, 1),   # padding-free 2x2 blocks
    (4, 9, 8, 4, 4, 2),    # padded rows, square blocks
    (3, 10, 11, 5, 4, 1),  # padded cols
    (3, 48, 40, 8, 8, 1),  # LANE > 128: narrowed seam-send path
    (2, 40, 47, 8, 8, 2),  # narrowed path, kernel 2, padded cols
])
def test_kernel_matches_scan_sweep(K, H, W, Bh, Bw, kernel):
    theta, D0, Q, alphas = _problem(K, H, W)
    tol = 1.5
    spec = banded.BandedSpec(H, W, Bh, Bw)
    bp = banded._BandedProblem(theta, D0, Q, alphas, spec, kernel, tol)
    state = banded.messages_to_state(jnp.zeros((4, K, H, W), theta.dtype), bp)

    res1 = banded.solve_banded(theta, D0, Q, alphas, kernel=kernel, tol=tol,
                               Bh=Bh, Bw=Bw, maxiter=1, max_relgap=0.0,
                               use_pallas=False)
    res2 = banded.solve_banded(theta, D0, Q, alphas, kernel=kernel, tol=tol,
                               Bh=Bh, Bw=Bw, maxiter=2, max_relgap=0.0,
                               check_every=2, use_pallas=False)

    sweep_fn = bdk.make_sweep(bp, interpret=True)
    state, lb1 = sweep_fn(state)
    np.testing.assert_allclose(np.asarray(lb1), np.asarray(res1.lower_bound),
                               rtol=1e-5, atol=1e-4)
    # reconstruct full messages and compare
    m1 = np.asarray(banded.state_to_messages(state, bp))
    np.testing.assert_allclose(m1, np.asarray(res1.messages), rtol=1e-5,
                               atol=1e-5)

    state, lb2 = sweep_fn(state)
    np.testing.assert_allclose(np.asarray(lb2), np.asarray(res2.lower_bound),
                               rtol=1e-5, atol=1e-4)
    m2 = np.asarray(banded.state_to_messages(state, bp))
    np.testing.assert_allclose(m2, np.asarray(res2.messages), rtol=1e-5,
                               atol=1e-5)


def test_kernel_warm_start_parity():
    K, H, W, Bh, Bw, kernel, tol = 3, 8, 9, 4, 4, 1, 0.8
    theta, D0, Q, alphas = _problem(K, H, W, seed=3)
    warm = banded.solve_banded(theta, D0, Q, alphas, kernel=kernel, tol=tol,
                               Bh=Bh, Bw=Bw, maxiter=2, max_relgap=0.0,
                               check_every=2, use_pallas=False)
    res3 = banded.solve_banded(theta, D0, Q, alphas, kernel=kernel, tol=tol,
                               Bh=Bh, Bw=Bw, maxiter=1, max_relgap=0.0,
                               messages=warm.messages, use_pallas=False)
    spec = banded.BandedSpec(H, W, Bh, Bw)
    bp = banded._BandedProblem(theta, D0, Q, alphas, spec, kernel, tol)
    state = banded.messages_to_state(warm.messages, bp)
    sweep_fn = bdk.make_sweep(bp, interpret=True)
    state, lb = sweep_fn(state)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(res3.lower_bound),
                               rtol=1e-5, atol=1e-4)
    m = np.asarray(banded.state_to_messages(state, bp))
    np.testing.assert_allclose(m, np.asarray(res3.messages), rtol=1e-5,
                               atol=1e-5)
