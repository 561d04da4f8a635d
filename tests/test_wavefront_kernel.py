"""Parity of the fused Pallas wavefront kernel vs the scan path.

The kernel (ops/wavefront_kernel.py) must reproduce the lax.scan sweep of
solvers/wavefront.py — same messages, same lower bound — since both claim to
be the reference's raster-order TRW-S sweep (cpp/trw-s/minimize.cpp:31-116).
Runs in pallas interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu.solvers import wavefront
from stereo_tpu.ops import wavefront_kernel as wfk


def _problem(K, H, W, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    theta = jnp.asarray(rng.uniform(0, 5, (K, H, W)), dtype)
    D0 = jnp.asarray(rng.uniform(0, 10, (K, H, W)), dtype)
    Q = jnp.asarray(
        np.expand_dims(np.asarray(D0), 0)
        + rng.normal(0, 0.3, (4, K, H, W)), dtype)
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (4, H, W)), dtype)
    return theta, D0, Q, alphas


@pytest.mark.parametrize("K,H,W,kernel", [(3, 6, 9, 1), (4, 7, 6, 2)])
def test_kernel_matches_scan_sweep(K, H, W, kernel):
    theta, D0, Q, alphas = _problem(K, H, W)
    tol = 1.5

    sk = wavefront._Skewed(theta, D0, Q, alphas, kernel, tol)
    M0 = wavefront.messages_to_groups(jnp.zeros((4, K, H, W), theta.dtype), W)

    # reference: the scan path after 1 and 2 full sweeps
    res1 = wavefront.solve_wavefront(theta, D0, Q, alphas, kernel=kernel,
                                     tol=tol, maxiter=1, max_relgap=0.0,
                                     check_every=1, use_pallas=False)
    res2 = wavefront.solve_wavefront(theta, D0, Q, alphas, kernel=kernel,
                                     tol=tol, maxiter=2, max_relgap=0.0,
                                     check_every=2, use_pallas=False)

    sweep_fn = wfk.make_sweep(sk, interpret=True)
    M, lb1 = sweep_fn(M0)
    np.testing.assert_allclose(np.asarray(lb1),
                               np.asarray(res1.lower_bound), rtol=1e-5,
                               atol=1e-4)
    Mk1 = wavefront.groups_to_messages(M[0], M[1], W)
    np.testing.assert_allclose(np.asarray(Mk1), np.asarray(res1.messages),
                               rtol=1e-5, atol=1e-5)

    M, lb2 = sweep_fn(M)
    np.testing.assert_allclose(np.asarray(lb2),
                               np.asarray(res2.lower_bound), rtol=1e-5,
                               atol=1e-4)
    Mk2 = wavefront.groups_to_messages(M[0], M[1], W)
    np.testing.assert_allclose(np.asarray(Mk2), np.asarray(res2.messages),
                               rtol=1e-5, atol=1e-5)


def test_kernel_warm_start_parity():
    K, H, W, kernel, tol = 3, 8, 7, 1, 0.8
    theta, D0, Q, alphas = _problem(K, H, W, seed=3)
    # warm-start messages from a couple of scan sweeps
    warm = wavefront.solve_wavefront(theta, D0, Q, alphas, kernel=kernel,
                                     tol=tol, maxiter=2, max_relgap=0.0,
                                     check_every=2, use_pallas=False)
    res3 = wavefront.solve_wavefront(theta, D0, Q, alphas, kernel=kernel,
                                     tol=tol, maxiter=1, max_relgap=0.0,
                                     check_every=1, messages=warm.messages,
                                     use_pallas=False)
    sk = wavefront._Skewed(theta, D0, Q, alphas, kernel, tol)
    sweep_fn = wfk.make_sweep(sk, interpret=True)
    M = wavefront.messages_to_groups(warm.messages, W)
    M, lb = sweep_fn(M)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(res3.lower_bound),
                               rtol=1e-5, atol=1e-4)
    Mk = wavefront.groups_to_messages(M[0], M[1], W)
    np.testing.assert_allclose(np.asarray(Mk), np.asarray(res3.messages),
                               rtol=1e-5, atol=1e-5)
