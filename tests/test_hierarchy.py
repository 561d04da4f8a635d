"""Coarse-to-fine warm starting: validity + usefulness."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu.solvers import hierarchy, trws

import oracles


def structured_inputs(rng, H, W, K):
    theta = rng.uniform(0, 5, (K, H, W))
    base = np.cumsum(rng.normal(0, 0.05, (H, W)), axis=1)
    D0 = rng.uniform(0, 1, (K, H, W)) * 0.3 + base[None]
    Q = D0[None] + rng.normal(0, 0.02, (4, K, H, W))
    alphas = np.zeros((4, H, W))
    alphas[0, :, 1:] = 4; alphas[1, :, :-1] = 4
    alphas[2, 1:, :] = 4; alphas[3, :-1, :] = 4
    return (jnp.asarray(theta), jnp.asarray(D0), jnp.asarray(Q),
            jnp.asarray(alphas))


def test_coarsen_shapes_and_border_weights():
    rng = np.random.default_rng(0)
    u, d0, q, al = structured_inputs(rng, 21, 34, 3)
    uc, d0c, qc, alc = hierarchy.coarsen(u, d0, q, al)
    assert uc.shape == (3, 10, 17)
    assert qc.shape == (4, 3, 10, 17)
    a = np.asarray(alc)
    assert (a[0][:, 0] == 0).all() and (a[1][:, -1] == 0).all()
    assert (a[2][0] == 0).all() and (a[3][-1] == 0).all()


def test_hierarchical_solve_valid_and_helpful():
    rng = np.random.default_rng(1)
    args = structured_inputs(rng, 32, 48, 4)
    kw = dict(kernel=1, tol=0.1, max_relgap=0.0, check_every=4)
    budget = 24
    cold = trws.solve(*args, maxiter=budget, **kw)
    warm = hierarchy.solve_hierarchical(*args, maxiter=budget, levels=3,
                                        coarse_sweeps=40, **kw)
    assert float(warm.lower_bound) <= float(warm.energy) + 1e-6
    # warm start should be comparable-or-better at the same fine budget
    # (equality up to fp noise on small near-converged problems)
    assert float(warm.lower_bound) >= float(cold.lower_bound) * (1 - 1e-4)
    # both energies are exact for their decoded labelings
    theta, D0, Q, alphas = (np.asarray(a) for a in args)
    theta_flat, edges = oracles.grid_edges_for_oracle(theta, D0, Q, alphas)
    lab = np.asarray(warm.labels).reshape(-1)
    E_indep = oracles.labeling_energy(theta_flat, edges, lab, 1, 0.1)
    assert float(warm.energy) == pytest.approx(E_indep, rel=1e-9)
