"""Binary fusion: never increases energy; improves toward brute-force optimum."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu import energy, geometry
from stereo_tpu.solvers import binary, trws

import oracles


def random_planes(rng, H, W):
    p = rng.standard_normal((4, H, W))
    p[2] = np.sign(p[2]) * (np.abs(p[2]) + 0.5)
    return p


def field_energy(planes, w, kernel, tol, unary_map):
    return float(
        energy.total_energy(jnp.asarray(unary_map), jnp.asarray(planes),
                            w, kernel, tol)
    )


@pytest.mark.parametrize("kernel", [1, 2])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fusion_never_increases_energy(kernel, seed):
    H, W, tol = 6, 7, 0.9
    rng = np.random.default_rng(seed)
    cur = random_planes(rng, H, W)
    w = energy.default_weights(H, W, dtype=jnp.float64)
    # random per-label unary maps
    U_cur = rng.uniform(0, 3, (H, W))
    E_cur = field_energy(cur, w, kernel, tol, U_cur)

    planes = cur
    U_planes = U_cur
    for step in range(5):
        prop = random_planes(rng, H, W)
        U_prop = rng.uniform(0, 3, (H, W))
        D0, Q = binary.fusion_problem(jnp.asarray(planes), jnp.asarray(prop))
        res = binary.binary_fuse(
            jnp.asarray(U_planes), jnp.asarray(U_prop), D0, Q, w,
            kernel=kernel, tol=tol,
        )
        take = np.asarray(res.take)
        fused = np.where(take[None], prop, planes)
        U_fused = np.where(take, U_prop, U_planes)
        E_fused = field_energy(fused, w, kernel, tol, U_fused)
        # solver's reported energy is the exact energy of the accepted config
        assert E_fused == pytest.approx(float(res.energy), rel=1e-9)
        # the invariant: fusion never increases energy
        assert E_fused <= E_cur + 1e-9
        assert float(res.lower_bound) <= float(res.energy) + 1e-12
        planes, U_planes, E_cur = fused, U_fused, E_fused


def test_fusion_reaches_brute_force_on_small_grid():
    """On a tiny grid the accepted move should be (near-)optimal vs exhaustive
    search over all 2^N fusion labelings."""
    H, W, kernel, tol = 3, 3, 1, 1.0
    rng = np.random.default_rng(4)
    cur = random_planes(rng, H, W)
    prop = random_planes(rng, H, W)
    w = energy.default_weights(H, W, dtype=jnp.float64)
    U0 = rng.uniform(0, 3, (H, W))
    U1 = rng.uniform(0, 3, (H, W))

    D0, Q = binary.fusion_problem(jnp.asarray(cur), jnp.asarray(prop))
    res = binary.binary_fuse(
        jnp.asarray(U0), jnp.asarray(U1), D0, Q, w, kernel=kernel, tol=tol,
        maxiter=200,
    )

    theta = np.stack([U0, U1], axis=0)
    theta_flat, edges = oracles.grid_edges_for_oracle(
        theta, np.asarray(D0), np.asarray(Q), np.asarray(w)
    )
    best, best_lab = oracles.brute_force_min(theta_flat, edges, kernel, tol)
    assert float(res.energy) >= best - 1e-9
    assert float(res.lower_bound) <= best + 1e-9
    assert float(res.energy) <= best * 1.02 + 1e-6


def test_fusion_accepts_obviously_better_proposal():
    """Proposal with strictly lower unary everywhere and identical smoothness
    must be adopted wholesale."""
    H, W = 4, 5
    plane = geometry.fronto_parallel(H, W, 3.0, dtype=jnp.float64)
    w = energy.default_weights(H, W, dtype=jnp.float64)
    U0 = jnp.full((H, W), 2.0, jnp.float64)
    U1 = jnp.full((H, W), 1.0, jnp.float64)
    D0, Q = binary.fusion_problem(plane, plane)
    res = binary.binary_fuse(U0, U1, D0, Q, w, kernel=1, tol=1.0)
    assert bool(jnp.all(res.take))
    assert float(res.energy) == pytest.approx(H * W * 1.0)
