"""End-to-end NCC model on a small synthetic pair."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu import geometry
from stereo_tpu.models.ncc import DispMapNCC

import oracles


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(0)
    H, W = 24, 36
    im1 = rng.uniform(0, 255, (H, W, 3))
    im0 = np.roll(im1, 4, axis=1) + rng.normal(0, 2, (H, W, 3))
    return DispMapNCC([im0, im1], np.arange(0, 9), kernel=1,
                      unary_weight=40.0, tol=8.0)


def test_energy_matches_oracle_formulation(model):
    """Model energy == numpy edge-list oracle energy of the same field."""
    planes = np.asarray(model.assignment)
    unary = np.asarray(model.unary_map(model.assignment))
    w_flat = oracles.dense_weights_to_flat(np.asarray(model.smooth_weights))
    want = oracles.total_energy(
        unary.flatten(order="F"), oracles.planes_to_flat(planes),
        *model.sz, w_flat, 1, model.tol,
    )
    assert model.energy() == pytest.approx(want, rel=1e-5)


def test_binary_fusion_monotone(model):
    H, W = model.sz
    e_prev = model.energy()
    rng = np.random.default_rng(1)
    for d in [0.0, 4.0, 8.0]:
        prop = geometry.fronto_parallel(H, W, d, model.dtype)
        e, lb = model.binary_fusion(prop)
        assert e <= e_prev + 1e-4
        assert lb <= e + 1e-6
        e_prev = e


def test_plane_proposal_finite(model):
    p = np.asarray(model.generate_new_plane_RANSAC(18, 12, 6.0))
    assert np.isfinite(p).all()
    assert p.shape == (4,) + tuple(model.sz)
    # plane normalized to c == 1
    np.testing.assert_allclose(p[2], 1.0, rtol=1e-6)


def test_simultaneous_beats_or_matches_iterative(model):
    H, W = model.sz
    proposals = [geometry.fronto_parallel(H, W, float(d), model.dtype)
                 for d in range(0, 9, 2)]
    proposals.append(model.generate_new_plane_RANSAC(18, 12, 8.0))

    model.restart()
    for P in proposals:
        model.binary_fusion(P)
    e_iter = model.energy()

    model.restart()
    e_sim, lb, iters = model.simultaneous_fusion(proposals)
    assert lb <= e_sim + 1e-6
    assert iters >= 1
    # simultaneous fusion sees the same move space and more; allow tiny slack
    assert e_sim <= e_iter * 1.05 + 1e-6


def test_restart_resets_energy(model):
    model.restart()
    e0 = model.energy()
    H, W = model.sz
    model.binary_fusion(geometry.fronto_parallel(H, W, 4.0, model.dtype))
    model.restart()
    assert model.energy() == pytest.approx(e0)


def test_fusion_sweep_matches_sequential(model):
    """binary_fusion_sweep == the per-call loop, move for move."""
    H, W = model.sz
    props = [geometry.fronto_parallel(H, W, float(d), model.dtype)
             for d in (0, 2, 4, 6, 8)]

    model.restart()
    seq = []
    for P in props:
        e, lb = model.binary_fusion(P)
        seq.append(e)
    a_seq = np.asarray(model.assignment)

    model.restart()
    swept = model.binary_fusion_sweep(props, chunk=3)
    np.testing.assert_allclose(swept, seq, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(model.assignment), a_seq, rtol=1e-10)
    assert model.energy() == pytest.approx(seq[-1], rel=1e-8)
