"""Second-order scalar model (ojw_stereo core): energies + fusion moves."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu.config import CVPR08Options
from stereo_tpu.models.second_order import SecondOrderStereo, curvature_map


def make_model(H=12, W=18, shift=2, seed=0):
    rng = np.random.default_rng(seed)
    im0 = np.clip(rng.uniform(0, 255, (H, W, 3)) * 0.5 +
                  np.linspace(0, 255, W)[None, :, None] * 0.5, 0, 255)
    im1 = np.roll(im0, -shift, axis=1)
    P = np.zeros((2, 3, 4))
    P[:, :, :3] = np.eye(3)
    P[1, 0, 3] = -1.0
    # visibility=False isolates the curvature/QPBO core; the geometric
    # occlusion model has its own tests (test_visibility.py)
    return SecondOrderStereo([im0, im1], P, (0, 4), 1,
                             CVPR08Options(visibility=False), seed=seed)


def test_curvature_map_values():
    d = jnp.asarray(np.array([[0.0, 1.0, 4.0, 9.0]]))
    c = np.asarray(curvature_map(d, axis=1))
    np.testing.assert_allclose(c, [[0.0, 2.0, 2.0, 0.0]])
    # a linear ramp has zero curvature
    ramp = jnp.asarray(np.arange(20.0).reshape(4, 5))
    assert float(curvature_map(ramp, 1).sum()) == 0.0
    assert float(curvature_map(ramp, 0).sum()) == 0.0


def test_fusion_never_increases_and_improves():
    dm = make_model()
    e0 = dm.energy()
    energies = [e0]
    for d in [0.0, 2.0, 4.0]:
        H, W = dm.sz
        e = dm.fuse(np.full((H, W), d))
        assert e <= energies[-1] + 1e-6
        energies.append(e)
    assert energies[-1] < e0  # something improved


def test_true_shift_is_preferred():
    dm = make_model(shift=2)
    H, W = dm.sz
    for d in [0.0, 1.0, 2.0, 3.0, 4.0, 2.0]:
        dm.fuse(np.full((H, W), d))
    disp = np.asarray(dm.disp)
    # the planar-true solution should dominate the interior
    assert (np.abs(disp[:, 2:-2] - 2.0) < 1.0).mean() > 0.5


def test_smooth_proposal_fusion():
    """Fusing a smooth ramp into a noisy field lowers the curvature energy."""
    dm = make_model(seed=1)
    H, W = dm.sz
    before = float(np.asarray(dm.smooth_map(dm.disp)).sum())
    dm.fuse(np.tile(np.linspace(0, 4, W), (H, 1)))
    after = float(np.asarray(dm.smooth_map(dm.disp)).sum())
    assert after <= before + 1e-6


def test_optimize_schedule_converges():
    dm = make_model(seed=2)
    es = dm.optimize(schedule=("fronto", "smooth", "sweep_ftb"),
                     max_iters=12, average_over=4, converge=0.1, seed=0)
    assert all(b <= a + 1e-6 for a, b in zip(es, es[1:]))
    assert es[-1] < es[0]


def test_optimize_unknown_kind_raises():
    dm = make_model(seed=3)
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown proposal kind"):
        dm.optimize(schedule=("bogus",), max_iters=1)


@pytest.mark.parametrize("imp", [0, 1, 2, 3, 4])
def test_improve_modes_never_increase(imp):
    """Every reference improve mode (ibr_fuse_depths.m:189-230 — 0 keep,
    1 QPBOI-F, 2 QPBO-R splice, 3 QPBO-L, 4 QPBOI-R) preserves the
    never-increase invariant through fuse()."""
    rng = np.random.default_rng(42)
    dm = make_model(H=8, W=12, seed=3)
    dm.options = CVPR08Options(visibility=False, improve=imp)
    H, W = dm.sz
    prev = dm.energy()
    for trial in range(3):
        prop = rng.random((H, W)) * dm.d_step + dm.d_min
        e = dm.fuse(prop)
        assert e <= prev + 1e-5
        prev = e


def test_improve_modes_visibility_path():
    """Improve modes also hold under the geometric occlusion model."""
    rng = np.random.default_rng(7)
    for imp in (0, 4):
        dm = make_model(H=8, W=12, seed=5)
        dm.options = CVPR08Options(visibility=True, improve=imp)
        H, W = dm.sz
        prev = dm.energy()
        for _ in range(2):
            prop = rng.random((H, W)) * dm.d_step + dm.d_min
            e = dm.fuse(prop)
            assert e <= prev + 1e-5
            prev = e
