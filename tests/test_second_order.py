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

def _smooth_oracle(dm):
    """Direct transcription of the reference smoothness energy: loop over
    the SEI clique set (ojw_stereo.m:76-94), EW weighting (:108-113) and
    esmooth kernels (:122-130), on the normalized disparity field."""
    dn = (np.asarray(dm.disp, np.float64) - dm.d_min) / max(dm.d_step, 1.0)
    H, W = dm.sz
    tau = dm.tau
    total = 0.0
    for (dy, dx), wmap in zip(dm.triple_dirs, dm.triple_weights):
        ady, adx = abs(dy), abs(dx)
        for y in range(ady, H - ady):
            for x in range(adx, W - adx):
                d2 = abs(dn[y - dy, x - dx] - 2 * dn[y, x] + dn[y + dy, x + dx])
                if dm.options.smoothness_kernel == 2:
                    e = min(d2 * d2, tau * tau) / tau
                else:
                    e = min(d2, tau)
                total += e * wmap[y, x]
    return total


@pytest.mark.parametrize("connect,kernel", [(4, 1), (8, 1), (4, 2), (8, 2)])
def test_smooth_map_matches_transcription_oracle(connect, kernel):
    rng = np.random.default_rng(11)
    im0 = rng.uniform(0, 255, (7, 9, 3))
    im1 = np.roll(im0, -1, axis=1)
    P = np.zeros((2, 3, 4))
    P[:, :, :3] = np.eye(3)
    P[1, 0, 3] = -1.0
    opts = CVPR08Options(visibility=False, connect=connect,
                         smoothness_kernel=kernel)
    dm = SecondOrderStereo([im0, im1], P, (0, 4), 1, opts, seed=4)
    got = float(np.asarray(dm.smooth_map(dm.disp), np.float64).sum())
    want = _smooth_oracle(dm)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    # 8-connect doubles the direction count and halves the weight scale
    assert len(dm.triple_dirs) == (4 if connect == 8 else 2)


@pytest.mark.parametrize("connect,kernel", [(8, 1), (4, 2), (8, 2)])
def test_fusion_never_increases_all_clique_configs(connect, kernel):
    rng = np.random.default_rng(13)
    im0 = rng.uniform(0, 255, (8, 12, 3))
    im1 = np.roll(im0, -2, axis=1)
    P = np.zeros((2, 3, 4))
    P[:, :, :3] = np.eye(3)
    P[1, 0, 3] = -1.0
    opts = CVPR08Options(visibility=False, connect=connect,
                         smoothness_kernel=kernel)
    dm = SecondOrderStereo([im0, im1], P, (0, 4), 1, opts, seed=6)
    prev = dm.energy()
    for d in [0.0, 2.0]:
        e = dm.fuse(np.full(dm.sz, d))
        assert e <= prev + 1e-5
        prev = e


def test_optimize_callable_schedule_and_hooks():
    dm = make_model(seed=8)
    H, W = dm.sz
    saves = []
    info = {}
    props = [np.full((H, W), 2.0), "smooth"]
    es = dm.optimize(schedule=[lambda it: props[it % 2]], max_iters=4,
                     average_over=2, converge=0.0, seed=0,
                     save_progress=lambda it, d: saves.append((it, d.copy())),
                     info=info)
    assert len(saves) == len(es) - 1
    assert info["error"] is None
    assert info["numbers"].shape[1] == 3
    assert info["map"].shape == (H, W)
    assert all(b <= a + 1e-6 for a, b in zip(es, es[1:]))


def test_optimize_graceful_failure_midway():
    """A proposal failure after the first fusion ends the loop with the
    current state (ojw_stereo_optim.m:116-127); on the first it re-raises."""
    dm = make_model(seed=9)

    def bomb(it):
        if it >= 2:
            raise RuntimeError("user bailed")
        return "fronto"

    info = {}
    es = dm.optimize(schedule=[bomb], max_iters=10, average_over=3,
                     converge=0.0, info=info)
    assert len(es) == 3  # initial + 2 fusions
    assert isinstance(info["error"], RuntimeError)

    dm2 = make_model(seed=9)
    with pytest.raises(RuntimeError):
        dm2.optimize(schedule=[lambda it: (_ for _ in ()).throw(
            RuntimeError("first"))], max_iters=2)


@pytest.mark.slow
def test_ojw_stereo_driver_stages():
    """proposal_method dispatch (ojw_stereo.m:144-192) runs SameUni →
    SegPln → Smooth* with fresh restarts and monotone per-stage traces."""
    from stereo_tpu.models.second_order import ojw_stereo

    rng = np.random.default_rng(21)
    im0 = np.clip(rng.uniform(0, 255, (10, 14, 3)) * 0.5 +
                  np.linspace(0, 255, 14)[None, :, None] * 0.5, 0, 255)
    im1 = np.roll(im0, -2, axis=1)
    P = np.zeros((2, 3, 4))
    P[:, :, :3] = np.eye(3)
    P[1, 0, 3] = -1.0
    opts = CVPR08Options(visibility=False, max_iters=4, average_over=2,
                         converge=0.0, proposal_method=(1, 2, 3))
    model, info = ojw_stereo([im0, im1], P, (0, 4), 1, opts, seed=0)
    assert set(info["stages"]) == {"sameuni", "segpln", "smooth_star"}
    for name, st in info["stages"].items():
        es = st["energy"]
        assert all(b <= a + 1e-6 for a, b in zip(es, es[1:])), name
        assert st["D"].shape == (10, 14)
    assert info["segpln_gen"] == 14
