"""Integration tests for the edge-modes renderer (ibr_edgemodes.m analog):
a synthetic constant-disparity scene must render back the reference view and
recover the true depth; invariants: lb <= E, TRW-S beats/equals argmin data
cost on total energy."""

import numpy as np
import pytest

from stereo_tpu.render import edgemodes


def _scene(H=12, W=18, disp=3.0, seed=0):
    rng = np.random.default_rng(seed)
    # per-pixel random texture: only the true disparity aligns the views
    im0 = rng.uniform(0, 255, (H, W + 8, 3))
    # view 1: u = x - d  ->  im1[:, x] = im0[:, x + disp]
    im1 = im0[:, int(disp):, :]
    im0 = im0[:, :W]
    im1 = im1[:, :W]
    P = np.zeros((2, 3, 4))
    P[:, :, :3] = np.eye(3)
    P[1, 0, 3] = -1.0
    return [im0, im1], P


def test_constant_disparity_scene_recovers_depth():
    disp = 3.0
    images, P = _scene(disp=disp)
    H, W = images[0].shape[:2]
    disps = np.arange(0.0, 6.0)
    res = edgemodes.render_edgemodes(images, P, disps, (H, W), lam=5.0,
                                     thresh=10.0, max_modes=4, maxiter=40)
    assert np.isfinite(res.energy)
    assert res.lower_bound <= res.energy + 1e-3
    img = np.asarray(res.image)
    depth = np.asarray(res.depth)
    # interior pixels (both views in-bounds at the true depth)
    interior = np.s_[1:-1, 4:W - 4]
    err = np.abs(img[interior] - np.asarray(images[0])[interior])
    assert np.median(err) < 2.0
    assert np.median(np.abs(depth[interior] - disp)) <= 0.5


def test_lambda_zero_is_pure_data_argmin():
    images, P = _scene(seed=1)
    H, W = images[0].shape[:2]
    disps = np.arange(0.0, 6.0)
    res = edgemodes.render_edgemodes(images, P, disps, (H, W), lam=0.0,
                                     thresh=10.0, max_modes=4)
    assert res.lower_bound is None
    assert np.isfinite(res.energy)
    assert np.asarray(res.image).shape == (H, W, 3)


def test_trws_energy_not_worse_than_argmin_under_prior():
    images, P = _scene(seed=2)
    H, W = images[0].shape[:2]
    disps = np.arange(0.0, 6.0)
    kwargs = dict(lam=8.0, thresh=10.0, max_modes=4)
    res = edgemodes.render_edgemodes(images, P, disps, (H, W), maxiter=60,
                                     **kwargs)
    # a labelling from pure data argmin, evaluated under the same energy,
    # cannot beat the TRW-S decode by much (sanity floor: lb <= E holds and
    # the gap is small on this near-trivial scene)
    assert (res.energy - res.lower_bound) / max(abs(res.energy), 1.0) < 0.2


def test_sample_depth_colors_oobv():
    images, P = _scene(seed=3)
    H, W = images[0].shape[:2]
    I = np.asarray(edgemodes.sample_depth_colors(
        images, P, np.array([0.0, 50.0]), (H, W)))
    assert I.shape == (2, 2, H, W, 3)
    # at disparity 50 most of view 1 is out of bounds
    assert (I[1, 1] == edgemodes.OOBV).mean() > 0.5
    # at disparity 0 view 1 samples are in bounds
    assert (I[1, 0] == edgemodes.OOBV).mean() == 0.0
