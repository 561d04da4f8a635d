"""GlobalStereo model on a small synthetic pair: weights, unary, segpln, fusion."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu import geometry
from stereo_tpu.config import CVPR08Options
from stereo_tpu.models.global_stereo import DispMapGlobalStereo


def make_pair(H=30, W=44, shift=3):
    rng = np.random.default_rng(0)
    im0 = np.zeros((H, W, 3))
    # textured blocks so segmentation and matching both have signal
    im0[:, : W // 2] = [180, 60, 60]
    im0[:, W // 2:] = [60, 60, 180]
    im0 += rng.uniform(0, 60, (H, W, 3))
    im0 = np.clip(im0, 0, 255)
    # second view: content moved left by `shift` px (P shift column -1)
    im1 = np.roll(im0, -shift, axis=1)
    P = np.zeros((2, 3, 4))
    P[:, :, :3] = np.eye(3)
    P[1, 0, 3] = -1.0
    return [im0, im1], P


@pytest.fixture(scope="module")
def model():
    images, P = make_pair()
    options = CVPR08Options()
    return DispMapGlobalStereo(images, P, (0, 6), 1, options, seed=3)


def test_descending_disparities_and_normalization(model):
    assert model.disps[0] == 6 and model.disps[-1] == 0
    assert model.d_min == 0.0 and model.d_step == 6.0
    assert model.normalize == (0.0, 6.0)


def test_weights_structure(model):
    w = np.asarray(model.smooth_weights)
    opts = model.options
    scale = 2.0  # num_images / ((connect==8)+1) = 2/1
    vals = np.unique(w[w > 0])
    assert set(np.round(vals, 6)) <= {
        round(opts.lambda_l * scale, 6), round(opts.lambda_h * scale, 6)
    }
    # interior edges exist in both classes (there is a segment boundary)
    assert (w == opts.lambda_h * scale).any()
    assert (w == opts.lambda_l * scale).any()


def test_unary_prefers_true_disparity(model):
    H, W = model.sz
    u_true = float(
        jnp.sum(model.unary_map(geometry.fronto_parallel(H, W, 3.0, model.dtype)))
    )
    u_wrong = float(
        jnp.sum(model.unary_map(geometry.fronto_parallel(H, W, 0.0, model.dtype)))
    )
    assert u_true < u_wrong


def test_fusion_moves_toward_true_disparity(model):
    model.restart()
    e0 = model.energy()
    H, W = model.sz
    for d in [0.0, 3.0, 6.0]:
        e, lb = model.binary_fusion(geometry.fronto_parallel(H, W, d, model.dtype))
        assert e <= e0 + 1e-6
        e0 = e
    disp = np.asarray(model.current_dispmap()) * model.d_step
    # most pixels should sit at the true disparity 3
    assert (np.abs(disp - 3.0) < 1.0).mean() > 0.6


@pytest.mark.slow
def test_segpln_proposals(model):
    props = model.segpln(seed=0)
    assert len(props) == 14
    H, W = model.sz
    found_plane = False
    for p in props:
        p = np.asarray(p)
        assert p.shape == (4, H, W)
        assert np.isfinite(p).all()
        # disparity of proposals should be near the true value somewhere
        disp = -(p[0] * np.arange(1, W + 1)[None] + p[1] * np.arange(1, H + 1)[:, None] + p[3]) / p[2]
        if (np.abs(disp - 3.0) < 1.0).mean() > 0.3:
            found_plane = True
    assert found_plane, "no SegPln proposal recovered the true plane"


def test_segpln_fusion_reduces_energy(model):
    model.restart()
    e0 = model.energy()
    props = model.segpln(seed=0)
    for p in props[:4]:
        e, _ = model.binary_fusion(p)
    assert model.energy() < e0


def test_bad_p_matrix_rejected():
    images, P = make_pair()
    P = P.copy()
    P[0, 0, 0] = 2.0
    with pytest.raises(ValueError, match="reference"):
        DispMapGlobalStereo(images, P, (0, 6), 1, CVPR08Options())


def test_kernel2_end_to_end():
    """Truncated-quadratic path: weights /= tol, tol squared
    (dispmap_globalstereo.m:410-413), fusion monotone, energy matches the
    edge-list oracle."""
    import oracles

    images, P = make_pair()
    dm = DispMapGlobalStereo(images, P, (0, 6), 1,
                             CVPR08Options(smoothness_kernel=2), seed=1)
    assert dm.tol == pytest.approx(CVPR08Options().disp_thresh ** 2)
    # oracle cross-check of the stored energy
    w_flat = oracles.dense_weights_to_flat(np.asarray(dm.smooth_weights))
    unary = np.asarray(dm.unary_map(dm.assignment))
    want = oracles.total_energy(
        unary.flatten(order="F"),
        oracles.planes_to_flat(np.asarray(dm.assignment)),
        *dm.sz, w_flat, 2, dm.tol, normalize=dm.normalize,
    )
    assert dm.energy() == pytest.approx(want, rel=1e-4)

    e0 = dm.energy()
    H, W = dm.sz
    for d in [0.0, 3.0, 6.0]:
        e, lb = dm.binary_fusion(geometry.fronto_parallel(H, W, d, dm.dtype))
        assert e <= e0 + 1e-6
        e0 = e


def test_default_options_dispatch():
    from stereo_tpu.config import default_options, CVPR08Options

    assert isinstance(default_options("cvpr08"), CVPR08Options)
    assert default_options("cvpr07").connect == 8
    assert default_options("bmvc07").num_loops == 2
    with pytest.raises(ValueError, match="not recognised"):
        default_options("nope")
