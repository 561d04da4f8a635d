"""End-to-end bad-pixel % on the bundled synthetic-GT pair (data/synth).

The scene is piecewise-planar with the true disparity known by construction
(tools/make_synth_pair.py), so the BASELINE bad-pixel metric is exercised for
real: fuse proposals that include the two true planes and the solver must
reconstruct the scene to within the matching ambiguity."""

import numpy as np
import pytest

from stereo_tpu import geometry
from stereo_tpu.models.ncc import DispMapNCC
from stereo_tpu.utils import io, metrics

# the generator's plane coefficients (printed by tools/make_synth_pair.py)
BG = (0.02242152466367713, 0.012578616352201259, -1.0, 2.9649998589841218)
FG = (0.013452914798206279, -0.009433962264150943, -1.0, 11.554107792537438)


def plane_field(p, H, W, dtype):
    import jax.numpy as jnp

    maps = [jnp.full((H, W), v, dtype) for v in p]
    return jnp.stack(maps, axis=0)


@pytest.fixture(scope="module")
def synth_model():
    pair = io.load_pair("synth")
    dm = DispMapNCC(pair.images, np.arange(0, 17), kernel=1,
                    unary_weight=40.0, tol=8.0)
    return pair, dm


def test_gt_loads_and_matches_generator(synth_model):
    pair, dm = synth_model
    gt = io.load_ground_truth("synth")
    assert gt is not None and gt.shape == pair.shape
    assert not np.isnan(gt).any()
    # GT equals the analytic scene at the generator's quantization
    H, W = pair.shape
    xs = np.arange(1, W + 1, dtype=np.float64)[None, :]
    ys = np.arange(1, H + 1, dtype=np.float64)[:, None]
    bg = -(BG[0] * xs + BG[1] * ys + BG[3]) / BG[2]
    fg = -(FG[0] * xs + FG[1] * ys + FG[3]) / FG[2]
    d = np.where((xs >= 64) & (xs < 152) & (ys >= 44) & (ys < 122), fg, bg)
    np.testing.assert_allclose(gt, np.round(d * 8) / 8, atol=1e-9)


def test_bad_pixel_end_to_end(synth_model):
    pair, dm = synth_model
    gt = io.load_ground_truth("synth")
    H, W = dm.sz
    proposals = [plane_field(BG, H, W, dm.dtype),
                 plane_field(FG, H, W, dm.dtype)]
    proposals += [geometry.fronto_parallel(H, W, float(d), dm.dtype)
                  for d in (0.0, 5.0, 10.0, 15.0)]
    bad0 = metrics.bad_pixel_rate(np.asarray(dm.current_dispmap()), gt)
    dm.binary_fusion_sweep(proposals, chunk=len(proposals))
    dm.binary_fusion_sweep(proposals, chunk=len(proposals))
    bad = metrics.bad_pixel_rate(np.asarray(dm.current_dispmap()), gt)
    # the true planes are in the proposal set: fusion must reconstruct the
    # scene almost everywhere (NCC ambiguity at the occlusion boundary and
    # weakly-textured patches allows a small residual)
    assert bad < 0.10, (bad0, bad)
    assert bad < bad0
