"""Output-view projection generators (ojw_genview/P2stereoP/P_interp)."""

import numpy as np
import pytest

from stereo_tpu.render.genview import genview, interp_views, stereo_views


def _random_P(rng):
    # K upper-triangular with positive diagonal, R a rotation, t a centre
    K = np.array([[rng.uniform(400, 800), rng.uniform(-2, 2), rng.uniform(100, 300)],
                  [0.0, rng.uniform(400, 800), rng.uniform(100, 300)],
                  [0.0, 0.0, 1.0]])
    A = rng.normal(size=(3, 3))
    R = np.linalg.qr(A)[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = rng.normal(size=3)
    return K @ np.concatenate([R, -R @ t[:, None]], axis=1)


def test_stereo_views_shift_structure():
    """P2stereoP.m:30-31: the camera centre moves along x by 70*view*z_min
    and the principal ray shifts by 50*view; rows 1-2 are untouched."""
    rng = np.random.default_rng(0)
    P = _random_P(rng)
    z_min = 0.5
    left = stereo_views(P, z_min, -1.0)
    right = stereo_views(P, z_min, +1.0)
    np.testing.assert_allclose(left[1:], P[1:], rtol=0, atol=0)
    np.testing.assert_allclose(right[1:], P[1:], rtol=0, atol=0)
    want_l = P[0].copy()
    want_l[3] -= 70.0 * z_min
    want_l += P[2] * 50.0
    np.testing.assert_allclose(left[0], want_l, rtol=1e-12)
    # 'l'/'r' string forms map to -/+1
    np.testing.assert_allclose(stereo_views(P, z_min, "l"), left)
    np.testing.assert_allclose(stereo_views(P, z_min, "r"), right)


def test_interp_views_endpoints_reproduce_inputs():
    """P_interp at f=0 / f=1 returns the input matrices (up to the projective
    scale fixed by the RQ decomposition)."""
    rng = np.random.default_rng(1)
    P0 = _random_P(rng)
    P1 = _random_P(rng)
    out = interp_views(P0, P1, [0.0, 0.5, 1.0])
    assert out.shape == (3, 3, 4)
    for got, want in ((out[0], P0), (out[2], P1)):
        scale = want[2, 2] / got[2, 2]
        np.testing.assert_allclose(got * scale, want, rtol=1e-8, atol=1e-8)
    assert np.isfinite(out[1]).all()


def test_genview_kinds():
    rng = np.random.default_rng(2)
    Pi = np.stack([_random_P(rng) for _ in range(3)])
    np.testing.assert_allclose(genview("input", Pi, [1], None), Pi[1:2])
    st = genview("stereo", Pi, [0], -1.0, disps=np.array([1.0, 4.0]))
    assert st.shape == (1, 3, 4)
    np.testing.assert_allclose(st[0, 1:], Pi[0, 1:])
    with pytest.raises(ValueError):
        genview("stereo", Pi, [0], -1.0)
    sw = genview("steady", Pi, [0, 2], [0.0, 1.0])
    scale = Pi[0, 2, 2] / sw[0, 2, 2]
    np.testing.assert_allclose(sw[0] * scale, Pi[0], rtol=1e-8, atol=1e-8)
    with pytest.raises(ValueError):
        genview("bogus", Pi, [0], 0)
