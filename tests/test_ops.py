"""interp2 and Woodford photometric unary vs independent numpy transcriptions."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu import geometry
from stereo_tpu.ops import interp, photo


def ref_bilinear(im, X, Y, oobv):
    """Literal transcription of vgg_interp2.cxx linear path (:246-323)."""
    H, W = im.shape[:2]
    im3 = im if im.ndim == 3 else im[..., None]
    out = np.full(X.shape + (im3.shape[2],), float(oobv))
    for idx in np.ndindex(X.shape):
        x, y = X[idx], Y[idx]
        if not (1 <= x <= W and 1 <= y <= H):
            continue
        xi = min(int(np.floor(x)), W - 1)
        yi = min(int(np.floor(y)), H - 1)
        u, v = x - xi, y - yi
        a = im3[yi - 1, xi - 1]
        b = im3[yi - 1, xi]
        c = im3[yi, xi - 1]
        d = im3[yi, xi]
        out[idx] = (a + (b - a) * u) + ((c + (d - c) * u) - (a + (b - a) * u)) * v
    return out if im.ndim == 3 else out[..., 0]


def test_interp2_matches_reference_semantics():
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 255, (7, 9, 3))
    X = rng.uniform(-1, 11, (40,))
    Y = rng.uniform(-1, 9, (40,))
    # include exact boundaries and corners
    X = np.concatenate([X, [1.0, 9.0, 9.0, 1.0, 4.5]])
    Y = np.concatenate([Y, [1.0, 7.0, 1.0, 7.0, 3.25]])
    got = np.asarray(interp.interp2(jnp.asarray(im), jnp.asarray(X), jnp.asarray(Y), oobv=-1000.0))
    want = ref_bilinear(im, X, Y, -1000.0)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_interp2_identity_on_grid():
    rng = np.random.default_rng(1)
    im = rng.uniform(0, 1, (5, 6))
    xs, ys = np.meshgrid(np.arange(1, 7), np.arange(1, 6))
    got = np.asarray(interp.interp2(jnp.asarray(im), jnp.asarray(xs, float), jnp.asarray(ys, float)))
    np.testing.assert_allclose(got, im, rtol=1e-14)


def test_ephoto_range_and_limits():
    F = jnp.zeros((4, 3))
    np.testing.assert_allclose(np.asarray(photo.ephoto(F, 30.0, 3)), 0.0, atol=1e-12)
    big = jnp.full((4, 3), 1e4)
    np.testing.assert_allclose(
        np.asarray(photo.ephoto(big, 30.0, 3)), np.log(2.0), rtol=1e-12
    )


def test_unary_cost_matches_manual_transcription():
    """dispmap_globalstereo.unary_cost (:355-375) on a random pair."""
    rng = np.random.default_rng(2)
    H, W = 10, 14
    im_ref = rng.uniform(0, 255, (H, W, 3))
    im2 = rng.uniform(0, 255, (H, W, 3))
    # teddy-style P: identity reference; second camera shifts x by -0.25*d
    P2 = np.array([[1.0, 0, 0, -0.25], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    d_min, d_step = 0.0, 36.0
    col_thresh = 30.0

    planes = rng.standard_normal((4, H, W))
    planes[2] = np.sign(planes[2]) * (np.abs(planes[2]) + 0.5)

    got = np.asarray(
        photo.unary_cost(
            jnp.asarray(planes), jnp.asarray(im_ref), jnp.asarray(im2),
            jnp.asarray(P2), col_thresh, d_min=d_min, d_step=d_step,
        )
    )

    # manual: disp raw (since d_min = 0 the quirk is identity), project, sample
    xs, ys = np.meshgrid(np.arange(1, W + 1), np.arange(1, H + 1))
    raw = -(planes[0] * xs + planes[1] * ys + planes[3]) / planes[2]
    disp = d_step * ((raw - d_min) / d_step + d_min)
    T1 = xs + P2[0, 3] * disp
    T2 = ys.astype(float)
    T3 = np.ones_like(T1)
    M = ref_bilinear(im2, T1 / T3, T2 / T3, -1000.0)
    F = M - im_ref
    want = np.log(2) - np.log(np.exp(-(F**2).sum(-1) / (col_thresh * 3)) + 1)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_rssd_volume_shapes_and_scores():
    rng = np.random.default_rng(3)
    H, W = 12, 16
    im_ref = jnp.asarray(rng.uniform(0, 255, (H, W, 3)))
    # P2's disparity column is -1, so pixel x at disparity d samples im2 at
    # x - d; make im2[x - 2] == im_ref[x] so the true level is d = 2
    im2 = jnp.asarray(np.roll(np.asarray(im_ref), -2, axis=1))
    P1 = jnp.asarray(np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]))
    P2 = jnp.asarray(np.array([[1.0, 0, 0, -1.0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]))
    disps = np.arange(4, -1, -1).astype(float)
    vol = photo.rssd_volume([im_ref, im2], [P1, P2], disps, 30.0, window=2)
    assert vol.shape == (5, H - 4, W - 4)
    v = np.asarray(vol)
    assert np.isfinite(v).all()
    # image 1 term is a perfect match at every level, so scores stay in (0, 1]
    assert (v <= 1.0 + 1e-12).all()
    # the true shift-2 level should win for most interior pixels
    best = v.argmax(axis=0)
    true_level = int(np.where(disps == 2)[0][0])
    assert (best == true_level).mean() > 0.6


def test_interp2_cubic_matches_reference_semantics():
    """Literal check against the mex cubic polynomial (vgg_interp2.cxx:325-368)."""
    rng = np.random.default_rng(4)
    H, W = 9, 11
    im = rng.uniform(0, 255, (H, W))
    X = np.concatenate([rng.uniform(0, W + 2, 60), [2.0, W - 1 - 1e-9, 5.5]])
    Y = np.concatenate([rng.uniform(0, H + 2, 60), [2.0, 3.25, H - 1 - 1e-9]])

    def ref_cubic(im, X, Y, oobv):
        out = np.full(X.shape, float(oobv))
        for idx in np.ndindex(X.shape):
            x, y = X[idx], Y[idx]
            if not (2 <= x < W - 1 and 2 <= y < H - 1):
                continue
            xi, yi = int(np.floor(x)), int(np.floor(y))
            u, v = x - xi, y - yi
            b = np.zeros(4)
            for m in range(4):
                c = im[yi - 2:yi + 2, xi - 2 + m]
                a = (c[3] + c[1]) - (c[2] + c[0])
                b[m] = v**3 * a + v**2 * ((c[0] - c[1]) - a) + v * (c[2] - c[0]) + c[1]
            a = (b[3] + b[1]) - (b[2] + b[0])
            out[idx] = u**3 * a + u**2 * ((b[0] - b[1]) - a) + u * (b[2] - b[0]) + b[1]
        return out

    got = np.asarray(interp.interp2_cubic(jnp.asarray(im), jnp.asarray(X),
                                          jnp.asarray(Y), oobv=-7.0))
    want = ref_cubic(im, X, Y, -7.0)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_interp2_nearest_matches_reference_window():
    rng = np.random.default_rng(5)
    im = rng.uniform(0, 255, (6, 7))
    X = np.array([0.4, 0.5, 3.2, 7.49, 7.5, 2.0])
    Y = np.array([1.0, 1.0, 5.7, 6.0, 6.0, 6.49])
    got = np.asarray(interp.interp2_nearest(jnp.asarray(im), jnp.asarray(X),
                                            jnp.asarray(Y), oobv=-1.0))
    # vgg_interp2.cxx:231: valid iff 0.5 <= X < W + 0.5 (likewise Y)
    assert got[0] == -1.0          # x = 0.4 out of bounds
    assert got[1] == im[0, 0]      # x = 0.5 rounds to column 1
    assert got[4] == -1.0          # x = 7.5 out of bounds (W = 7)
    assert got[2] == im[round(5.7) - 1, round(3.2) - 1]
