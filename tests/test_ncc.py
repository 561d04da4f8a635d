"""NCC volume + continuous sampling vs a literal scipy transcription of the
reference's MATLAB (dispmap_ncc.m:116-276)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import convolve2d

from stereo_tpu.ops import ncc as ncc_ops


def matlab_interp2_linear(im, X, Y):
    """MATLAB interp2 linear on a plain grid (NaN outside)."""
    H, W = im.shape
    out = np.full(X.shape, np.nan)
    valid = (X >= 1) & (X <= W) & (Y >= 1) & (Y <= H)
    x0 = np.clip(np.floor(X), 1, W - 1).astype(int)
    y0 = np.clip(np.floor(Y), 1, H - 1).astype(int)
    u = X - x0
    v = Y - y0
    a = im[y0 - 1, x0 - 1]
    b = im[y0 - 1, x0]
    c = im[y0, x0 - 1]
    d = im[y0, x0]
    val = a * (1 - u) * (1 - v) + b * u * (1 - v) + c * (1 - u) * v + d * u * v
    out[valid] = val[valid]
    return out


def oracle_ncc(im0, im1, disparities, patchsize=2):
    """Near-literal transcription of compute_ncc (dispmap_ncc.m:116-198)."""
    H, W, _ = im0.shape
    d = np.asarray(disparities, float)
    ncc = np.zeros((H, W, len(d)))

    meanpatch = np.ones((2 * patchsize + 1,) * 2) / ((2 * patchsize + 1) ** 2) / 3
    patch = np.ones((2 * patchsize + 1,) * 2)
    conv = lambda a, k: convolve2d(a, k, mode="same")
    R, G, B = im0[:, :, 0], im0[:, :, 1], im0[:, :, 2]
    mean_right = conv(R, meanpatch) + conv(G, meanpatch) + conv(B, meanpatch)
    t1 = conv(R**2, patch) + conv(G**2, patch) + conv(B**2, patch)
    t2 = mean_right * (conv(R, patch) + conv(G, patch) + conv(B, patch))
    t4 = patch.sum() * 3 * mean_right**2
    norm_right = np.sqrt(t1 - 2 * t2 + t4)

    for i, di in enumerate(d):
        bnd = np.zeros((H, W))
        bnd[:, int(np.floor(di + 1.5)) - 1:] = 1  # MATLAB round: half away from 0
        y_span = np.arange(int(np.ceil(di + 1)), W + 1)  # 1-based cols
        X1 = np.linspace(1, W - di, len(y_span))
        X = np.tile(X1, (H, 1))
        Y = np.tile(np.arange(1, H + 1)[:, None], (1, len(y_span)))
        imtr = np.zeros((H, W, 3))
        for c in range(3):
            imtr[:, y_span - 1, c] = matlab_interp2_linear(im1[:, :, c], X, Y)
        Rt, Gt, Bt = imtr[:, :, 0], imtr[:, :, 1], imtr[:, :, 2]
        mean_tr = conv(Rt, meanpatch) + conv(Gt, meanpatch) + conv(Bt, meanpatch)
        t1 = conv(Rt**2, patch) + conv(Gt**2, patch) + conv(Bt**2, patch)
        t2 = mean_tr * (conv(Rt, patch) + conv(Gt, patch) + conv(Bt, patch))
        t4 = patch.sum() * 3 * mean_tr**2
        norm_tr = np.sqrt(t1 - 2 * t2 + t4)

        c1 = conv(R * Rt, patch) + conv(G * Gt, patch) + conv(B * Bt, patch)
        c2 = mean_right * (conv(Rt, patch) + conv(Gt, patch) + conv(Bt, patch))
        c3 = mean_tr * (conv(R, patch) + conv(G, patch) + conv(B, patch))
        c4 = patch.sum() * 3 * mean_tr * mean_right
        with np.errstate(all="ignore"):
            ncci = (c1 - c2 - c3 + c4) / norm_right / norm_tr
        ncci[~np.isfinite(ncci)] = 0
        ncci[~(bnd >= 1 - 1e-8)] = 0
        ncc[:, :, i] = np.real(ncci)
    return ncc


@pytest.fixture(scope="module")
def small_pair():
    rng = np.random.default_rng(0)
    H, W = 18, 32
    im1 = rng.uniform(0, 255, (H, W, 3))
    # build im0 as a shifted version of im1 so NCC peaks are meaningful
    im0 = np.roll(im1, 3, axis=1) + rng.normal(0, 5, (H, W, 3))
    return im0, im1


@pytest.mark.parametrize("disparities", [np.arange(0, 9), np.arange(0.0, 6.5, 0.5)])
def test_volume_matches_oracle(small_pair, disparities):
    im0, im1 = small_pair
    want = oracle_ncc(im0, im1, disparities)  # [H, W, D]
    got = np.asarray(
        ncc_ops.compute_ncc(jnp.asarray(im0), jnp.asarray(im1), disparities)
    )  # [D, H, W]
    np.testing.assert_allclose(got, np.moveaxis(want, -1, 0), rtol=1e-9, atol=1e-10)


def test_best_disparity_recovers_shift(small_pair):
    im0, im1 = small_pair
    disparities = np.arange(0, 9)
    vol = ncc_ops.compute_ncc(jnp.asarray(im0), jnp.asarray(im1), disparities)
    best = np.asarray(ncc_ops.best_disparity(vol, disparities))
    # interior pixels away from the border should peak near the true shift 3
    interior = best[6:-6, 12:-6]
    assert np.median(np.abs(interior - 3)) < 0.75


def test_sample_at_grid_points_matches_volume(small_pair):
    im0, im1 = small_pair
    disparities = np.arange(0, 9)
    vol = ncc_ops.compute_ncc(jnp.asarray(im0), jnp.asarray(im1), disparities)
    voln = np.asarray(vol)
    H, W = voln.shape[1:]
    # sampling exactly at an interior grid disparity returns the volume value
    for k in [1, 4, 7]:
        disp = jnp.full((H, W), float(disparities[k]))
        got = np.asarray(ncc_ops.sample_at(vol, disparities, disp))
        np.testing.assert_allclose(got, voln[k], rtol=1e-8, atol=1e-9)


def test_sample_outside_range_is_large_negative(small_pair):
    im0, im1 = small_pair
    disparities = np.arange(0, 9)
    vol = ncc_ops.compute_ncc(jnp.asarray(im0), jnp.asarray(im1), disparities)
    H, W = np.asarray(vol).shape[1:]
    got = np.asarray(ncc_ops.sample_at(vol, disparities, jnp.full((H, W), 100.0)))
    assert (got == -ncc_ops.LARGEVAL).all()


def test_nearest_index_tie_goes_up():
    d = np.array([0.0, 1.0, 2.0])
    disp = jnp.asarray([[0.5, 1.49, 1.5, 0.2]])
    idx = np.asarray(ncc_ops.nearest_index(d, disp))[0]
    assert list(idx) == [1, 1, 2, 0]


def test_sample_quadratic_between_grid_points(small_pair):
    """Between interior grid points the value is the 3-point quadratic."""
    im0, im1 = small_pair
    disparities = np.arange(0, 9).astype(float)
    vol = np.asarray(
        ncc_ops.compute_ncc(jnp.asarray(im0), jnp.asarray(im1), disparities)
    )
    y, x, dq = 9, 20, 3.6  # nearest grid 4, neighbors 3,5
    got = float(
        np.asarray(
            ncc_ops.sample_at(
                jnp.asarray(vol), disparities, jnp.full(vol.shape[1:], dq)
            )
        )[y, x]
    )
    d1, d2, d3 = 3.0, 4.0, 5.0
    y1, y2, y3 = vol[3, y, x], vol[4, y, x], vol[5, y, x]
    a = y1 / ((d1 - d2) * (d1 - d3))
    b = y2 / ((d2 - d1) * (d2 - d3))
    c = y3 / ((d3 - d1) * (d3 - d2))
    r = a + b + c
    p = -(a * (d2 + d3) + b * (d1 + d3) + c * (d1 + d2))
    q = a * d2 * d3 + b * d1 * d3 + c * d1 * d2
    want = r * dq**2 + p * dq + q
    assert got == pytest.approx(want, rel=1e-9)
