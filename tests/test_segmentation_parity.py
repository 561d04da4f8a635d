"""Quantitative mean-shift parity vs literal EDISON transcriptions.

Oracles here are straight numpy transcriptions of the reference's EDISON code
(imrender/vgg/seg_ms/msImageProcessor.cpp): RGBtoLUV (:835-875) and the
non-optimized lattice filter NewNonOptimizedFilter (:4305-4630).  The device
implementation (stereo_tpu/proposals/segmentation.py) is the same algorithm
in lockstep f32; parity is asserted numerically on a real teddy crop, and the
full segmentation (filter + connect + transitive closure + prune) is compared
via segment counts and boundary agreement.
"""

import numpy as np
import pytest

from stereo_tpu.proposals import segmentation
from stereo_tpu.utils import io

# ------------------------------------------------------------- transcriptions

_XYZ = np.array([[0.4125, 0.3576, 0.1804],
                 [0.2125, 0.7154, 0.0721],
                 [0.0193, 0.1192, 0.9502]])
_UN_PRIME = 0.19784977571475
_VN_PRIME = 0.46834507665248
_LT = 0.008856


def rgb_to_luv_ref(rgb):
    """Literal RGBtoLUV (msImageProcessor.cpp:835-875); rgb in 0..255."""
    rgb = np.asarray(rgb, np.float64)
    x = rgb @ _XYZ[0]
    y = rgb @ _XYZ[1]
    z = rgb @ _XYZ[2]
    L0 = y / 255.0
    L = np.where(L0 > _LT, 116.0 * np.cbrt(L0) - 16.0, 903.3 * L0)
    const = x + 15.0 * y + 3.0 * z
    u_prime = np.where(const != 0, 4.0 * x / np.where(const == 0, 1, const),
                       4.0)
    v_prime = np.where(const != 0, 9.0 * y / np.where(const == 0, 1, const),
                       9.0 / 15.0)
    u = 13.0 * L * (u_prime - _UN_PRIME)
    v = 13.0 * L * (v_prime - _VN_PRIME)
    return np.stack([L, u, v], axis=-1)


def ms_filter_ref(luv, sigma_s, sigma_r, eps=0.01, limit=100):
    """Literal NewNonOptimizedFilter (msImageProcessor.cpp:4305-4630):
    per-pixel mean-shift to convergence in the (x, y, L, u, v) joint space
    scaled by (sigma_s, sigma_r), uniform kernels with strict < 1 windows,
    the hiLTr L-quirk, the scaled-then-unscaled magnitude test asymmetry,
    and the post-loop extra shift."""
    H, W, _ = luv.shape
    sS, sR = float(sigma_s), float(sigma_r)
    pts = np.empty((H * W, 5))
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    pts[:, 0] = xs.ravel() / sS
    pts[:, 1] = ys.ravel() / sS
    pts[:, 2:] = np.asarray(luv, np.float64).reshape(-1, 3) / sR
    hiLTr = 80.0 / sR
    out = np.empty((H * W, 3))

    def msvec(yk):
        dsp = (pts[:, 0] - yk[0]) ** 2 + (pts[:, 1] - yk[1]) ** 2
        cand = pts[dsp < 1.0]
        dL = cand[:, 2] - yk[2]
        quad = 4.0 if yk[2] > hiLTr else 1.0
        dr = (quad * dL * dL + (cand[:, 3] - yk[3]) ** 2
              + (cand[:, 4] - yk[4]) ** 2)
        sel = cand[dr < 1.0]
        if len(sel) == 0:
            return np.zeros(5)
        return sel.mean(axis=0) - yk

    for p in range(H * W):
        yk = pts[p].copy()
        mh = msvec(yk)
        mv = float(np.sum(mh * mh))  # first test: scaled units (:4520-4523)
        ic = 1
        while mv >= eps and ic < limit:
            yk += mh
            mh = msvec(yk)
            mv = ((mh[0] ** 2 + mh[1] ** 2) * sS * sS
                  + float(np.sum(mh[2:] ** 2)) * sR * sR)  # unscaled (:4609)
            ic += 1
        yk += mh  # applied on every exit path (:4619-4620)
        out[p] = yk[2:] * sR
    return out.reshape(H, W, 3)


def _teddy_crop(h=40, w=56, y0=120, x0=180):
    pair = io.load_pair("teddy", dtype=np.float32)
    return np.asarray(pair.images[0][y0:y0 + h, x0:x0 + w]).astype(np.float32)


def _boundaries(labels):
    b = np.zeros(labels.shape, bool)
    b[:-1, :] |= labels[:-1, :] != labels[1:, :]
    b[:, :-1] |= labels[:, :-1] != labels[:, 1:]
    return b


def _dilate1(mask):
    out = mask.copy()
    out[1:, :] |= mask[:-1, :]
    out[:-1, :] |= mask[1:, :]
    out[:, 1:] |= mask[:, :-1]
    out[:, :-1] |= mask[:, 1:]
    return out


# --------------------------------------------------------------------- tests

def test_rgb_to_luv_matches_edison():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(16, 16, 3)).astype(np.float32)
    ours = np.asarray(segmentation.rgb_to_luv(rgb))
    ref = rgb_to_luv_ref(rgb)
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    # known values: pure white, black, mid grey, primary red
    probes = np.array([[[255, 255, 255], [0, 0, 0], [128, 128, 128],
                        [255, 0, 0]]], np.float32)
    ours = np.asarray(segmentation.rgb_to_luv(probes))
    ref = rgb_to_luv_ref(probes)
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    assert ref[0, 1, 0] == 0.0 and ref[0, 1, 1] == 0.0  # black -> L=u=v=0
    # white: L* = 116*(0.9505/... y=0.2125+0.7154+0.0721=1.0)^(1/3)-16 = 100
    assert ref[0, 0, 0] == pytest.approx(100.0, abs=1e-6)


def test_mean_shift_filter_matches_edison_transcription():
    """Device lockstep filter == literal per-pixel transcription on a real
    teddy crop (f32 vs f64 basin-edge divergence allowed on a small
    fraction of pixels)."""
    im = _teddy_crop()
    luv64 = rgb_to_luv_ref(im)
    ref_modes = ms_filter_ref(luv64, 4, 5.0)
    luv = segmentation.rgb_to_luv(np.asarray(im, np.float32))
    ours = np.asarray(segmentation.mean_shift_filter(luv, 4, 5.0))
    err = np.abs(ours - ref_modes).max(axis=-1)
    assert np.median(err) < 0.05
    assert (err < 0.5).mean() > 0.97
    assert (err < 2.0).mean() > 0.995


def test_full_segmentation_quantitative_parity():
    """Full pipeline (filter + connect + transitive closure) vs the
    transcription's modes run through the same native merge: segment counts
    within 30% and boundary recall/precision >= 0.8 at 1 px tolerance."""
    import ctypes

    from stereo_tpu import native

    im = _teddy_crop(48, 64, 100, 160)
    ours = segmentation.mean_shift(im, h_s=4, h_r=5.0, min_region=0)

    ref_modes = ms_filter_ref(rgb_to_luv_ref(im), 4, 5.0).astype(np.float32)
    H, W, _ = ref_modes.shape
    ref_labels = np.zeros((H, W), np.uint32)
    L = native.lib()
    L.connect_modes(
        np.ascontiguousarray(ref_modes).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        H, W, ctypes.c_float(5.0), 0,
        ref_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))

    n_ours = len(np.unique(ours))
    n_ref = len(np.unique(ref_labels))
    assert 0.7 * n_ref <= n_ours <= 1.3 * n_ref, (n_ours, n_ref)

    b_ours = _boundaries(ours)
    b_ref = _boundaries(ref_labels)
    recall = (b_ref & _dilate1(b_ours)).sum() / max(b_ref.sum(), 1)
    precision = (b_ours & _dilate1(b_ref)).sum() / max(b_ours.sum(), 1)
    assert recall >= 0.8, recall
    assert precision >= 0.8, precision


@pytest.mark.slow
def test_segment_count_ranges_reference_params():
    """Segment-count sanity at the reference's operating points on a real
    crop: the smoothness-weight segmentation (seg_params [4 5 0],
    dispmap_globalstereo.m:391-392) oversegments into many small regions;
    the coarsest segpln mean-shift setting (multiplier 7) merges far more
    aggressively."""
    im = _teddy_crop(60, 80, 80, 140)
    fine = segmentation.mean_shift(im, h_s=4, h_r=5.0, min_region=0)
    n_fine = len(np.unique(fine))
    assert 40 <= n_fine <= 2000, n_fine
    coarse = segmentation.mean_shift(im, h_s=4 * 2, h_r=5.0 * 2,
                                     min_region=20)
    n_coarse = len(np.unique(coarse))
    assert n_coarse < n_fine
    assert n_coarse <= 200, n_coarse
