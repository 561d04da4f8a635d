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


# The filter + merge transcriptions live in tests/oracle_meanshift.py (the
# per-layer oracle module); ms_filter_ref is kept as the historical alias.
from oracle_meanshift import filter_oracle as ms_filter_ref  # noqa: E402
from oracle_meanshift import segment_oracle  # noqa: E402


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


def _baby2_crop(h=24, w=32, y0=60, x0=90):
    pair = io.load_pair("baby2", dtype=np.float32)
    return np.asarray(pair.images[0][y0:y0 + h, x0:x0 + w]).astype(np.float32)


@pytest.mark.parametrize("crop,h_s,h_r", [
    ("teddy", 3, 5.0),
    ("baby2", 4, 6.5),
])
def test_filter_per_pixel_modes_pinned(crop, h_s, h_r):
    """Device lockstep filter at the oracle's own precision (f64 on the CPU
    test backend) == the serial per-pixel transcription, per-pixel, on real
    crops of both bundled pairs.  This is the strict pin; the production f32
    path is covered by the looser basin-edge test below."""
    im = _teddy_crop(20, 28, 140, 200) if crop == "teddy" else _baby2_crop()
    luv = rgb_to_luv_ref(im)  # float64
    ref = ms_filter_ref(luv, h_s, h_r)
    ours = np.asarray(segmentation.mean_shift_filter(
        np.asarray(luv, np.float64), h_s, float(h_r))).astype(np.float32)
    err = np.abs(ours.astype(np.float64)
                 - np.asarray(ref, np.float64)).max(axis=-1)
    # Window-membership semantics are pinned exactly (constant divisions
    # hoisted to host IEEE, FMA barriers); the one remaining freedom is
    # floating-point summation ASSOCIATION inside the window means (EDISON
    # sums in bucket-list order, numpy pairwise, the device kernel in
    # offset order), which every transcription has.  Pixels whose
    # trajectory crosses a strict-< window boundary within that last-bit
    # dust may branch to a different (equally valid) nearby mode; all
    # others are bit-identical after the f32 output cast.
    assert (err < 1e-6).mean() >= 0.96, (err.max(), (err >= 1e-6).sum())
    assert np.median(err) < 1e-6


@pytest.mark.parametrize("crop,h_r,min_region", [
    ("teddy", 5.0, 0),
    ("teddy", 5.0, 12),
    ("baby2", 6.5, 8),
])
def test_native_merge_matches_edison_transcription(crop, h_r, min_region):
    """native connect_modes (Connect + TransitiveClosure pattern + Prune)
    == the literal numpy transcription, exact label-map equality including
    numbering, on real filtered modes.  min_region > 0 exercises Prune."""
    import ctypes

    from stereo_tpu import native

    im = _teddy_crop(28, 36, 120, 180) if crop == "teddy" else _baby2_crop()
    luv = segmentation.rgb_to_luv(np.asarray(im, np.float32))
    modes = np.asarray(segmentation.mean_shift_filter(luv, 4, float(h_r)),
                       np.float32)
    H, W, _ = modes.shape

    ref_labels, ref_modes, ref_counts = segment_oracle(modes, h_r, min_region)

    got = np.zeros((H, W), np.uint32)
    L = native.lib()
    n = L.connect_modes(
        np.ascontiguousarray(modes).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        H, W, ctypes.c_float(float(h_r)), int(min_region),
        got.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))

    assert n == len(ref_counts)
    np.testing.assert_array_equal(got.astype(np.int64), ref_labels + 1)
    if min_region > 0:
        assert (ref_counts >= min_region).all() or len(ref_counts) == 1


def test_merge_wrap_quirk_pinned():
    """The reference Fill's commented-out column-boundary check makes
    neighbour offsets wrap across row ends (msImageProcessor.cpp:2010-2023);
    a two-column-block image whose halves are similar ONLY via the wrap edge
    must come out as ONE region, and the transcription + native merge agree."""
    import ctypes

    from stereo_tpu import native

    # one row: the 1-W offset applied to the linear index connects
    # (0, W-1) straight to (0, 0); interior pixels are mutually dissimilar
    H, W = 1, 6
    vals = np.array([0.0, 10.0, 20.0, 30.0, 40.0, 0.5], np.float32)
    modes = np.broadcast_to(vals[None, :, None], (H, W, 3)).copy()

    labels, _, _ = segment_oracle(modes, 5.0, 0)
    assert labels[0, 0] == labels[0, W - 1]  # fused ONLY via the wrap edge
    assert len(np.unique(labels)) == W - 1

    got = np.zeros((H, W), np.uint32)
    L = native.lib()
    n = L.connect_modes(
        np.ascontiguousarray(modes).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        H, W, ctypes.c_float(5.0), 0,
        got.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    np.testing.assert_array_equal(got.astype(np.int64), labels + 1)
    assert n == W - 1


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
