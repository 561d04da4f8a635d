"""Ground-truth wiring: load_ground_truth scaling/unknown handling and the
bad-pixel metric end-to-end (BASELINE metric 1; download_stereo.m:116-117
provides GT at runtime in the reference — here GT arrives via files/env)."""

import os

import numpy as np
import pytest
from PIL import Image

from stereo_tpu.utils import io, metrics


def _write_gt(tmp_path, name, arr):
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr.astype(np.uint8), mode="L").save(d / "disp2.png")
    return str(tmp_path)


def test_load_ground_truth_scaling_and_unknown(tmp_path):
    raw = np.array([[0, 4, 8], [12, 16, 0]], np.uint8)  # teddy factor = 4
    root = _write_gt(tmp_path, "teddy", raw)
    gt = io.load_ground_truth("teddy", root=root)
    assert gt is not None
    assert np.isnan(gt[0, 0]) and np.isnan(gt[1, 2])  # 0 = unknown
    np.testing.assert_allclose(gt[0, 1:], [1.0, 2.0])
    np.testing.assert_allclose(gt[1, :2], [3.0, 4.0])


def test_load_ground_truth_env_var(tmp_path, monkeypatch):
    raw = np.full((2, 2), 6, np.uint8)  # baby2 factor = 3 -> disparity 2
    root = _write_gt(tmp_path, "baby2", raw)
    monkeypatch.setenv("STEREO_TPU_GT_DIR", root)
    gt = io.load_ground_truth("baby2")
    np.testing.assert_allclose(gt, 2.0)


def test_load_ground_truth_absent(tmp_path):
    assert io.load_ground_truth("teddy", root=str(tmp_path)) is None


def test_bad_pixel_rate_respects_unknowns():
    gt = np.array([[1.0, np.nan], [3.0, 4.0]])
    disp = np.array([[1.2, 99.0], [5.5, 4.0]])
    # errors: 0.2 (ok), unknown (skipped), 2.5 (bad), 0 (ok) -> 1/3
    assert metrics.bad_pixel_rate(disp, gt, threshold=1.0) == pytest.approx(
        1.0 / 3.0)


def test_unknown_pair_raises():
    with pytest.raises(KeyError):
        io.load_ground_truth("nonesuch")
