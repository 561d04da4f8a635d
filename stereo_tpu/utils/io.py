"""Image / dataset IO for the bundled Middlebury pairs.

Replaces the reference's imread + download_stereo conventions: images are
loaded as double-valued float arrays in [0, 255] (MATLAB ``double(imread(.))``)
and stereo datasets carry the P-matrix convention of
imrender/ojw/download_stereo.m:116-117 — P of view n shifts x by
-(n-1)/(disparity_factor * im_space) per disparity unit; for the bundled
2-view pairs that is P(1,4,2) = -0.25 (example_global.m:17-18).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "data")


def load_image(path: str, dtype=np.float32) -> np.ndarray:
    """[H, W, 3] float image with values in [0, 255]."""
    from PIL import Image

    im = np.asarray(Image.open(path).convert("RGB"))
    return im.astype(dtype)


@dataclass
class StereoPair:
    name: str
    images: list  # two [H, W, 3] float arrays, images[0] = reference view
    P: np.ndarray  # [2, 3, 4] camera matrices
    disp_range: tuple  # (min, max) in dataset disparity units
    disparity_factor: int

    @property
    def shape(self):
        return self.images[0].shape[:2]


_PAIRS = {
    # example_global.m:17-20 / example_simultaneous.m:15-18
    "teddy": dict(disp_range=(0, 59), disparity_factor=4, p_shift=-0.25),
    "baby2": dict(disp_range=(0, 85), disparity_factor=3, p_shift=-0.25),
    # synthetic pair with bundled exact GT (tools/make_synth_pair.py) — the
    # bad-pixel metric's end-to-end fixture; Middlebury GT itself is a
    # runtime download in the reference (download_stereo.m) and absent here
    "synth": dict(disp_range=(0, 16), disparity_factor=8, p_shift=-0.125),
}


def load_ground_truth(name: str, root: str | None = None,
                      dtype=np.float32) -> np.ndarray | None:
    """Ground-truth disparity map of the reference view, or None if absent.

    The reference downloads GT at runtime (download_stereo.m) — impossible in
    a zero-egress environment, so GT is optional: place ``disp2.png`` (the
    Middlebury GT image for view 2, values = disparity_factor * disparity,
    0 = unknown) under ``<root>/<name>/`` or point the ``STEREO_TPU_GT_DIR``
    env var at a directory with ``<name>/disp2.png``.  Returns [H, W] float
    disparities in dataset units with NaN at unknown pixels.
    """
    if name not in _PAIRS:
        raise KeyError(f"Unknown bundled pair {name!r}; have {sorted(_PAIRS)}")
    roots = [r for r in (root, os.environ.get("STEREO_TPU_GT_DIR"), DATA_ROOT)
             if r]
    for r in roots:
        path = os.path.join(r, name, "disp2.png")
        if os.path.exists(path):
            from PIL import Image

            raw = np.asarray(Image.open(path).convert("I")).astype(dtype)
            gt = raw / _PAIRS[name]["disparity_factor"]
            gt[raw == 0] = np.nan  # Middlebury: 0 marks unknown
            return gt
    return None


def load_pair(name: str, root: str | None = None, dtype=np.float32) -> StereoPair:
    if name not in _PAIRS:
        raise KeyError(f"Unknown bundled pair {name!r}; have {sorted(_PAIRS)}")
    cfg = _PAIRS[name]
    root = root or DATA_ROOT
    im0 = load_image(os.path.join(root, name, "im2.png"), dtype)
    im1 = load_image(os.path.join(root, name, "im6.png"), dtype)
    P = np.zeros((2, 3, 4))
    P[:, :, :3] = np.eye(3)
    P[1, 0, 3] = cfg["p_shift"]
    return StereoPair(
        name=name,
        images=[im0, im1],
        P=P,
        disp_range=cfg["disp_range"],
        disparity_factor=cfg["disparity_factor"],
    )
