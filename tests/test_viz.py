"""Visualization: files render, mesh cuts behave."""

import os

import numpy as np
import jax.numpy as jnp

from stereo_tpu import geometry
from stereo_tpu.utils import viz


def test_save_dispmap(tmp_path):
    p = viz.save_dispmap(str(tmp_path / "d.png"), np.random.rand(20, 30), 123.4)
    assert os.path.getsize(p) > 1000


def test_surface_mesh_cuts_discontinuities():
    H, W = 10, 12
    disp = np.zeros((H, W))
    disp[:, 6:] = 50.0  # step edge
    planes = np.asarray(geometry.plane_field_from_disparity(jnp.asarray(disp)))
    gray = np.ones((H, W)) * 0.5
    verts, tris, shade = viz.surface_mesh(planes, gray, tol=10.0)
    assert len(tris) > 0
    # no triangle spans the discontinuity between columns 5 and 6
    xs = verts[:, 0][tris]  # 1-based x coords of corners
    spans = (xs.min(axis=1) <= 6) & (xs.max(axis=1) >= 7)
    assert not spans.any()
    # continuous surface keeps all triangles
    verts2, tris2, _ = viz.surface_mesh(
        np.asarray(geometry.plane_field_from_disparity(jnp.zeros((H, W)))),
        gray, tol=10.0,
    )
    assert len(tris2) == 2 * (H - 1) * (W - 1)


def test_save_surfaces(tmp_path):
    H, W = 8, 9
    rng = np.random.default_rng(0)
    disp = rng.uniform(0, 5, (H, W))
    planes = np.asarray(geometry.plane_field_from_disparity(jnp.asarray(disp)))
    im = rng.uniform(0, 255, (H, W, 3))
    p = viz.save_surfaces(str(tmp_path / "s.png"), planes, im, tol=1000.0,
                          energy=42.0)
    assert os.path.getsize(p) > 1000
