"""NCC-unary disparity model (the dispmap_ncc equivalent).

Precomputes the NCC volume once (HBM-resident across all fusions — the
reference rebuilds MATLAB temporaries per call, dispmap_ncc.m:222-249), scores
any plane field by sampling the volume at its continuous disparities, and
initializes from the sub-sample-refined WTA disparity (dispmap_ncc.m:199-221).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from stereo_tpu import geometry
from stereo_tpu.models.base import DispMap
from stereo_tpu.ops import ncc as ncc_ops


class DispMapNCC(DispMap):
    def __init__(self, images, disparities, kernel: int, unary_weight: float,
                 tol: float, **kw):
        super().__init__(images, kernel, **kw)
        if unary_weight < 0:
            raise ValueError("Unary weight must be positive")
        if tol < 0:
            raise ValueError("Tolerance weight must be positive")
        self.disparities = np.asarray(disparities, dtype=np.float64)
        self.unary_weight = float(unary_weight)
        self.tol = float(tol)
        self.ncc = _compute_ncc(self.images[0], self.images[1],
                                tuple(self.disparities))
        self.restart()

    # ------------------------------------------------------------- unary
    def unary_map(self, planes: jax.Array) -> jax.Array:
        """w * (1 - ncc(disparity)) (dispmap_ncc.m:107-115)."""
        return _ncc_unary(planes, self.ncc, tuple(self.disparities),
                          self.unary_weight)

    def unary_partial(self):
        """Traceable unary as a pytree-of-arrays callable (for fused sweeps)."""
        return jax.tree_util.Partial(
            unary_pure, self.ncc, jnp.asarray(self.disparities, self.dtype),
            jnp.asarray(self.unary_weight, self.dtype),
        )

    # ------------------------------------------------------------- setup
    def restart(self):
        """Reset to the NCC WTA initial solution (dispmap_ncc.m:100-103)."""
        self.assignment = _init_from_ncc(self.ncc, tuple(self.disparities))

    def best_disp(self) -> jax.Array:
        return _best_disp(self.ncc, tuple(self.disparities))

    def generate_new_plane_RANSAC(self, x: float, y: float, r: float) -> jax.Array:
        """Constant-plane proposal fit to the NCC point cloud within radius r
        of (x, y) (dispmap_ncc.m:48-66).  1-based center coordinates."""
        return _plane_proposal(
            self.best_disp(),
            jnp.asarray(float(x), self.dtype), jnp.asarray(float(y), self.dtype),
            jnp.asarray(float(r), self.dtype),
            l1=self.smoothness_kernel == 1,
        )


@functools.partial(jax.jit, static_argnames=("disparities",))
def _compute_ncc(im0, im1, disparities):
    return ncc_ops.compute_ncc(im0, im1, np.asarray(disparities))


def unary_pure(ncc_vol, disparities, unary_weight, planes):
    """Pure NCC unary: all inputs traceable (dispmap_ncc.m:107-115)."""
    disp = geometry.own_disparity(planes)
    vals = ncc_ops.sample_at(ncc_vol, disparities, disp)
    return unary_weight * (1.0 - vals)


@functools.partial(jax.jit, static_argnames=("disparities",))
def _ncc_unary(planes, ncc_vol, disparities, unary_weight):
    return unary_pure(ncc_vol, jnp.asarray(np.asarray(disparities)),
                      unary_weight, planes)


@functools.partial(jax.jit, static_argnames=("disparities",))
def _best_disp(ncc_vol, disparities):
    return ncc_ops.best_disparity(ncc_vol, np.asarray(disparities))


@functools.partial(jax.jit, static_argnames=("disparities",))
def _init_from_ncc(ncc_vol, disparities):
    best = ncc_ops.best_disparity(ncc_vol, np.asarray(disparities))
    return geometry.plane_field_from_disparity(best)


@functools.partial(jax.jit, static_argnames=("l1",))
def _plane_proposal(best_disp, x, y, r, l1):
    from stereo_tpu.proposals.planes import fit_plane_to_points

    H, W = best_disp.shape
    xs, ys = geometry.grid_points(H, W, dtype=best_disp.dtype)
    mask = jnp.sqrt((xs - x) ** 2 + (ys - y) ** 2) < r
    p = fit_plane_to_points(xs, ys, best_disp, mask, l1=l1)
    return p[:, None, None] * jnp.ones((1, H, W), best_disp.dtype)
