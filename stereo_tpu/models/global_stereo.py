"""Woodford-unary disparity model (the dispmap_globalstereo equivalent).

Unary from "Global stereo reconstruction under second-order smoothness
priors" (Woodford et al., PAMI 2009): projective warp + robust log kernel
(dispmap_globalstereo.m:355-375, 405).  Smoothness weights from mean-shift
segmentation: lambda_h inside a segment, lambda_l across boundaries, scaled by
num_images (preprocess, :377-414).  Pairwise terms act on disparities
normalized by (d - d_min)/d_step (:336-345).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from stereo_tpu import energy, geometry
from stereo_tpu.config import CVPR08Options
from stereo_tpu.models.base import DispMap
from stereo_tpu.ops import photo
from stereo_tpu.proposals import segmentation, segpln as segpln_mod


class DispMapGlobalStereo(DispMap):
    def __init__(self, images, P, disp_range, disparity_factor,
                 options: CVPR08Options | None = None, *, seed: int = 0, **kw):
        options = options or CVPR08Options()
        super().__init__(images, options.smoothness_kernel, **kw)
        self.options = options
        self.tol = float(options.disp_thresh)

        P = np.asarray(P, dtype=np.float64)  # [n_views, 3, 4]
        if np.abs(P[0] - np.eye(3, 4)).max() > 1e-12:
            raise ValueError("First image must be reference image")
        self.P = P

        self.disp_range = tuple(disp_range)
        self.disparity_factor = int(disparity_factor)
        disps = np.arange(disp_range[0] * disparity_factor,
                          disp_range[1] * disparity_factor + 1)
        self.disps = np.sort(disps)[::-1].astype(np.float64)  # descending (:48-49)
        self.d_min = float(self.disps[-1])
        self.d_step = float(self.disps[0] - self.d_min)
        self.normalize = (self.d_min, self.d_step)

        self._preprocess()
        H, W = self.sz
        rng = np.random.default_rng(seed)
        self.start_disparity = jnp.asarray(
            rng.random((H, W)) * self.d_step + self.d_min, self.dtype
        )
        self.restart()

    # -------------------------------------------------------------- setup
    def _preprocess(self):
        """Segmentation-modulated smoothness weights + kernel-2 rescaling
        (preprocess, dispmap_globalstereo.m:377-414)."""
        opts = self.options
        H, W = self.sz
        im_u8 = np.asarray(jnp.clip(self.images[0], 0, 255)).astype(np.uint8)
        seg = segmentation.mean_shift(
            im_u8.astype(np.float64), int(opts.seg_params[0]),
            float(opts.seg_params[1]), int(opts.seg_params[2]),
        )
        self.segments = seg
        self.improve = opts.improve > 0

        num_in = len(self.images)
        scale = num_in / ((opts.connect == 8) + 1)
        w = np.zeros((geometry.NUM_DIRS, H, W))
        for d, (dy, dx) in enumerate(geometry.DIRS):
            # weight of the in-edge from the (dy, dx) neighbor: lambda_h when
            # both pixels share a segment, else lambda_l (:399-403)
            nbr = np.roll(seg, (-dy, -dx), axis=(0, 1))
            same = seg == nbr
            valid = np.asarray(geometry.valid_mask(H, W, d, dtype=jnp.float64))
            w[d] = (same * opts.lambda_h + ~same * opts.lambda_l) * scale * valid
        if self.smoothness_kernel == 2:
            w = w / self.tol
            self.tol = self.tol ** 2
        self.smooth_weights = jnp.asarray(w, self.dtype)

    def restart(self):
        """Reset to the (fixed) random initial field (:208-211, 347-353)."""
        self.assignment = geometry.plane_field_from_disparity(self.start_disparity)

    # -------------------------------------------------------------- unary
    def unary_map(self, planes: jax.Array) -> jax.Array:
        return _global_unary(
            planes, self.images[0], self.images[1],
            jnp.asarray(self.P[1], self.dtype), self.options.col_thresh,
            self.d_min, self.d_step,
        )

    def unary_partial(self):
        """Traceable unary as a pytree-of-arrays callable (for fused sweeps)."""
        return jax.tree_util.Partial(
            unary_pure, self.images[0], self.images[1],
            jnp.asarray(self.P[1], self.dtype),
            jnp.asarray(self.options.col_thresh, self.dtype),
            jnp.asarray(self.d_min, self.dtype),
            jnp.asarray(self.d_step, self.dtype),
        )

    # ---------------------------------------------------------- proposals
    def segpln(self, seed: int = 0) -> list[jax.Array]:
        """14 segmentation-driven piecewise-planar proposals (:60-201)."""
        props = segpln_mod.segpln(
            [np.asarray(im) for im in self.images],
            [self.P[i] for i in range(len(self.images))],
            self.disps, self.options.col_thresh, self.options.window,
            seed=seed,
        )
        return [jnp.asarray(p, self.dtype) for p in props]


def unary_pure(im_ref, im_other, P_other, col_thresh, d_min, d_step, planes):
    """Pure Woodford unary: all inputs traceable."""
    return photo.unary_cost(
        planes, im_ref, im_other, P_other, col_thresh,
        d_min=d_min, d_step=d_step,
    )


@functools.partial(jax.jit, static_argnames=("col_thresh", "d_min", "d_step"))
def _global_unary(planes, im_ref, im_other, P_other, col_thresh, d_min, d_step):
    return unary_pure(im_ref, im_other, P_other, col_thresh, d_min, d_step,
                      planes)
