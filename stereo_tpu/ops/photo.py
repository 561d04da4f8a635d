"""Woodford CVPR'08 photometric unary: projective warp + robust kernel.

Re-design of dispmap_globalstereo.unary_cost (:355-375) and the ephoto kernel
(:405): project each pixel through the second camera at its plane's disparity,
bilinearly sample the second image, and score the color difference with

    ephoto(F) = log(2) - log(exp(-||F||^2 / (col_thresh * C)) + 1)

which is 0 for a perfect match and saturates at log 2.  Also the windowed
RSSD correlation volume of segpln (dispmap_globalstereo.m:84-108).

P convention: the reference stores P transposed (4x3 per view,
dispmap_globalstereo.m:43); we take the raw 3x4 camera matrices and transpose
internally.  Image 1 must be the reference view (identity K[R|t] up to the
disparity column, :40-42).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stereo_tpu import geometry
from stereo_tpu.ops.interp import interp2


def ephoto(F: jax.Array, col_thresh: float, colors: int) -> jax.Array:
    """Robust photoconsistency kernel (dispmap_globalstereo.m:405).

    F: [..., C] color difference; returns [...].
    """
    ss = jnp.sum(F * F, axis=-1) * (-1.0 / (col_thresh * colors))
    return jnp.log(2.0) - jnp.log(jnp.exp(ss) + 1.0)


def project(P: jax.Array, xs, ys, disp):
    """Homogeneous projection [x y 1 d] @ P^T -> (u, v) image coordinates.

    P: [3, 4] camera matrix of the target view; xs/ys/disp: [..., H, W].
    Matches T = WC * self.P(:,:,a) with the stored transpose
    (dispmap_globalstereo.m:361-368).
    """
    T1 = P[0, 0] * xs + P[0, 1] * ys + P[0, 2] + P[0, 3] * disp
    T2 = P[1, 0] * xs + P[1, 1] * ys + P[1, 2] + P[1, 3] * disp
    T3 = P[2, 0] * xs + P[2, 1] * ys + P[2, 2] + P[2, 3] * disp
    n = 1.0 / T3
    return T1 * n, T2 * n


def unary_cost(
    planes: jax.Array,  # [4, H, W]
    im_ref: jax.Array,  # [H, W, C] reference image (double-valued)
    im_other: jax.Array,  # [H, W, C] second image
    P_other: jax.Array,  # [3, 4] camera of the second image
    col_thresh: float,
    *,
    d_min: float,
    d_step: float,
    oobv: float = -1000.0,
) -> jax.Array:
    """Per-pixel Woodford unary for a plane-label field [H, W].

    Reproduces the reference's normalization quirk exactly: the raw disparity
    is mapped to d_step * ((raw - d_min)/d_step + d_min) before projection
    (dispmap_globalstereo.m:356 composed with :336-345) — the identity when
    d_min == 0, which holds for all bundled datasets.
    """
    H, W, C = im_ref.shape
    xs, ys = geometry.grid_points(H, W, dtype=planes.dtype)
    raw = geometry.plane_disparity(planes, xs, ys)
    disp = d_step * ((raw - d_min) / d_step + d_min)
    u, v = project(P_other, xs, ys, disp)
    M = interp2(im_other, u, v, oobv=oobv)
    return ephoto(M - im_ref, col_thresh, C)


def rssd_volume(
    images: list[jax.Array],  # [H, W, C] each; images[0] is the reference
    Ps: list[jax.Array],  # [3, 4] per image
    disparities,  # static descending grid (dispmap_globalstereo.m:48-49)
    col_thresh: float,
    window: int,
    *,
    oobv: float = -1000.0,
) -> jax.Array:
    """Windowed robust-SSD correlation volume [D, H-2w, W-2w] + normalization
    to [~0, 1] scores (segpln, dispmap_globalstereo.m:84-108).

    Returns (corr, max_score) where scores are (X - corr)/X with
    X = ephoto(-1000 - R) * num_images summed... (we return the normalized
    volume directly, matching :107-108).
    """
    from stereo_tpu.ops.filters import valid_average_2d

    im_ref = images[0]
    H, W, C = im_ref.shape
    dtype = im_ref.dtype
    disparities = np.asarray(disparities, dtype=np.float64)
    xs, ys = geometry.grid_points(H, W, dtype=dtype)

    corr = jnp.zeros((len(disparities), H - 2 * window, W - 2 * window), dtype)
    dvec = jnp.asarray(disparities, dtype)
    for a, (im, P) in enumerate(zip(images, Ps)):

        def level(d):
            u, v = project(P, xs, ys, d * jnp.ones((H, W), dtype))
            Y = interp2(im, u, v, oobv=oobv)  # [H, W, C]
            E = ephoto(Y - im_ref, col_thresh, C)
            return valid_average_2d(E, window)

        # chunked sequential map keeps peak memory at ~16 warped images
        corr = corr + jax.lax.map(level, dvec, batch_size=16)

    # normalize: score = (X - corr) / X with X = worst-case ephoto * n_images
    X = ephoto(jnp.full((1, 1, C), oobv, dtype) - im_ref[:1, :1], col_thresh, C)
    X = X[0, 0] * len(images)
    return (X - corr) / X
