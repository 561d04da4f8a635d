"""Energy of a plane-label field: unary + truncated second-order smoothness.

Reference semantics (dispmap_super.m:226-274): the pairwise term is summed over
*directed* edges.  For the directed edge (tail n -> head p) the cost is

    w_e * min(|d_{l_p}(x_p) - d_{l_n}(x_p)|^k, tol),   k in {1, 2}

i.e. the discrepancy between the head's own disparity and the tail's plane
extrapolated to the head's point (dispmap_super.m:243-246).  Both directions of
every grid edge are present (construct_neighborhood, dispmap_super.m:279-302),
so each pixel pair contributes twice, once measured at each endpoint — this is
what makes a pairwise potential over plane labels a *second-order* (curvature)
prior.

Dense formulation: for each of the 4 in-edge directions d, the per-pixel cost
field is ``w[d] * trunc(|D0 - Q_d|)`` where D0[p] = own disparity and
Q_d[p] = neighbor's plane at p's point; border pixels are masked via w[d] = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_tpu import geometry
from stereo_tpu.geometry import DIRS, NUM_DIRS


def truncated_kernel(diff: jax.Array, kernel: int, tol) -> jax.Array:
    """min(|diff|, tol) for kernel 1, min(diff^2, tol) for kernel 2.

    (pairwise_cost, dispmap_super.m:226-235.)
    """
    if kernel == 1:
        return jnp.minimum(jnp.abs(diff), tol)
    elif kernel == 2:
        return jnp.minimum(diff * diff, tol)
    raise ValueError(f"Unknown smoothness kernel {kernel!r}")


def default_weights(H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """All-ones directed edge weights [4, H, W], zero where no neighbor exists.

    Matches the reference default smooth_weights = 1 (dispmap_super.m:35).
    weights[d, y, x] multiplies the in-edge from the DIRS[d] neighbor of (y,x).
    """
    return jnp.stack(
        [geometry.valid_mask(H, W, d, dtype=dtype) for d in range(NUM_DIRS)], axis=0
    )


def pairwise_energy_map(
    planes: jax.Array,
    weights: jax.Array,
    kernel: int,
    tol,
    normalize: tuple | None = None,
) -> jax.Array:
    """Per-pixel sum of in-edge smoothness costs. [4,H,W] planes -> [H,W].

    ``normalize``: optional (d_min, d_step) rescaling of disparities before the
    kernel, as dispmap_globalstereo overloads disparitymap_from_assignment
    (dispmap_globalstereo.m:336-345).
    """
    D0 = geometry.own_disparity(planes)
    if normalize is not None:
        d_min, d_step = normalize
        D0 = (D0 - d_min) / d_step
    total = jnp.zeros_like(D0)
    for d in range(NUM_DIRS):
        Qd = geometry.neighbor_plane_disparity(planes, d, fill=0.0)
        if normalize is not None:
            d_min, d_step = normalize
            Qd = (Qd - d_min) / d_step
        cost = truncated_kernel(D0 - Qd, kernel, tol)
        # weights[d] is zero on invalid borders, so the fill value never counts.
        total = total + weights[d] * cost
    return total


def pairwise_energy(
    planes: jax.Array,
    weights: jax.Array,
    kernel: int,
    tol,
    normalize: tuple | None = None,
) -> jax.Array:
    """Total smoothness energy (scalar), accumulated in float64-free safe order."""
    m = pairwise_energy_map(planes, weights, kernel, tol, normalize)
    return jnp.sum(m, dtype=jnp.promote_types(m.dtype, jnp.float32))


def total_energy(
    unary: jax.Array,
    planes: jax.Array,
    weights: jax.Array,
    kernel: int,
    tol,
    normalize: tuple | None = None,
) -> jax.Array:
    """unary: per-pixel unary cost map [H, W] of the current labeling."""
    return jnp.sum(unary, dtype=jnp.promote_types(unary.dtype, jnp.float32)) + (
        pairwise_energy(planes, weights, kernel, tol, normalize)
    )


def binary_fusion_pairwise_tables(
    current: jax.Array,
    proposal: jax.Array,
    kernel: int,
    tol,
    normalize: tuple | None = None,
):
    """Per-direction E00/E01/E10/E11 cost maps for a binary fusion move.

    Returns a [4, 4, H, W] array indexed [d, table, :, :] with table order
    (E00, E01, E10, E11); label 0 = current, 1 = proposal.  For the directed
    edge (tail n -> head p), E_{ab} uses tail label a and head label b —
    matching all_pairwise_costs (dispmap_super.m:236-262) where E10 pairs the
    current head value with the proposal tail value, etc.
    """

    def disp_own(planes):
        D = geometry.own_disparity(planes)
        if normalize is not None:
            D = (D - normalize[0]) / normalize[1]
        return D

    def disp_nbr(planes, d):
        Q = geometry.neighbor_plane_disparity(planes, d, fill=0.0)
        if normalize is not None:
            Q = (Q - normalize[0]) / normalize[1]
        return Q

    D0_cur = disp_own(current)
    D0_new = disp_own(proposal)
    out = []
    for d in range(NUM_DIRS):
        Q_cur = disp_nbr(current, d)
        Q_new = disp_nbr(proposal, d)
        # head label vs tail label; cost measured at the head pixel.
        e00 = truncated_kernel(D0_cur - Q_cur, kernel, tol)
        e01 = truncated_kernel(D0_new - Q_cur, kernel, tol)  # tail current, head prop
        e10 = truncated_kernel(D0_cur - Q_new, kernel, tol)  # tail prop, head current
        e11 = truncated_kernel(D0_new - Q_new, kernel, tol)
        out.append(jnp.stack([e00, e01, e10, e11], axis=0))
    return jnp.stack(out, axis=0)


def fuse_labelling(current: jax.Array, proposal: jax.Array, take: jax.Array) -> jax.Array:
    """Merge: where take (bool [H, W]) pick proposal's plane, else current.

    (dispmap_super.m:83: assignment(:, labelling == 1) = proposal.)
    """
    return jnp.where(take[None, :, :], proposal, current)
