"""Slow numpy oracles mirroring the reference's edge-list formulation.

These intentionally follow the MATLAB structure (flat 4xN assignments,
explicit ind1/ind2 directed edge lists, per-edge loops) so the dense
grid implementation in stereo_tpu can be tested against an independent
construction.  Column-major (Fortran) node numbering matches MATLAB's
``nodenr(:) = 1:N`` (dispmap_super.m:279-302).
"""

from __future__ import annotations

import numpy as np


def build_neighborhood(H: int, W: int):
    """Directed edge lists (ind1=tail, ind2=head), 0-based, column-major nodes.

    Mirrors construct_neighborhood (dispmap_super.m:279-302): vertical edges
    both directions first, then horizontal both directions.
    """
    nodenr = np.arange(H * W).reshape(W, H).T  # column-major numbering
    ind1, ind2 = [], []
    # vertical
    start = nodenr[:-1, :].flatten(order="F")
    finish = nodenr[1:, :].flatten(order="F")
    ind1 += [start, finish]
    ind2 += [finish, start]
    # horizontal
    start = nodenr[:, :-1].flatten(order="F")
    finish = nodenr[:, 1:].flatten(order="F")
    ind1 += [start, finish]
    ind2 += [finish, start]
    return np.concatenate(ind1), np.concatenate(ind2)


def points(H: int, W: int):
    """2 x N array of 1-based (x; y) coordinates, column-major order."""
    xx, yy = np.meshgrid(np.arange(1, W + 1), np.arange(1, H + 1))
    return np.stack([xx.flatten(order="F"), yy.flatten(order="F")], axis=0).astype(
        np.float64
    )


def planes_to_flat(planes):
    """[4, H, W] -> [4, N] with column-major pixel order (MATLAB linear index)."""
    p = np.asarray(planes)
    return np.stack([p[i].flatten(order="F") for i in range(4)], axis=0)


def disparity_from_assignment(assignment, pts, normalize=None):
    """-(a*x + b*y + d)/c (dispmap_super.m:318-328), optional (d_min, d_step)."""
    disps = -(assignment[0] * pts[0] + assignment[1] * pts[1] + assignment[3]) / (
        assignment[2]
    )
    if normalize is not None:
        d_min, d_step = normalize
        disps = (disps - d_min) / d_step
    return disps


def pairwise_cost(p, q, w, kernel, tol):
    if kernel == 1:
        return w * np.minimum(np.abs(p - q), tol)
    return w * np.minimum((p - q) ** 2, tol)


def edge_qs(assignment, ind1, ind2, pts, normalize=None):
    """q (head plane at head point) and qprim (tail plane at head point).

    Mirrors all_pairwise_costs (dispmap_super.m:243-244).
    """
    q = disparity_from_assignment(assignment[:, ind2], pts[:, ind2], normalize)
    qprim = disparity_from_assignment(assignment[:, ind1], pts[:, ind2], normalize)
    return q, qprim


def total_energy(unary_flat, assignment, H, W, weights_flat, kernel, tol, normalize=None):
    """Unary (per node, flat column-major) + directed-edge smoothness sum."""
    ind1, ind2 = build_neighborhood(H, W)
    pts = points(H, W)
    q, qprim = edge_qs(assignment, ind1, ind2, pts, normalize)
    E = pairwise_cost(q, qprim, weights_flat, kernel, tol)
    return float(np.sum(unary_flat) + np.sum(E))


def dense_weights_to_flat(weights_4hw):
    """[4, H, W] in-edge weight maps -> per-edge flat weights in oracle edge order.

    Oracle edge order: vertical (down-in then up-in), horizontal (right-in then
    left-in) — see build_neighborhood.  For a directed edge (tail->head), the
    dense map index is [direction of tail relative to head] at the head pixel.
    """
    w = np.asarray(weights_4hw)
    H, Wd = w.shape[1], w.shape[2]
    # DIRS order in stereo_tpu.geometry: left=(0,-1), right=(0,1), up=(-1,0), down=(1,0)
    out = []
    # vertical edges, first block: tail = upper (start), head = lower (finish):
    # at head, tail is the 'up' neighbor -> dense dir index 2, rows 1..H-1
    out.append(w[2, 1:, :].flatten(order="F"))
    # second block: tail = lower, head = upper: dense dir 'down' = 3, rows 0..H-2
    out.append(w[3, :-1, :].flatten(order="F"))
    # horizontal, first block: tail = left col, head = right col: dir 'left' = 0
    out.append(w[0, :, 1:].flatten(order="F"))
    # second block: tail = right, head = left: dir 'right' = 1
    out.append(w[1, :, :-1].flatten(order="F"))
    return np.concatenate(out)
