"""Binary fusion moves on the pixel grid.

The reference solves each binary fusion with QPBO roof duality
(rd.m, rd_mex.cpp:55-100) and keeps the current label where QPBO leaves nodes
unlabelled, so a fusion never increases the energy (property P2,
imrender/vgg/vgg_qpbo.m:14-17).

TPU-native design: a fusion move is a 2-label MRF whose pairwise terms are in
the *same* truncated-distance family as the multi-label problem —
V(a, b) = w * min(|d_a(tail @ head) - d_b(head @ head)|^k, tol)
(all_pairwise_costs, dispmap_super.m:236-262) — so the checkerboard TRW-S
solver doubles as the fusion solver with K = 2.  For binary pairwise MRFs the
TRW-S dual optimum coincides with the roof-duality (QPBO) bound, so at
convergence the lower bound matches.  The decoded labeling carries no
per-node persistency certificate, so we enforce the reference's "never
increase" invariant directly: accept the move only where it helps —
if the decoded fusion has higher energy than the incumbent, keep the
incumbent (the analog of all-nodes-unlabelled).

An exact CPU QPBO oracle (stereo_tpu/native) backs parity tests and offers a
bit-faithful host path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_tpu import geometry
from stereo_tpu.solvers import trws


class FusionResult(NamedTuple):
    take: jax.Array  # [H, W] bool: where to adopt the proposal
    energy: jax.Array  # energy of the accepted configuration
    lower_bound: jax.Array  # TRW-S/roof-duality style lower bound
    iterations: jax.Array


def fusion_problem(
    current_planes: jax.Array,
    proposal_planes: jax.Array,
    normalize: tuple | None = None,
):
    """Build the K=2 label geometry for a fusion move.

    Returns (D0 [2,H,W], Q [4,2,H,W]): label 0 = current, 1 = proposal;
    positions are the continuous disparities entering the pairwise terms.
    """

    def norm(x):
        if normalize is None:
            return x
        return (x - normalize[0]) / normalize[1]

    def own(planes):
        return norm(geometry.own_disparity(planes))

    def nbr(planes, d):
        return norm(geometry.neighbor_plane_disparity(planes, d, fill=0.0))

    D0 = jnp.stack([own(current_planes), own(proposal_planes)], axis=0)
    Q = jnp.stack(
        [
            jnp.stack([nbr(current_planes, d), nbr(proposal_planes, d)], axis=0)
            for d in range(geometry.NUM_DIRS)
        ],
        axis=0,
    )
    return D0, Q


def binary_fuse(
    unary0: jax.Array,  # [H, W] unary cost of keeping the current label
    unary1: jax.Array,  # [H, W] unary cost of taking the proposal
    D0: jax.Array,  # [2, H, W] from fusion_problem
    Q: jax.Array,  # [4, 2, H, W]
    alphas: jax.Array,  # [4, H, W]
    *,
    kernel: int,
    tol,
    maxiter: int = 50,
    max_relgap: float = 1e-6,
    current_energy: jax.Array | None = None,
    check_every: int = 5,
) -> FusionResult:
    """One fusion move; never increases the energy.

    ``current_energy``: energy of the all-zeros labeling (incumbent).  If not
    given it is computed from the solver data (exactly consistent with the
    decode energy, so the guard is sound).
    """
    theta = jnp.stack([unary0, unary1], axis=0)
    res = trws.solve(
        theta, D0, Q, alphas, kernel=kernel, tol=tol, maxiter=maxiter,
        max_relgap=max_relgap, check_every=check_every,
    )
    if current_energy is None:
        zeros = jnp.zeros(unary0.shape, jnp.int32)
        current_energy = trws.labeling_energy(zeros, theta, D0, Q, alphas, kernel, tol)
    improved = res.energy <= current_energy
    take = jnp.logical_and(res.labels == 1, improved)
    energy = jnp.where(improved, res.energy, current_energy)
    return FusionResult(take, energy, res.lower_bound, res.iterations)
