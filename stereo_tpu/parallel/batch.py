"""Multi-pair batched simultaneous fusion over a device mesh.

The "high-res multi-pair batch" configuration: B same-shaped stereo problems
ride a leading batch axis mapped to the mesh's 'batch' dimension while the
pixel grid is spatially partitioned over 'x' — data parallelism and the
sequence-parallel analog composed in one jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stereo_tpu import geometry
from stereo_tpu.parallel import mesh as mesh_mod


def batched_problem(models, proposals_per_model):
    """Stack B models' simultaneous-fusion inputs.

    models: same-shaped DispMap instances; proposals_per_model: list of lists
    of [4, H, W] proposals (equal K per model; the incumbent is appended like
    dispmap_super.m:158).
    Returns (unary [B,K,H,W], D0 [B,K,H,W], Q [B,4,K,H,W], alphas [B,4,H,W],
    prop_stacks [B,K,4,H,W]).
    """
    shapes = {m.sz for m in models}
    if len(shapes) != 1:
        raise ValueError(
            f"batched fusion needs same-shaped problems, got sizes {sorted(shapes)}"
        )
    unaries, D0s, Qs, alphas, stacks = [], [], [], [], []
    for dm, props in zip(models, proposals_per_model):
        all_props = [jnp.asarray(p, dm.dtype) for p in props]
        all_props.append(dm.assignment)
        stack = jnp.stack(all_props, axis=0)
        unary = jnp.stack([dm.unary_map(p) for p in all_props], axis=0)

        def norm(x):
            if dm.normalize is None:
                return x
            return (x - dm.normalize[0]) / dm.normalize[1]

        D0 = norm(jax.vmap(geometry.own_disparity)(stack))
        Q = jnp.stack(
            [
                norm(jax.vmap(
                    lambda p, d=d: geometry.neighbor_plane_disparity(p, d, fill=0.0)
                )(stack))
                for d in range(geometry.NUM_DIRS)
            ],
            axis=0,
        )
        unaries.append(unary)
        D0s.append(D0)
        Qs.append(Q)
        alphas.append(dm.smooth_weights)
        stacks.append(stack)
    return (jnp.stack(unaries), jnp.stack(D0s), jnp.stack(Qs),
            jnp.stack(alphas), jnp.stack(stacks))


def simultaneous_fusion_batched(models, proposals_per_model, mesh,
                                maxiter=1000, max_relgap=1e-4):
    """Fuse B problems at once across the mesh; updates each model in place.

    Returns list of (energy, lower_bound, iterations_total).
    """
    kernel = models[0].smoothness_kernel
    tol = models[0].tol
    assert all(m.smoothness_kernel == kernel for m in models)
    unary, D0, Q, alphas, stacks = batched_problem(models, proposals_per_model)

    res = mesh_mod.sharded_solve(
        mesh, unary, D0, Q, alphas, kernel=kernel, tol=tol, maxiter=maxiter,
        max_relgap=max_relgap,
    )
    out = []
    for b, dm in enumerate(models):
        labels = res.labels[b]
        dm.assignment = jnp.take_along_axis(
            stacks[b], labels[None, None, :, :].astype(jnp.int32), axis=0
        )[0]
        out.append((float(res.energy[b]), float(res.lower_bound[b]),
                    int(res.iterations[b])))
    return out
