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


def model_problem(dm, props):
    """One model's simultaneous-fusion inputs (incumbent appended like
    dispmap_super.m:158).

    Returns (unary [K,H,W], D0 [K,H,W], Q [4,K,H,W], alphas [4,H,W],
    prop_stack [K,4,H,W])."""
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
    return unary, D0, Q, dm.smooth_weights, stack


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
    parts = [model_problem(dm, props)
             for dm, props in zip(models, proposals_per_model)]
    return tuple(jnp.stack([p[i] for p in parts]) for i in range(5))


def simultaneous_fusion_batched(models, proposals_per_model, mesh,
                                maxiter=1000, max_relgap=1e-4,
                                compact=False):
    """Fuse B problems at once across the mesh; updates each model in place.

    Returns list of (energy, lower_bound, iterations_total).
    """
    kernel = models[0].smoothness_kernel
    tol = models[0].tol
    assert all(m.smoothness_kernel == kernel for m in models)
    unary, D0, Q, alphas, stacks = batched_problem(models, proposals_per_model)

    res = mesh_mod.sharded_solve(
        mesh, unary, D0, Q, alphas, kernel=kernel, tol=tol, maxiter=maxiter,
        max_relgap=max_relgap, compact=compact,
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


def simultaneous_fusion_pool(models, proposals_per_model, mesh, *,
                             maxiter=1000, max_relgap=1e-4, check_every=50,
                             max_retries=1, on_progress=None,
                             compact=False):
    """Production multi-pair driver: per-pair convergence and eviction.

    A fixed pool of B = mesh 'batch'-axis slots runs chunks of
    ``check_every`` sweeps in one jit; after each chunk, pairs whose relgap
    (E - lb)/E has met ``max_relgap`` (or whose sweep budget is exhausted)
    are *evicted* — labels written back into their model, the slot refilled
    from the pending queue with fresh (zero) messages — so N > B pairs
    stream through the mesh and pairs finish at different iteration counts.

    Failure-graceful like the reference's fusion loop
    (ojw_stereo_optim.m:116-127): a chunk that raises is retried up to
    ``max_retries`` times (transient backend drops); a persistent failure
    ends the run gracefully, every model keeping its current incumbent, and
    unfinished pairs reported with status "failed".

    Returns a list of dicts (one per input pair, input order):
    {"energy", "lower_bound", "iterations", "status"} with status in
    {"converged", "maxiter", "failed", "pending"}.
    """
    from collections import deque

    B = int(mesh.devices.shape[0])
    n = len(models)
    if len(proposals_per_model) != n:
        raise ValueError("one proposal list per model required")
    shapes = {m.sz for m in models}
    ks = {len(p) for p in proposals_per_model}
    if len(shapes) != 1 or len(ks) != 1:
        raise ValueError("pooled fusion needs same-shaped problems and "
                         "equal proposal counts")
    kernel = models[0].smoothness_kernel
    tol = models[0].tol
    assert all(m.smoothness_kernel == kernel for m in models)

    pending = deque(range(n))
    results = [{"energy": None, "lower_bound": None, "iterations": 0,
                "status": "pending"} for _ in range(n)]
    # slot state: problem arrays + messages + pair index (-1 = idle)
    slots = []
    problems = {}

    def load(i):
        if i not in problems:
            problems[i] = model_problem(models[i], proposals_per_model[i])
        return problems[i]

    K = len(proposals_per_model[0]) + 1
    H, W = models[0].sz
    dtype = models[0].dtype
    zero_msg = jnp.zeros((4, K, H, W), dtype)

    for _ in range(B):
        if pending:
            i = pending.popleft()
            slots.append({"pair": i, "prob": load(i), "msg": zero_msg,
                          "iters": 0})
        else:
            slots.append(None)

    def finish(slot, e, lb, labels, status):
        i = slot["pair"]
        dm = models[i]
        stack = slot["prob"][4]
        dm.assignment = jnp.take_along_axis(
            stack, labels[None, None, :, :].astype(jnp.int32), axis=0)[0]
        results[i] = {"energy": float(e), "lower_bound": float(lb),
                      "iterations": slot["iters"], "status": status}
        if on_progress:
            on_progress(i, results[i])

    while any(s is not None for s in slots):
        live = [s for s in slots if s is not None]
        # pad the batch to B with replicas of the first live slot (their
        # results are discarded) so the jit shape stays fixed
        padded = live + [live[0]] * (B - len(live))
        unary = jnp.stack([s["prob"][0] for s in padded])
        D0 = jnp.stack([s["prob"][1] for s in padded])
        Q = jnp.stack([s["prob"][2] for s in padded])
        alphas = jnp.stack([s["prob"][3] for s in padded])
        msgs = jnp.stack([s["msg"] for s in padded])

        res = None
        for attempt in range(max_retries + 1):
            try:
                res = mesh_mod.sharded_solve(
                    mesh, unary, D0, Q, alphas, kernel=kernel, tol=tol,
                    maxiter=check_every, max_relgap=max_relgap,
                    messages=msgs, check_every=check_every, compact=compact)
                jax.block_until_ready(res.energy)
                break
            except Exception as exc:  # transient backend drop: retry, then bail
                import sys as _sys
                import traceback as _tb

                print(f"pooled fusion chunk failed "
                      f"(attempt {attempt + 1}/{max_retries + 1}): {exc!r}",
                      file=_sys.stderr)
                if attempt == max_retries:
                    _tb.print_exc(file=_sys.stderr)
                    for s in live:
                        e = s.get("last_e")
                        results[s["pair"]] = {
                            "energy": e, "lower_bound": s.get("last_lb"),
                            "iterations": s["iters"], "status": "failed"}
                    return results
        energies = np.asarray(res.energy)
        lbs = np.asarray(res.lower_bound)
        iters = np.asarray(res.iterations)

        for k, s in enumerate(live):
            s["iters"] += int(iters[k])
            s["msg"] = res.messages[k]
            s["last_e"] = float(energies[k])
            s["last_lb"] = float(lbs[k])
            e, lb = float(energies[k]), float(lbs[k])
            relgap = (e - lb) / e if e else 0.0
            if relgap < max_relgap:
                finish(s, e, lb, res.labels[k], "converged")
            elif s["iters"] >= maxiter:
                finish(s, e, lb, res.labels[k], "maxiter")
            else:
                continue
            # evict: refill from the queue or idle the slot
            j = slots.index(s)
            if pending:
                i = pending.popleft()
                slots[j] = {"pair": i, "prob": load(i), "msg": zero_msg,
                            "iters": 0}
            else:
                slots[j] = None
    return results
