"""Time-to-energy race: host serial TRW-S vs TPU schedules on baby2 K=15.

Measures the VERDICT item-1 benchmark honestly:
  1. the native serial O(K) TRW-S (trws_host — the trws_mex stand-in) run to
     the reference stopping rule (3000 iters, relgap 1e-5) with a per-
     iteration (energy, lb, seconds) trace;
  2. the TPU checkerboard schedule, decoded every `chunk` sweeps, recording
     cumulative wall time;
  3. the TPU scanline schedule likewise;
  4. hierarchy warm start + checkerboard.

Prints a JSON report: host final energy + time, and for each TPU schedule the
wall time to first reach (<=) the host's final energy.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from examples.run_global import build_model
from stereo_tpu import geometry
from stereo_tpu.solvers import trws, trws_host


def build_problem(dm, proposals):
    all_props = [jnp.asarray(p, dm.dtype) for p in proposals]
    all_props.append(dm.assignment)
    stack = jnp.stack(all_props, axis=0)
    unary = jnp.stack([dm.unary_map(p) for p in all_props], axis=0)

    def norm(x):
        if dm.normalize is None:
            return x
        return (x - dm.normalize[0]) / dm.normalize[1]

    D0 = norm(jax.vmap(geometry.own_disparity)(stack))
    Q = jnp.stack(
        [norm(jax.vmap(lambda p: geometry.neighbor_plane_disparity(p, d, fill=0.0))(stack))
         for d in range(geometry.NUM_DIRS)], axis=0)
    return unary, D0, Q, dm.smooth_weights


def run_host(kernel, tol, unary, D0, Q, alphas, maxiter, relgap, order="raster"):
    K, H, W = unary.shape
    theta, tails, heads, q_src, q_dst, al = trws_host.grid_to_edges(
        unary, D0, Q, alphas)
    ordv = (trws_host.raster_order(H, W) if order == "raster"
            else trws_host.bipartite_order(H, W))
    t0 = time.perf_counter()
    labels, e, lb, iters, tr = trws_host.solve(
        kernel, theta, tails, heads, q_src, q_dst, al, tol, ordv,
        maxiter=maxiter, max_relgap=relgap, trace=True)
    dt = time.perf_counter() - t0
    return {"energy": float(e), "lb": float(lb), "iters": int(iters),
            "seconds": dt,
            "trace_e": tr["energy"].tolist(),
            "trace_lb": tr["lower_bound"].tolist(),
            "trace_s": tr["seconds"].tolist()}


def run_device(kernel, tol, unary, D0, Q, alphas, schedule, chunk, max_sweeps,
               target_e, messages=None, t_accum=0.0):
    """Chunked solve recording (cum_time, E, lb) per chunk; stops early once
    E <= target_e."""
    if schedule == "scanline":
        from stereo_tpu.solvers.scanline import solve_scanline as _solve
    else:
        _solve = trws.solve
    curve = []
    total = 0
    while total < max_sweeps:
        t0 = time.perf_counter()
        res = _solve(unary, D0, Q, alphas, kernel=kernel, tol=tol,
                     maxiter=chunk, max_relgap=1e-12, check_every=chunk,
                     messages=messages)
        jax.block_until_ready(res.energy)
        t_accum += time.perf_counter() - t0
        total += int(res.iterations)
        messages = res.messages
        e, lb = float(res.energy), float(res.lower_bound)
        curve.append({"sweeps": total, "t": t_accum, "e": e, "lb": lb})
        print(f"  {schedule} {total}: t={t_accum:.2f}s E={e:.6g} lb={lb:.6g}",
              flush=True)
        if e <= target_e:
            break
    return curve, messages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="baby2")
    ap.add_argument("--host-maxiter", type=int, default=3000)
    ap.add_argument("--host-relgap", type=float, default=1e-5)
    ap.add_argument("--skip", default="", help="comma list: host,cb,scan,hier")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    dm = build_model(args.pair, "float32", seed=0)
    segplns = dm.segpln(seed=0)
    print(f"{len(segplns)} proposals", flush=True)
    unary, D0, Q, alphas = build_problem(dm, segplns)
    kernel, tol = dm.smoothness_kernel, dm.tol
    K, H, W = unary.shape
    print(f"problem: K={K} H={H} W={W} kernel={kernel} tol={tol}", flush=True)

    report = {"K": K, "H": H, "W": W}

    if "host" not in skip:
        print("host serial (raster)...", flush=True)
        host = run_host(kernel, tol, unary, D0, Q, alphas,
                        args.host_maxiter, args.host_relgap)
        print(f"host: E={host['energy']:.6g} lb={host['lb']:.6g} "
              f"iters={host['iters']} t={host['seconds']:.1f}s", flush=True)
        report["host"] = {k: host[k] for k in ("energy", "lb", "iters", "seconds")}
        # times at which host first reached within 0.1%/0.01% of final
        te = np.asarray(host["trace_e"]); ts = np.asarray(host["trace_s"])
        for frac, name in ((1.001, "t_within_0.1pct"), (1.0001, "t_within_0.01pct")):
            hit = np.nonzero(te <= host["energy"] * frac)[0]
            report["host"][name] = float(ts[hit[0]]) if len(hit) else None
        target_e = host["energy"]
        report["host_curve"] = {"e": host["trace_e"][::10], "s": host["trace_s"][::10]}
    else:
        target_e = 38974.6  # round-1 measured 30k-sweep energy
    report["target_e"] = target_e

    # warmup compile (excluded from timing) at the chunk shape
    if "cb" not in skip:
        print("checkerboard warmup...", flush=True)
        _ = trws.solve(unary, D0, Q, alphas, kernel=kernel, tol=tol,
                       maxiter=2, max_relgap=1e-12, check_every=2)
        jax.block_until_ready(_.energy)
        print("checkerboard race...", flush=True)
        curve, _ = run_device(kernel, tol, unary, D0, Q, alphas,
                              "checkerboard", 500, 40000, target_e)
        report["checkerboard"] = curve

    if "scan" not in skip:
        print("scanline race...", flush=True)
        curve, _ = run_device(kernel, tol, unary, D0, Q, alphas,
                              "scanline", 50, 3000, target_e)
        report["scanline"] = curve

    if "hier" not in skip:
        print("hierarchy warm start + checkerboard race...", flush=True)
        from stereo_tpu.solvers import hierarchy
        t0 = time.perf_counter()
        pyr = [(unary, D0, Q, alphas)]
        for _ in range(2):
            u, d0, q, al = pyr[-1]
            pyr.append(hierarchy.coarsen(u, d0, q, al))
        messages = None
        for lvl in range(len(pyr) - 1, 0, -1):
            u, d0, q, al = pyr[lvl]
            res = trws.solve(u, d0, q, al, kernel=kernel, tol=tol,
                             maxiter=600, max_relgap=1e-6, check_every=100,
                             messages=messages)
            jax.block_until_ready(res.energy)
            messages = hierarchy.upsample_messages(
                res.messages, pyr[lvl - 1][0].shape[-2:])
        warm_t = time.perf_counter() - t0
        print(f"  warm start took {warm_t:.2f}s", flush=True)
        curve, _ = run_device(kernel, tol, unary, D0, Q, alphas,
                              "checkerboard", 500, 40000, target_e,
                              messages=messages, t_accum=warm_t)
        report["hierarchy"] = curve

    with open("/tmp/race_report.json", "w") as f:
        json.dump(report, f)
    print("REPORT WRITTEN /tmp/race_report.json", flush=True)


if __name__ == "__main__":
    main()
