"""Wavefront-TRW-S race on the real TPU: time-to-host-energy on baby2 K=15.

The wavefront solver is bitwise the host's raster-order schedule, so it needs
the host's ~424 sweeps (race_report_r2_baseline.json) rather than the
checkerboard's >40k; this script measures its per-sweep wall cost and the
time to reach the host's converged energy (38919.91).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from examples.run_global import build_model
from tools.measure_race import build_problem
from stereo_tpu.solvers import wavefront


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="baby2")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--max-sweeps", type=int, default=800)
    ap.add_argument("--target-e", type=float, default=38919.911)
    ap.add_argument("--levels", type=int, default=1,
                    help="coarse-to-fine warm-start pyramid levels (1 = off)")
    ap.add_argument("--coarse-sweeps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/wavefront_race.json")
    args = ap.parse_args()

    import os

    import numpy as np

    cache = f"/tmp/wavefront_problem_{args.pair}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        unary, D0, Q, alphas = (jax.numpy.asarray(z[k])
                                for k in ("unary", "D0", "Q", "alphas"))
        kernel, tol = int(z["kernel"]), float(z["tol"])
        print(f"loaded problem from {cache}", flush=True)
    else:
        dm = build_model(args.pair, "float32", seed=0)
        segplns = dm.segpln(seed=0)
        unary, D0, Q, alphas = build_problem(dm, segplns)
        kernel, tol = dm.smoothness_kernel, dm.tol
        np.savez(cache, unary=np.asarray(unary), D0=np.asarray(D0),
                 Q=np.asarray(Q), alphas=np.asarray(alphas), kernel=kernel,
                 tol=tol)
    K, H, W = unary.shape
    print(f"problem: K={K} H={H} W={W} kernel={kernel} tol={tol} "
          f"backend={jax.default_backend()}", flush=True)

    def run(maxiter, messages=None):
        return wavefront.solve_wavefront(
            unary, D0, Q, alphas, kernel=kernel, tol=tol, maxiter=maxiter,
            max_relgap=1e-12, check_every=maxiter, messages=messages,
            unroll=args.unroll)

    print("warmup compile (2-sweep shape)...", flush=True)
    t0 = time.perf_counter()
    res = run(args.chunk)
    jax.block_until_ready(res.energy)
    t_first = time.perf_counter() - t0
    print(f"first chunk ({args.chunk} sweeps) incl. compile: {t_first:.1f}s "
          f"E={float(res.energy):.6g} lb={float(res.lower_bound):.6g}",
          flush=True)

    curve = []
    total = 0
    t_accum = 0.0
    messages = None
    if args.levels > 1:
        from stereo_tpu.solvers import hierarchy

        # compile the coarse shapes off the clock, then time the warm start
        hierarchy.wavefront_warm_start(
            unary, D0, Q, alphas, kernel=kernel, tol=tol, levels=args.levels,
            coarse_sweeps=2)
        t0 = time.perf_counter()
        messages = hierarchy.wavefront_warm_start(
            unary, D0, Q, alphas, kernel=kernel, tol=tol, levels=args.levels,
            coarse_sweeps=args.coarse_sweeps)
        jax.block_until_ready(messages)
        t_accum = time.perf_counter() - t0
        print(f"warm start (levels={args.levels}, "
              f"{args.coarse_sweeps} coarse sweeps): {t_accum:.2f}s",
              flush=True)
    while total < args.max_sweeps:
        t0 = time.perf_counter()
        res = run(args.chunk, messages)
        jax.block_until_ready(res.energy)
        t_accum += time.perf_counter() - t0
        total += int(res.iterations)
        messages = res.messages
        e, lb = float(res.energy), float(res.lower_bound)
        curve.append({"sweeps": total, "t": t_accum, "e": e, "lb": lb})
        print(f"  wavefront {total}: t={t_accum:.2f}s "
              f"({t_accum / total * 1000:.1f} ms/sweep) E={e:.6g} "
              f"lb={lb:.6g}", flush=True)
        if e <= args.target_e:
            break

    report = {"K": K, "H": H, "W": W, "unroll": args.unroll,
              "target_e": args.target_e, "wavefront": curve}
    with open(args.out, "w") as f:
        json.dump(report, f)
    print(f"REPORT WRITTEN {args.out}", flush=True)


if __name__ == "__main__":
    main()
