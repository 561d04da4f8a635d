"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Headline metric: binary fusion moves/second on the teddy NCC workload
(example_ncc configuration — the reference's per-move cost is one
rd_mex/QPBO solve plus MATLAB-side table construction).  ``vs_baseline``
compares against this machine's CPU roof-duality path (our native C++ QPBO —
the rd_mex equivalent, BK-style tree-reuse maxflow — solving the *identical*
fusion problems), i.e. the reference-architecture cost with the MATLAB
overhead already discounted; the north star is >= 10x (BASELINE.md).

``extras`` carries the remaining BASELINE.md metrics, measured on the
example_simultaneous workload (baby2 SegPln, K=15):

  - checkerboard TRW-S sweep cost (ms) and throughput (label-MPixel/s =
    H*W*K*sweeps/s) of the fused Pallas phase kernel;
  - simultaneous-fusion race: trws_host (our serial O(K) C++ TRW-S, the
    trws_mex stand-in) run to the reference stopping rule (maxiter 3000,
    relgap 1e-5), then the banded-wavefront TPU solver (solvers/banded.py,
    fused Pallas kernel, 64x64 blocks) timed to the host's final energy —
    wall-clock speedup at equal-or-better energy;
  - energy ratio reached (tpu_e / host_e, <= 1 means matched or beat).

Robustness: the axon TPU tunnel occasionally drops; transient backend
failures retry a few times before giving up.  Extras failures degrade to an
"error" field instead of killing the headline metric.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def run_bench(n_moves=24, warmup=2):
    import jax
    import jax.numpy as jnp

    from stereo_tpu import geometry
    from stereo_tpu.models.ncc import DispMapNCC
    from stereo_tpu.utils import io

    pair = io.load_pair("teddy", dtype=np.float32)
    disparities = np.arange(0, 51)
    dm = DispMapNCC(pair.images, disparities, kernel=1, unary_weight=40.0,
                    tol=8.0)
    H, W = dm.sz

    # proposal stream: fronto ladder + grid plane fits (example_ncc.m:24-41)
    proposals = [geometry.fronto_parallel(H, W, float(d), dm.dtype)
                 for d in range(0, 51, 10)]
    for x in range(40, W, 120):
        for y in range(40, H, 120):
            proposals.append(dm.generate_new_plane_RANSAC(x, y, 5.0))
    while len(proposals) < n_moves + warmup:
        proposals.extend(proposals[: n_moves + warmup - len(proposals)])

    # warmup: compile the sweep at the exact timed stack shape
    dm.binary_fusion_sweep(proposals[:n_moves], chunk=n_moves)

    t0 = time.perf_counter()
    es = dm.binary_fusion_sweep(proposals[warmup:warmup + n_moves],
                                chunk=n_moves)
    jax.block_until_ready(dm.assignment)
    dt = time.perf_counter() - t0
    tpu_moves_per_sec = n_moves / dt

    # CPU baseline: the identical fusion problems through the native QPBO
    # (rd_mex-equivalent) path; tables precomputed so the CPU timing is pure
    # solver cost (conservative in our favor).
    from stereo_tpu.solvers import qpbo_host
    from stereo_tpu import energy as energy_mod

    cur = dm.assignment
    prop = proposals[warmup]
    tables = np.asarray(
        energy_mod.binary_fusion_pairwise_tables(cur, prop, 1, dm.tol),
        np.float64,
    )
    w = np.asarray(dm.smooth_weights, np.float64)

    # dense tables -> directed edge lists (4 direction blocks)
    tails, heads, E = [], [], [[] for _ in range(4)]
    DIRS = geometry.DIRS
    nid = np.arange(H * W).reshape(H, W)
    for d, (dy, dx) in enumerate(DIRS):
        ys, xs = np.nonzero(w[d] > 0)
        tails.append(nid[ys + dy, xs + dx])
        heads.append(nid[ys, xs])
        for t in range(4):
            E[t].append(w[d, ys, xs] * tables[d, t, ys, xs])
    tails = np.concatenate(tails)
    heads = np.concatenate(heads)
    E00, E01, E10, E11 = [np.concatenate(e) for e in E]
    # row-major unaries to match the row-major node ids above
    U0 = np.asarray(dm.unary_map(cur), np.float64).ravel()
    U1 = np.asarray(dm.unary_map(prop), np.float64).ravel()

    n_cpu = 3
    t0 = time.perf_counter()
    for _ in range(n_cpu):
        qpbo_host.solve(U0, U1, tails, heads, E00, E01, E10, E11)
    cpu_moves_per_sec = n_cpu / (time.perf_counter() - t0)

    return {
        "metric": "fusion_moves_per_sec_teddy_ncc",
        "value": round(tpu_moves_per_sec, 3),
        "unit": "moves/s",
        "vs_baseline": round(tpu_moves_per_sec / cpu_moves_per_sec, 3),
    }


def run_extras(max_sweeps=4000, chunk=100, band=128, decode_every=50):
    """BASELINE.md's remaining metrics on the baby2 K=15 workload."""
    import jax
    import jax.numpy as jnp

    from examples.run_global import build_model
    from tools.measure_race import build_problem
    from stereo_tpu.solvers import banded, trws, trws_host

    dm = build_model("baby2", "float32", seed=0)
    unary, D0, Q, alphas = build_problem(dm, dm.segpln(seed=0))
    kernel, tol = dm.smoothness_kernel, dm.tol
    K, H, W = unary.shape
    out = {"workload": f"baby2 K={K} {H}x{W} kernel={kernel}"}

    # --- checkerboard phase-kernel sweep throughput ----------------------
    # marginal cost between two sweep counts: one eager trws.solve call
    # carries ~2-3 s of fixed trace/dispatch/decode overhead, which at a few
    # hundred sweeps would inflate the per-sweep figure ~4x
    warm = trws.solve(unary, D0, Q, alphas, kernel=kernel, tol=tol,
                      maxiter=50, max_relgap=0.0, check_every=50)
    jax.block_until_ready(warm.energy)

    def timed(n):
        t0 = time.perf_counter()
        res = trws.solve(unary, D0, Q, alphas, kernel=kernel, tol=tol,
                         maxiter=n, max_relgap=0.0, check_every=n,
                         messages=warm.messages)
        jax.block_until_ready(res.energy)
        return time.perf_counter() - t0

    timed(200)  # compile both shapes off the clock
    timed(700)
    n_marginal = 500
    dt = timed(700) - timed(200)
    out["checkerboard_sweep_ms"] = round(dt / n_marginal * 1e3, 3)
    out["trws_label_mpixel_s"] = round(H * W * K * n_marginal / dt / 1e6, 1)

    # --- host baseline: reference stopping rule --------------------------
    theta, tails, heads, q_src, q_dst, al = trws_host.grid_to_edges(
        np.asarray(unary), np.asarray(D0), np.asarray(Q), np.asarray(alphas))
    order = trws_host.raster_order(H, W)
    t0 = time.perf_counter()
    _, e_host, lb_host, iters = trws_host.solve(
        kernel, theta, tails, heads, q_src, q_dst, al, tol, order,
        maxiter=3000, max_relgap=1e-5)
    t_host = time.perf_counter() - t0
    out["host_trws_s"] = round(t_host, 1)
    out["host_trws_iters"] = iters
    out["host_trws_energy"] = round(e_host, 3)

    # --- banded-wavefront race to the host's final energy ----------------
    # BandedRun packs the problem once; each chunk is one jitted dispatch of
    # `chunk` fused-kernel sweeps + a decode (solvers/banded.py).
    runner = banded.BandedRun(unary, D0, Q, alphas, kernel=kernel, tol=tol,
                              Bh=band, Bw=band)
    # B=128's bound converges in fewer sweeps than B=64; its greedy decode
    # oscillates, so chunks keep a best-labels incumbent across frequent
    # cheap decodes (decode_every) — measured round 3: 2.8 s / 900 sweeps
    # to the host's converged energy vs 4.2 s / 1700 at B=64.
    _, e0, _, _ = runner.run(runner.init_state(), chunk,
                             decode_every=decode_every)  # compile, discard
    jax.block_until_ready(e0)

    state = runner.init_state()
    t_tpu = 0.0
    swept = 0
    e_best = float("inf")
    while swept < max_sweeps and e_best > e_host:
        t0 = time.perf_counter()
        state, e, lb, labels = runner.run(state, chunk,
                                          decode_every=decode_every)
        jax.block_until_ready(e)
        t_tpu += time.perf_counter() - t0
        swept += chunk
        e_best = min(e_best, float(e))
    out["banded_block"] = band
    out["banded_sweep_ms"] = round(t_tpu / swept * 1e3, 2)
    out["simultaneous_tpu_s"] = round(t_tpu, 1)
    out["simultaneous_tpu_sweeps"] = swept
    out["simultaneous_energy_ratio"] = round(e_best / e_host, 6)
    out["simultaneous_speedup_vs_host"] = round(t_host / t_tpu, 2)
    return out


def main():
    last_err = None
    result = None
    for attempt in range(3):
        try:
            result = run_bench()
            break
        except Exception as e:  # tunnel flakiness: retry
            last_err = e
            print(f"# bench attempt {attempt} failed: {e}", file=sys.stderr)
            time.sleep(20)
    if result is None:
        print(json.dumps({
            "metric": "fusion_moves_per_sec_teddy_ncc",
            "value": 0.0,
            "unit": "moves/s",
            "vs_baseline": 0.0,
            "error": str(last_err),
        }))
        return 1
    import os

    if os.environ.get("BENCH_QUICK"):  # headline only (~2 min)
        print(json.dumps(result))
        return 0
    try:
        result["extras"] = run_extras()
    except Exception as e:
        print(f"# bench extras failed: {e}", file=sys.stderr)
        result["extras"] = {"error": str(e)}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
