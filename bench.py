"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: binary fusion moves/second on the teddy NCC workload
(example_ncc configuration — the reference's per-move cost is one
rd_mex/QPBO solve plus MATLAB-side table construction).  ``vs_baseline``
compares against this machine's CPU roof-duality path (our native C++ QPBO —
the rd_mex equivalent — solving the *identical* fusion problems), i.e. the
reference-architecture cost with the MATLAB overhead already discounted; the
north star is >= 10x (BASELINE.md).

Robustness: the axon TPU tunnel occasionally drops; transient backend
failures retry a few times before giving up.
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


def main():
    last_err = None
    for attempt in range(3):
        try:
            result = run_bench()
            print(json.dumps(result))
            return 0
        except Exception as e:  # tunnel flakiness: retry
            last_err = e
            print(f"# bench attempt {attempt} failed: {e}", file=sys.stderr)
            time.sleep(20)
    print(json.dumps({
        "metric": "fusion_moves_per_sec_teddy_ncc",
        "value": 0.0,
        "unit": "moves/s",
        "vs_baseline": 0.0,
        "error": str(last_err),
    }))
    return 1


if __name__ == "__main__":
    sys.exit(main())
