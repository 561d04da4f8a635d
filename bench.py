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


HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec: 819 GB/s)
VPU_GFLOPS = 3900.0  # v5e VPU f32 (8x128 lanes x 4 ALUs x ~0.94 GHz)


def roofline(K, H, W, band=None):
    """Analytic per-sweep HBM bytes / VPU flops of the three Pallas kernels
    vs v5e peaks (BASELINE north star: "kernels at speed-of-light").

    Bytes count the pallas_call operands + results only (each streams
    HBM<->VMEM once; the XLA glue around the kernel — gD assembly, rolls —
    adds traffic NOT counted here, so 'sol_ms' is a hard lower bound on the
    achievable sweep time and measured/sol overstates the true gap).
    Flops per (k_tail, k_head) pair: sub, |.| or square, min-vs-tol, mul,
    add, min-reduce ~= 6 VPU ops.
    """
    f = 6.0  # flops per K x K table cell
    out = {}
    # standard fused phase kernel (ops/phase_kernel.phase_messages_pallas):
    # in 2 k3 + 3 k4 + 2 p3 + 1 p1, out 1 k4 + 1 p3 -> (18K+13) planes of
    # H x W f32 per phase, 2 phases per sweep
    b = (18 * K + 13) * H * W * 4 * 2
    fl = 4 * (2 * H * W) * (f * K * K)  # both variants on the full grid
    out["phase"] = (b, fl)
    # compacted kernel (phase_messages_compact_pallas): (31K+24) planes of
    # the half grid per phase, 2 phases per sweep; each variant computed once
    b = (31 * K + 24) * (H // 2) * W * 4 * 2
    fl = 4 * H * W * (f * K * K)
    out["compact"] = (b, fl)
    if band:
        # banded sweep kernel (ops/banded_kernel): problem pack
        # [T+2, Rp, LANE] read per pass, messages [T+2, 4Kp, LANE]
        # read+written per pass, 2 passes per sweep
        Kp = -(-K // 8) * 8
        Gy, Gx = -(-H // band), -(-W // band)
        LANE = -(-(band * Gy * Gx) // 128) * 128
        Rp = -(-(6 * Kp + 10) // 8) * 8
        T2 = 2 * band + 1
        b = (2 * Rp + 4 * 4 * Kp) * T2 * LANE * 4
        fl = 4 * H * W * (f * K * K)
        out["banded"] = (b, fl)
    table = {}
    for name, (b, fl) in out.items():
        sol_ms = max(b / (HBM_GBPS * 1e9), fl / (VPU_GFLOPS * 1e9)) * 1e3
        table[name] = {
            "bytes_per_sweep_mb": round(b / 2**20, 1),
            "gflop_per_sweep": round(fl / 1e9, 2),
            "sol_ms": round(sol_ms, 3),
        }
    return table


def run_extras(max_sweeps=4000, chunk=100, band=128, decode_every=50):
    """BASELINE.md's remaining metrics on the baby2 K=15 workload."""
    import hashlib

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
    # pin the proposal stream: host and TPU must race on THIS problem
    # (host-baseline drift across rounds — r02 early-stop at 503 iters vs
    # r03 full 3000 — is diagnosable iff the stream is identified)
    sha = hashlib.sha256()
    for a in (unary, D0, Q, alphas):
        sha.update(np.ascontiguousarray(np.asarray(a)).tobytes())
    out["problem_sha"] = sha.hexdigest()[:16]

    rf = roofline(K, H, W, band=band)
    out["roofline"] = rf

    # --- checkerboard phase-kernel sweep throughput ----------------------
    # marginal cost between two sweep counts: one eager trws.solve call
    # carries ~2-3 s of fixed trace/dispatch/decode overhead, which at a few
    # hundred sweeps would inflate the per-sweep figure ~4x.  The tunnel has
    # seconds-scale dispatch variance, so a single two-point difference is
    # untrustworthy (BENCH_r03 published a 14x-off figure that way): take
    # the median of several marginal pairs and sanity-check against the
    # roofline lower bound and the direct (overhead-inclusive) upper bound.
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
    timed(1200)
    # 9 samples over a 1000-sweep span: each timed() call rides the tunnel's
    # seconds-scale dispatch variance, so the span must swamp it and the
    # sample list (published below) must carry the spread, not hide it
    # (round-4 review: 5 samples spanning 3x is a floor, not a measurement)
    lo, hi = 200, 1200
    per_sweep = sorted((timed(hi) - timed(lo)) / (hi - lo) for _ in range(9))
    # a dispatch-variance spike on the lo leg can make a marginal negative;
    # such samples are physically meaningless — publish them (the spread is
    # part of the measurement) but take the median of the positive ones
    positive = [s for s in per_sweep if s > 0] or per_sweep
    marg = positive[len(positive) // 2]
    direct = timed(hi) / hi  # upper bound: includes the fixed overhead
    sol = rf["compact"]["sol_ms"] / 1e3
    consistent = (0.5 * sol <= marg <= direct * 1.05)
    out["checkerboard_sweep_ms_samples"] = [round(s * 1e3, 3)
                                            for s in per_sweep]
    out["checkerboard_sweep_ms_direct_ub"] = round(direct * 1e3, 3)
    if not consistent:
        # never publish a number that beats speed of light or exceeds the
        # overhead-inclusive direct measurement
        out["checkerboard_sweep_ms_error"] = (
            f"median marginal {marg * 1e3:.3f} ms outside "
            f"[{0.5 * sol * 1e3:.3f} (0.5x roofline), "
            f"{direct * 1.05 * 1e3:.3f} (direct ub)]")
    else:
        out["checkerboard_sweep_ms"] = round(marg * 1e3, 3)
        out["checkerboard_vs_sol"] = round(marg / sol, 2)
        out["trws_label_mpixel_s"] = round(H * W * K / marg / 1e6, 1)

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
    # marginal sweep cost: the race loop's t_tpu/swept folds ~35-45 ms of
    # per-chunk eager dispatch into every `chunk` sweeps and moves with box
    # load; difference two chunk sizes on a fresh state instead
    st_m = runner.init_state()
    _, e_m, _, _ = runner.run(st_m, 100, 100)
    jax.block_until_ready(e_m)
    marg_b = []
    for _ in range(5):
        st_m = runner.init_state()
        t0 = time.perf_counter()
        st_m, e_m, _, _ = runner.run(st_m, 100, 100)
        jax.block_until_ready(e_m)
        t_lo = time.perf_counter() - t0
        st_m = runner.init_state()
        t0 = time.perf_counter()
        st_m, e_m, _, _ = runner.run(st_m, 400, 400)
        jax.block_until_ready(e_m)
        marg_b.append((time.perf_counter() - t0 - t_lo) / 300)
    marg_b.sort()
    pos_b = [s for s in marg_b if s > 0] or marg_b
    bs = pos_b[len(pos_b) // 2]
    out["banded_sweep_ms_samples"] = [round(s * 1e3, 3) for s in marg_b]
    out["banded_sweep_ms"] = round(bs * 1e3, 2)
    out["banded_vs_sol"] = round((bs * 1e3) / rf["banded"]["sol_ms"], 2)
    out["banded_race_ms_per_sweep_incl_dispatch"] = round(
        t_tpu / swept * 1e3, 2)
    out["simultaneous_tpu_s"] = round(t_tpu, 1)
    out["simultaneous_tpu_sweeps"] = swept
    out["simultaneous_energy_ratio"] = round(e_best / e_host, 6)
    out["simultaneous_speedup_vs_host"] = round(t_host / t_tpu, 2)

    out["bad_pixel_synth_pct"] = round(bad_pixel_synth() * 100, 2)

    try:
        out["ncc_k79"] = run_k79()
    except Exception as e:
        out["ncc_k79"] = {"error": str(e)}
    return out


def run_k79(host_iters=60, chunk=5, band=(375, 256), max_sweeps=600):
    """The large-K regime (SURVEY example_ncc: teddy, K=79 labels).

    Round-4 measurements fixed the design here: the O(K) envelope DT stays
    host-only (its per-update indirection costs more than the entire dense
    K^2 update on TPU — ops/minplus.py records 169 ms/permutation-gather vs
    4.18 ms for the whole dense K=79 update), and the checkerboard kernels
    auto-fall-back to the standard (non-compact) fused kernel whose tiles
    fit to K ~ 95 (28 ms/sweep at K=79, ~1.4x the VPU flop roofline).
    This race pits the banded-schedule solver against the native serial
    O(K) host on the real teddy-NCC simultaneous-fusion problem.  Since
    round 5 the fully-fused banded kernel runs here too: the 2-slot
    problem-column window + KT-blocked send walks brought its VMEM under
    the 14 MB gate at K=79/B=(375,256) (ops/banded_kernel.py), 62.8
    ms/sweep vs the scan path's 129 (which pays for XLA materializing
    [K,K,L] send intermediates to HBM even with the fused one-variant
    minplus_send kernel).
    """
    import jax
    import jax.numpy as jnp

    from stereo_tpu import geometry
    from stereo_tpu.models.ncc import DispMapNCC
    from stereo_tpu.solvers import banded, trws_host
    from stereo_tpu.utils import io
    from tools.measure_race import build_problem

    pair = io.load_pair("teddy", dtype=np.float32)
    dm = DispMapNCC(pair.images, np.arange(0, 51), kernel=1,
                    unary_weight=40.0, tol=8.0)
    H, W = dm.sz
    proposals = []
    for x in range(10, W + 1, 50):
        for y in range(10, H + 1, 50):
            proposals.append(dm.generate_new_plane_RANSAC(x, y, 5.0))
    proposals += [geometry.fronto_parallel(H, W, float(d), dm.dtype)
                  for d in range(0, 51, 10)]
    unary, D0, Q, alphas = build_problem(dm, proposals)
    K = unary.shape[0]
    out = {"K": int(K)}

    theta, tails, heads, q_src, q_dst, al = trws_host.grid_to_edges(
        np.asarray(unary), np.asarray(D0), np.asarray(Q), np.asarray(alphas))
    order = trws_host.raster_order(H, W)
    t0 = time.perf_counter()
    host = trws_host.solve(dm.smoothness_kernel, theta, tails, heads, q_src,
                           q_dst, al, dm.tol, order, maxiter=host_iters,
                           max_relgap=1e-5)
    t_host = time.perf_counter() - t0
    e_host = float(host[1])
    out["host_iters"] = host_iters
    out["host_s"] = round(t_host, 1)
    out["host_energy"] = round(e_host, 1)

    # B=(375,256) is the one block shape whose fused-kernel windows fit
    # VMEM at K=79 (ops/banded_kernel.vmem_estimate: 13.9 MB vs 27.8 at
    # B=128) — the race runs the fully-fused kernel there (62.8 ms/sweep
    # vs the scan path's 129 at B=128)
    Bh, Bw = band if isinstance(band, tuple) else (band, band)
    runner = banded.BandedRun(unary, D0, Q, alphas,
                              kernel=dm.smoothness_kernel, tol=dm.tol,
                              Bh=Bh, Bw=Bw)
    st = runner.init_state()
    st, e0, _, _ = runner.run(st, chunk, chunk)  # compile
    jax.block_until_ready(e0)
    st = runner.init_state()
    t_tpu, swept, e_best = 0.0, 0, float("inf")
    while swept < max_sweeps and e_best > e_host:
        t0 = time.perf_counter()
        st, e, lb, _ = runner.run(st, chunk, chunk)
        jax.block_until_ready(e)
        t_tpu += time.perf_counter() - t0
        swept += chunk
        e_best = min(e_best, float(e))
    out["banded_block"] = list(band) if isinstance(band, tuple) else band
    out["sweep_path"] = "fused" if runner.uses_fused_kernel else "scan"
    out["tpu_sweeps"] = swept
    out["tpu_s"] = round(t_tpu, 1)
    out["tpu_energy"] = round(e_best, 1)
    out["reached_host_energy"] = bool(e_best <= e_host)
    out["speedup_vs_host"] = round(t_host / t_tpu, 1) if t_tpu > 0 else None
    return out


def bad_pixel_synth():
    """BASELINE metric 1 (bad-pixel %) on the bundled synthetic-GT pair
    (data/synth, exact GT by construction — tools/make_synth_pair.py):
    NCC model, proposals = RANSAC grid + fronto ladder, two fusion sweeps."""
    from stereo_tpu import geometry
    from stereo_tpu.models.ncc import DispMapNCC
    from stereo_tpu.utils import io, metrics

    pair = io.load_pair("synth", dtype=np.float32)
    dm = DispMapNCC(pair.images, np.arange(0, 17), kernel=1,
                    unary_weight=40.0, tol=8.0)
    gt = io.load_ground_truth("synth")
    H, W = dm.sz
    proposals = []
    for x in range(20, W, 40):
        for y in range(20, H, 40):
            proposals.append(dm.generate_new_plane_RANSAC(x, y, 5.0))
    proposals += [geometry.fronto_parallel(H, W, float(d), dm.dtype)
                  for d in range(0, 17, 4)]
    dm.binary_fusion_sweep(proposals, chunk=len(proposals))
    dm.binary_fusion_sweep(proposals, chunk=len(proposals))
    return metrics.bad_pixel_rate(np.asarray(dm.current_dispmap()), gt)


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
