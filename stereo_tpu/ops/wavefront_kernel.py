"""Fused Pallas TPU kernel for one full wavefront TRW-S sweep.

The lax.scan path in solvers/wavefront.py issues ~50 small XLA ops per
anti-diagonal column; at baby2 scale (T=782 diagonals) per-op launch overhead
dominates (~500 ms/sweep measured on v5e, vs ~1 ms of algorithmic HBM
traffic).  This kernel runs the whole sweep — forward and backward raster
passes — as ONE pallas_call:

  - a single program (no grid) with a `lax.fori_loop` over diagonals;
  - all problem data packed into one t-leading HBM array `prob[T+2, R, Hp]`
    (R = 6K+10 rows: theta, D0, QA, QB, aA, aB, vA, vB, gamma, pix), so each
    column is one contiguous DMA;
  - messages as one aliased HBM array `M[T+2, 4, K, Hp]` (dirs RT, DN, LT,
    UP = groups A, B of solvers/wavefront.py);
  - a 4-slot rolling VMEM window over message columns (slot = c mod 4) and a
    3-slot window over problem columns, with double-buffered async copies:
    at step c the kernel prefetches column c±2, waits on c±1, computes, and
    writes back the finalized column c — DMA fully overlapped with compute.

Column lifecycle (forward pass; backward is the mirror image):
  prefetch col x at step x-2  ->  first modified (group B) at step x-1  ->
  finalized (group A) at step x  ->  write-back started at step x  ->
  last VMEM read at step x+1  ->  slot reused for col x+4 at step x+2
  (after waiting the write-back semaphore).

The semantics are bit-for-bit those of wavefront.fwd_col/bwd_col: the same
send formulas, the same read-before-write order within a column, the same
validity masking.  Parity is pinned in tests/test_wavefront_kernel.py
against the scan path.

Reference context: this replaces the serial raster sweep of the reference's
TRW-S engine (cpp/trw-s/minimize.cpp:31-116) with an anti-diagonal wavefront
whose per-diagonal work is one straight-line VPU block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_tpu.energy import truncated_kernel

NSLOT = 4  # message-column window slots
PSLOT = 3  # problem-column window slots


def _sdown(v):
    """v[..., y] -> v[..., y-1], zero at y=0 (lane axis)."""
    r = pltpu.roll(v, 1, axis=v.ndim - 1)
    idx = lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    return jnp.where(idx == 0, 0.0, r)


def _sup(v):
    """v[..., y] -> v[..., y+1], zero at the last lane."""
    r = pltpu.roll(v, v.shape[-1] - 1, axis=v.ndim - 1)  # circular -1
    idx = lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    return jnp.where(idx == v.shape[-1] - 1, 0.0, r)


KT = 8  # target/source-block size for the sends' (kt, kh) walks: live
# intermediates stay [2, KT, lanes] instead of [2, Kp, lanes].  At K ~ 80
# the flat walk's K live candidate buffers are what blew Mosaic's scoped
# vmem (~39 MB of temporaries at K=79, LANE=768 — observed "ran out of
# memory in memory space vmem ... 44.99M" on v5e); min is exact, so the
# blocked reduction is bitwise-identical to the flat one (same argument as
# ops/phase_kernel.py's KT blocks).


def kt_for(K: int) -> int:
    """Send-walk block size for label count K.  Measured (v5e, round 5,
    baby2 K=15 banded B=128): KT=16 sweeps 3.12 -> 2.92 ms (-6.6%; KT=24
    equal within noise), labels bitwise across KT by min-exactness — but
    live temporaries scale with KT, and KT=8 is what keeps the K~80 fused
    windows under Mosaic's scoped-vmem limit, so large K stays at 8
    (K=79 B=(375,256) verified bitwise at both)."""
    return 16 if K <= 32 else KT


def _send_head(gD, Mold, Q, D0, alpha, kernel, tol, K):
    """msg'[kt] = min_kh(gD[kh] - Mold[kh] + a*TR(Q[kt]-D0[kh])), normalized.

    gD/D0: [Kp, Hp]; Mold/Q: [2, Kp, Hp]; alpha: [2, Hp]; only rows < K are
    real — pad message rows are forced to 0 and excluded from vmin.
    Unrolled over kh in KT-sized target blocks — straight-line VPU code, no
    launch overhead, bounded live temporaries."""
    Kp = Mold.shape[1]
    Hs = gD[None] - Mold  # [2, Kp, Hp]
    outs = []
    for i0 in range(0, K, kt_for(K)):
        sl = slice(i0, min(i0 + kt_for(K), K))
        Qb = Q[:, sl]
        acc = None
        for kh in range(K):  # real labels only
            cand = Hs[:, kh][:, None, :] + alpha[:, None, :] * truncated_kernel(
                Qb - D0[kh][None, None, :], kernel, tol)
            acc = cand if acc is None else jnp.minimum(acc, cand)
        outs.append(acc)
    acc = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    if K < Kp:  # pad target rows: excluded from vmin, zeroed in msg
        acc = jnp.concatenate(
            [acc, jnp.full((2, Kp - K, acc.shape[-1]), BIG, acc.dtype)],
            axis=1)
    kt = lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    vmin = jnp.min(jnp.where(kt < K, acc, BIG), axis=1)  # [2, Hp]
    msg = jnp.where(kt < K, acc - vmin[:, None, :], 0.0)
    return msg, vmin


def _send_tail(gDt, Mold, Q, D0, alpha, kernel, tol, K):
    """msg'[kh] = min_kt(gDt[kt] - Mold[kt] + a*TR(Q[kt]-D0[kh])), normalized.

    gDt: [2, Kp, Hp] (per-direction source beliefs); Mold/Q: [2, Kp, Hp].
    Pad source rows carry BIG beliefs (never the min); pad output rows 0.
    The source (kt) reduction walks KT-sized blocks (see KT)."""
    Kp = Mold.shape[1]
    Hs = gDt - Mold  # [2, Kp, Hp]
    kt = lax.broadcasted_iota(jnp.int32, Hs.shape, 1)
    Hs = jnp.where(kt < K, Hs, BIG)  # exclude pad sources from the min
    src_blocks = [slice(i0, min(i0 + kt_for(K), K)) for i0 in range(0, K, kt_for(K))]
    outs = []
    for kh in range(K):
        m = None
        for sl in src_blocks:
            cand = Hs[:, sl] + alpha[:, None, :] * truncated_kernel(
                Q[:, sl] - D0[kh][None, None, :], kernel, tol)
            part = jnp.min(cand, axis=1)  # [2, Hp]
            m = part if m is None else jnp.minimum(m, part)
        outs.append(m)
    vmin = outs[0]
    for o in outs[1:]:
        vmin = jnp.minimum(vmin, o)
    zero = jnp.zeros_like(outs[0])
    msg = jnp.stack([outs[kh] - vmin if kh < K else zero
                     for kh in range(Kp)], axis=1)
    return msg, vmin


BIG = 1e30  # unary for label-axis pad rows: they must never win a min


def _ceil8(n: int) -> int:
    return -(-n // 8) * 8


def pack_problem(sk) -> jax.Array:
    """Pack a wavefront._Skewed into [T+2, Rp, Hp].

    Mosaic DMA slices need the sublane dim aligned to 8, so the label axis is
    padded K -> Kp = ceil8(K) (theta pad rows = BIG so pad labels never win a
    min; D0/Q pad rows = 0) and the row count to Rp = ceil8(6*Kp + 10)."""
    K = sk.K
    Kp = _ceil8(K)
    Tp2 = sk.theta.shape[0]

    def padk(a, value=0.0):  # [T+2, ..., K, H] -> [..., Kp, H]
        pads = [(0, 0)] * (a.ndim - 2) + [(0, Kp - K), (0, 0)]
        return jnp.pad(a, pads, constant_values=value)

    rows = [padk(sk.theta, BIG),           # [T+2, Kp, H]
            padk(sk.D0),
            padk(sk.QA).reshape(Tp2, 2 * Kp, -1),
            padk(sk.QB).reshape(Tp2, 2 * Kp, -1),
            sk.aA, sk.aB, sk.vA, sk.vB,    # [T+2, 2, H]
            sk.gamma[:, None], sk.pix[:, None]]  # [T+2, 1, H]
    packed = jnp.concatenate(rows, axis=1)
    pad_r = _ceil8(packed.shape[1]) - packed.shape[1]
    pad_h = (-packed.shape[-1]) % 128
    if pad_r or pad_h:
        packed = jnp.pad(packed, [(0, 0), (0, pad_r), (0, pad_h)])
    return packed


def _kernel(tol_ref, prob_hbm, M_hbm, M_out, lb_out, mwin, pwin, lbacc,
            pf_m, pf_p, wb, *, T, K, kernel):
    """One full sweep: forward pass over diagonals 1..T, then backward."""
    tol = tol_ref[0]
    Kp = _ceil8(K)  # row offsets into the packed problem slab (pack_problem)
    R2 = 2 * Kp
    off_QA, off_QB = 2 * Kp, 4 * Kp
    off_aA = 6 * Kp
    off_aB, off_vA, off_vB = off_aA + 2, off_aA + 4, off_aA + 6
    off_g, off_pix = off_aA + 8, off_aA + 9

    # M_hbm and M_out are aliased on TPU; in interpret mode they may be two
    # buffers, so each pass reads from the ref that provably holds the truth:
    # the forward pass only ever loads columns untouched this sweep (M_hbm),
    # the backward pass only loads columns the forward pass wrote back
    # (M_out) — except pad column 0, which is zero in both.
    def m_in(col, slot, src):
        return pltpu.make_async_copy(src.at[col], mwin.at[slot],
                                     pf_m.at[slot])

    def m_wb(col, slot):
        return pltpu.make_async_copy(mwin.at[slot], M_out.at[col],
                                     wb.at[slot])

    def p_in(col, slot):
        return pltpu.make_async_copy(prob_hbm.at[col], pwin.at[slot],
                                     pf_p.at[slot])

    def prow(slot, lo, hi):
        return pwin[slot, lo:hi]

    def beliefs(slot_cm1, slot_c, slot_cp1, theta_c):
        Ac = mwin[slot_c, 0:2]
        Bc = mwin[slot_c, 2:4]
        Acm1 = mwin[slot_cm1, 0:2]
        Bcp1 = mwin[slot_cp1, 2:4]
        D = theta_c + Ac[0] + Ac[1] + Bc[0] + Bc[1]
        D = D + Acm1[0] + _sdown(Acm1[1])
        D = D + Bcp1[0] + _sup(Bcp1[1])
        return D, Ac, Bc, Acm1, Bcp1

    # ---------------------------------------------------------- forward pass
    # Pre-loop: columns 0..2 and problem columns 1..2 in flight.
    m_in(0, 0, M_hbm).start()
    m_in(1, 1, M_hbm).start()
    m_in(2, 2, M_hbm).start()
    p_in(1, 1).start()
    p_in(2, 2).start()
    m_in(0, 0, M_hbm).wait()
    m_in(1, 1, M_hbm).wait()
    p_in(1, 1).wait()

    def fwd_step(c, _):
        slot_c = lax.rem(c, NSLOT)
        slot_cm1 = lax.rem(c + (NSLOT - 1), NSLOT)
        slot_cp1 = lax.rem(c + 1, NSLOT)
        slot_cp2 = lax.rem(c + 2, NSLOT)
        ps_c = lax.rem(c, PSLOT)
        ps_cp1 = lax.rem(c + 1, PSLOT)
        ps_cp2 = lax.rem(c + 2, PSLOT)

        # prefetch column c+2 (slot previously held c-2: wait its write-back)
        @pl.when(c + 2 <= T + 1)
        def _():
            @pl.when(c >= 3)
            def _():
                m_wb(c - 2, slot_cp2).wait()  # write-back of col c-2 done

            m_in(c + 2, slot_cp2, M_hbm).start()
            p_in(c + 2, ps_cp2).start()

        # wait the column needed this step (started at step c-1 / pre-loop)
        m_in(c + 1, slot_cp1, M_hbm).wait()
        p_in(c + 1, ps_cp1).wait()

        theta_c = prow(ps_c, 0, Kp)
        D0_c = prow(ps_c, Kp, R2)
        D, Ac, _, _, Bcp1 = beliefs(slot_cm1, slot_c, slot_cp1, theta_c)
        gD = prow(ps_c, off_g, off_g + 1)[0][None] * D  # [K, Hp]

        # head-sends, group A (RT, DN) at column c
        QA_c = prow(ps_c, off_QA, off_QA + R2).reshape(2, Kp, -1)
        aA_c = prow(ps_c, off_aA, off_aA + 2)
        vA_c = prow(ps_c, off_vA, off_vA + 2)
        mh, _ = _send_head(gD, Ac, QA_c, D0_c, aA_c, kernel, tol, K)
        mwin[slot_c, 0:2] = jnp.where(vA_c[:, None, :] > 0, mh, Ac)

        # tail-sends, group B (LT, UP) into column c+1
        QB_n = prow(ps_cp1, off_QB, off_QB + R2).reshape(2, Kp, -1)
        aB_n = prow(ps_cp1, off_aB, off_aB + 2)
        vB_n = prow(ps_cp1, off_vB, off_vB + 2)
        D0_n = prow(ps_cp1, Kp, R2)
        gDt = jnp.stack([gD, _sdown(gD)], axis=0)
        mt, _ = _send_tail(gDt, Bcp1, QB_n, D0_n, aB_n, kernel, tol, K)
        mwin[slot_cp1, 2:4] = jnp.where(vB_n[:, None, :] > 0, mt, Bcp1)

        # column c is final: write it back (overlaps the next step)
        m_wb(c, slot_c).start()
        return 0

    lax.fori_loop(1, T + 1, fwd_step, 0)
    # column T+1 was only read; write it back too so every slot's pending
    # write-back count is exactly one at the fwd/bwd boundary drain below.
    m_wb(T + 1, lax.rem(T + 1, NSLOT)).start()

    # drain: columns T-2..T+1 have un-waited write-backs (one per slot)
    for col in range(T - 2, T + 2):
        m_wb(col, col % NSLOT).wait()

    # --------------------------------------------------------- backward pass
    lbacc[...] = jnp.zeros_like(lbacc)
    # window holds columns T-1..T+1; problem columns T..T+1 resident.
    p_in(T - 1, lax.rem(T - 1, PSLOT)).start()

    def bwd_step(i, _):
        c = T - i
        slot_c = lax.rem(c, NSLOT)
        slot_cm1 = lax.rem(c + (NSLOT - 1), NSLOT)
        slot_cp1 = lax.rem(c + 1, NSLOT)
        slot_cm2 = lax.rem(c + (NSLOT - 2), NSLOT)
        ps_c = lax.rem(c, PSLOT)
        ps_cm1 = lax.rem(c + (PSLOT - 1), PSLOT)
        ps_cm2 = lax.rem(c + (PSLOT - 2), PSLOT)

        # prefetch column c-2 (slot previously held c+2: wait its write-back)
        @pl.when(c >= 2)
        def _():
            @pl.when(c + 2 <= T)
            def _():
                m_wb(c + 2, slot_cm2).wait()  # bwd write-back of col c+2 done

            m_in(c - 2, slot_cm2, M_out).start()
            p_in(c - 2, ps_cm2).start()

        # wait the column needed this step (resident at c=T, else prefetched)
        @pl.when(c < T)
        def _():
            m_in(c - 1, slot_cm1, M_out).wait()
        p_in(c - 1, ps_cm1).wait()

        theta_c = prow(ps_c, 0, Kp)
        D0_c = prow(ps_c, Kp, R2)
        D, _, Bc, Acm1, _ = beliefs(slot_cm1, slot_c, slot_cp1, theta_c)
        pix_c = prow(ps_c, off_pix, off_pix + 1)[0]
        vminD = jnp.min(D, axis=0)  # [Hp]
        lb_col = jnp.where(pix_c > 0, vminD, 0.0)
        gD = prow(ps_c, off_g, off_g + 1)[0][None] * (D - vminD[None])

        # head-sends, group B (LT, UP) at column c
        QB_c = prow(ps_c, off_QB, off_QB + R2).reshape(2, Kp, -1)
        aB_c = prow(ps_c, off_aB, off_aB + 2)
        vB_c = prow(ps_c, off_vB, off_vB + 2)
        mh, vminh = _send_head(gD, Bc, QB_c, D0_c, aB_c, kernel, tol, K)
        lb_col = lb_col + jnp.sum(jnp.where(vB_c > 0, vminh, 0.0), axis=0)
        mwin[slot_c, 2:4] = jnp.where(vB_c[:, None, :] > 0, mh, Bc)

        # tail-sends, group A (RT, DN) into column c-1
        QA_p = prow(ps_cm1, off_QA, off_QA + R2).reshape(2, Kp, -1)
        aA_p = prow(ps_cm1, off_aA, off_aA + 2)
        vA_p = prow(ps_cm1, off_vA, off_vA + 2)
        D0_p = prow(ps_cm1, Kp, R2)
        gDt = jnp.stack([gD, _sup(gD)], axis=0)
        mt, vmint = _send_tail(gDt, Acm1, QA_p, D0_p, aA_p, kernel, tol, K)
        lb_col = lb_col + jnp.sum(jnp.where(vA_p > 0, vmint, 0.0), axis=0)
        mwin[slot_cm1, 0:2] = jnp.where(vA_p[:, None, :] > 0, mt, Acm1)

        lbacc[0] = lbacc[0] + lb_col
        # column c is final (its group A was written at step c+1): write back
        m_wb(c, slot_c).start()
        return 0

    lax.fori_loop(0, T, bwd_step, 0)

    # drain the trailing write-backs: the in-loop waits cover columns 4..T
    # (started at steps c = 2..T-2 for column c+2), leaving 1..3 pending
    for col in (1, 2, 3):
        m_wb(col, col % NSLOT).wait()
    lb_out[...] = lbacc[...]


@functools.partial(jax.jit, static_argnames=("T", "K", "kernel", "interpret"))
def sweep_pallas(prob, M, *, T, K, kernel, tol, interpret=False):
    """One full (fwd+bwd) raster sweep.  prob: [T+2, Rp, Hp] packed problem;
    M: [T+2, 4, Kp, Hp] messages (RT, DN, LT, UP; K real label rows).
    Returns (M', lb)."""
    Hp = prob.shape[-1]
    Rp = prob.shape[1]
    Kp = M.shape[2]
    f = pl.pallas_call(
        functools.partial(_kernel, T=T, K=K, kernel=kernel),
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(M.shape, M.dtype),
                   jax.ShapeDtypeStruct((1, Hp), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 4, Kp, Hp), M.dtype),
            pltpu.VMEM((PSLOT, Rp, Hp), prob.dtype),
            pltpu.VMEM((1, Hp), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((PSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        input_output_aliases={2: 0},
        interpret=interpret,
    )
    Mnew, lbv = f(jnp.asarray(tol, jnp.float32).reshape(1), prob, M)
    return Mnew, jnp.sum(lbv, dtype=jnp.float32)


def make_sweep(sk, interpret: bool = False):
    """Build a sweep_fn((MA, MB)) -> ((MA', MB'), lb) closure over a
    wavefront._Skewed.  Message groups are concatenated to the kernel's
    [T+2, 4, Kp, Hp] layout per call; label/lane padding is added and
    stripped here so the caller keeps the scan path's exact shapes (a
    pad+slice of the message array costs ~2 HBM passes per sweep — small
    next to the sweep itself)."""
    if sk.T < 4:  # window logic needs >= 4 interior columns; tiny grids
        raise ImportError("wavefront kernel requires T >= 4")
    prob = pack_problem(sk)
    Hp = prob.shape[-1]
    K = sk.K
    Kp = _ceil8(K)
    H = sk.theta.shape[-1]
    pad_h = Hp - H
    pad_k = Kp - K

    def sweep_fn(M):
        MA, MB = M
        M4 = jnp.concatenate([MA, MB], axis=1)
        if pad_h or pad_k:
            M4 = jnp.pad(M4, [(0, 0), (0, 0), (0, pad_k), (0, pad_h)])
        M4, lb = sweep_pallas(prob, M4, T=sk.T, K=K, kernel=sk.kernel,
                              tol=sk.tol, interpret=interpret)
        if pad_h or pad_k:
            M4 = M4[:, :, :K, :H]
        return (M4[:, 0:2], M4[:, 2:4]), lb

    return sweep_fn
