"""Fused Pallas TPU kernel for one banded-wavefront TRW-S sweep.

Same rolling-window architecture as ops/wavefront_kernel.py — one program,
double-buffered async column DMA, aliased HBM message array — but over the
banded ordering of solvers/banded.py: T = Bh + Bw - 1 steps per pass instead
of H + W - 1, with every block's anti-diagonal processed in one step.  The
per-step fixed cost (DMA waits + scalar bookkeeping, ~40 us on v5e) is what
dominates the raster kernel's sweep time, so fewer/wider steps convert
almost directly into sweep wall-clock (ROADMAP.md round-2 findings).

On top of the wavefront kernel this adds the seam machinery:

  - the four seam-edge message arrays (SxL, SxR, SyU, SyD of
    solvers/banded.py) ride along as one [4, Kp, LANE] VMEM-resident array,
    read/updated with masked group compares + lane rolls each step;
  - the seam neighbors' potential data (Q/D0/alpha at block-boundary nodes)
    is packed once into a [Rs, LANE] VMEM-resident slab (`pack_seam`);
  - per step, two extra stacked sends run next to the interior pair: a
    head-send updating (SxL, SyU) [forward] / (SxR, SyD) [backward] and a
    tail-send into the partner arrays, exactly the F-/B- seam sends of
    solvers/banded.py.

Semantics are pinned against the banded scan path in
tests/test_banded_kernel.py (which itself is oracle-exact, tests/test_banded.py).

K=15 roofline floor (measured, v5e, baby2 370x413, round 5): the sweep is
COMPUTE-bound, not step- or byte-bound.  Block-shape sweep at K in {4, 15}:

    B=(128,128) T=255  K=15: 3.135 ms   K=4: 1.294 ms   (LANE 1536)
    B=( 64, 64) T=127  K=15: 2.634      K=4: 1.051      (LANE 2688)
    B=( 96,104) T=199  K=15: 2.599                      (LANE 1536)
    B=( 48, 52) T= 99  K=15: 2.476                      (LANE 3072)
    B=(128, 32) T=159  K=15: 76.3  <- pathological (Mosaic spill; rectangle
                                      blocks this skewed are refuted)

Fitting t = steps * (a + b*LANE*K^2): a ~ 2.3 us/step (seam rolls, masked
group compares, DMA waits — K-independent) and b ~ 11 ps/(lane*K^2-pair),
i.e. the two interior sends run at ~0.7 TFLOP/s effective VPU.  Per-step
cost is ~4 ns/lane at K=15 across block shapes (6.1 us at LANE 1536, 10.4
at 2688), so cutting T at fixed lane-work (T=255 -> 99) only removes the
per-step constant — the floor is the send arithmetic itself.  The byte
roofline (0.925 ms) is not the binding constraint; vs it the kernel sits
at 2.7-3.3x depending on block shape.  B=128 stays the race default: its
sweeps-to-energy advantage (900 vs 1700 sweeps at B=64, round 3) outweighs
the 6-20% sweep-cost edge of smaller blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_tpu.energy import truncated_kernel
from stereo_tpu.ops.wavefront_kernel import BIG, NSLOT, _ceil8, _send_head

# Problem-column window slots.  The wavefront kernel uses 3 (prefetch c+2
# while columns c, c+1 are read, start at the top of the step); here the
# c+2 prefetch is issued at the *end* of the step — after the last read of
# column c, whose slot it reuses — so 2 slots suffice.  The prefetch
# distance drops from ~2 steps to ~1, which still hides the ~1.5 us column
# DMA behind the >= 40 us step; the freed [Rp, LANE] slot (~1.5 MB at
# K=79) is what brings the K~80 regime under the VMEM gate (ROADMAP
# round-4 "Still open" #2).
PSLOT = 2

__all__ = ["make_sweep", "sweep_banded_pallas"]


def _ceil128(n: int) -> int:
    return -(-n // 128) * 128


def _send_head2(gD2, Mold, Q, D02, alpha, kernel, tol, K):
    """Head-send with per-direction source beliefs and positions:
    msg'[kt] = min_kh(gD2[kh] - Mold[kh] + a*TR(Q[kt] - D02[kh])), normalized.

    gD2/Mold/Q/D02: [2, Kp, L]; alpha: [2, L].  Like
    wavefront_kernel._send_head but with gD and D0 stacked per direction —
    the narrowed seam sends window each direction at a different lane group,
    so the two directions no longer share source data.  Target rows walk in
    KT blocks (wavefront_kernel.KT) to bound live temporaries; min is
    exact, so this is bitwise the flat walk."""
    from stereo_tpu.ops.wavefront_kernel import kt_for

    Kp = Mold.shape[1]
    Hs = gD2 - Mold
    outs = []
    for i0 in range(0, K, kt_for(K)):
        sl = slice(i0, min(i0 + kt_for(K), K))
        Qb = Q[:, sl]
        acc = None
        for kh in range(K):
            cand = Hs[:, kh][:, None, :] + alpha[:, None, :] * truncated_kernel(
                Qb - D02[:, kh][:, None, :], kernel, tol)
            acc = cand if acc is None else jnp.minimum(acc, cand)
        outs.append(acc)
    acc = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    if K < Kp:
        acc = jnp.concatenate(
            [acc, jnp.full((2, Kp - K, acc.shape[-1]), BIG, acc.dtype)],
            axis=1)
    kt = lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    vmin = jnp.min(jnp.where(kt < K, acc, BIG), axis=1)
    msg = jnp.where(kt < K, acc - vmin[:, None, :], 0.0)
    return msg, vmin


def _send_tail2(gDt, Mold, Q, D02, alpha, kernel, tol, K):
    """Tail-send with per-direction head positions: msg'[kh] =
    min_kt(gDt[kt] - Mold[kt] + a*TR(Q[kt] - D02[kh])), normalized.

    gDt/Mold/Q/D02: [2, Kp, LANE]; alpha: [2, LANE].  Like
    wavefront_kernel._send_tail but with D0 stacked per direction (the two
    seam targets are different nodes).  Source rows walk in KT blocks."""
    from stereo_tpu.ops.wavefront_kernel import kt_for

    Kp = Mold.shape[1]
    Hs = gDt - Mold
    kt = lax.broadcasted_iota(jnp.int32, Hs.shape, 1)
    Hs = jnp.where(kt < K, Hs, BIG)
    src_blocks = [slice(i0, min(i0 + kt_for(K), K)) for i0 in range(0, K, kt_for(K))]
    outs = []
    for kh in range(K):
        m = None
        for sl in src_blocks:
            cand = Hs[:, sl] + alpha[:, None, :] * truncated_kernel(
                Q[:, sl] - D02[:, kh][:, None, :], kernel, tol)
            part = jnp.min(cand, axis=1)  # [2, LANE]
            m = part if m is None else jnp.minimum(m, part)
        outs.append(m)
    vmin = outs[0]
    for o in outs[1:]:
        vmin = jnp.minimum(vmin, o)
    zero = jnp.zeros_like(outs[0])
    msg = jnp.stack([outs[kh] - vmin if kh < K else zero
                     for kh in range(Kp)], axis=1)
    return msg, vmin


def pack_problem(bp) -> jax.Array:
    """Pack a banded._BandedProblem into [T+2, Rp, LANE] (cf.
    wavefront_kernel.pack_problem: theta pad rows = BIG, others 0)."""
    K = bp.K
    Kp = _ceil8(K)
    spec = bp.spec
    Tp2 = bp.theta.shape[0]

    def padk(a, value=0.0):
        pads = [(0, 0)] * (a.ndim - 2) + [(0, Kp - K), (0, 0)]
        return jnp.pad(a, pads, constant_values=value)

    rows = [padk(bp.theta, BIG),  # [T+2, Kp, L]
            padk(bp.D0),
            padk(bp.QA).reshape(Tp2, 2 * Kp, -1),
            padk(bp.QB).reshape(Tp2, 2 * Kp, -1),
            bp.aA, bp.aB, bp.vA, bp.vB,  # [T+2, 2, L]
            bp.gamma[:, None], bp.pix[:, None]]  # [T+2, 1, L]
    packed = jnp.concatenate(rows, axis=1)
    pad_r = _ceil8(packed.shape[1]) - packed.shape[1]
    LANE = _ceil128(spec.Lp)
    pad_l = LANE - packed.shape[-1]
    return jnp.pad(packed, [(0, 0), (0, pad_r), (0, pad_l)])


def pack_seam(bp) -> jax.Array:
    """Seam-neighbor problem data -> [Rs, LANE]: rows
    [PxL_q | PxR_q | PyU_q | PyD_q] (4*Kp) + same for d0 (4*Kp) + 4 alphas."""
    K = bp.K
    Kp = _ceil8(K)
    LANE = _ceil128(bp.spec.Lp)

    def padkl(a):  # [K, L*] -> [Kp, LANE]
        return jnp.pad(a, [(0, Kp - K), (0, LANE - a.shape[-1])])

    def padl(a):  # [L*] -> [1, LANE]
        return jnp.pad(a, [(0, LANE - a.shape[-1])])[None]

    rows = [padkl(bp.PxL_q), padkl(bp.PxR_q), padkl(bp.PyU_q),
            padkl(bp.PyD_q), padkl(bp.PxL_d0), padkl(bp.PxR_d0),
            padkl(bp.PyU_d0), padkl(bp.PyD_d0),
            padl(bp.PxL_a), padl(bp.PxR_a), padl(bp.PyU_a), padl(bp.PyD_a)]
    packed = jnp.concatenate(rows, axis=0)
    pad_r = _ceil8(packed.shape[0]) - packed.shape[0]
    return jnp.pad(packed, [(0, pad_r), (0, 0)])


def _kernel(tol_ref, prob_hbm, sp, M_hbm, S_in, M_out, S_out, lb_out,
            mwin, pwin, lbacc, pf_m, pf_p, wb, *,
            T, K, kernel, Bh, Bw, Gy, Gx, H, W, L2):
    """One full banded sweep: forward pass over steps 1..T, then backward."""
    tol = tol_ref[0]
    Kp = _ceil8(K)
    nb = Gy * Gx
    LANE = S_in.shape[-1]
    R2 = 2 * Kp
    off_QA, off_QB = 2 * Kp, 4 * Kp
    off_aA = 6 * Kp
    off_aB, off_vA, off_vB = off_aA + 2, off_aA + 4, off_aA + 6
    off_g, off_pix = off_aA + 8, off_aA + 9

    # seam state works in S_out (resident in VMEM for the whole sweep)
    S_out[...] = S_in[...]
    lbacc[...] = jnp.zeros_like(lbacc)

    # ---- static lane masks (loop-invariant) ----
    li = lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    yb_l = li // nb          # column-lane group (= xb in lane2 reading)
    b_l = li % nb
    gy_l = b_l // Gx
    gx_l = b_l % Gx
    yimg = gy_l * Bh + yb_l
    ximg2 = gx_l * Bw + yb_l  # lane2 reading: group index is xb
    vSxL = (gx_l > 0) & (yimg < H) & (gx_l * Bw < W)
    vSxR = (gx_l < Gx - 1) & (yimg < H) & ((gx_l + 1) * Bw < W)
    vSyU = (li < L2) & (ximg2 < W) & (gy_l > 0) & (gy_l * Bh < H)
    vSyD = (li < L2) & (ximg2 < W) & (gy_l < Gy - 1) & ((gy_l + 1) * Bh < H)
    g0 = yb_l == 0
    gT = yb_l == Bh - 1
    has_up = gy_l > 0
    has_dn = gy_l < Gy - 1

    def _dro(v, s):
        """Dynamic circular lane roll: out[i] = v[i - s]."""
        sh = lax.rem(lax.rem(s, LANE) + LANE, LANE)
        return pltpu.roll(v, sh, axis=v.ndim - 1)

    # Narrow seam-send windows: each seam send only affects one lane group
    # (nb = Gy*Gx contiguous lanes out of LANE), so when nb is much smaller
    # than LANE the send's O(K^2 * LANE) min-add compute is done on a rolled
    # [*, WN] window instead (WN = ceil128(nb)) and the result expanded back.
    # Rolls only permute lanes, so the masked lanes are bitwise identical to
    # the full-width path (pinned in tests/test_banded_kernel.py).
    WN = _ceil128(nb)
    NARROW = WN < LANE

    def _win(v, s):
        """Roll v by s, keep the first WN lanes (out[i] = v[i - s])."""
        return _dro(v, s)[..., :WN]

    def _expand(n, s):
        """[..., WN] -> [..., LANE]: zero-pad, then place window at lane s."""
        z = jnp.zeros(n.shape[:-1] + (LANE - WN,), n.dtype)
        return _dro(jnp.concatenate([n, z], axis=-1), s)

    def _sdownb(v):
        """v[lane] -> v[lane - nb], zero at yb = 0 (within-block up nbr)."""
        r = pltpu.roll(v, nb, axis=v.ndim - 1)
        return jnp.where(yb_l == 0, 0.0, r)

    def _supb(v):
        """v[lane] -> v[lane + nb], zero at yb = Bh-1."""
        r = pltpu.roll(v, LANE - nb, axis=v.ndim - 1)
        return jnp.where(yb_l == Bh - 1, 0.0, r)

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

    def seam_views(t):
        """(syu0, syd0, sydT, syuT): Sy values aligned to column-lane groups
        0 / Bh-1 for step t (junk outside; callers mask)."""
        SyU = S_out[2]
        SyD = S_out[3]
        syu0 = _dro(SyU, -t * nb)
        syd0 = _dro(SyD, -t * nb + Gx)
        sydT = _dro(SyD, (2 * Bh - 2 - t) * nb)
        syuT = _dro(SyU, (2 * Bh - 2 - t) * nb - Gx)
        return syu0, syd0, sydT, syuT

    def beliefs(slot_cm1, slot_c, slot_cp1, theta_c, pix_c, t, views):
        Ac = mwin[slot_c, 0:2]
        Bc = mwin[slot_c, 2:4]
        Acm1 = mwin[slot_cm1, 0:2]
        Bcp1 = mwin[slot_cp1, 2:4]
        D = theta_c + Ac[0] + Ac[1] + Bc[0] + Bc[1]
        D = D + Acm1[0] + _sdownb(Acm1[1])
        D = D + Bcp1[0] + _supb(Bcp1[1])
        SxL = S_out[0]
        SxR = S_out[1]
        syu0, syd0, sydT, syuT = views
        mx0 = (yb_l == t) & vSxL
        mxW = (yb_l == t - (Bw - 1)) & vSxR
        my0 = g0 & has_up & (pix_c > 0)
        myT = gT & has_dn & (pix_c > 0)
        D = D + jnp.where(mx0, SxL + pltpu.roll(SxR, 1, axis=1), 0.0)
        D = D + jnp.where(mxW, SxR + pltpu.roll(SxL, LANE - 1, axis=1), 0.0)
        D = D + jnp.where(my0, syu0 + syd0, 0.0)
        D = D + jnp.where(myT, sydT + syuT, 0.0)
        return D, (Ac, Bc, Acm1, Bcp1), (mx0, mxW, my0, myT)

    # ---------------------------------------------------------- forward pass
    m_in(0, 0, M_hbm).start()
    m_in(1, 1, M_hbm).start()
    m_in(2, 2, M_hbm).start()
    p_in(1, 1 % PSLOT).start()
    p_in(2, 2 % PSLOT).start()
    m_in(0, 0, M_hbm).wait()
    m_in(1, 1, M_hbm).wait()
    p_in(1, 1 % PSLOT).wait()

    def fwd_step(c, _):
        t = c - 1
        slot_c = lax.rem(c, NSLOT)
        slot_cm1 = lax.rem(c + (NSLOT - 1), NSLOT)
        slot_cp1 = lax.rem(c + 1, NSLOT)
        slot_cp2 = lax.rem(c + 2, NSLOT)
        ps_c = lax.rem(c, PSLOT)
        ps_cp1 = lax.rem(c + 1, PSLOT)

        @pl.when(c + 2 <= T + 1)
        def _():
            @pl.when(c >= 3)
            def _():
                m_wb(c - 2, slot_cp2).wait()

            m_in(c + 2, slot_cp2, M_hbm).start()

        m_in(c + 1, slot_cp1, M_hbm).wait()
        p_in(c + 1, ps_cp1).wait()

        theta_c = prow(ps_c, 0, Kp)
        D0_c = prow(ps_c, Kp, R2)
        pix_c = prow(ps_c, off_pix, off_pix + 1)
        views = seam_views(t)
        D, bufs, masks = beliefs(slot_cm1, slot_c, slot_cp1, theta_c,
                                 pix_c, t, views)
        Ac, _, _, Bcp1 = bufs
        mx0, mxW, my0, myT = masks
        gD = prow(ps_c, off_g, off_g + 1)[0][None] * D  # [Kp, LANE]

        # interior head-sends, group A (RT, DN) at column c
        QA_c = prow(ps_c, off_QA, off_QA + R2).reshape(2, Kp, -1)
        aA_c = prow(ps_c, off_aA, off_aA + 2)
        vA_c = prow(ps_c, off_vA, off_vA + 2)
        mh, _ = _send_head(gD, Ac, QA_c, D0_c, aA_c, kernel, tol, K)
        mwin[slot_c, 0:2] = jnp.where(vA_c[:, None, :] > 0, mh, Ac)

        # interior tail-sends, group B (LT, UP) into column c+1
        QB_n = prow(ps_cp1, off_QB, off_QB + R2).reshape(2, Kp, -1)
        aB_n = prow(ps_cp1, off_aB, off_aB + 2)
        vB_n = prow(ps_cp1, off_vB, off_vB + 2)
        D0_n = prow(ps_cp1, Kp, R2)
        gDt = jnp.stack([gD, _sdownb(gD)], axis=0)
        mt, _ = _send_tail2(gDt, Bcp1, QB_n,
                            jnp.stack([D0_n, D0_n], 0), aB_n, kernel, tol, K)
        mwin[slot_cp1, 2:4] = jnp.where(vB_n[:, None, :] > 0, mt, Bcp1)

        # seam head-sends: M[LT]@(., t, 0) -> SxL, M[UP]@(., 0, t) -> SyU
        QB_c = prow(ps_c, off_QB, off_QB + R2).reshape(2, Kp, -1)
        aB_c = prow(ps_c, off_aB, off_aB + 2)
        if NARROW:
            # x-dir computed at group t (shift sx), y-dir at group 0
            sx = -t * nb
            gD2 = jnp.stack([_win(gD, sx), gD[:, :WN]], 0)
            mold = jnp.stack([_win(S_out[0], sx), views[0][:, :WN]], 0)
            Q2 = jnp.stack([_win(QB_c[0], sx), QB_c[1][:, :WN]], 0)
            D02 = jnp.stack([_win(D0_c, sx), D0_c[:, :WN]], 0)
            a2 = jnp.stack([_win(aB_c[0][None], sx)[0], aB_c[1][:WN]], 0)
            mhs_n, _ = _send_head2(gD2, mold, Q2, D02, a2, kernel, tol, K)
            mhs = jnp.stack([_expand(mhs_n[0], t * nb),
                             _expand(mhs_n[1], 0)], 0)
        else:
            mold = jnp.stack([S_out[0], views[0]], 0)
            mhs, _ = _send_head(gD, mold, QB_c, D0_c, aB_c, kernel, tol, K)
        S_out[0] = jnp.where(mx0, mhs[0], S_out[0])
        upd = _dro(jnp.where(my0, mhs[1], 0.0), t * nb)
        S_out[2] = jnp.where(((yb_l == t) & vSyU), upd, S_out[2])

        # seam tail-sends: -> SxR at (t, b-1), -> SyD at (t, b-Gx)
        if NARROW:
            # both targets live at lane group t
            gDs = jnp.stack([_win(gD, sx - 1), _win(gD, -Gx)], 0)
            molds = jnp.stack([_win(S_out[1], sx), _win(S_out[3], sx)], 0)
            Qs = jnp.stack([_win(sp[Kp:2 * Kp], sx),
                            _win(sp[3 * Kp:4 * Kp], sx)], 0)
            D0s = jnp.stack([_win(sp[5 * Kp:6 * Kp], sx),
                             _win(sp[7 * Kp:8 * Kp], sx)], 0)
            als = jnp.stack([_win(sp[8 * Kp + 1][None], sx)[0],
                             _win(sp[8 * Kp + 3][None], sx)[0]], 0)
            mts_n, _ = _send_tail2(gDs, molds, Qs, D0s, als, kernel, tol, K)
            mts = jnp.stack([_expand(mts_n[0], t * nb),
                             _expand(mts_n[1], t * nb)], 0)
        else:
            gDs = jnp.stack([pltpu.roll(gD, LANE - 1, axis=1),
                             _dro(gD, t * nb - Gx)], 0)
            molds = jnp.stack([S_out[1], S_out[3]], 0)
            Qs = jnp.stack([sp[Kp:2 * Kp], sp[3 * Kp:4 * Kp]], 0)
            D0s = jnp.stack([sp[5 * Kp:6 * Kp], sp[7 * Kp:8 * Kp]], 0)
            als = jnp.stack([sp[8 * Kp + 1], sp[8 * Kp + 3]], 0)
            mts, _ = _send_tail2(gDs, molds, Qs, D0s, als, kernel, tol, K)
        S_out[1] = jnp.where(((yb_l == t) & vSxR), mts[0], S_out[1])
        S_out[3] = jnp.where(((yb_l == t) & vSyD), mts[1], S_out[3])

        m_wb(c, slot_c).start()

        # column c's reads are done — its problem slot (= rem(c+2, PSLOT))
        # is free for the c+2 prefetch; waited at the top of step c+1
        @pl.when(c + 2 <= T + 1)
        def _():
            p_in(c + 2, lax.rem(c + 2, PSLOT)).start()

        return 0

    lax.fori_loop(1, T + 1, fwd_step, 0)
    m_wb(T + 1, lax.rem(T + 1, NSLOT)).start()
    for col in range(T - 2, T + 2):
        m_wb(col, col % NSLOT).wait()

    # --------------------------------------------------------- backward pass
    p_in(T - 1, lax.rem(T - 1, PSLOT)).start()

    def bwd_step(i, _):
        c = T - i
        t = c - 1
        slot_c = lax.rem(c, NSLOT)
        slot_cm1 = lax.rem(c + (NSLOT - 1), NSLOT)
        slot_cp1 = lax.rem(c + 1, NSLOT)
        slot_cm2 = lax.rem(c + (NSLOT - 2), NSLOT)
        ps_c = lax.rem(c, PSLOT)
        ps_cm1 = lax.rem(c + (PSLOT - 1), PSLOT)

        @pl.when(c >= 2)
        def _():
            @pl.when(c + 2 <= T)
            def _():
                m_wb(c + 2, slot_cm2).wait()

            m_in(c - 2, slot_cm2, M_out).start()

        @pl.when(c < T)
        def _():
            m_in(c - 1, slot_cm1, M_out).wait()
        p_in(c - 1, ps_cm1).wait()

        theta_c = prow(ps_c, 0, Kp)
        D0_c = prow(ps_c, Kp, R2)
        pix_c = prow(ps_c, off_pix, off_pix + 1)
        views = seam_views(t)
        D, bufs, masks = beliefs(slot_cm1, slot_c, slot_cp1, theta_c,
                                 pix_c, t, views)
        _, Bc, Acm1, _ = bufs
        mx0, mxW, my0, myT = masks
        vminD = jnp.min(D, axis=0)
        lb_col = jnp.where(pix_c[0] > 0, vminD, 0.0)
        gD = prow(ps_c, off_g, off_g + 1)[0][None] * (D - vminD[None])

        # interior head-sends, group B (LT, UP) at column c
        QB_c = prow(ps_c, off_QB, off_QB + R2).reshape(2, Kp, -1)
        aB_c = prow(ps_c, off_aB, off_aB + 2)
        vB_c = prow(ps_c, off_vB, off_vB + 2)
        mh, vminh = _send_head(gD, Bc, QB_c, D0_c, aB_c, kernel, tol, K)
        lb_col = lb_col + jnp.sum(jnp.where(vB_c > 0, vminh, 0.0), axis=0)
        mwin[slot_c, 2:4] = jnp.where(vB_c[:, None, :] > 0, mh, Bc)

        # interior tail-sends, group A (RT, DN) into column c-1
        QA_p = prow(ps_cm1, off_QA, off_QA + R2).reshape(2, Kp, -1)
        aA_p = prow(ps_cm1, off_aA, off_aA + 2)
        vA_p = prow(ps_cm1, off_vA, off_vA + 2)
        D0_p = prow(ps_cm1, Kp, R2)
        gDt = jnp.stack([gD, _supb(gD)], axis=0)
        mt, vmint = _send_tail2(gDt, Acm1, QA_p,
                                jnp.stack([D0_p, D0_p], 0), aA_p, kernel,
                                tol, K)
        lb_col = lb_col + jnp.sum(jnp.where(vA_p > 0, vmint, 0.0), axis=0)
        mwin[slot_cm1, 0:2] = jnp.where(vA_p[:, None, :] > 0, mt, Acm1)

        # seam head-sends: M[RT]@(., t-Bw+1, Bw-1) -> SxR,
        #                  M[DN]@(., Bh-1, t-Bh+1) -> SyD
        QA_c = prow(ps_c, off_QA, off_QA + R2).reshape(2, Kp, -1)
        aA_c = prow(ps_c, off_aA, off_aA + 2)
        tb = t - (Bw - 1)  # x-seam compute/target lane group
        th_ = t - (Bh - 1)  # y-seam target lane2 group
        if NARROW:
            # x-dir computed at group tb; y-dir at group Bh-1
            sxb = -tb * nb
            syb = -(Bh - 1) * nb
            gD2 = jnp.stack([_win(gD, sxb), _win(gD, syb)], 0)
            mold = jnp.stack([_win(S_out[1], sxb),
                              _win(S_out[3], -th_ * nb)], 0)
            Q2 = jnp.stack([_win(QA_c[0], sxb), _win(QA_c[1], syb)], 0)
            D02 = jnp.stack([_win(D0_c, sxb), _win(D0_c, syb)], 0)
            a2 = jnp.stack([_win(aA_c[0][None], sxb)[0],
                            _win(aA_c[1][None], syb)[0]], 0)
            mhs_n, vhs_n = _send_head2(gD2, mold, Q2, D02, a2, kernel, tol,
                                       K)
            mhs = jnp.stack([_expand(mhs_n[0], tb * nb),
                             _expand(mhs_n[1], (Bh - 1) * nb)], 0)
            vhs = jnp.stack([_expand(vhs_n[0][None], tb * nb)[0],
                             _expand(vhs_n[1][None], (Bh - 1) * nb)[0]], 0)
        else:
            mold = jnp.stack([S_out[1], views[2]], 0)
            mhs, vhs = _send_head(gD, mold, QA_c, D0_c, aA_c, kernel, tol, K)
        lb_col = lb_col + jnp.where(mxW[0], vhs[0], 0.0)
        lb_col = lb_col + jnp.where(myT[0], vhs[1], 0.0)
        S_out[1] = jnp.where(mxW, mhs[0], S_out[1])
        upd = _dro(jnp.where(myT, mhs[1], 0.0),
                   -(2 * Bh - 2 - t) * nb)
        S_out[3] = jnp.where(((yb_l == t - (Bh - 1)) & vSyD), upd, S_out[3])

        # seam tail-sends: -> SxL at (t-Bw+1, b+1), -> SyU at (t-Bh+1, b+Gx)
        if NARROW:
            gDs = jnp.stack([_win(gD, sxb + 1),
                             _win(gD, Gx - (Bh - 1) * nb)], 0)
            molds = jnp.stack([_win(S_out[0], sxb),
                               _win(S_out[2], -th_ * nb)], 0)
            Qs = jnp.stack([_win(sp[0:Kp], sxb),
                            _win(sp[2 * Kp:3 * Kp], -th_ * nb)], 0)
            D0s = jnp.stack([_win(sp[4 * Kp:5 * Kp], sxb),
                             _win(sp[6 * Kp:7 * Kp], -th_ * nb)], 0)
            als = jnp.stack([_win(sp[8 * Kp][None], sxb)[0],
                             _win(sp[8 * Kp + 2][None], -th_ * nb)[0]], 0)
            mts_n, vts_n = _send_tail2(gDs, molds, Qs, D0s, als, kernel,
                                       tol, K)
            mts = jnp.stack([_expand(mts_n[0], tb * nb),
                             _expand(mts_n[1], th_ * nb)], 0)
            vts = jnp.stack([_expand(vts_n[0][None], tb * nb)[0],
                             _expand(vts_n[1][None], th_ * nb)[0]], 0)
        else:
            gDs = jnp.stack([pltpu.roll(gD, 1, axis=1),
                             _dro(gD, (t - 2 * Bh + 2) * nb + Gx)], 0)
            molds = jnp.stack([S_out[0], S_out[2]], 0)
            Qs = jnp.stack([sp[0:Kp], sp[2 * Kp:3 * Kp]], 0)
            D0s = jnp.stack([sp[4 * Kp:5 * Kp], sp[6 * Kp:7 * Kp]], 0)
            als = jnp.stack([sp[8 * Kp], sp[8 * Kp + 2]], 0)
            mts, vts = _send_tail2(gDs, molds, Qs, D0s, als, kernel, tol, K)
        wxl = (yb_l == t - (Bw - 1)) & vSxL
        wyu = (yb_l == t - (Bh - 1)) & vSyU
        lb_col = lb_col + jnp.where(wxl[0], vts[0], 0.0)
        lb_col = lb_col + jnp.where(wyu[0], vts[1], 0.0)
        S_out[0] = jnp.where(wxl, mts[0], S_out[0])
        S_out[2] = jnp.where(wyu, mts[1], S_out[2])

        lbacc[0] = lbacc[0] + lb_col
        m_wb(c, slot_c).start()

        # column c's reads are done — its slot (= rem(c-2, PSLOT)) is free
        # for the c-2 prefetch; waited at the top of step c-1
        @pl.when(c >= 2)
        def _():
            p_in(c - 2, lax.rem(c + (PSLOT - 2), PSLOT)).start()

        return 0

    lax.fori_loop(0, T, bwd_step, 0)
    for col in (1, 2, 3):
        m_wb(col, col % NSLOT).wait()
    lb_out[...] = lbacc[...]


@functools.partial(jax.jit, static_argnames=(
    "T", "K", "kernel", "Bh", "Bw", "Gy", "Gx", "H", "W", "L2", "interpret"))
def sweep_banded_pallas(prob, sp, M, S, *, T, K, kernel, tol, Bh, Bw, Gy, Gx,
                        H, W, L2, interpret=False):
    """One full (fwd+bwd) banded sweep.  prob: [T+2, Rp, LANE]; sp: [Rs,
    LANE] seam problem slab; M: [T+2, 4, Kp, LANE] (RT, DN, LT, UP); S:
    [4, Kp, LANE] seam messages (SxL, SxR, SyU, SyD).  Returns (M', S', lb)."""
    LANE = prob.shape[-1]
    Rp = prob.shape[1]
    Kp = M.shape[2]
    f = pl.pallas_call(
        functools.partial(_kernel, T=T, K=K, kernel=kernel, Bh=Bh, Bw=Bw,
                          Gy=Gy, Gx=Gx, H=H, W=W, L2=L2),
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(M.shape, M.dtype),
                   jax.ShapeDtypeStruct(S.shape, S.dtype),
                   jax.ShapeDtypeStruct((1, LANE), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 4, Kp, LANE), M.dtype),
            pltpu.VMEM((PSLOT, Rp, LANE), prob.dtype),
            pltpu.VMEM((1, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((PSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )
    Mnew, Snew, lbv = f(jnp.asarray(tol, jnp.float32).reshape(1), prob, sp,
                        M, S)
    return Mnew, Snew, jnp.sum(lbv, dtype=jnp.float32)


def sweep_state(spec, K, kernel, tol, prob, sp, state,
                interpret: bool = False):
    """One banded sweep on a solvers/banded.py state, with the packed
    problem slabs (prob, sp) passed explicitly — so callers can route them
    through a jit boundary as arguments instead of closure constants
    (closure-captured slabs are inlined into the compile payload).
    Padding to kernel layouts is added/stripped per call."""
    LANE = prob.shape[-1]
    Kp = _ceil8(K)
    L, Lp = spec.L, spec.Lp
    pad_k = Kp - K
    MA, MB, (SxL, SxR, SyU, SyD) = state
    M4 = jnp.concatenate([MA, MB], axis=1)
    M4 = jnp.pad(M4, [(0, 0), (0, 0), (0, pad_k), (0, LANE - L)])
    S = jnp.stack([
        jnp.pad(SxL, [(0, pad_k), (0, LANE - L)]),
        jnp.pad(SxR, [(0, pad_k), (0, LANE - L)]),
        jnp.pad(SyU, [(0, pad_k), (0, LANE - Lp)]),
        jnp.pad(SyD, [(0, pad_k), (0, LANE - Lp)]),
    ], 0)
    M4, S, lb = sweep_banded_pallas(
        prob, sp, M4, S, T=spec.T, K=K, kernel=kernel, tol=tol,
        Bh=spec.Bh, Bw=spec.Bw, Gy=spec.Gy, Gx=spec.Gx, H=spec.H,
        W=spec.W, L2=spec.L2, interpret=interpret)
    MA = M4[:, 0:2, :K, :L]
    MB = M4[:, 2:4, :K, :L]
    Snew = (S[0, :K, :L], S[1, :K, :L], S[2, :K, :Lp], S[3, :K, :Lp])
    return (MA, MB, Snew), lb


def vmem_estimate(K: int, spec) -> int:
    """Rough VMEM footprint (bytes) of one sweep_banded_pallas call."""
    Kp = _ceil8(K)
    LANE = _ceil128(spec.Lp)
    Rp = _ceil8(6 * Kp + 10)
    Rs = _ceil8(8 * Kp + 4)
    rows = (NSLOT * 4 * Kp  # message window
            + PSLOT * Rp  # problem window
            + 3 * 4 * Kp  # S in/out + working copies
            + Rs  # seam problem slab
            + 8 * Kp)  # per-step temporaries (views, sends)
    return rows * LANE * 4


def make_sweep(bp, interpret: bool = False):
    """Build sweep_fn(state) -> (state', lb) over a banded._BandedProblem,
    where state = (MA, MB, (SxL, SxR, SyU, SyD)) in solvers/banded.py's
    shapes."""
    spec = bp.spec
    if spec.T < 4:
        raise ImportError("banded kernel requires T >= 4")
    if vmem_estimate(bp.K, spec) > 14 * 1024 * 1024:
        # e.g. K ~ 80 at small blocks: the resident windows exceed the ~16 MB
        # VMEM budget; fall back to the (exact) scan path rather than fail
        # Mosaic allocation.  Larger blocks shrink LANE — callers can retry
        # with a bigger band.
        raise ImportError("banded kernel VMEM estimate exceeds budget "
                          f"(K={bp.K}, LANE={_ceil128(spec.Lp)})")
    prob = pack_problem(bp)
    sp = pack_seam(bp)

    def sweep_fn(state):
        return sweep_state(spec, bp.K, bp.kernel, bp.tol, prob, sp, state,
                           interpret=interpret)

    return sweep_fn
