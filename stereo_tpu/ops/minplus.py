"""Fused min-plus message kernels (the hot op of TRW-S).

For every pixel and an edge family with source positions P[K], dest positions
R[K], weight alpha and truncation tol:

    msgA[j] = min_i ( H_A[i] + alpha * TR(|P[i] - R[j]|) )   (source = tail)
    msgB[i] = min_j ( H_B[j] + alpha * TR(|P[i] - R[j]|) )   (source = head)

The straightforward XLA formulation materializes K stacked [K, H, W]
intermediates per reduction, turning an O(K^2 HW) compute problem into ~K x
the necessary HBM traffic.  The Pallas kernel streams (K, 8, 128) tiles
through VMEM and emits both variants from a single pass over j — each element
of H/P/R is read from HBM exactly once.

The reference computes the same update in O(K) per edge with a lower-envelope
scan over sorted positions (typeStereoLinear.h:329-487,
typeStereoQuadratic.h); at this problem family's label counts (K <= ~100) the
dense K^2 VMEM pass beats any sort + data-dependent scan on TPU, and is exact
for both kernels.

Measured (v5e, round 4, [K, H, W] = [79, 375, 450] f32, amortized in jitted
lax.scan): this kernel's full K=79 dense update costs **4.18 ms**, while the
envelope DT's required indirection primitives cost more than the entire
dense update *each*:

  - take_along_axis by a per-pixel static permutation (sorting h into
    position order, needed >= 2x per envelope update): **169 ms** — TPU
    gathers along a non-minor axis serialize, ~40x the dense update;
  - lax.sort_key_val along K (the gather-free alternative; a bitonic
    network re-sorted per update): 3.77 ms — already ~1x the dense update
    before any envelope work;
  - the envelope's cummin itself (lax.associative_scan): 1.03 ms.

Positions are static per solve but h = gD - M changes every update, so the
per-update reordering cannot be hoisted (and no single per-pixel relabeling
sorts all four directions' q plus D0 simultaneously).  Dense K^2 is the
right TPU design for this regime; the O(K) envelope is kept in the host
oracle (native/trws.cpp:37-164) where pointers are free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stereo_tpu.energy import truncated_kernel


def minplus_pair_xla(H_A, H_B, P, R, alpha, kernel: int, tol):
    """Reference XLA implementation. H_A/H_B/P/R: [K, H, W]; alpha: [H, W].

    Returns (msgA, msgB), each [K, H, W].
    """
    K = P.shape[0]
    msgA = []
    accB = jnp.full_like(H_B, jnp.inf)
    for j in range(K):
        term = alpha[None] * truncated_kernel(P - R[j][None], kernel, tol)
        msgA.append(jnp.min(H_A + term, axis=0))
        accB = jnp.minimum(accB, H_B[j][None] + term)
    return jnp.stack(msgA, axis=0), accB


def _tile_kernel(tol_ref, ha_ref, hb_ref, p_ref, r_ref, alpha_ref,
                 msga_ref, msgb_ref, *, kernel: int):
    K = p_ref.shape[0]
    tol = tol_ref[0]
    alpha = alpha_ref[0]
    ha = ha_ref[...]
    hb = hb_ref[...]
    p = p_ref[...]
    accb = jnp.full(hb.shape, jnp.inf, dtype=hb.dtype)
    for j in range(K):
        term = alpha[None] * truncated_kernel(p - r_ref[j][None], kernel, tol)
        msga_ref[j] = jnp.min(ha + term, axis=0)
        accb = jnp.minimum(accb, hb[j][None] + term)
    msgb_ref[...] = accb


@functools.partial(jax.jit,
                   static_argnames=("kernel", "th", "tw", "interpret"))
def minplus_pair_pallas(H_A, H_B, P, R, alpha, tol, kernel: int,
                        th: int = 8, tw: int | None = None,
                        interpret: bool = False):
    """Pallas TPU implementation; same contract as minplus_pair_xla
    (tol may be a traced scalar — it rides in SMEM)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, H, W = P.shape
    if tw is None:
        # keep ~7 live [K, th, tw] f32 buffers + double buffering under the
        # 16 MB VMEM budget: cap per-buffer elements at ~128k
        tw = 512
        while tw > 128 and K * th * tw > 128 * 1024:
            tw //= 2
    pad_h = (-H) % th
    pad_w = (-W) % tw
    if pad_h or pad_w:
        pad3 = lambda x: jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w)))
        H_A, H_B, P, R = map(pad3, (H_A, H_B, P, R))
        alpha = jnp.pad(alpha, ((0, pad_h), (0, pad_w)))
    Hp, Wp = H + pad_h, W + pad_w

    grid = (Hp // th, Wp // tw)
    spec_k = pl.BlockSpec((K, th, tw), lambda h, w: (0, h, w),
                          memory_space=pltpu.VMEM)
    spec_a = pl.BlockSpec((1, th, tw), lambda h, w: (0, h, w),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec(memory_space=pltpu.SMEM)

    tol_arr = jnp.asarray(tol, P.dtype).reshape(1)
    msgA, msgB = pl.pallas_call(
        functools.partial(_tile_kernel, kernel=kernel),
        grid=grid,
        interpret=interpret,
        in_specs=[spec_s, spec_k, spec_k, spec_k, spec_k, spec_a],
        out_specs=[spec_k, spec_k],
        out_shape=[
            jax.ShapeDtypeStruct((K, Hp, Wp), P.dtype),
            jax.ShapeDtypeStruct((K, Hp, Wp), P.dtype),
        ],
    )(tol_arr, H_A, H_B, P, R, alpha[None])
    if pad_h or pad_w:
        msgA = msgA[:, :H, :W]
        msgB = msgB[:, :H, :W]
    return msgA, msgB


def minplus_pair(H_A, H_B, P, R, alpha, tol, kernel: int,
                 use_pallas: bool | None = None):
    """Backend dispatch: Pallas on TPU (unless disabled), XLA elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return minplus_pair_pallas(H_A, H_B, P, R, alpha, tol, kernel)
    return minplus_pair_xla(H_A, H_B, P, R, alpha, kernel, tol)


# ---------------------------------------------------------------- send kernel
def _send_kernel(tol_ref, hs_ref, p_ref, r_ref, alpha_ref, msg_ref, vmin_ref,
                 *, kernel: int, K: int, KT: int = 8):
    """msg[t] = min_s (hs[s] + alpha * TR(p[t] - r[s])), normalized.

    2-D tiles [Kp, tl]; rows >= K are padding (hs rows preloaded with BIG by
    the wrapper so they never win the source min; target rows >= K emit junk
    that the wrapper crops, and vmin reduces over the real K rows only)."""
    tol = tol_ref[0]
    alpha = alpha_ref[0]  # [tl]
    hs = hs_ref[...]  # [Kp, tl]
    r = r_ref[...]
    Kp = hs.shape[0]
    for i0 in range(0, Kp, KT):
        sl = slice(i0, min(i0 + KT, Kp))
        pt = p_ref[sl]
        acc = None
        for s in range(K):
            c = hs[s][None] + alpha[None] * truncated_kernel(
                pt - r[s][None], kernel, tol)
            acc = c if acc is None else jnp.minimum(acc, c)
        msg_ref[sl] = acc
    vmin = jnp.min(msg_ref[:K], axis=0)  # real target rows only
    vmin_ref[0] = vmin
    msg_ref[...] = msg_ref[...] - vmin[None]


@functools.partial(jax.jit, static_argnames=("kernel", "tl", "interpret"))
def minplus_send_pallas(hs, p, r, alpha, tol, kernel: int, tl: int = 512,
                        interpret: bool = False):
    """One-variant fused send on column-shaped data.

    hs/p/r: [K, L] (source heights, target positions, source positions);
    alpha: [L].  Returns (msg [K, L] min-normalized, vmin [L]) — exactly
    wavefront._send_head's math (and _send_tail's with p/r swapped; TR is
    even, so the operand order is immaterial).  Values match the XLA path
    to FP-contraction noise (~1-2 ulp: the compilers fuse a*TR+h into FMAs
    differently), measured in tests.

    Motivation: the scan-path solvers (banded/wavefront/banded_dist) spend
    their sweeps in these sends; the XLA formulation materializes a
    [K, K, L] intermediate per send (38 MB at K=79, L=1536), ~all of it
    HBM traffic.  Here the K x K walk stays in VMEM ([KT, tl] blocks).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, L = hs.shape
    Kp = -(-K // 8) * 8
    tl = min(tl, -(-L // 128) * 128)
    pad_l = (-L) % tl
    Lp = L + pad_l
    BIG = jnp.asarray(1e30, hs.dtype)
    hs = jnp.pad(hs, ((0, Kp - K), (0, pad_l)), constant_values=BIG)
    p = jnp.pad(p, ((0, Kp - K), (0, pad_l)))
    r = jnp.pad(r, ((0, Kp - K), (0, pad_l)))
    alpha = jnp.pad(alpha, ((0, pad_l),))

    grid = (Lp // tl,)
    kspec = pl.BlockSpec((Kp, tl), lambda l: (0, l), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, tl), lambda l: (0, l), memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    msg, vmin = pl.pallas_call(
        functools.partial(_send_kernel, kernel=kernel, K=K),
        grid=grid,
        interpret=interpret,
        in_specs=[sm, kspec, kspec, kspec, aspec],
        out_specs=[kspec, aspec],
        out_shape=[
            jax.ShapeDtypeStruct((Kp, Lp), hs.dtype),
            jax.ShapeDtypeStruct((1, Lp), hs.dtype),
        ],
    )(jnp.asarray(tol, hs.dtype).reshape(1), hs, p, r, alpha[None])
    return msg[:K, :L], vmin[0, :L]


def minplus_send(hs, p, r, alpha, tol, kernel: int, min_k: int = 24):
    """Batched dispatcher for minplus_send_pallas over leading dims.

    hs/p/r: [..., K, L]; alpha: [..., L] (all mutually broadcastable).
    Returns (msg, vmin) with the broadcast leading shape.  Returns None if
    the fused path does not apply (non-TPU backend or K < min_k — at small
    K the XLA formulation's intermediates are cheap and the extra dispatch
    isn't worth it; measured win is the large-K regime).
    """
    K = hs.shape[-2]
    if jax.default_backend() != "tpu" or K < min_k:
        return None
    lead = jnp.broadcast_shapes(hs.shape[:-2], p.shape[:-2], r.shape[:-2],
                                alpha.shape[:-1])
    L = hs.shape[-1]
    hs = jnp.broadcast_to(hs, lead + (K, L)).reshape((-1, K, L))
    p = jnp.broadcast_to(p, lead + (K, L)).reshape((-1, K, L))
    r = jnp.broadcast_to(r, lead + (K, L)).reshape((-1, K, L))
    alpha = jnp.broadcast_to(alpha, lead + (L,)).reshape((-1, L))
    msgs, vmins = [], []
    for b in range(hs.shape[0]):
        m, v = minplus_send_pallas(hs[b], p[b], r[b], alpha[b], tol, kernel)
        msgs.append(m)
        vmins.append(v)
    return (jnp.stack(msgs).reshape(lead + (K, L)),
            jnp.stack(vmins).reshape(lead + (L,)))
