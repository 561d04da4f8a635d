"""Host (native C++) serial TRW-S — oracle and CPU baseline.

The trws_mex equivalent running the papers' O(K) lower-envelope message
updates on a single core, with a caller-chosen node ordering.  Used for
full-scale parity checks against the device solver and as the CPU
reference architecture when benchmarking simultaneous fusion.
"""

from __future__ import annotations

import ctypes

import numpy as np

from stereo_tpu import native


def bipartite_order(H: int, W: int) -> np.ndarray:
    """Blacks (y+x even) before whites — the device solver's ordering."""
    ys, xs = np.mgrid[0:H, 0:W]
    parity = ((ys + xs) % 2).ravel()
    ids = np.arange(H * W)
    return np.concatenate([ids[parity == 0], ids[parity == 1]]).astype(np.int32)


def solve(kernel, unary, tails, heads, q_src, q_dst, alphas, tol, order,
          maxiter=1000, max_relgap=1e-4):
    """unary: [K, N] node costs; q_src/q_dst: [K, E]; returns
    (labels [N], energy, lower_bound, iterations)."""
    unary = np.ascontiguousarray(np.asarray(unary, np.float64).T)  # node-major
    q_src = np.ascontiguousarray(np.asarray(q_src, np.float64).T)  # edge-major
    q_dst = np.ascontiguousarray(np.asarray(q_dst, np.float64).T)
    tails = np.ascontiguousarray(tails, np.int32)
    heads = np.ascontiguousarray(heads, np.int32)
    alphas = np.ascontiguousarray(alphas, np.float64)
    order = np.ascontiguousarray(order, np.int32)
    K = unary.shape[1]
    N = unary.shape[0]
    E = len(tails)
    assert q_src.shape == (E, K) and q_dst.shape == (E, K)
    assert len(order) == N

    labels = np.zeros(N, np.int32)
    energy = ctypes.c_double()
    lb = ctypes.c_double()
    L = native.lib()
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    iters = L.trws_serial(
        int(kernel), K, N, E,
        unary.ctypes.data_as(f64p),
        tails.ctypes.data_as(i32p), heads.ctypes.data_as(i32p),
        q_src.ctypes.data_as(f64p), q_dst.ctypes.data_as(f64p),
        alphas.ctypes.data_as(f64p), float(tol),
        order.ctypes.data_as(i32p), int(maxiter), float(max_relgap),
        labels.ctypes.data_as(i32p), ctypes.byref(energy), ctypes.byref(lb),
    )
    return labels, float(energy.value), float(lb.value), int(iters)
