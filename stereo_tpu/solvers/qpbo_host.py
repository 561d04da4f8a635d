"""Host QPBO (roof duality) — exact binary-fusion oracle via the native lib.

The rd.m / rd_mex.cpp equivalent: takes per-directed-edge fusion tables and
returns a strongly-persistent partial labeling, the energy of the
unlabelled-keep-current completion, the roof-dual lower bound, and the
unlabelled count.
"""

from __future__ import annotations

import ctypes

import numpy as np

from stereo_tpu import native


def solve(U0, U1, tails, heads, E00, E01, E10, E11, improve: bool = False,
          weak: bool = True):
    """Returns (labels [N] in {-1,0,1}, energy, lower_bound, n_unlabelled).

    ``weak``: extend the strongly-persistent labeling with weak persistency
    (ComputeWeakPersistencies equivalent; on by default like rd_mex.cpp:69).
    """
    U0 = np.ascontiguousarray(U0, dtype=np.float64).ravel()
    U1 = np.ascontiguousarray(U1, dtype=np.float64).ravel()
    tails = np.ascontiguousarray(tails, dtype=np.int32).ravel()
    heads = np.ascontiguousarray(heads, dtype=np.int32).ravel()
    E00 = np.ascontiguousarray(E00, dtype=np.float64).ravel()
    E01 = np.ascontiguousarray(E01, dtype=np.float64).ravel()
    E10 = np.ascontiguousarray(E10, dtype=np.float64).ravel()
    E11 = np.ascontiguousarray(E11, dtype=np.float64).ravel()
    n = U0.shape[0]
    m = tails.shape[0]
    assert heads.shape[0] == m and U1.shape[0] == n
    assert all(x.shape[0] == m for x in (E00, E01, E10, E11))
    if m and (tails.min() < 0 or max(tails.max(), heads.max()) >= n):
        raise ValueError("edge endpoint out of range")

    labels = np.zeros(n, dtype=np.int32)
    energy = ctypes.c_double()
    lb = ctypes.c_double()
    n_unlab = ctypes.c_int32()

    L = native.lib()
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = L.qpbo_solve(
        n, m,
        U0.ctypes.data_as(f64p), U1.ctypes.data_as(f64p),
        tails.ctypes.data_as(i32p), heads.ctypes.data_as(i32p),
        E00.ctypes.data_as(f64p), E01.ctypes.data_as(f64p),
        E10.ctypes.data_as(f64p), E11.ctypes.data_as(f64p),
        int(bool(improve)) | (0 if weak else 2),
        labels.ctypes.data_as(i32p),
        ctypes.byref(energy), ctypes.byref(lb), ctypes.byref(n_unlab),
    )
    if rc != 0:
        raise RuntimeError(f"qpbo_solve failed with code {rc}")
    return labels, float(energy.value), float(lb.value), int(n_unlab.value)


def improve(labels, U0, U1, tails, heads, E00, E01, E10, E11,
            rounds: int = 3, seed: int = 0):
    """QPBO-I (the rd_mex Improve path, rd_mex.cpp:91-92): randomized
    fix-and-resolve.

    Start from the keep-current completion y of a QPBO partial labeling.
    Each round fixes a random subset of the previously-unlabelled nodes to
    their value in y (via hard unaries), re-solves QPBO on the rest, and
    applies every labeled node onto y.  Because the fixed energy's strong
    persistency is an autarky and y satisfies the constraints, the energy is
    non-increasing; the symmetry-breaking lets rounds label nodes the plain
    roof dual could not.  Follows the scheme of Rother et al., "Optimizing
    Binary MRFs via Extended Roof Duality" (CVPR 2007), not Kolmogorov's code.

    Returns (y, energy) with y a complete 0/1 labeling.
    """
    U0 = np.asarray(U0, dtype=np.float64).ravel().copy()
    U1 = np.asarray(U1, dtype=np.float64).ravel().copy()
    labels = np.asarray(labels)
    y = np.where(labels >= 0, labels, 0).astype(np.int64)
    free = labels < 0
    if not free.any():
        return y, labeling_energy(y, U0, U1, tails, heads, E00, E01, E10, E11)

    scale = max(np.abs(U0).max(), np.abs(U1).max(), 1.0)
    BIG = 1e6 * scale * len(U0)
    rng = np.random.default_rng(seed)
    best_e = labeling_energy(y, U0, U1, tails, heads, E00, E01, E10, E11)
    for _ in range(rounds):
        fix = free & (rng.random(len(U0)) < 0.5)
        u0 = U0.copy()
        u1 = U1.copy()
        u0[fix & (y == 1)] = BIG
        u1[fix & (y == 0)] = BIG
        lab, _, _, _ = solve(u0, u1, tails, heads, E00, E01, E10, E11)
        y_new = np.where(lab >= 0, lab, y)
        e_new = labeling_energy(y_new, U0, U1, tails, heads, E00, E01, E10, E11)
        if e_new <= best_e:
            y, best_e = y_new, e_new
    return y, best_e


def labeling_energy(lab, U0, U1, tails, heads, E00, E01, E10, E11):
    """Energy of a full 0/1 labeling under the same inputs."""
    lab = np.asarray(lab)
    E = np.where(lab == 1, U1, U0).sum()
    xi = lab[tails] == 1
    xj = lab[heads] == 1
    E += np.where(xi, np.where(xj, E11, E10), np.where(xj, E01, E00)).sum()
    return float(E)
