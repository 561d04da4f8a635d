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


def labeling_energy(lab, U0, U1, tails, heads, E00, E01, E10, E11):
    """Energy of a full 0/1 labeling under the same inputs."""
    lab = np.asarray(lab)
    E = np.where(lab == 1, U1, U0).sum()
    xi = lab[tails] == 1
    xj = lab[heads] == 1
    E += np.where(xi, np.where(xj, E11, E10), np.where(xj, E01, E00)).sum()
    return float(E)
