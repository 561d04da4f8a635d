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


def solve_with_triples(U0, U1, tails, heads, E00, E01, E10, E11, triples,
                       improve: bool = False, weak: bool = True):
    """QPBO with triple cliques — the vgg_qpbo capability
    (imrender/vgg/vgg_qpbo.cxx:209-256 reduces each 8-entry triple table to
    pairwise terms plus one auxiliary node; here via the Freedman-Drineas
    cubic reduction rather than the mex's regularity-projection code).

    triples: list of (i, j, k, table) with table[x_i, x_j, x_k] of shape
    (2, 2, 2).  Returns (labels [N] for the original variables, energy,
    lower_bound, n_unlabelled) where the reported energy is re-evaluated on
    the original energy (aux labels marginalized exactly).
    """
    U0_orig = np.asarray(U0, dtype=np.float64).ravel()
    U1_orig = np.asarray(U1, dtype=np.float64).ravel()
    U0 = U0_orig.copy()
    U1 = U1_orig.copy()
    n = len(U0)
    tails_orig = np.asarray(tails, dtype=np.int64).ravel()
    heads_orig = np.asarray(heads, dtype=np.int64).ravel()
    tails = list(tails_orig)
    heads = list(heads_orig)
    pe = [list(np.asarray(e, dtype=np.float64).ravel())
          for e in (E00, E01, E10, E11)]
    extra_u = []  # (node, du0, du1) — aux nodes appended after the n originals

    def add_pair(a, b, t00, t01, t10, t11):
        tails.append(a)
        heads.append(b)
        for lst, v in zip(pe, (t00, t01, t10, t11)):
            lst.append(v)

    def add_unary(i, w):  # energy w * x_i
        nonlocal U0, U1
        if i < n:
            U1[i] += w
        else:
            extra_u[i - n][2] += w

    n_aux = 0
    const = 0.0
    for (i, j, k, table) in triples:
        t = np.asarray(table, dtype=np.float64).reshape(2, 2, 2)
        # multilinear coefficients
        c0 = t[0, 0, 0]
        ci = t[1, 0, 0] - c0
        cj = t[0, 1, 0] - c0
        ck = t[0, 0, 1] - c0
        cij = t[1, 1, 0] - c0 - ci - cj
        cik = t[1, 0, 1] - c0 - ci - ck
        cjk = t[0, 1, 1] - c0 - cj - ck
        cijk = t[1, 1, 1] - c0 - ci - cj - ck - cij - cik - cjk
        const += c0
        add_unary(i, ci)
        add_unary(j, cj)
        add_unary(k, ck)
        if cij:
            add_pair(i, j, 0, 0, 0, cij)
        if cik:
            add_pair(i, k, 0, 0, 0, cik)
        if cjk:
            add_pair(j, k, 0, 0, 0, cjk)
        if cijk:
            w_id = n + n_aux
            n_aux += 1
            extra_u.append([w_id, 0.0, 0.0])
            a = cijk
            if a < 0:
                # a*x_i*x_j*x_k = min_w a*w*(x_i + x_j + x_k - 2):
                # three E11 pairwise terms a*w*x_. plus unary -2a*w
                extra_u[-1][2] += -2.0 * a
                add_pair(i, w_id, 0, 0, 0, a)
                add_pair(j, w_id, 0, 0, 0, a)
                add_pair(k, w_id, 0, 0, 0, a)
            else:
                # a*x_i*x_j*x_k = a*x_j*x_k - a*(1-x_i)*x_j*x_k; the second
                # term has a negative cubic coefficient in (1-x_i, x_j, x_k):
                # -a*(1-x_i)*x_j*x_k = min_w [-a*w*(1-x_i) - a*w*x_j
                #                             - a*w*x_k + 2a*w]
                add_pair(j, k, 0, 0, 0, a)
                extra_u[-1][2] += 2.0 * a
                add_pair(i, w_id, 0, -a, 0, 0)  # E01: -a*w*(1-x_i)
                add_pair(j, w_id, 0, 0, 0, -a)  # E11: -a*w*x_j
                add_pair(k, w_id, 0, 0, 0, -a)

    U0_full = np.concatenate([U0, [u[1] for u in extra_u]])
    U1_full = np.concatenate([U1, [u[2] for u in extra_u]])
    labels, e_raw, lb, n_unlab = solve(
        U0_full, U1_full, tails, heads, *pe, improve=improve, weak=weak,
    )
    lb += const
    lab_orig = labels[:n]
    # energy of the keep-zero completion on the ORIGINAL energy
    y = np.where(lab_orig >= 0, lab_orig, 0)
    E = triples_energy(y, U0_orig, U1_orig, tails_orig, heads_orig,
                       E00, E01, E10, E11, triples)
    n_unlab = int((lab_orig < 0).sum())
    return lab_orig, E, lb, n_unlab


def triples_energy(lab, U0, U1, tails, heads, E00, E01, E10, E11, triples):
    """Energy of a 0/1 labeling under unary + pairwise + triple terms."""
    E = labeling_energy(lab, U0, U1, np.asarray(tails, dtype=np.int64),
                        np.asarray(heads, dtype=np.int64),
                        np.asarray(E00, dtype=np.float64),
                        np.asarray(E01, dtype=np.float64),
                        np.asarray(E10, dtype=np.float64),
                        np.asarray(E11, dtype=np.float64))
    for (i, j, k, table) in triples:
        t = np.asarray(table, dtype=np.float64).reshape(2, 2, 2)
        E += float(t[lab[i], lab[j], lab[k]])
    return E


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
