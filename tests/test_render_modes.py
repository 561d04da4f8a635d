"""truncquad_modes / truncquad_edges parity vs literal numpy transcriptions
of imrender/ojw/truncquad_modes.cxx and truncquad_edges.cxx."""

import numpy as np
import pytest

from stereo_tpu.render import modes as modes_mod
from stereo_tpu.render import edges as edges_mod


# ------------------------------------------------------------- transcription
def _update_energy(A, C, thresh):
    """truncquad_modes.cxx:update_energy — A: [Cc, L], C: [Cc]."""
    d2 = np.sum((A - C[:, None]) ** 2, axis=0)
    bt = d2 <= thresh
    e = np.sum(np.where(bt, d2, thresh))
    n = int(bt.sum())
    if n > 0:
        C[:] = A[:, bt].mean(axis=1)
    return e, bt, n


def _calc_energy(A, C, thresh, use_variance=None):
    d2 = np.sum((A - C[:, None]) ** 2, axis=0)
    if use_variance is None:
        return np.sum(np.minimum(d2, thresh))
    inl = d2 <= thresh
    n = int(inl.sum())
    if n < 2:
        return 1e300
    return d2[inl].sum() / (n - use_variance)


def modes_reference(I, thresh, use_variance=0, search_width=None):
    """Literal transcription of the C loop (without seen_before pruning —
    its survivors coincide with the energy dedupe, which is applied)."""
    C, L, M = I.shape
    uv = use_variance - 1
    sw = 2 * M if search_width is None else search_width
    out = []
    for d in range(M):
        e_thisdepth = []
        for p1 in range(L - 1):
            for p2 in range(p1 + 1, L):
                dist = np.sum((I[:, p1, d] - I[:, p2, d]) ** 2)
                if dist > 4 * thresh:
                    continue
                centre = (I[:, p1, d] + I[:, p2, d]) * 0.5
                e_curr = -1.0
                while True:
                    e_up = e_curr
                    e_curr, bt, n = _update_energy(I[:, :, d], centre, thresh)
                    if e_up == e_curr:
                        break
                if n < 2:
                    continue
                if any(e_curr == e for e in e_thisdepth):
                    continue
                e_thisdepth.append(e_curr)
                # depth-mode test
                if uv < 0:
                    e_ref = e_curr
                    calc = lambda d2i: _calc_energy(I[:, :, d2i], centre,
                                                    thresh)
                else:
                    e_ref = (e_curr - thresh * (L - n)) / (n - uv)
                    calc = lambda d2i: _calc_energy(I[:, :, d2i], centre,
                                                    thresh, uv)
                is_mode = True
                for d2i in range(d + 1, min(d + sw, M)):
                    if calc(d2i) < e_ref:
                        is_mode = False
                        break
                if is_mode:
                    for d2i in range(d - 1, max(d - sw, 0) - 1, -1):
                        if calc(d2i) < e_ref:
                            is_mode = False
                            break
                if not is_mode:
                    continue
                out.append((d, e_curr / L, centre.copy(), bt.copy()))
    return out


@pytest.mark.parametrize("seed,use_variance", [(0, 0), (1, 0), (2, 1),
                                               (3, 2), (4, 0)])
def test_modes_match_transcription(seed, use_variance):
    rng = np.random.default_rng(seed)
    C, L, M = 3, 5, 6
    # clustered colours so modes actually form
    I = np.round(rng.uniform(0, 10, (C, L, M))).astype(np.float64)
    thresh = 6.0

    ref = modes_reference(I, thresh, use_variance)
    got = {k: np.asarray(v) for k, v in modes_mod.truncquad_modes(
        I, thresh, use_variance=use_variance, max_modes=M * 10).items()}

    n_valid = int(np.isfinite(got["energy"]).sum())
    assert n_valid == len(ref) == int(got["count"])
    if not ref:
        return
    ref_sorted = sorted(ref, key=lambda r: r[1])
    for i, (d, e, centre, bt) in enumerate(ref_sorted):
        assert got["depth"][i] == d
        np.testing.assert_allclose(got["energy"][i], e, rtol=1e-6)
        np.testing.assert_allclose(got["modes"][i], centre, rtol=1e-6)
        np.testing.assert_array_equal(got["inliers"][i], bt)


def test_modes_search_width():
    rng = np.random.default_rng(7)
    I = np.round(rng.uniform(0, 8, (2, 4, 8))).astype(np.float64)
    thresh = 5.0
    for sw in (1, 2, 4):
        ref = modes_reference(I, thresh, 0, search_width=sw)
        got = modes_mod.truncquad_modes(I, thresh, search_width=sw,
                                        max_modes=80)
        assert int(np.isfinite(np.asarray(got["energy"])).sum()) == len(ref)


def test_modes_batched_consistency():
    rng = np.random.default_rng(11)
    I = np.round(rng.uniform(0, 9, (4, 3, 4, 5))).astype(np.float64)
    got = modes_mod.truncquad_modes(I, 5.0, max_modes=6)
    for b in range(4):
        single = modes_mod.truncquad_modes(I[b], 5.0, max_modes=6)
        for k in ("modes", "depth", "energy"):
            np.testing.assert_allclose(np.asarray(got[k])[b],
                                       np.asarray(single[k]))


# ------------------------------------------------------------------- edges
def edges_reference(lib1, lib2, m1, m2, thresh, weight):
    """Literal transcription of truncquad_edges.cxx (with its prunings)."""
    V = lib1.shape[1]
    A, B = m1.shape[0], m2.shape[0]
    d1 = np.array([[np.sum((lib1[:, v] - m1[a]) ** 2) for a in range(A)]
                   for v in range(V)])
    cost = np.full((A, B), thresh, np.float64)
    for v in range(V):
        min_val = thresh - d1[v].min()
        if min_val < 0:
            continue
        for b in range(B):
            d2 = np.sum((lib2[:, v] - m2[b]) ** 2)
            if d2 < min_val:
                for a in range(A):
                    cost[a, b] = min(cost[a, b], d1[v, a] + d2)
    return cost * weight


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_edges_match_transcription(seed):
    rng = np.random.default_rng(seed)
    C, V, A, B = 3, 12, 4, 5
    lib1 = rng.uniform(0, 10, (C, V))
    lib2 = rng.uniform(0, 10, (C, V))
    m1 = rng.uniform(0, 10, (A, C))
    m2 = rng.uniform(0, 10, (B, C))
    thresh, weight = 40.0, 0.7
    ref = edges_reference(lib1, lib2, m1, m2, thresh, weight)
    got = np.asarray(edges_mod.truncquad_edges(lib1, lib2, m1, m2, thresh,
                                               weight))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_edges_batched():
    rng = np.random.default_rng(5)
    lib = rng.uniform(0, 5, (6, 3, 10))
    m = rng.uniform(0, 5, (6, 4, 3))
    got = np.asarray(edges_mod.truncquad_edges(lib, lib, m, m, 20.0, 2.0))
    assert got.shape == (6, 4, 4)
    for b in range(6):
        ref = edges_reference(lib[b], lib[b], m[b], m[b], 20.0, 2.0)
        np.testing.assert_allclose(got[b], ref, rtol=1e-10)
