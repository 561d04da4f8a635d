"""Occlusion-aware renderer (ibr_occlrender / ibr_gen_cliques parity).

The clique generator is pinned to a literal per-point transcription of
ibr_gen_cliques.cxx:232-441 (method=ssd, float path — no integer
saturation); the renderer itself is exercised end-to-end on a synthetic
two-plane scene where the fronto sweep must recover the scene depths and
mark the geometrically occluded samples invisible.
"""

import numpy as np
import pytest

from stereo_tpu.render import occlrender
from stereo_tpu.render.occlrender import (
    OcclRenderOptions,
    gen_cliques,
    render_occl,
)


def _ssd(mean, sample, Kocc):
    return min(float(((mean - sample) ** 2).sum()), Kocc)


def gen_cliques_oracle(IA, VA, V, Kocc):
    """Literal transcription of ibr_gen_cliques.cxx (general branch)."""
    P2, C, N = IA.shape
    tp = P2 // 2
    U = np.zeros((tp, 2))
    pairs = []
    triples = []
    for label in (0, 1):
        for node in range(tp):
            a = label * tp + node
            vis = VA[a].copy()
            occ = np.nonzero(~vis)[0]
            num_occl = len(occ)
            if num_occl == 0:
                M = IA[a].mean(axis=1)
                for b in range(N):
                    U[node, label] += _ssd(M, IA[a, :, b], Kocc)
            elif num_occl == 1:
                v1 = occ[0]
                Mv = IA[a][:, vis].mean(axis=1) if vis.any() else -1000.0
                e_occl = sum(
                    _ssd(Mv, IA[a, :, b], Kocc) if vis[b] else Kocc + 1.0
                    for b in range(N))
                Ma = IA[a].mean(axis=1)
                e_vis = sum(_ssd(Ma, IA[a, :, b], Kocc) for b in range(N))
                pairs.append((node, int(v1), label, e_occl, e_vis))
            elif num_occl == 2:
                v1, v2 = occ

                def cost(mask):
                    m = (IA[a][:, mask].mean(axis=1) if mask.any()
                         else np.full(C, -1000.0))
                    return sum(
                        _ssd(m, IA[a, :, b], Kocc) if mask[b] else Kocc + 1.0
                        for b in range(N))

                both = vis.copy()
                w2 = vis.copy()
                w2[v2] = True
                w1 = vis.copy()
                w1[v1] = True
                allv = np.ones(N, bool)
                triples.append((node, label, int(v1), int(v2),
                                (cost(both), cost(w2), cost(w1),
                                 cost(allv))))
            else:
                va = V[a]
                m = (IA[a][:, va].mean(axis=1) if va.any()
                     else np.full(C, -1000.0))
                for b in range(N):
                    data = _ssd(m, IA[a, :, b], Kocc)
                    if vis[b]:
                        U[node, label] += data
                    else:
                        pairs.append((node, b, label, Kocc + 1.0, data))
    return U, pairs, triples


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_views", [2, 3, 5])
def test_gen_cliques_matches_transcription(seed, n_views):
    rng = np.random.default_rng(seed)
    tp, C = 40, 3
    IA = rng.uniform(0, 255, size=(2 * tp, C, n_views))
    # bias visibility so every occluder-count class appears
    VA = rng.uniform(size=(2 * tp, n_views)) > 0.35
    V = VA | (rng.uniform(size=VA.shape) > 0.5)
    Kocc = 2700.0

    U, dpairs, triples = gen_cliques(IA, VA, V, Kocc)
    U_o, pairs_o, triples_o = gen_cliques_oracle(IA, VA, V, Kocc)
    pairs = [(int(p), int(v), int(l), float(eo), float(ev))
             for p, v, l, eo, ev in zip(dpairs["pixel"], dpairs["view"],
                                        dpairs["label"], dpairs["e_occl"],
                                        dpairs["e_vis"])]

    np.testing.assert_allclose(U, U_o, rtol=1e-12, atol=1e-9)
    assert sorted(p[:3] for p in pairs) == sorted(p[:3] for p in pairs_o)
    key = lambda p: p[:3]
    for got, want in zip(sorted(pairs, key=key), sorted(pairs_o, key=key)):
        np.testing.assert_allclose(got[3:], want[3:], rtol=1e-12, atol=1e-9)
    assert sorted(t[:4] for t in triples) == sorted(t[:4] for t in triples_o)
    key3 = lambda t: t[:4]
    for got, want in zip(sorted(triples, key=key3),
                         sorted(triples_o, key=key3)):
        np.testing.assert_allclose(got[4], want[4], rtol=1e-12, atol=1e-9)


def _two_plane_scene():
    """Two translated views of a near square over a far background.

    The output view sits between the inputs; P convention [x, y, 1, d] with
    pure horizontal parallax: u = x + s_a * d."""
    H, W, C = 20, 28, 3
    rng = np.random.default_rng(7)
    bg = rng.uniform(40, 215, size=(H, 2 * W, C)).astype(np.float32)
    d_far, d_near = 1.0, 4.0
    sq = rng.uniform(0, 255, size=(10, 10, C)).astype(np.float32)

    def make_view(shift):
        # view at u = x + shift * d: background (d=1) comes from bg column
        # 8 - shift + u; the square (d=4) lands at x0 = 9 + 4 * shift
        im = bg[:, 8 - shift:8 - shift + W].copy()
        x0 = 9 + int(round(shift * d_near))
        im[5:15, x0:x0 + 10] = sq
        return im

    # inputs at shift ±1 px per unit disparity relative to the output view
    views = [make_view(-1), make_view(1)]
    P = np.zeros((2, 3, 4))
    for i, s in enumerate((-1.0, 1.0)):
        P[i, 0] = [1, 0, 0, s]
        P[i, 1] = [0, 1, 0, 0]
        P[i, 2] = [0, 0, 1, 0]
    D_true = np.full((H, W), d_far)
    D_true[5:15, 9:19] = d_near
    return views, P, D_true, (H, W)


def test_render_occl_recovers_scene():
    views, P, D_true, sz = _two_plane_scene()
    disps = np.array([4.0, 2.5, 1.0])  # descending ladder incl. both planes
    res = render_occl(views, P, disps, sz,
                      OcclRenderOptions(col_thresh=20.0, lambda_=0.01,
                                        num_loops=2, visibility=True))
    assert res.image.shape == (*sz, 3)
    assert np.isfinite(res.image).all()
    assert np.isfinite(res.energies).all()
    # the sweep recovers the dominant depths on the interior
    frac_correct = np.mean(np.isin(res.depth, disps))
    assert frac_correct == 1.0
    inner = res.depth[6:14, 11:17]
    assert np.mean(inner == 4.0) > 0.6, inner
    bgmask = np.zeros(sz, bool)
    bgmask[2:18, 2:7] = True
    assert np.mean(res.depth[bgmask] == 1.0) > 0.6
    # visibility maps: boolean, mostly visible
    assert res.visibility.dtype == bool
    assert res.visibility.mean() > 0.5


def test_render_occl_no_visibility_path():
    views, P, D_true, sz = _two_plane_scene()
    disps = np.array([4.0, 1.0])
    res = render_occl(views, P, disps, sz,
                      OcclRenderOptions(col_thresh=20.0, lambda_=0.01,
                                        num_loops=1, visibility=False))
    assert np.isfinite(res.energies).all()
    assert np.isin(res.depth, disps).all()


def test_render_occl_texture_prior_runs():
    views, P, D_true, sz = _two_plane_scene()
    disps = np.array([4.0, 1.0])
    res = render_occl(views, P, disps, sz,
                      OcclRenderOptions(col_thresh=20.0, lambda_=0.01,
                                        tex_weight=0.5, num_loops=1))
    assert np.isfinite(res.energies).all()
