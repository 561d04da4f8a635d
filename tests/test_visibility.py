"""Geometric visibility/occlusion fusion: oracle transcriptions + invariants.

Oracles re-derive the reference semantics independently:
- interaction pairs vs a brute-force O(n^2) window scan
  (find_interactions.cxx:48-72);
- calc_vis_energy vs a from-scratch per-sample minimization
  (ibr_fuse_depths.m:57-139, 377-392);
- the QPBO graph's table energy at a labeling (with samples assigned by the
  same rule) must equal calc_vis_energy — graph <-> energy consistency.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu.config import CVPR08Options
from stereo_tpu.models import visibility
from stereo_tpu.models.second_order import SecondOrderStereo


def brute_force_pairs(u, v, z, tp, dist=0.5):
    """All occluding pairs among points: |du|<=dist, |dv|<=dist, ordered by
    depth; same-pixel pairs dropped."""
    n = len(u)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            if abs(u[i] - u[j]) <= dist and abs(v[i] - v[j]) <= dist:
                if abs(i - j) == tp:
                    continue
                if z[i] < z[j]:
                    out.append((i, j))
                else:
                    out.append((j, i))
    return set(out)


def test_interactions_match_bruteforce():
    rng = np.random.default_rng(0)
    H, W = 4, 6
    tp = H * W
    u = rng.uniform(0, 6, (2, H, W)).astype(np.float32)
    v = rng.uniform(0, 4, (2, H, W)).astype(np.float32)
    z = rng.uniform(1, 3, (2, H, W)).astype(np.float32)
    pairs = visibility.view_interactions(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(z), max_offsets=2 * tp)
    got = set(map(tuple, pairs.tolist()))
    want = brute_force_pairs(u.ravel(), v.ravel(), z.ravel(), tp)
    assert got == want


def make_model(H=6, W=9, shift=2, seed=0, **opt):
    rng = np.random.default_rng(seed)
    im0 = np.clip(rng.uniform(0, 255, (H, W, 3)) * 0.5 +
                  np.linspace(0, 255, W)[None, :, None] * 0.5, 0, 255)
    im1 = np.roll(im0, -shift, axis=1)
    P = np.zeros((2, 3, 4))
    P[:, :, :3] = np.eye(3)
    P[1, 0, 3] = -1.0
    return SecondOrderStereo([im0, im1], P, (0, 4), 1,
                             CVPR08Options(**opt), seed=seed)


def oracle_vis_energy(terms, y):
    """From-scratch transcription: for every (pixel, selected surface, view)
    sample, pay occl if some selected nearer point projects within the
    window, else min(photo, occl)."""
    tp = terms["tp"]
    occl = terms["occl_cost"]
    e = 0.0
    for a, pc in enumerate(terms["photo_cost"]):
        forced = np.zeros(2 * tp, bool)
        for i, j in terms["interactions"][a]:
            if y[i % tp] == i // tp:
                forced[j] = True
        for p in range(tp):
            point = y[p] * tp + p
            if forced[point]:
                e += occl
            else:
                e += min(pc[y[p], p], occl)
    return e


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_calc_vis_energy_matches_oracle(seed):
    dm = make_model(seed=seed)
    H, W = dm.sz
    rng = np.random.default_rng(seed + 10)
    D1 = rng.uniform(0, 4, (H, W))
    D2 = rng.uniform(0, 4, (H, W))
    terms = dm._vis_terms(D1, D2)
    for _ in range(25):
        y = rng.integers(0, 2, H * W).astype(np.int32)
        e, _ = visibility.calc_vis_energy(terms, y)
        assert e == pytest.approx(oracle_vis_energy(terms, y), rel=1e-12)


def test_graph_tables_consistent_with_energy():
    """Evaluating the QPBO tables at (pixel labels, rule-assigned sample
    labels) must reproduce calc_vis_energy."""
    dm = make_model(seed=3)
    H, W = dm.sz
    tp = H * W
    rng = np.random.default_rng(3)
    D1 = rng.uniform(0, 4, (H, W))
    D2 = rng.uniform(0, 4, (H, W))
    terms = dm._vis_terms(D1, D2)
    occl = terms["occl_cost"]
    sample_pix, sample_surf, sample_view = terms["samples"]
    tails, heads, E00, E01, E10, E11 = terms["edges"]
    for _ in range(10):
        y = rng.integers(0, 2, tp).astype(np.int32)
        # assign each aux sample by the minimization rule
        full = np.zeros(tp + len(sample_pix), np.int64)
        full[:tp] = y
        forced = [np.zeros(2 * tp, bool) for _ in terms["photo_cost"]]
        for a, pairs in enumerate(terms["interactions"]):
            for i, j in pairs:
                if y[i % tp] == i // tp:
                    forced[a][j] = True
        for s in range(len(sample_pix)):
            p, c, a = sample_pix[s], sample_surf[s], sample_view[s]
            pc = terms["photo_aux"][s]
            if y[p] != c:
                vis = False  # label is free; 0 is always optimal
            elif forced[a][c * tp + p]:
                vis = False
            else:
                vis = pc <= occl
            full[tp + s] = int(vis)
        # table energy: folded unaries + all pairwise tables
        e = float(np.where(y == 0, terms["unary0"], terms["unary1"]).sum())
        tbl = np.stack([E00, E01, E10, E11])
        e += float(tbl[2 * full[tails] + full[heads],
                       np.arange(len(tails))].sum())
        want, _ = visibility.calc_vis_energy(terms, y)
        assert e == pytest.approx(want, rel=1e-12)


def test_fuse_with_visibility_monotone():
    dm = make_model(visibility=True)
    H, W = dm.sz
    e_prev = dm.energy()
    rng = np.random.default_rng(7)
    for d in [0.0, 2.0, 1.0]:
        e = dm.fuse(np.full((H, W), d))
        assert e <= e_prev + 1e-9
        e_prev = e
    # model energy of the final field agrees with the fusion bookkeeping
    assert dm.energy() == pytest.approx(e_prev, rel=1e-9)


def test_occlusion_penalizes_double_coverage():
    """Two surfaces projecting onto the same input pixel: the occluded one
    must pay occl_cost, not its (tiny) photo cost."""
    H, W = 4, 8
    dm = make_model(H=H, W=W)
    # D1: flat 0 everywhere; D2: disparity 2 in the left half -> in the
    # second view the left-half D2 points land on top of D1 points
    D1 = np.zeros((H, W))
    D2 = np.zeros((H, W))
    D2[:, :4] = 2.0
    terms = dm._vis_terms(D1, D2)
    # with the mixed labeling that selects D2 on the left half, some kept-D1
    # samples are occluded
    y = np.zeros(H * W, np.int32)
    y[(np.arange(H * W) % W) < 4] = 1
    e_mixed, vis = visibility.calc_vis_energy(terms, y)
    forced_some = (~vis[0]).sum() > 0
    assert forced_some, "expected at least one forced occlusion"
