"""Native QPBO vs brute force: optimality on submodular instances, lower
bound + autarky (never-increase) on general ones."""

import itertools

import numpy as np
import pytest

from stereo_tpu.solvers import qpbo_host


def random_instance(rng, n, m, submodular=False):
    U0 = rng.normal(0, 2, n)
    U1 = rng.normal(0, 2, n)
    tails = rng.integers(0, n, m)
    heads = (tails + 1 + rng.integers(0, n - 1, m)) % n
    E00 = rng.normal(0, 1, m)
    E01 = rng.normal(0, 1, m)
    E10 = rng.normal(0, 1, m)
    E11 = rng.normal(0, 1, m)
    if submodular:
        # force E01 + E10 - E00 - E11 >= 0
        gap = (E01 + E10 - E00 - E11)
        fix = np.clip(-gap, 0, None) / 2 + 0.01
        E01 = E01 + fix
        E10 = E10 + fix
    return U0, U1, tails, heads, E00, E01, E10, E11


def brute_force(U0, U1, tails, heads, E00, E01, E10, E11):
    n = len(U0)
    best, best_lab = np.inf, None
    for bits in itertools.product([0, 1], repeat=n):
        lab = np.array(bits)
        E = qpbo_host.labeling_energy(lab, U0, U1, tails, heads, E00, E01, E10, E11)
        if E < best:
            best, best_lab = E, lab
    return best, best_lab


@pytest.mark.parametrize("seed", range(8))
def test_submodular_exact(seed):
    """Submodular instances: everything labeled, labeling is optimal, lb == opt."""
    rng = np.random.default_rng(seed)
    n, m = 8, 14
    inst = random_instance(rng, n, m, submodular=True)
    labels, e, lb, n_unlab = qpbo_host.solve(*inst)
    best, best_lab = brute_force(*inst)
    assert n_unlab == 0
    assert e == pytest.approx(best, abs=1e-9)
    assert lb == pytest.approx(best, abs=1e-9)


@pytest.mark.parametrize("seed", range(12))
def test_general_lower_bound_and_persistency(seed):
    """General (non-submodular) instances: lb <= OPT; labeled nodes agree with
    the autarky property — applying them onto ANY completion never increases
    its energy (tested against the all-zeros completion and random ones)."""
    rng = np.random.default_rng(100 + seed)
    n, m = 7, 12
    inst = random_instance(rng, n, m, submodular=False)
    labels, e, lb, n_unlab = qpbo_host.solve(*inst)
    best, _ = brute_force(*inst)
    assert lb <= best + 1e-9

    U0, U1, tails, heads, E00, E01, E10, E11 = inst
    for trial in range(6):
        base = (np.zeros(n, dtype=int) if trial == 0
                else rng.integers(0, 2, n))
        merged = np.where(labels >= 0, labels, base)
        e_base = qpbo_host.labeling_energy(base, *inst[:2], *inst[2:4], *inst[4:])
        e_merged = qpbo_host.labeling_energy(merged, *inst[:2], *inst[2:4], *inst[4:])
        assert e_merged <= e_base + 1e-9, (
            f"autarky violated: {e_merged} > {e_base}"
        )


@pytest.mark.parametrize("seed", range(6))
def test_fully_labeled_is_optimal(seed):
    """Whenever QPBO labels every node, that labeling is a global optimum."""
    rng = np.random.default_rng(300 + seed)
    n, m = 6, 10
    inst = random_instance(rng, n, m)
    labels, e, lb, n_unlab = qpbo_host.solve(*inst)
    if n_unlab == 0:
        best, _ = brute_force(*inst)
        assert e == pytest.approx(best, abs=1e-9)
        assert lb == pytest.approx(best, abs=1e-9)


def test_energy_reported_matches_keep_zero_completion():
    rng = np.random.default_rng(7)
    inst = random_instance(rng, 9, 16)
    labels, e, lb, _ = qpbo_host.solve(*inst)
    completion = np.where(labels >= 0, labels, 0)
    assert e == pytest.approx(
        qpbo_host.labeling_energy(completion, *inst), abs=1e-9
    )
    assert lb <= e + 1e-9


@pytest.mark.parametrize("seed", range(10))
def test_weak_persistency_extends_and_stays_monotone(seed):
    """Weak persistency labels at least as many nodes as strong-only, and the
    fusion-style completion (unlabelled -> 0) never worsens the all-zeros
    incumbent (the property dispmap_super.m:83 relies on)."""
    rng = np.random.default_rng(500 + seed)
    n, m = 8, 14
    inst = random_instance(rng, n, m, submodular=False)
    lab_w, e_w, lb_w, nu_w = qpbo_host.solve(*inst, weak=True)
    lab_s, e_s, lb_s, nu_s = qpbo_host.solve(*inst, weak=False)
    assert lb_w == pytest.approx(lb_s, abs=1e-9)
    assert nu_w <= nu_s
    # strong labels are preserved by the weak extension
    assert ((lab_s < 0) | (lab_w == lab_s)).all()
    # fusion completion never increases energy vs keeping the incumbent
    zero = np.zeros(n, dtype=int)
    e_keep = qpbo_host.labeling_energy(zero, *inst)
    assert e_w <= e_keep + 1e-9
    assert e_w <= e_s + 1e-9  # weak extension should not be worse


def test_weak_persistency_resolves_tied_antiferromagnet():
    """Canonical case where strong persistency labels nothing but weak
    persistency recovers a global optimum: anti-correlated pairs with tied
    optima (the half-integral LP point)."""
    inst = (np.zeros(2), np.zeros(2), [0], [1],
            [1.0], [0.0], [0.0], [1.0])
    lab_s, e_s, lb_s, nu_s = qpbo_host.solve(*inst, weak=False)
    assert nu_s == 2 and e_s == pytest.approx(1.0)
    lab_w, e_w, lb_w, nu_w = qpbo_host.solve(*inst, weak=True)
    assert nu_w == 0
    assert e_w == pytest.approx(0.0)  # optimal
    assert lab_w[0] != lab_w[1]

    # chain of three anti-correlated variables
    inst = (np.zeros(3), np.zeros(3), [0, 1], [1, 2],
            [1.0, 1.0], [0.0, 0.0], [0.0, 0.0], [1.0, 1.0])
    lab, e, lb, nu = qpbo_host.solve(*inst, weak=True)
    assert nu == 0 and e == pytest.approx(0.0)
    assert lab[0] != lab[1] and lab[1] != lab[2]


@pytest.mark.parametrize("seed", range(8))
def test_improve_never_increases_and_completes(seed):
    """QPBO-I: returns a complete labeling with energy <= the keep-zero
    completion of the partial labeling."""
    rng = np.random.default_rng(700 + seed)
    n, m = 9, 16
    inst = random_instance(rng, n, m, submodular=False)
    labels, e, lb, n_unlab = qpbo_host.solve(*inst)
    y, e_imp = qpbo_host.improve(labels, *inst, rounds=4, seed=seed)
    assert set(np.unique(y)) <= {0, 1}
    assert e_imp <= e + 1e-9
    assert e_imp == pytest.approx(qpbo_host.labeling_energy(y, *inst), abs=1e-9)
    assert lb <= e_imp + 1e-9


def test_improve_helps_on_frustrated_instance():
    """On instances with many unlabelled nodes, improve should usually find a
    strictly better completion at least once across seeds."""
    rng = np.random.default_rng(9)
    gains = 0
    for trial in range(10):
        inst = random_instance(rng, 10, 24, submodular=False)
        labels, e, _, n_unlab = qpbo_host.solve(*inst)
        if n_unlab == 0:
            continue
        _, e_imp = qpbo_host.improve(labels, *inst, rounds=6, seed=trial)
        if e_imp < e - 1e-9:
            gains += 1
    assert gains >= 1


def brute_force_triples(U0, U1, tails, heads, E00, E01, E10, E11, triples):
    n = len(U0)
    best, best_lab = np.inf, None
    for bits in itertools.product([0, 1], repeat=n):
        lab = np.array(bits)
        E = qpbo_host.triples_energy(lab, U0, U1, tails, heads,
                                     E00, E01, E10, E11, triples)
        if E < best:
            best, best_lab = E, lab
    return best, best_lab


@pytest.mark.parametrize("seed", range(10))
def test_triple_cliques_lower_bound_and_exactness(seed):
    """Triple-clique QPBO (vgg_qpbo equivalent): valid bound always; exact
    optimum whenever every node gets labeled."""
    rng = np.random.default_rng(900 + seed)
    n, m, T = 6, 6, 4
    U0 = rng.normal(0, 1, n)
    U1 = rng.normal(0, 1, n)
    tails = rng.integers(0, n, m)
    heads = (tails + 1 + rng.integers(0, n - 1, m)) % n
    E00, E01, E10, E11 = (rng.normal(0, .5, m) for _ in range(4))
    triples = []
    for _ in range(T):
        ijk = rng.choice(n, size=3, replace=False)
        triples.append((int(ijk[0]), int(ijk[1]), int(ijk[2]),
                        rng.normal(0, 1, (2, 2, 2))))

    lab, e, lb, n_unlab = qpbo_host.solve_with_triples(
        U0, U1, tails, heads, E00, E01, E10, E11, triples)
    best, best_lab = brute_force_triples(U0, U1, tails, heads,
                                         E00, E01, E10, E11, triples)
    assert lb <= best + 1e-9
    assert e >= best - 1e-9
    if n_unlab == 0:
        assert e == pytest.approx(best, abs=1e-9)


def test_triple_cliques_pure_cubic_terms():
    """Isolated cubic terms of both signs solve exactly."""
    for sign in (+1.0, -1.0):
        table = np.zeros((2, 2, 2))
        table[1, 1, 1] = sign * 3.0
        U0 = np.zeros(3)
        U1 = np.array([-1.0, -1.0, -1.0])  # prefer all ones
        lab, e, lb, nu = qpbo_host.solve_with_triples(
            U0, U1, [], [], [], [], [], [], [(0, 1, 2, table)])
        best, _ = brute_force_triples(U0, U1, np.array([], int),
                                      np.array([], int), [], [], [], [],
                                      [(0, 1, 2, table)])
        assert lb <= best + 1e-9
        if nu == 0:
            assert e == pytest.approx(best, abs=1e-9)


# --------------------------------------------------------------------------
# regions / choose_labels / improve_with_triples (the vgg_qpbo GetRegions +
# ibr_fuse_depths.m:287-375 choose_labels splice + QPBOI-F/R modes)

def _completion_energy(y, inst, triples=()):
    return qpbo_host.triples_energy(np.asarray(y), *inst, triples)


@pytest.mark.parametrize("seed", range(12))
def test_regions_mark_exactly_the_unlabelled(seed):
    """regions[i] == -1 iff labels[i] >= 0; unlabelled ids compact 0..R-1."""
    rng = np.random.default_rng(1300 + seed)
    inst = random_instance(rng, 8, 14, submodular=False)
    labels, e, lb, nu, regions = qpbo_host.solve(*inst, regions=True)
    assert ((regions < 0) == (labels >= 0)).all()
    if nu:
        ids = np.unique(regions[labels < 0])
        assert ids.min() == 0 and ids.max() == len(ids) - 1


def _unlabelled_instance(rng, n=7, m=12, triples=0, tries=200):
    """Fuzz until QPBO leaves nodes unlabelled (frustrated instances)."""
    for _ in range(tries):
        inst = random_instance(rng, n, m, submodular=False)
        tr = []
        for _ in range(triples):
            ijk = rng.choice(n, size=3, replace=False)
            tr.append((int(ijk[0]), int(ijk[1]), int(ijk[2]),
                       rng.normal(0, 1, (2, 2, 2))))
        if triples:
            labels, e, lb, nu, reg = qpbo_host.solve_with_triples(
                *inst, tr, regions=True)
        else:
            labels, e, lb, nu, reg = qpbo_host.solve(*inst, regions=True)
        if nu > 0:
            return inst, tr, labels, reg
    raise AssertionError("could not fuzz an unlabelled instance")


@pytest.mark.parametrize("seed", range(8))
def test_choose_labels_independent_is_optimal_over_region_flips(seed):
    """With ``independent=True`` regions are merged along shared cliques, so
    per-region flip decisions are exact and the splice is the OPTIMAL
    completion over all 2^R whole-region flips (brute-forced here)."""
    rng = np.random.default_rng(1400 + seed)
    inst, _, labels, regions = _unlabelled_instance(rng)
    y, nreg = qpbo_host.choose_labels(labels, regions, *inst,
                                      mode=2, independent=True)
    # recover the merged regions from y vs brute force over flip patterns
    free = labels < 0
    # brute force over flips of the ORIGINAL (unmerged) regions — a superset
    # of the merged-region patterns, so optimal over it is a stronger claim
    # only when deltas decompose; restrict to merged regions via union-find
    # replay: enumerate patterns over unique region ids of the y-grouping.
    uniq = np.unique(regions[free])
    R = len(uniq)
    if R > 10:
        pytest.skip("too many regions to brute force")
    y0 = np.where(free, 0, labels)
    best = np.inf
    for bits in itertools.product([0, 1], repeat=R):
        yy = y0.copy()
        for r, b in zip(uniq, bits):
            if b:
                yy[free & (regions == r)] = 1
        best = min(best, _completion_energy(yy, inst))
    e_y = _completion_energy(y, inst)
    assert e_y == pytest.approx(best, abs=1e-9)
    assert nreg <= R


@pytest.mark.parametrize("seed", range(8))
def test_choose_labels_mode3_picks_better_uniform_completion(seed):
    rng = np.random.default_rng(1500 + seed)
    inst, _, labels, regions = _unlabelled_instance(rng)
    free = labels < 0
    y0 = np.where(free, 0, labels)
    y1 = np.where(free, 1, labels)
    e0 = _completion_energy(y0, inst)
    e1 = _completion_energy(y1, inst)
    y, _ = qpbo_host.choose_labels(labels, regions, *inst, mode=3)
    assert _completion_energy(y, inst) == pytest.approx(min(e0, e1), abs=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_choose_labels_with_triples_never_increases(seed):
    """Splice (independent + mode 3) on triple-clique instances never ends
    above the keep-zero completion."""
    rng = np.random.default_rng(1600 + seed)
    inst, tr, labels, regions = _unlabelled_instance(rng, triples=3)
    free = labels < 0
    y0 = np.where(free, 0, labels)
    e0 = _completion_energy(y0, inst, tr)
    for mode, indep in ((2, True), (3, False)):
        y, _ = qpbo_host.choose_labels(labels, regions, *inst, triples=tr,
                                       mode=mode, independent=indep)
        assert _completion_energy(y, inst, tr) <= e0 + 1e-9


@pytest.mark.parametrize("seed", range(6))
def test_improve_with_triples_never_increases_and_respects_init(seed):
    rng = np.random.default_rng(1700 + seed)
    inst, tr, labels, regions = _unlabelled_instance(rng, triples=3)
    free = labels < 0
    y0 = np.where(free, 0, labels)
    e0 = _completion_energy(y0, inst, tr)
    y, e = qpbo_host.improve_with_triples(labels, *inst, tr, rounds=4,
                                          seed=seed)
    assert e <= e0 + 1e-9
    assert e == pytest.approx(_completion_energy(y, inst, tr), abs=1e-9)
    # QPBOI-R: seeded from the splice, never ends above the seed
    init, _ = qpbo_host.choose_labels(labels, regions, *inst, triples=tr,
                                      mode=2, independent=True)
    e_init = _completion_energy(init, inst, tr)
    y4, e4 = qpbo_host.improve_with_triples(labels, *inst, tr, rounds=4,
                                            seed=seed, init=init)
    assert e4 <= e_init + 1e-9


# ---------------------------------------------------------------- QPBO-P
def _probe_consistent_min(inst, labels, rep, flip):
    """Minimum energy over labelings consistent with probe's constraints."""
    n = len(inst[0])
    best = np.inf
    for bits in itertools.product([0, 1], repeat=n):
        y = np.array(bits)
        if (labels >= 0).any() and not (y[labels >= 0] == labels[labels >= 0]).all():
            continue
        if not (y == y[rep] ^ flip).all():
            continue
        best = min(best, qpbo_host.labeling_energy(y, *inst))
    return best


@pytest.mark.parametrize("seed", range(10))
def test_probe_preserves_global_minimum(seed):
    """Probing (QPBO-P) fixes/contracts variables while keeping at least one
    global minimizer feasible — the guarantee of QPBO_extra.cpp:708's Probe."""
    rng = np.random.default_rng(1800 + seed)
    inst, _, _, _ = _unlabelled_instance(rng)
    labels, rep, flip, n_fixed = qpbo_host.probe(*inst)
    best, _ = brute_force(*inst)
    assert _probe_consistent_min(inst, labels, rep, flip) == pytest.approx(
        best, abs=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_probe_extends_solve(seed):
    """Probe fixes at least every node plain QPBO labels, and across the fuzz
    battery it strictly simplifies some frustrated instance (extra fixed
    variables or contractions)."""
    rng = np.random.default_rng(1900 + seed)
    inst, _, labels_solve, _ = _unlabelled_instance(rng)
    labels, rep, flip, n_fixed = qpbo_host.probe(*inst)
    solved = labels_solve >= 0
    assert (labels[solved] == labels_solve[solved]).all()
    assert n_fixed >= solved.sum()


def test_probe_simplifies_some_frustrated_instance():
    """At least one fuzzed frustrated instance gains constraints beyond the
    plain solve (otherwise probing would be a no-op everywhere)."""
    gained = False
    for seed in range(12):
        rng = np.random.default_rng(2000 + seed)
        inst, _, labels_solve, _ = _unlabelled_instance(rng)
        labels, rep, flip, n_fixed = qpbo_host.probe(*inst)
        n = len(labels)
        if n_fixed > (labels_solve >= 0).sum() or (rep != np.arange(n)).any():
            gained = True
            break
    assert gained


def test_probe_fully_labeled_passthrough():
    """On a submodular instance everything is already labelled; probe returns
    the optimal labeling with identity mapping."""
    rng = np.random.default_rng(42)
    inst = random_instance(rng, 7, 12, submodular=True)
    labels, rep, flip, n_fixed = qpbo_host.probe(*inst)
    best, best_lab = brute_force(*inst)
    assert n_fixed == 7
    assert qpbo_host.labeling_energy(labels, *inst) == pytest.approx(
        best, abs=1e-9)
