"""Model-level simultaneous fusion across TRW-S schedules.

All four sweep schedules (checkerboard, scanline, wavefront, banded) drive
the same TRW-S fixed point (different orderings of the same algorithm,
minimize.cpp:31-116): on a small model they must all return valid bounds and
converge to energies within a whisker of one another."""

import numpy as np
import pytest

from stereo_tpu import geometry
from stereo_tpu.models.ncc import DispMapNCC


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    H, W = 20, 26
    im1 = rng.uniform(0, 255, (H, W, 3))
    im0 = np.roll(im1, 3, axis=1) + rng.normal(0, 2, (H, W, 3))
    images = [im0, im1]
    return images, H, W


def run_schedule(images, H, W, schedule, band=None):
    dm = DispMapNCC(images, np.arange(0, 7), kernel=1, unary_weight=40.0,
                    tol=8.0, schedule=schedule)
    if band is not None:
        dm.band = band
    proposals = [geometry.fronto_parallel(H, W, float(d), dm.dtype)
                 for d in range(0, 7, 2)]
    dm.maxiter = 60
    dm.max_relgap = 1e-6
    e, lb, iters = dm.simultaneous_fusion(proposals)
    assert np.isfinite(e) and np.isfinite(lb)
    assert lb <= e + 1e-4
    return e, lb


@pytest.mark.parametrize("schedule,band", [
    ("wavefront", None), ("banded", 8), ("banded", 64)])
def test_schedules_reach_checkerboard_energy(setup, schedule, band):
    images, H, W = setup
    e_cb, _ = run_schedule(images, H, W, "checkerboard")
    e, lb = run_schedule(images, H, W, schedule, band)
    # same fixed point: energies agree to a loose fp/decode tolerance
    assert e == pytest.approx(e_cb, rel=2e-3)


def test_unknown_schedule_rejected(setup):
    images, H, W = setup
    with pytest.raises(ValueError):
        DispMapNCC(images, np.arange(0, 7), kernel=1, unary_weight=40.0,
                   tol=8.0, schedule="zigzag")


def test_chunked_until_convergence_matches_per_move(setup):
    """binary_fuse_until_convergence routes through the chunked
    _fusion_sweep scan; the sequence of assignment-changing moves — and so
    the final labeling/energy — must equal the per-move driver's."""
    images, H, W = setup
    proposals = [geometry.fronto_parallel(H, W, float(d), None)
                 for d in range(0, 7, 2)]

    def fresh():
        dm = DispMapNCC(images, np.arange(0, 7), kernel=1, unary_weight=40.0,
                        tol=8.0)
        dm.maxiter = 50
        return dm

    # per-move reference: the r3 sequential loop, inlined
    dm_ref = fresh()
    n = len(proposals)
    rng = np.random.default_rng(7)
    ids = np.concatenate([np.arange(n), rng.integers(0, n, dm_ref.maxiter * 5)])
    keep = np.ones(len(ids), dtype=bool)
    keep[1:] = np.diff(ids) != 0
    ids = ids[keep]
    visited = np.zeros(n, dtype=bool)
    energies = [dm_ref.energy()]
    for it in range(min(dm_ref.maxiter, len(ids))):
        pid = int(ids[it])
        if visited[pid]:
            continue
        dm_ref.binary_fusion(proposals[pid])
        energies.append(dm_ref.energy())
        if energies[-1] != energies[-2]:
            visited[:] = False
        else:
            visited[pid] = True
        if visited.all():
            break

    for chunk in (3, 8):
        dm = fresh()
        dm.binary_fuse_until_convergence(proposals, seed=7, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(dm.assignment),
                                      np.asarray(dm_ref.assignment))
        assert dm.energy() == pytest.approx(dm_ref.energy(), rel=1e-6)
