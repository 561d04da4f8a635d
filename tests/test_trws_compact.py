"""Checkerboard H-compaction parity: compact sweeps == standard sweeps.

The compact path (solvers/trws._phase_compact over the ops/checker.py layout)
must reproduce the standard checkerboard TRW-S exactly — same messages, same
bound, same decode — since the standard path is itself pinned per-iteration
to the sequential oracle (tests/test_trws.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu import geometry
from stereo_tpu.ops import checker
from stereo_tpu.solvers import trws


def _problem(K, H, W, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    theta = jnp.asarray(rng.uniform(0, 5, (K, H, W)), dtype)
    D0 = jnp.asarray(rng.uniform(0, 10, (K, H, W)), dtype)
    Q = jnp.asarray(
        np.expand_dims(np.asarray(D0), 0) + rng.normal(0, 0.4, (4, K, H, W)),
        dtype)
    valid = jnp.stack(
        [geometry.valid_mask(H, W, d, dtype=dtype) for d in range(4)], 0)
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (4, H, W)), dtype) * valid
    return theta, D0, Q, alphas


@pytest.mark.parametrize("kernel", [1, 2])
@pytest.mark.parametrize("K,H,W", [(4, 9, 10), (3, 8, 11), (5, 7, 7)])
@pytest.mark.parametrize("mode", ["trws", "bp"])
def test_compact_solve_matches_standard(kernel, K, H, W, mode):
    theta, D0, Q, alphas = _problem(K, H, W, seed=K + H)
    tol = 1.7
    kw = dict(kernel=kernel, tol=tol, maxiter=6, max_relgap=0.0,
              check_every=2, mode=mode, use_pallas=False)
    ref = trws.solve(theta, D0, Q, alphas, **kw, compact=False)
    got = trws.solve(theta, D0, Q, alphas, **kw, compact=True)
    np.testing.assert_allclose(float(got.energy), float(ref.energy),
                               rtol=1e-12)
    np.testing.assert_allclose(float(got.lower_bound),
                               float(ref.lower_bound), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  np.asarray(ref.labels))
    np.testing.assert_allclose(np.asarray(got.messages),
                               np.asarray(ref.messages), rtol=1e-12,
                               atol=1e-12)
    assert int(got.iterations) == int(ref.iterations)


@pytest.mark.parametrize("K,H,W", [(4, 9, 10), (3, 16, 21)])
def test_compact_padded_layout_bitwise(K, H, W):
    """The pad-once tile-aligned compact layout (pad_tiles=True, the state
    the TPU pallas path runs on) is BITWISE the unpadded compact solve:
    padded pixels carry zero theta/alphas/valid/pix and their messages stay
    zero, while real-border pixels pull padding zeros exactly where the
    unpadded rolls pulled valid-zeroed wrap values."""
    theta, D0, Q, alphas = _problem(K, H, W, seed=K + W)
    kw = dict(kernel=1, tol=1.3, maxiter=5, max_relgap=0.0, check_every=1,
              use_pallas=False, compact=True)
    ref = trws.solve(theta, D0, Q, alphas, **kw, pad_tiles=False)
    got = trws.solve(theta, D0, Q, alphas, **kw, pad_tiles=True)
    assert float(got.energy) == float(ref.energy)
    assert float(got.lower_bound) == float(ref.lower_bound)
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  np.asarray(ref.labels))
    np.testing.assert_array_equal(np.asarray(got.messages),
                                  np.asarray(ref.messages))

    # TRWSRun carries the same padded state; trajectory stays bitwise
    r = trws.TRWSRun(theta, D0, Q, alphas, kernel=1, tol=1.3,
                     use_pallas=False, compact=True, pad_tiles=True)
    st = r.init_state()
    st, e, lb, labels = r.run(st, 5, 5)
    np.testing.assert_array_equal(np.asarray(r.messages(st)),
                                  np.asarray(ref.messages))
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref.labels))

    # warm-started messages round-trip the padded layout bitwise
    got2 = trws.solve(theta, D0, Q, alphas, kernel=1, tol=1.3, maxiter=2,
                      max_relgap=0.0, check_every=1, use_pallas=False,
                      compact=True, pad_tiles=True, messages=ref.messages)
    ref2 = trws.solve(theta, D0, Q, alphas, kernel=1, tol=1.3, maxiter=2,
                      max_relgap=0.0, check_every=1, use_pallas=False,
                      compact=True, pad_tiles=False, messages=ref.messages)
    np.testing.assert_array_equal(np.asarray(got2.messages),
                                  np.asarray(ref2.messages))


def test_compact_warm_start_parity():
    theta, D0, Q, alphas = _problem(3, 8, 9, seed=7)
    kw = dict(kernel=1, tol=0.9, max_relgap=0.0, use_pallas=False)
    warm = trws.solve(theta, D0, Q, alphas, maxiter=2, check_every=2,
                      compact=True, **kw)
    ref = trws.solve(theta, D0, Q, alphas, maxiter=3, check_every=3,
                     compact=False, **kw)
    got = trws.solve(theta, D0, Q, alphas, maxiter=1, check_every=1,
                     compact=True, messages=warm.messages, **kw)
    np.testing.assert_allclose(float(got.energy), float(ref.energy),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.messages),
                               np.asarray(ref.messages), rtol=1e-12,
                               atol=1e-12)


@pytest.mark.parametrize("kernel", [1, 2])
def test_compact_phase_pallas_interpret(kernel):
    """The fused compact kernel (interpret mode) == the XLA compact phase."""
    K, H, W = 4, 10, 9
    f = jnp.float32
    theta, D0, Q, alphas = _problem(K, H, W, seed=3, dtype=f)
    rng = np.random.default_rng(11)
    M = jnp.asarray(rng.normal(0, 1, (4, K, H, W)), f)
    gamma = trws.node_gamma(H, W, f)
    valid = jnp.stack(
        [geometry.valid_mask(H, W, d, dtype=f) for d in range(4)], 0)
    tol = 1.1

    ch = lambda a: (checker.compact_h(a, 0), checker.compact_h(a, 1))
    theta2, D02, Q2, alphas2, valid2, gamma2 = map(
        ch, (theta, D0, Q, alphas, valid, gamma))
    pix = jnp.ones((H, W), f)
    pix2 = (checker.compact_h(pix, 0), checker.compact_h(pix, 1), H)
    M2 = ch(M)

    for s in (0, 1):
        want, wn, wm = trws._phase_compact(
            theta2, M2, D02, Q2, alphas2, valid2, gamma2, pix2, s, kernel,
            tol, accumulate_lb=True, use_pallas=False)
        got, gn, gm = trws._phase_compact(
            theta2, M2, D02, Q2, alphas2, valid2, gamma2, pix2, s, kernel,
            tol, accumulate_lb=True, use_pallas=True, interpret=True)
        for c in (0, 1):
            np.testing.assert_allclose(np.asarray(got[c]),
                                       np.asarray(want[c]), rtol=1e-5,
                                       atol=1e-5)
        np.testing.assert_allclose(float(gn), float(wn), rtol=1e-5)
        np.testing.assert_allclose(float(gm), float(wm), rtol=1e-5)
