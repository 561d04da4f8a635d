"""Checkpoint save/restore round trips, versioning, resume equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu.solvers import trws
from stereo_tpu.utils.checkpoint import Checkpointer

import oracles


def test_roundtrip_and_gc(tmp_path):
    ck = Checkpointer(str(tmp_path), keep=2, async_save=False)
    for step in range(5):
        ck.save(step, {"a": jnp.arange(3) + step, "b": {"c": np.ones((2, 2)) * step}})
    assert ck.steps() == [3, 4]
    step, flat = ck.load()
    assert step == 4
    np.testing.assert_array_equal(flat["['a']"], np.arange(3) + 4)
    np.testing.assert_array_equal(flat["['b']/['c']"], np.ones((2, 2)) * 4)


def test_async_save(tmp_path):
    ck = Checkpointer(str(tmp_path), async_save=True)
    ck.save(0, {"x": np.arange(10)})
    ck.wait()
    assert ck.steps() == [0]


def test_trws_resume_identical_trajectory(tmp_path):
    """Solve 6 iterations straight vs 3 + checkpoint + resume 3: identical."""
    rng = np.random.default_rng(0)
    theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, 6, 7, 3)
    args = tuple(jnp.asarray(x) for x in (theta, D0, Q, alphas))
    kw = dict(kernel=1, tol=1.0, max_relgap=0.0)

    full = trws.solve(*args, maxiter=6, **kw)

    half = trws.solve(*args, maxiter=3, **kw)
    ck = Checkpointer(str(tmp_path), async_save=False)
    ck.save(3, {"messages": half.messages})
    _, flat = ck.load()
    resumed = trws.solve(*args, maxiter=3, **kw,
                         messages=jnp.asarray(flat["['messages']"]))

    assert float(resumed.energy) == pytest.approx(float(full.energy), rel=1e-12)
    assert float(resumed.lower_bound) == pytest.approx(
        float(full.lower_bound), rel=1e-12
    )
    np.testing.assert_array_equal(np.asarray(resumed.labels),
                                  np.asarray(full.labels))
