"""Checkerboard H-compaction layout utilities vs full-width equivalents."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu import geometry
from stereo_tpu.ops import checker


@pytest.mark.parametrize("H,W", [(8, 10), (9, 7), (6, 9), (7, 8)])
def test_compact_expand_roundtrip(H, W):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
    v0 = checker.compact_h(a, 0)
    v1 = checker.compact_h(a, 1)
    back = checker.expand_h(v0, v1, H)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


@pytest.mark.parametrize("H,W", [(8, 10), (9, 7)])
def test_compact_selects_right_pixels(H, W):
    ys = np.arange(H)[:, None] + np.zeros((1, W))
    xs = np.zeros((H, 1)) + np.arange(W)[None, :]
    color = (ys + xs) % 2
    a = jnp.asarray(np.where(color == 0, 1.0, -1.0), jnp.float32)
    v0 = np.asarray(checker.compact_h(a, 0))
    v1 = np.asarray(checker.compact_h(a, 1))
    # pad cells (odd H) are zero; real cells carry only their color's value
    assert set(np.unique(v0)) <= {0.0, 1.0}
    assert set(np.unique(v1)) <= {0.0, -1.0}
    assert (v0 == 1.0).sum() == (np.asarray(color) == 0).sum()
    assert (v1 == -1.0).sum() == (np.asarray(color) == 1).sum()


@pytest.mark.parametrize("H,W", [(8, 10), (9, 7), (6, 9)])
@pytest.mark.parametrize("d", [0, 1, 2, 3])
@pytest.mark.parametrize("c_to", [0, 1])
def test_cshift_matches_full_shift(H, W, d, c_to):
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(2, H, W)), jnp.float32)
    # values live at color 1-c_to; zero elsewhere so the full shift only
    # moves (1-c_to)-colored values (as 4-neighbors always are)
    ys = np.arange(H)[:, None] + np.zeros((1, W), np.int32)
    xs = np.zeros((H, 1), np.int32) + np.arange(W)[None, :]
    color = (ys + xs).astype(np.int32) % 2
    a = a * jnp.asarray(color == (1 - c_to), jnp.float32)

    full = geometry.shift_from_neighbor(a, d, fill=0.0)
    want = checker.compact_h(full, c_to)

    v = checker.compact_h(a, 1 - c_to)
    got = checker.cshift(v, d, c_to, H)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
