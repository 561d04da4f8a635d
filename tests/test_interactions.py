"""find_interactions equivalent vs a literal transcription of the mex scan."""

import numpy as np
import jax.numpy as jnp

from stereo_tpu.ops import interactions


def ref_find_interactions(X, Y, Z, dist=0.5):
    """Literal transcription of find_interactions.cxx:48-72 (0-based)."""
    out = []
    N = len(X)
    for a in range(N):
        for b in range(a + 1, N):
            if X[b] > X[a] + dist:
                break
            if abs(Y[b] - Y[a]) > dist:
                continue
            if Z[a] < Z[b]:
                out.append((a, b))
            else:
                out.append((b, a))
    return sorted(out)


def test_matches_reference_scan():
    rng = np.random.default_rng(0)
    N = 200
    X = np.sort(rng.uniform(0, 30, N))
    Y = rng.uniform(0, 3, N)
    Z = rng.uniform(1, 10, N)

    p, f, v = interactions.find_interactions(
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z), max_offsets=64
    )
    got = sorted(map(tuple, interactions.interactions_to_pairs(p, f, v)))
    want = ref_find_interactions(X, Y, Z)
    assert got == want


def test_no_interactions_when_far_apart():
    X = jnp.asarray(np.arange(10) * 5.0)
    Y = jnp.zeros(10)
    Z = jnp.ones(10)
    p, f, v = interactions.find_interactions(X, Y, Z)
    assert not bool(v.any())
