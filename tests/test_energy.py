"""Dense grid energy vs the edge-list numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_tpu import energy, geometry

import oracles


def random_planes(rng, H, W, spatially_varying=True):
    p = rng.standard_normal((4, H, W))
    # keep c bounded away from zero (reference errors on c == 0,
    # dispmap_super.m:323-325)
    p[2] = np.sign(p[2]) * (np.abs(p[2]) + 0.5)
    if not spatially_varying:
        p = np.broadcast_to(p[:, :1, :1], (4, H, W)).copy()
    return p


@pytest.mark.parametrize("kernel", [1, 2])
@pytest.mark.parametrize("H,W", [(5, 7), (8, 8), (3, 12)])
def test_pairwise_energy_matches_oracle(kernel, H, W):
    rng = np.random.default_rng(0)
    planes = random_planes(rng, H, W)
    tol = 0.7

    w_dense = np.array(energy.default_weights(H, W, dtype=jnp.float64))
    got = float(energy.pairwise_energy(jnp.asarray(planes), jnp.asarray(w_dense), kernel, tol))

    assignment = oracles.planes_to_flat(planes)
    w_flat = oracles.dense_weights_to_flat(w_dense)
    want = oracles.total_energy(
        np.zeros(H * W), assignment, H, W, w_flat, kernel, tol
    )
    assert got == pytest.approx(want, rel=1e-12)


@pytest.mark.parametrize("kernel", [1, 2])
def test_pairwise_energy_with_random_symmetric_weights(kernel):
    H, W = 6, 9
    rng = np.random.default_rng(1)
    planes = random_planes(rng, H, W)
    tol = 1.3

    # build symmetric undirected weights (like segmentation-based lambda maps)
    w_h = rng.uniform(1, 5, size=(H, W - 1))  # weight between (y,x) and (y,x+1)
    w_v = rng.uniform(1, 5, size=(H - 1, W))
    w_dense = np.zeros((4, H, W))
    w_dense[0, :, 1:] = w_h  # in-edge from left
    w_dense[1, :, :-1] = w_h  # in-edge from right
    w_dense[2, 1:, :] = w_v  # from up
    w_dense[3, :-1, :] = w_v  # from down

    got = float(
        energy.pairwise_energy(jnp.asarray(planes), jnp.asarray(w_dense), kernel, tol)
    )
    assignment = oracles.planes_to_flat(planes)
    w_flat = oracles.dense_weights_to_flat(w_dense)
    want = oracles.total_energy(np.zeros(H * W), assignment, H, W, w_flat, kernel, tol)
    assert got == pytest.approx(want, rel=1e-12)


def test_normalized_disparity_matches_oracle():
    H, W, kernel, tol = 5, 6, 1, 0.02
    rng = np.random.default_rng(2)
    planes = random_planes(rng, H, W)
    normalize = (3.0, 117.0)
    w_dense = np.asarray(energy.default_weights(H, W, dtype=jnp.float64))
    got = float(
        energy.pairwise_energy(
            jnp.asarray(planes), jnp.asarray(w_dense), kernel, tol, normalize
        )
    )
    assignment = oracles.planes_to_flat(planes)
    w_flat = oracles.dense_weights_to_flat(w_dense)
    want = oracles.total_energy(
        np.zeros(H * W), assignment, H, W, w_flat, kernel, tol, normalize
    )
    assert got == pytest.approx(want, rel=1e-12)


def test_own_disparity_formula():
    H, W = 4, 5
    rng = np.random.default_rng(3)
    planes = random_planes(rng, H, W)
    D = np.asarray(geometry.own_disparity(jnp.asarray(planes)))
    pts = oracles.points(H, W)
    flat = oracles.planes_to_flat(planes)
    want = oracles.disparity_from_assignment(flat, pts).reshape(W, H).T
    np.testing.assert_allclose(D, want, rtol=1e-13)


def test_fronto_parallel_disparity_is_constant():
    f = geometry.fronto_parallel(3, 4, 7.5, dtype=jnp.float64)
    D = geometry.own_disparity(f)
    np.testing.assert_allclose(np.asarray(D), 7.5)


@pytest.mark.parametrize("kernel", [1, 2])
def test_binary_fusion_tables_consistency(kernel):
    """E00 equals the current pairwise map; E11 the proposal's; fused energy
    computed from tables equals energy of the fused field."""
    H, W, tol = 5, 6, 1,
    tol = 0.9
    rng = np.random.default_rng(4)
    cur = jnp.asarray(random_planes(rng, H, W))
    prop = jnp.asarray(random_planes(rng, H, W))
    w = energy.default_weights(H, W, dtype=jnp.float64)

    tables = energy.binary_fusion_pairwise_tables(cur, prop, kernel, tol)
    e00 = (w * tables[:, 0]).sum()
    e11 = (w * tables[:, 3]).sum()
    assert float(e00) == pytest.approx(
        float(energy.pairwise_energy(cur, w, kernel, tol)), rel=1e-12
    )
    assert float(e11) == pytest.approx(
        float(energy.pairwise_energy(prop, w, kernel, tol)), rel=1e-12
    )

    # random labelling: energy from tables == energy of fused plane field
    take = jnp.asarray(rng.integers(0, 2, size=(H, W)).astype(bool))
    fused = energy.fuse_labelling(cur, prop, take)
    direct = float(energy.pairwise_energy(fused, w, kernel, tol))

    # from tables: for in-edge from neighbor d: tail label = take at neighbor,
    # head label = take at pixel; table index = 2*tail + head... E01 is tail
    # current/head proposal -> index 1 = tail 0 head 1 so idx = 2*a + b with
    # (a=tail, b=head).
    total = 0.0
    take_np = np.asarray(take)
    tables_np = np.asarray(tables)
    for d, (dy, dx) in enumerate(geometry.DIRS):
        for y in range(H):
            for x in range(W):
                ny, nx = y + dy, x + dx
                if not (0 <= ny < H and 0 <= nx < W):
                    continue
                a = int(take_np[ny, nx])
                b = int(take_np[y, x])
                total += float(w[d, y, x]) * tables_np[d, 2 * a + b, y, x]
    assert direct == pytest.approx(total, rel=1e-12)
