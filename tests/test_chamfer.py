import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapeclipper_tpu.ops.chamfer import (chamfer_dists_sq,
                                          chamfer_distance_sq,
                                          chamfer_distance_sq_reference)


def _rand_clouds(key=0, B=2, N1=100, N2=130):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x1 = jax.random.normal(k1, (B, N1, 3))
    x2 = jax.random.normal(k2, (B, N2, 3))
    return x1, x2


def test_chamfer_matches_reference():
    x1, x2 = _rand_clouds()
    d1, d2, i1, i2 = chamfer_distance_sq(x1, x2)
    rd1, rd2, ri1, ri2 = chamfer_distance_sq_reference(x1, x2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ri1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ri2))


def test_chamfer_identical_clouds_zero():
    x1, _ = _rand_clouds()
    d1, d2, i1, i2 = chamfer_distance_sq(x1, x1)
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)
    # argmin = self
    np.testing.assert_array_equal(np.asarray(i1)[0],
                                  np.arange(x1.shape[1]))


def test_chamfer_tile_boundaries():
    # N larger than one tile in both directions exercises the fori_loop
    x1, x2 = _rand_clouds(key=3, B=1, N1=600, N2=2100)
    d1, d2, i1, i2 = chamfer_distance_sq(x1, x2)
    rd1, rd2, _, _ = chamfer_distance_sq_reference(x1, x2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_chamfer_dists_only_matches_reference(impl, monkeypatch):
    # the eval metric path: distances only, both tile-boundary regimes
    monkeypatch.setenv("SCL_CHAMFER_IMPL", impl)
    x1, x2 = _rand_clouds(key=7, B=1, N1=600, N2=2100)
    d1, d2 = chamfer_dists_sq(x1, x2)
    rd1, rd2, _, _ = chamfer_distance_sq_reference(x1, x2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("dists_mode", ["twopass", "bidir"])
def test_chamfer_nodot_cross_matches_reference(dists_mode, monkeypatch):
    """SCL_CHAMFER_CROSS=nodot (fused per-coordinate squared differences —
    no MXU dot) must match the O(N^2) reference for both the dist+argmin and
    dist-only paths (both XLA formulations), across tile boundaries."""
    monkeypatch.setenv("SCL_CHAMFER_CROSS", "nodot")
    monkeypatch.setenv("SCL_CHAMFER_DISTS", dists_mode)
    x1, x2 = _rand_clouds(key=9, B=2, N1=600, N2=2100)
    ref = chamfer_distance_sq_reference(x1, x2)
    got = chamfer_distance_sq(x1, x2)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4,
                                   atol=1e-5)
    d1, d2 = chamfer_dists_sq(x1, x2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(ref[0]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(ref[1]), rtol=1e-4,
                               atol=1e-5)


def test_chamfer_bidir_prune_exact(monkeypatch):
    """The Morton-sorted bbox-culled sweep is EXACT: per-pair distances are
    computed identically and min is order-independent, so it must equal the
    unpruned bidir sweep bitwise (and the O(N^2) reference to fp tolerance),
    including tile-boundary and clustered-cloud regimes."""
    monkeypatch.setenv("SCL_CHAMFER_DISTS", "bidir_prune")
    monkeypatch.setenv("SCL_CHAMFER_TILE1", "128")
    monkeypatch.setenv("SCL_CHAMFER_TILE2", "256")
    # uniform + clustered (two separated blobs => heavy pruning) + ragged N
    x1, x2 = _rand_clouds(key=11, B=2, N1=700, N2=900)
    x1 = x1.at[1].set(x1[1] * 0.05)                 # tight cluster vs spread
    x2 = x2.at[1].add(2.0)                          # disjoint offset blob
    d1, d2 = chamfer_dists_sq(x1, x2)
    monkeypatch.setenv("SCL_CHAMFER_DISTS", "bidir")
    b1, b2 = chamfer_dists_sq(x1, x2)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(b2))
    rd1, rd2, _, _ = chamfer_distance_sq_reference(x1, x2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2), rtol=1e-4,
                               atol=1e-5)


def test_chamfer_dists_only_asymmetric_batch():
    x1, x2 = _rand_clouds(key=8, B=3, N1=57, N2=201)
    d1, d2 = chamfer_dists_sq(x1, x2)
    rd1, rd2, _, _ = chamfer_distance_sq_reference(x1, x2)
    assert d1.shape == (3, 57) and d2.shape == (3, 201)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2), rtol=1e-4,
                               atol=1e-5)


def test_chamfer_gradient_matches_reference():
    x1, x2 = _rand_clouds(key=4, B=1, N1=40, N2=50)

    def loss_pallas(a, b):
        d1, d2, _, _ = chamfer_distance_sq(a, b)
        return d1.mean() + d2.mean()

    def loss_ref(a, b):
        d1, d2, _, _ = chamfer_distance_sq_reference(a, b)
        return d1.mean() + d2.mean()

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(x1, x2)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x1, x2)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-5)


def test_chamfer_gradient_finite_difference():
    x1, x2 = _rand_clouds(key=5, B=1, N1=12, N2=15)

    def loss(a):
        d1, d2, _, _ = chamfer_distance_sq(a, x2)
        return d1.sum() + d2.sum()

    g = jax.grad(loss)(x1)
    eps = 1e-3
    rng = np.random.RandomState(0)
    for _ in range(5):
        i, j = rng.randint(12), rng.randint(3)
        dp = jnp.zeros_like(x1).at[0, i, j].set(eps)
        fd = (loss(x1 + dp) - loss(x1 - dp)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, i, j]), float(fd), rtol=1e-2,
                                   atol=1e-2)
