import jax
import jax.numpy as jnp
import numpy as np

from shapeclipper_tpu.models.implicit import SDFNetwork, sdf_with_gradient
from shapeclipper_tpu.ops.fused_sdf import fused_sdf_forward


def _setup(key=0):
    net = SDFNetwork()
    pts0 = jnp.zeros((1, 4, 3))
    lat0 = jnp.zeros((1, 4, 64))
    params = net.init(jax.random.PRNGKey(key), pts0, lat0)["params"]
    return net, params


def test_fused_forward_matches_reference():
    net, params = _setup()
    B, N = 2, 700  # non-multiple of TILE exercises padding
    pts = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)) * 0.5
    lat = jax.random.normal(jax.random.PRNGKey(2), (B, 64)) * 0.2
    sdf, feat, grad = fused_sdf_forward(params, pts, lat, compute_grad=False)
    ref = net.apply({"params": params}, pts, lat)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(ref[..., :1]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(ref[..., 1:]),
                               atol=2e-5)
    assert grad is None


def test_fused_gradient_matches_vjp():
    net, params = _setup()
    B, N = 1, 512
    pts = jax.random.normal(jax.random.PRNGKey(3), (B, N, 3)) * 0.5
    # keep x0 away from the |x| kink where sign-based tangents differ
    pts = pts.at[..., 0].set(jnp.where(jnp.abs(pts[..., 0]) < 0.05,
                                       pts[..., 0] + 0.1, pts[..., 0]))
    lat = jax.random.normal(jax.random.PRNGKey(4), (B, 64)) * 0.2
    sdf, feat, grad = fused_sdf_forward(params, pts, lat, compute_grad=True)
    rsdf, rfeat, rgrad = sdf_with_gradient(net.apply, params, pts, lat)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(rsdf), atol=2e-5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(rgrad),
                               atol=5e-4, rtol=5e-3)


def test_fused_symmetry():
    net, params = _setup()
    pts = jax.random.normal(jax.random.PRNGKey(5), (1, 512, 3)) * 0.4
    lat = jnp.zeros((1, 64))
    s1, _, g1 = fused_sdf_forward(params, pts, lat, compute_grad=True)
    flipped = pts * jnp.array([-1.0, 1.0, 1.0])
    s2, _, g2 = fused_sdf_forward(params, flipped, lat, compute_grad=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    # gradient x-component flips sign, yz invariant
    np.testing.assert_allclose(np.asarray(g1[..., 0]), -np.asarray(g2[..., 0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[..., 1:]), np.asarray(g2[..., 1:]),
                               atol=1e-4)
