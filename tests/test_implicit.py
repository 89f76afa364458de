import jax
import jax.numpy as jnp
import numpy as np

from shapeclipper_tpu.models.embedder import posenc_dim, positional_encoding
from shapeclipper_tpu.models import implicit
from shapeclipper_tpu.models.implicit import (
    SDFNetwork, RGBNetwork, laplace_density, laplace_density_dsdf,
    sdf_with_gradient)


def test_posenc_shape_and_order():
    x = jnp.array([[0.5, -0.3, 1.0]])
    out = positional_encoding(x, 6)
    assert out.shape == (1, posenc_dim(6)) == (1, 39)
    np.testing.assert_allclose(np.asarray(out[0, :3]), np.asarray(x[0]))
    # first frequency block: sin(x), cos(x)
    np.testing.assert_allclose(np.asarray(out[0, 3:6]), np.sin(np.asarray(x[0])), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 6:9]), np.cos(np.asarray(x[0])), atol=1e-6)
    # second: sin(2x)
    np.testing.assert_allclose(np.asarray(out[0, 9:12]), np.sin(2 * np.asarray(x[0])), atol=1e-6)
    # last: cos(32x)
    np.testing.assert_allclose(np.asarray(out[0, -3:]), np.cos(32 * np.asarray(x[0])), atol=1e-5)


def test_laplace_density_closed_form():
    beta_param = jnp.asarray(0.1)
    beta = 0.1 + implicit.BETA_MIN
    alpha = 1 / beta
    sdf = jnp.array([-0.5, -0.01, 0.0, 0.01, 0.5])
    d = laplace_density(sdf, beta_param)
    expected = np.where(
        np.asarray(sdf) >= 0,
        alpha * 0.5 * np.exp(-np.asarray(sdf) / beta),
        alpha * (1 - 0.5 * np.exp(np.asarray(sdf) / beta)))
    np.testing.assert_allclose(np.asarray(d), expected, rtol=1e-5)
    # no overflow for extreme sdf
    assert np.isfinite(np.asarray(laplace_density(jnp.array([-100.0, 100.0]), beta_param))).all()


def test_laplace_density_derivative_matches_autodiff():
    beta_param = jnp.asarray(0.1)
    f = lambda s: laplace_density(s, beta_param)
    sdf = jnp.array([-0.3, -0.01, 0.02, 0.4])
    auto = jax.vmap(jax.grad(f))(sdf)
    analytic = laplace_density_dsdf(sdf, beta_param)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(analytic), rtol=1e-4)


def _sdf_net_and_params(key=0):
    net = SDFNetwork()
    pts = jnp.zeros((1, 4, 3))
    lat = jnp.zeros((1, 4, 64))
    params = net.init(jax.random.PRNGKey(key), pts, lat)["params"]
    return net, params


def test_geometric_init_is_approx_sphere():
    net, params = _sdf_net_and_params()
    # zero latent: geometric init should give sdf(x) ~ ||x|| - 0.5
    r = jnp.linspace(0.05, 1.0, 20)
    pts = jnp.stack([r, jnp.zeros_like(r), jnp.zeros_like(r)], -1)[None]
    lat = jnp.zeros((1, 20, 64))
    sdf = np.asarray(net.apply({"params": params}, pts, lat)[..., 0][0])
    # negative inside, positive outside, monotone increasing radially
    assert sdf[0] < 0 and sdf[-1] > 0
    assert (np.diff(sdf) > 0).all()
    # zero crossing at a plausible radius (init is approximate; pretrain
    # refines to the exact 0.5 sphere)
    r_np = np.asarray(r)
    cross = r_np[np.searchsorted(sdf, 0.0)]
    assert 0.3 < cross < 0.9


def test_force_symmetry():
    net, params = _sdf_net_and_params()
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 64)) * 0.1
    p = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 3))
    p_flip = p * jnp.array([-1.0, 1.0, 1.0])
    out1 = net.apply({"params": params}, p, lat)
    out2 = net.apply({"params": params}, p_flip, lat)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_sdf_gradient_matches_finite_difference():
    net, params = _sdf_net_and_params()
    pts = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 3)) * 0.4
    # keep x away from the |x| kink
    pts = pts.at[..., 0].set(jnp.abs(pts[..., 0]) + 0.05)
    lat = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 64)) * 0.1
    sdf, feat, grad = sdf_with_gradient(net.apply, params, pts, lat)
    assert grad.shape == pts.shape
    eps = 1e-4
    for axis in range(3):
        dp = jnp.zeros(3).at[axis].set(eps)
        s_plus = net.apply({"params": params}, pts + dp, lat)[..., :1]
        s_minus = net.apply({"params": params}, pts - dp, lat)[..., :1]
        fd = (s_plus - s_minus)[..., 0] / (2 * eps)
        np.testing.assert_allclose(np.asarray(grad[..., axis]),
                                   np.asarray(fd), atol=1e-2, rtol=1e-2)


def test_sdf_gradient_near_unit_norm_at_init():
    # geometric init: ||∇sdf|| ~ 1 (sphere SDF property)
    net, params = _sdf_net_and_params()
    pts = jax.random.uniform(jax.random.PRNGKey(5), (1, 100, 3), minval=-1, maxval=1)
    lat = jnp.zeros((1, 100, 64))
    _, _, grad = sdf_with_gradient(net.apply, params, pts, lat)
    norms = jnp.linalg.norm(grad, axis=-1)
    assert 0.5 < float(norms.mean()) < 1.5


def test_second_order_gradients_flow():
    """Training differentiates through ∇sdf (volume normals): make sure
    grad-of-grad w.r.t. params is finite and nonzero."""
    net, params = _sdf_net_and_params()
    pts = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 3)) * 0.3
    lat = jnp.zeros((1, 8, 64))

    def loss(p):
        _, _, grad = sdf_with_gradient(net.apply, p, pts, lat)
        return jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert np.isfinite(total) and total > 0


def test_rgb_network_range_and_shape():
    net = RGBNetwork()
    pts = jax.random.normal(jax.random.PRNGKey(7), (2, 10, 3))
    lat = jax.random.normal(jax.random.PRNGKey(8), (2, 10, 64))
    feat = jax.random.normal(jax.random.PRNGKey(9), (2, 10, 64))
    params = net.init(jax.random.PRNGKey(10), pts, lat, feat)["params"]
    rgb = net.apply({"params": params}, pts, lat, feat)
    assert rgb.shape == (2, 10, 3)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0


def test_factored_latent_matches_per_point():
    """[B,C] factored latent must equal the [B,N,C] per-point path."""
    net, params = _sdf_net_and_params()
    pts = jax.random.normal(jax.random.PRNGKey(20), (2, 9, 3)) * 0.4
    lat = jax.random.normal(jax.random.PRNGKey(21), (2, 64)) * 0.1
    lat_pp = jnp.broadcast_to(lat[:, None, :], (2, 9, 64))
    out_f = net.apply({"params": params}, pts, lat)
    out_p = net.apply({"params": params}, pts, lat_pp)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-5)

    rgbnet = RGBNetwork()
    feat = jax.random.normal(jax.random.PRNGKey(22), (2, 9, 64))
    rp = rgbnet.init(jax.random.PRNGKey(23), pts, lat, feat)["params"]
    rf = rgbnet.apply({"params": rp}, pts, lat, feat)
    rpnt = rgbnet.apply({"params": rp}, pts, lat_pp, feat)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rpnt), atol=1e-5)


def test_param_tree_matches_dense_layout():
    """FactoredLinear keeps the nn.Dense param contract {kernel, bias} with
    full concat in_dim (checkpoint compatibility)."""
    net, params = _sdf_net_and_params()
    assert params["lin0"]["kernel"].shape == (103, 64)
    assert params["lin1"]["kernel"].shape == (167, 64)
    assert params["lin5"]["kernel"].shape == (64, 65)
    assert params["lin0"]["bias"].shape == (64,)
