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


def test_fwdmode_xla_full_parity():
    """sdf_fwdmode_xla == sdf_with_gradient: values, spatial grads, parameter
    gradients through an eikonal-style second-order loss, and detach_latent
    semantics."""
    from shapeclipper_tpu.ops.fused_sdf import sdf_fwdmode_xla

    net = SDFNetwork()
    B, N, C = 2, 33, 64
    pts = jax.random.uniform(jax.random.PRNGKey(1), (B, N, 3),
                             minval=-1, maxval=1)
    lat = jax.random.normal(jax.random.PRNGKey(2), (B, C)) * 0.3
    params = net.init(jax.random.PRNGKey(0), pts, lat)["params"]

    s1, f1, g1 = sdf_with_gradient(net.apply, params, pts, lat)
    s2, f2, g2 = sdf_fwdmode_xla(params, pts, lat)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    def loss(p, fn):
        s, f, g = fn(p)
        return ((s ** 2).mean() + (f ** 2).mean()
                + ((jnp.linalg.norm(g, axis=-1) - 1) ** 2).mean())

    gv = jax.grad(loss)(params, lambda p: sdf_with_gradient(
        net.apply, p, pts, lat))
    gf = jax.grad(loss)(params, lambda p: sdf_fwdmode_xla(p, pts, lat))
    for a, b in zip(jax.tree_util.tree_leaves(gv),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    # detach_latent: no gradient flows to the latent from the spatial grad
    gl = jax.grad(lambda l: sdf_fwdmode_xla(params, pts, l,
                                            detach_latent=True)[2].sum())(lat)
    assert float(np.abs(np.asarray(gl)).max()) == 0.0


def test_fwdmode_xla_nondefault_arch():
    """The fwd-mode path generalizes over posenc res / skip set / depth."""
    from shapeclipper_tpu.ops.fused_sdf import sdf_fwdmode_xla

    net = SDFNetwork(posenc_res=4, skip_in=(2,), n_hidden=4, n_channels=32,
                     proj_latent_dim=16, force_symmetry=False)
    B, N = 2, 17
    pts = jax.random.uniform(jax.random.PRNGKey(3), (B, N, 3),
                             minval=-1, maxval=1)
    lat = jax.random.normal(jax.random.PRNGKey(4), (B, 16)) * 0.3
    params = net.init(jax.random.PRNGKey(5), pts, lat)["params"]
    s1, f1, g1 = sdf_with_gradient(net.apply, params, pts, lat)
    s2, f2, g2 = sdf_fwdmode_xla(params, pts, lat, n_freqs=4, skip_in=(2,),
                                 n_hidden=4, force_symmetry=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_eval_grid_fused_path_parity():
    """_eval_grid_chunked(fused_cfg=...) == plain XLA apply (interpret-mode
    Pallas on CPU; compiled on TPU backends)."""
    from shapeclipper_tpu.eval3d.metrics import _eval_grid_chunked

    net = SDFNetwork()
    B, P, C = 2, 1024, 64
    pts = jax.random.uniform(jax.random.PRNGKey(7), (P, 3),
                             minval=-0.6, maxval=0.6)
    lat = jax.random.normal(jax.random.PRNGKey(8), (B, C)) * 0.3
    params = net.init(jax.random.PRNGKey(9), pts[None, :8], lat)["params"]

    ref = _eval_grid_chunked(net.apply, params, pts, lat, n_chunks=2)
    fused = _eval_grid_chunked(net.apply, params, pts, lat, n_chunks=2,
                               fused_cfg=(6, (1, 2), 5, True))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), atol=1e-5)
