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


def test_fused_train_pair_full_parity():
    """fused_sdf_train (Pallas fwd + hand-derived Pallas bwd) == nested-vjp
    reference: primal outputs AND all training gradients (params, points,
    latent) through an eikonal-style second-order loss."""
    from shapeclipper_tpu.ops.fused_sdf import fused_sdf_train

    net, params = _setup()
    B, N, C = 2, 300  , 64   # non-multiple of TILE_BWD exercises padding
    pts = jax.random.uniform(jax.random.PRNGKey(11), (B, N, 3),
                             minval=-1, maxval=1)
    lat = jax.random.normal(jax.random.PRNGKey(12), (B, C)) * 0.3

    s1, f1, g1 = sdf_with_gradient(net.apply, params, pts, lat)
    s2, f2, g2 = fused_sdf_train(params, pts, lat)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def loss(p, x, l, fn):
        s, f, g = fn(p, x, l)
        return ((s ** 2).mean() + (f ** 2).mean()
                + ((jnp.linalg.norm(g, axis=-1) - 1) ** 2).mean())

    ref_fn = lambda p, x, l: sdf_with_gradient(net.apply, p, x, l)  # noqa
    gv = jax.grad(loss, argnums=(0, 1, 2))(params, pts, lat, ref_fn)
    gf = jax.grad(loss, argnums=(0, 1, 2))(params, pts, lat, fused_sdf_train)
    for a, b in zip(jax.tree_util.tree_leaves(gv),
                    jax.tree_util.tree_leaves(gf)):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5 * scale, rtol=2e-4)


def test_fused_train_pair_detach_latent():
    """detach_latent cuts ALL latent gradients (reference compute_grad=True
    detaches the latent, `model/implicit.py:163-189`)."""
    from shapeclipper_tpu.ops.fused_sdf import fused_sdf_train

    net, params = _setup()
    pts = jax.random.uniform(jax.random.PRNGKey(13), (1, 64, 3),
                             minval=-1, maxval=1)
    lat = jax.random.normal(jax.random.PRNGKey(14), (1, 64)) * 0.3

    gl = jax.grad(lambda l: fused_sdf_train(
        params, pts, l, detach_latent=True)[2].sum())(lat)
    assert float(np.abs(np.asarray(gl)).max()) == 0.0
    # and matches the vjp reference when NOT detached
    gl1 = jax.grad(lambda l: sdf_with_gradient(
        net.apply, params, pts, l)[0].sum())(lat)
    gl2 = jax.grad(lambda l: fused_sdf_train(params, pts, l)[0].sum())(lat)
    np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl2), atol=2e-5)


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
