import jax
import jax.numpy as jnp
import numpy as np

import shapeclipper_tpu.camera as camera
from shapeclipper_tpu.models.implicit import (SDFNetwork, RGBNetwork,
                                              init_density_params)
from shapeclipper_tpu.render import renderer as R


def _setup(base_opt, H=16, W=16):
    opt = base_opt.deepcopy()
    opt.H, opt.W = H, W
    sdf_net = SDFNetwork.from_opt(opt)
    rgb_net = RGBNetwork.from_opt(opt)
    pts = jnp.zeros((1, 4, 3))
    lat = jnp.zeros((1, 4, 64))
    feat = jnp.zeros((1, 4, 64))
    params = {
        "sdf_network": sdf_net.init(jax.random.PRNGKey(0), pts, lat)["params"],
        "rgb_network": rgb_net.init(jax.random.PRNGKey(1), pts, lat, feat)["params"],
        "density": init_density_params(opt),
    }
    B = 2
    pose = camera.pose(R=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                       t=jnp.broadcast_to(jnp.array([0.0, 0.0, opt.camera.dist]), (B, 3)))
    intr = camera.get_intr(opt, jnp.ones((B,)))
    scale_dist = jnp.ones((B,))
    lat_sdf = jnp.zeros((B, 64))
    lat_rgb = jnp.zeros((B, 64))
    return opt, sdf_net, rgb_net, params, pose, intr, scale_dist, lat_sdf, lat_rgb


def test_volume_rendering_analytic():
    # constant density sigma: alpha = 1 - exp(-d*sigma), T_k = exp(-sigma*sum d_<k)
    z = jnp.linspace(1.0, 2.0, 5)[None, None, :]
    sigma = 3.0
    density = jnp.full_like(z, sigma)
    w, a = R.volume_rendering(z, density)
    d = 0.25
    alpha = 1 - np.exp(-d * sigma)
    np.testing.assert_allclose(np.asarray(a[0, 0, :-1]), alpha, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a[0, 0, -1]), 0.0, atol=1e-6)  # last dist = 0
    expected_T = np.exp(-sigma * d * np.arange(5))
    np.testing.assert_allclose(np.asarray(w[0, 0]),
                               np.asarray(a[0, 0]) * expected_T, rtol=1e-5)
    # weights sum <= 1
    assert float(w.sum(-1).max()) <= 1.0 + 1e-5


def test_sample_z_vals_bounds(base_opt):
    opt = base_opt.deepcopy()
    scale_dist = jnp.ones((3,)) * 1.1
    z, z_eik = R.sample_z_vals(opt, jax.random.PRNGKey(0), 7, scale_dist, True)
    near = 5 * 1.1 - 0.7
    far = 5 * 1.1 + 0.7
    assert z.shape == (3, 7, opt.render.n_samples_uniform)
    assert float(z.min()) >= near - 1e-5 and float(z.max()) <= far + 1e-5
    # strictly increasing along the sample axis
    assert float(jnp.min(z[..., 1:] - z[..., :-1])) > 0
    assert float(z_eik.min()) >= near - 1e-5 and float(z_eik.max()) <= far + 1e-5
    # eval mode: exact linspace
    z_eval, _ = R.sample_z_vals(opt, None, 2, scale_dist, False)
    np.testing.assert_allclose(np.asarray(z_eval[0, 0, 0]), near, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z_eval[0, 0, -1]), far, rtol=1e-6)


def test_render_sphere_geometry(base_opt):
    """Geometric-init SDF + zero latent = sphere of radius 0.5 at the origin.
    Camera at world [0,0,-5] looking down +z must see it."""
    opt, sdf_net, rgb_net, params, pose, intr, scale_dist, ls, lr = _setup(base_opt)
    # widen the FOV so corner rays clearly miss the ~0.66-radius init sphere
    # (half-extent at dist 5 with focal 2: 0.5/2*5 = 1.25)
    opt.camera.focal = 2
    intr = __import__("shapeclipper_tpu.camera", fromlist=["x"]).get_intr(
        opt, jnp.ones((2,)))
    out = R.render(opt, sdf_net.apply, rgb_net.apply, params, pose, intr,
                   scale_dist, ls, lr, ray_idx=None, rng=None, training=False)
    Hh, Ww = opt.H, opt.W
    assert out.rgb.shape == (2, Hh * Ww, 3)
    mask = np.asarray(out.mask).reshape(2, Hh, Ww)
    depth = np.asarray(out.depth).reshape(2, Hh, Ww)
    normal = np.asarray(out.normal).reshape(2, Hh, Ww, 3)
    cy, cx = Hh // 2, Ww // 2
    # center ray hits the sphere, corners miss
    assert mask[0, cy, cx] > 0.9
    assert mask[0, 0, 0] < 0.3
    # center depth ~ dist - init radius (~0.66), with laplace-density blur
    assert abs(depth[0, cy, cx] - 4.34) < 0.3
    # center normal points toward the camera (world -z)
    assert normal[0, cy, cx, 2] < -0.8
    # grad_eikonal None in eval
    assert out.grad_eikonal is None
    # both batch elements identical (same inputs)
    np.testing.assert_allclose(mask[0], mask[1], atol=1e-5)


def test_render_background_composition(base_opt):
    opt, sdf_net, rgb_net, params, pose, intr, scale_dist, ls, lr = _setup(base_opt)
    opt.camera.focal = 1  # very wide FOV: corner rays far from the sphere
    intr = __import__("shapeclipper_tpu.camera", fromlist=["x"]).get_intr(
        opt, jnp.ones((2,)))
    out = R.render(opt, sdf_net.apply, rgb_net.apply, params, pose, intr,
                   scale_dist, ls, lr, training=False)
    rgb = np.asarray(out.rgb).reshape(2, opt.H, opt.W, 3)
    # corner = pure background (bgcolor 1)
    np.testing.assert_allclose(rgb[0, 0, 0], 1.0, atol=0.05)


def test_render_training_mode_with_ray_idx(base_opt):
    opt, sdf_net, rgb_net, params, pose, intr, scale_dist, ls, lr = _setup(base_opt)
    B, Rn = 2, 32
    ray_idx = jax.random.randint(jax.random.PRNGKey(5), (B, Rn), 0, opt.H * opt.W)
    out = R.render(opt, sdf_net.apply, rgb_net.apply, params, pose, intr,
                   scale_dist, ls, lr, ray_idx=ray_idx,
                   rng=jax.random.PRNGKey(7), training=True)
    assert out.rgb.shape == (B, Rn, 3)
    assert out.grad_eikonal.shape == (B, 2 * Rn)
    # geometric init: eikonal norms near 1
    assert 0.5 < float(out.grad_eikonal.mean()) < 1.5


def test_render_is_jittable_and_differentiable(base_opt):
    opt, sdf_net, rgb_net, params, pose, intr, scale_dist, ls, lr = _setup(base_opt, H=8, W=8)
    B, Rn = 2, 16
    ray_idx = jax.random.randint(jax.random.PRNGKey(5), (B, Rn), 0, opt.H * opt.W)

    def loss_fn(p):
        out = R.render(opt, sdf_net.apply, rgb_net.apply, p, pose, intr,
                       scale_dist, ls, lr, ray_idx=ray_idx,
                       rng=jax.random.PRNGKey(3), training=True)
        return (jnp.mean(out.rgb ** 2) + jnp.mean(out.normal ** 2)
                + jnp.mean((out.grad_eikonal - 1) ** 2))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # density beta receives gradient (via normals + compositing)
    assert float(jnp.abs(grads["density"]["beta"])) > 0


def test_render_eikonal_fold_parity(base_opt):
    """Folded eikonal evaluation (one merged field call, tpu.fold_eikonal)
    must match the separate-call path: forward outputs, grad_eikonal, and
    training gradients — including that the eikonal loss still sends NO
    gradient to the latent (reference detaches it,
    `model/implicit.py:168-169`)."""
    opt, sdf_net, rgb_net, params, pose, intr, scale_dist, ls, lr = _setup(
        base_opt, H=8, W=8)
    B, Rn = 2, 16
    ray_idx = jax.random.randint(jax.random.PRNGKey(5), (B, Rn), 0,
                                 opt.H * opt.W)
    ls = jax.random.normal(jax.random.PRNGKey(11), (B, 64)) * 0.1

    def run(fold, eikonal_batch=None):
        o = opt.deepcopy()
        o.tpu.fold_eikonal = fold
        return R.render(o, sdf_net.apply, rgb_net.apply, params, pose, intr,
                        scale_dist, ls, lr, ray_idx=ray_idx,
                        rng=jax.random.PRNGKey(3), training=True,
                        eikonal_batch=eikonal_batch)

    a, b = run(True), run(False)
    for name in ("rgb", "mask", "depth", "normal", "grad_eikonal"):
        np.testing.assert_allclose(np.asarray(getattr(a, name)),
                                   np.asarray(getattr(b, name)),
                                   atol=1e-5, rtol=1e-5, err_msg=name)

    # eikonal_batch < B: only the first row's eikonal gradients
    a1, b1 = run(True, eikonal_batch=1), run(False, eikonal_batch=1)
    assert a1.grad_eikonal.shape == (1, 2 * Rn)
    np.testing.assert_allclose(np.asarray(a1.grad_eikonal),
                               np.asarray(b1.grad_eikonal),
                               atol=1e-5, rtol=1e-5)

    def grads(fold, eik_only):
        o = opt.deepcopy()
        o.tpu.fold_eikonal = fold

        def loss_fn(p, lat):
            out = R.render(o, sdf_net.apply, rgb_net.apply, p, pose, intr,
                           scale_dist, lat, lr, ray_idx=ray_idx,
                           rng=jax.random.PRNGKey(3), training=True)
            le = jnp.mean((out.grad_eikonal - 1.0) ** 2)
            if eik_only:
                return le
            return le + jnp.mean(out.rgb ** 2) + jnp.mean(out.normal ** 2)

        return jax.grad(loss_fn, argnums=(0, 1))(params, ls)

    ga, gb = grads(True, False), grads(False, False)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-4, rtol=2e-3)
    # eikonal-only loss: zero latent gradient in BOTH paths (detached)
    for fold in (True, False):
        _, glat = grads(fold, True)
        assert float(jnp.abs(glat).max()) == 0.0, fold


def test_render_visualize_extras(base_opt):
    opt, sdf_net, rgb_net, params, pose, intr, scale_dist, ls, lr = _setup(base_opt, H=8, W=8)
    out = R.render(opt, sdf_net.apply, rgb_net.apply, params, pose, intr,
                   scale_dist, ls, lr, training=False, visualize=True)
    S = opt.render.n_samples_uniform
    assert out.extras["points"].shape == (2, 64, S, 3)
    assert out.extras["transparency"].shape == (2, 64, S, 3)
    assert out.extras["rgb_samples"].shape == (2, 64, S, 4)


def test_render_orthographic_smoke(base_opt):
    opt, sdf_net, rgb_net, params, pose, intr, scale_dist, ls, lr = _setup(
        base_opt, H=8, W=8)
    opt.camera.model = "orthographic"
    out = R.render(opt, sdf_net.apply, rgb_net.apply, params, pose, None,
                   scale_dist, ls, lr, training=False)
    assert out.rgb.shape == (2, 64, 3)
    assert np.isfinite(np.asarray(out.rgb)).all()
    # center ray of the ortho grid passes near the origin -> hits the sphere
    mask = np.asarray(out.mask).reshape(2, 8, 8)
    assert mask[0, 4, 4] > 0.5
