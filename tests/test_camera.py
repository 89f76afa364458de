import jax
import jax.numpy as jnp
import numpy as np
import pytest

import shapeclipper_tpu.camera as camera
from shapeclipper_tpu.utils.easydict import EasyDict as edict


def rand_rotation(key, batch=4):
    """Random rotation matrices via QR of gaussian."""
    A = jax.random.normal(key, (batch, 3, 3))
    Q, R = jnp.linalg.qr(A)
    # fix determinant to +1
    det = jnp.linalg.det(Q)
    Q = Q * jnp.stack([det, jnp.ones_like(det), jnp.ones_like(det)], -1)[..., None, :]
    return Q


def test_pose_invert_roundtrip():
    key = jax.random.PRNGKey(0)
    R = rand_rotation(key)
    t = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    p = camera.pose(R=R, t=t)
    p_inv = camera.invert_pose(p)
    composed = camera.compose_pair(p, p_inv)
    ident = camera.pose(R=jnp.broadcast_to(jnp.eye(3), (4, 3, 3)))
    np.testing.assert_allclose(np.asarray(composed), np.asarray(ident), atol=1e-5)


def test_world2cam_cam2world_roundtrip():
    key = jax.random.PRNGKey(2)
    R = rand_rotation(key)
    t = jax.random.normal(jax.random.PRNGKey(3), (4, 3))
    p = camera.pose(R=R, t=t)
    X = jax.random.normal(jax.random.PRNGKey(4), (4, 7, 3))
    X_cam = camera.world2cam(X, p)
    X_back = camera.cam2world(X_cam, p)
    np.testing.assert_allclose(np.asarray(X_back), np.asarray(X), atol=1e-4)


def test_compose_order():
    # compose([a, b])(x) == b(a(x))
    Ra = rand_rotation(jax.random.PRNGKey(5), 1)
    Rb = rand_rotation(jax.random.PRNGKey(6), 1)
    ta = jax.random.normal(jax.random.PRNGKey(7), (1, 3))
    tb = jax.random.normal(jax.random.PRNGKey(8), (1, 3))
    pa, pb = camera.pose(R=Ra, t=ta), camera.pose(R=Rb, t=tb)
    p = camera.compose([pa, pb])
    X = jax.random.normal(jax.random.PRNGKey(9), (1, 5, 3))
    lhs = camera.world2cam(X, p)[..., :3]
    rhs = camera.world2cam(camera.world2cam(X, pa)[..., :3], pb)[..., :3]
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_rotation_constructors_match_closed_form():
    azim = jnp.array([0.3, -1.2])
    Ry = camera.azim_to_rotation_matrix(azim, "rad")
    c, s = np.cos(0.3), np.sin(0.3)
    expected = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(Ry[0]), expected, atol=1e-6)
    # trig representation agrees with rad
    trig = jnp.stack([jnp.cos(azim), jnp.sin(azim)], axis=-1)
    np.testing.assert_allclose(
        np.asarray(camera.azim_to_rotation_matrix(trig, "trig")),
        np.asarray(Ry), atol=1e-6)
    # deg representation agrees
    np.testing.assert_allclose(
        np.asarray(camera.azim_to_rotation_matrix(azim * 180 / jnp.pi, "angle")),
        np.asarray(Ry), atol=1e-5)
    # elev/roll orthonormal
    for fn in (camera.elev_to_rotation_matrix, camera.roll_to_rotation_matrix):
        R = fn(azim, "rad")
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(
            np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-6)


def _opt(model="perspective", H=8, W=8):
    return edict(camera=edict(model=model, focal=4, dist=5), H=H, W=W)


def test_rays_through_pixel_centers():
    """A ray through pixel (i,j) with identity pose must pass through the
    img2cam-unprojected pixel center on the d=1 plane."""
    opt = _opt()
    B = 2
    p = camera.pose(R=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)))
    intr = camera.get_intr(opt, jnp.ones((B,)))
    center, ray = camera.get_center_and_ray(opt, p, intr=intr)
    assert center.shape == (B, 1, 3) and ray.shape == (B, 64, 3)
    # identity pose, zero translation: center at origin
    np.testing.assert_allclose(np.asarray(center), 0.0, atol=1e-6)
    # ray z-component == 1 (image plane at depth 1)
    np.testing.assert_allclose(np.asarray(ray[..., 2]), 1.0, atol=1e-5)
    # pixel (0,0) center maps to ((0.5 - W/2) / (f*W), ...)
    f = opt.camera.focal
    np.testing.assert_allclose(
        np.asarray(ray[0, 0, 0]), (0.5 - opt.W / 2) / (f * opt.W), atol=1e-6)


def test_sparse_ray_generation_matches_dense():
    opt = _opt()
    B, R = 2, 10
    key = jax.random.PRNGKey(0)
    Rm = rand_rotation(key, B)
    t = jax.random.normal(jax.random.PRNGKey(1), (B, 3))
    p = camera.pose(R=Rm, t=t)
    intr = camera.get_intr(opt, jnp.ones((B,)) * 1.1)
    ray_idx = jax.random.randint(jax.random.PRNGKey(2), (B, R), 0, opt.H * opt.W)
    center_d, ray_d = camera.get_center_and_ray(opt, p, intr=intr)
    center_s, ray_s = camera.get_center_and_ray(opt, p, intr=intr, ray_idx=ray_idx)
    gathered = jnp.take_along_axis(ray_d, ray_idx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(ray_s), np.asarray(gathered), atol=1e-5)
    np.testing.assert_allclose(np.asarray(center_s), np.asarray(center_d), atol=1e-5)


def test_sparse_ray_generation_orthographic():
    opt = _opt(model="orthographic")
    B, R = 2, 10
    p = camera.pose(R=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)))
    ray_idx = jax.random.randint(jax.random.PRNGKey(2), (B, R), 0, opt.H * opt.W)
    center_d, ray_d = camera.get_center_and_ray(opt, p)
    center_s, ray_s = camera.get_center_and_ray(opt, p, ray_idx=ray_idx)
    np.testing.assert_allclose(
        np.asarray(ray_s),
        np.asarray(jnp.take_along_axis(ray_d, ray_idx[..., None], axis=1)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(center_s),
        np.asarray(jnp.take_along_axis(center_d, ray_idx[..., None], axis=1)), atol=1e-5)


def test_transform_normal_preserves_norm():
    B = 3
    Rm = rand_rotation(jax.random.PRNGKey(11), B)
    t = jax.random.normal(jax.random.PRNGKey(12), (B, 3))
    p = camera.pose(R=Rm, t=t)
    n = jax.random.normal(jax.random.PRNGKey(13), (B, 17, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    n_t = camera.transform_normal(n, p)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(n_t, axis=-1)), 1.0, atol=1e-5)


def test_get_intr_values():
    opt = _opt()
    intr = camera.get_intr(opt, jnp.array([1.0, 2.0]))
    assert intr.shape == (2, 3, 3)
    np.testing.assert_allclose(np.asarray(intr[0, 0, 0]), 4 * opt.W)
    np.testing.assert_allclose(np.asarray(intr[1, 1, 1]), 8 * opt.H)
    np.testing.assert_allclose(np.asarray(intr[:, 2, 2]), 1.0)
