"""Device marching tetrahedra + sampling vs the host isosurface path."""

import jax
import jax.numpy as jnp
import numpy as np

from shapeclipper_tpu.eval3d import device_isosurface, isosurface, metrics
from shapeclipper_tpu.utils.easydict import EasyDict as edict


def _bumpy_level(M=17, extent=0.6):
    g = np.linspace(-extent, extent, M).astype(np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    lv = (np.sqrt(X ** 2 + 1.4 * Y ** 2 + 0.7 * Z ** 2) - 0.42
          + 0.05 * np.sin(7 * X) * np.cos(5 * Y + 2 * Z))
    return lv.astype(np.float32)


def _numpy_mt_triangles(level):
    """Host triangle list via the pure-numpy fallback (bypass the native
    kernel so the comparison is against the correctness reference)."""
    from shapeclipper_tpu.eval3d import native
    orig = native.marching_tetrahedra
    native.marching_tetrahedra = lambda *a, **k: None  # force numpy fallback
    try:
        mesh = isosurface.marching_tetrahedra(level)
    finally:
        native.marching_tetrahedra = orig
    return mesh.vertices.reshape(-1, 3, 3)


def _sorted_tris(tris):
    flat = np.round(np.asarray(tris, np.float64).reshape(len(tris), 9), 5)
    order = np.lexsort(flat.T[::-1])
    return flat[order]


def test_triangle_set_matches_host():
    level = _bumpy_level(M=17)
    host = _numpy_mt_triangles(level)
    tris, valid = device_isosurface.triangles_for_tests(jnp.asarray(level))
    dev = np.asarray(tris)[np.asarray(valid)]
    assert dev.shape[0] == host.shape[0]
    np.testing.assert_allclose(_sorted_tris(dev), _sorted_tris(host),
                               atol=2e-5)


def test_triangle_areas_match_host():
    level = _bumpy_level(M=21)
    host = _numpy_mt_triangles(level)
    a, b, c = host[:, 0], host[:, 1], host[:, 2]
    host_total = 0.5 * np.linalg.norm(
        np.cross(b - a, c - a), axis=-1).sum()
    dev_total = float(jnp.sum(
        device_isosurface.triangle_areas(jnp.asarray(level))))
    np.testing.assert_allclose(dev_total, host_total, rtol=1e-4)


def test_triangle_set_matches_host_with_exact_ties():
    """Grid values exactly AT the isovalue exercise the strict `<` sign
    convention both paths share."""
    rng = np.random.RandomState(7)
    level = rng.randint(-2, 3, size=(11, 11, 11)).astype(np.float32)
    host = _numpy_mt_triangles(level)
    tris, valid = device_isosurface.triangles_for_tests(jnp.asarray(level))
    dev = np.asarray(tris)[np.asarray(valid)]
    assert dev.shape[0] == host.shape[0]
    np.testing.assert_allclose(_sorted_tris(dev), _sorted_tris(host),
                               atol=2e-5)


def test_empty_surface_returns_zeros():
    level = jnp.ones((9, 9, 9), jnp.float32)
    pts = device_isosurface.sample_level_surface(
        level, 128, -0.6, 0.6, jax.random.PRNGKey(0))
    assert pts.shape == (128, 3)
    np.testing.assert_array_equal(np.asarray(pts), 0.0)


def test_samples_lie_on_sphere_surface():
    M = 33
    g = np.linspace(-0.6, 0.6, M).astype(np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    level = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.5
    pts = device_isosurface.sample_level_surface(
        jnp.asarray(level), 4096, -0.6, 0.6, jax.random.PRNGKey(1))
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    # world-rescale convention shares the host's half-voxel offset; the
    # tolerance matches test_marching_tetrahedra_sphere_surface
    assert abs(r.mean() - 0.5) < 0.03
    assert np.abs(r - 0.5).max() < 0.08


def test_sampling_distribution_matches_host():
    """Device and host samplers draw from the same area-weighted
    distribution: first/second moments agree to sampling noise."""
    level = _bumpy_level(M=25)
    n = 20000
    dev = np.asarray(device_isosurface.sample_level_surface(
        jnp.asarray(level), n, -0.6, 0.6, jax.random.PRNGKey(2)))
    mesh = isosurface.marching_cubes_world(level, -0.6, 0.6)
    host = isosurface.sample_surface(mesh, n, rng=np.random.RandomState(3))
    np.testing.assert_allclose(dev.mean(0), host.mean(0), atol=5e-3)
    np.testing.assert_allclose(dev.std(0), host.std(0), atol=5e-3)
    np.testing.assert_allclose(dev.min(0), host.min(0), atol=2e-2)
    np.testing.assert_allclose(dev.max(0), host.max(0), atol=2e-2)


def test_batched_sampling_shape_and_determinism():
    lv = jnp.stack([jnp.asarray(_bumpy_level(M=13)),
                    jnp.ones((13, 13, 13), jnp.float32)])
    out1 = device_isosurface.sample_level_surface_batch(
        lv, 256, -0.6, 0.6, jax.random.PRNGKey(5))
    out2 = device_isosurface.sample_level_surface_batch(
        lv, 256, -0.6, 0.6, jax.random.PRNGKey(5))
    assert out1.shape == (2, 256, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[1]), 0.0)  # empty grid


def test_finish_device_vs_host_metrics(base_opt):
    """End-to-end eval_metrics_finish: the device-isosurface path and the
    host path agree on CD / F-score to sampling noise."""
    opt = base_opt.deepcopy()
    opt.eval.vox_res = 24
    opt.eval.num_points = 8192

    M = opt.eval.vox_res + 1
    level = jnp.asarray(_bumpy_level(M=M))[None]
    rng = np.random.RandomState(0)
    gt = rng.randn(1, 8192, 3).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True) / 0.45
    eye_pose = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1), (1, 3, 4))

    def run(device):
        opt.tpu = opt.get("tpu", edict())
        opt.tpu.device_isosurface = device
        var = edict(dpc_points=jnp.asarray(gt), pose=eye_pose,
                    pose_gt=eye_pose)
        acc, comp = metrics.eval_metrics_finish(
            opt, var, level, rng=np.random.RandomState(1), seed=1,
            need_meshes=device)  # exercise host-mesh extraction too
        return acc, comp, np.asarray(var.f_score), var

    acc_d, comp_d, f_d, var_d = run(True)
    acc_h, comp_h, f_h, _ = run(False)
    np.testing.assert_allclose(acc_d, acc_h, rtol=0.05, atol=2e-3)
    np.testing.assert_allclose(comp_d, comp_h, rtol=0.05, atol=2e-3)
    np.testing.assert_allclose(f_d, f_h, atol=0.05)
    # the device path still extracted host meshes for dumps
    assert var_d.mesh_pred[0].n_faces > 0
    assert var_d.dpc_pred.shape == (1, 8192, 3)
