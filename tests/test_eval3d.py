import jax
import jax.numpy as jnp
import numpy as np

from shapeclipper_tpu.eval3d import isosurface, metrics
from shapeclipper_tpu.utils.easydict import EasyDict as edict


def _sphere_level(N=32, radius=0.5, extent=0.6):
    grid = np.linspace(-extent, extent, N)
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    return np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - radius


def test_marching_tetrahedra_sphere_surface():
    N = 48
    level = _sphere_level(N)
    mesh = isosurface.marching_cubes_world(level, -0.6, 0.6)
    assert mesh.n_faces > 100
    # all vertices near the radius-0.5 sphere
    r = np.linalg.norm(mesh.vertices, axis=-1)
    # (the reference rescale convention has a half-voxel offset; tolerance
    # covers it at this resolution)
    assert abs(np.mean(r) - 0.5) < 0.03
    assert np.abs(r - 0.5).max() < 0.08


def test_marching_tetrahedra_empty_and_full():
    level = np.ones((8, 8, 8), np.float32)  # all outside
    mesh = isosurface.marching_tetrahedra(level)
    assert mesh.n_faces == 0
    mesh = isosurface.marching_tetrahedra(-level)  # all inside
    assert mesh.n_faces == 0


def test_sample_surface_area_weighted():
    # single large triangle + tiny triangle: samples land mostly on the large
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [5, 5, 0], [5.01, 5, 0], [5, 5.01, 0]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    mesh = isosurface.Mesh(verts, faces)
    pts = isosurface.sample_surface(mesh, 1000, rng=np.random.RandomState(0))
    frac_near_origin = np.mean(pts[:, 0] < 2)
    assert frac_near_origin > 0.99
    # points lie in the triangle plane
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-6)


def test_write_ply_roundtrip_header(tmp_path):
    verts = np.random.rand(10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    path = str(tmp_path / "m.ply")
    isosurface.write_ply(path, verts, faces)
    with open(path, "rb") as f:
        head = f.read(200).decode("ascii", errors="ignore")
    assert "element vertex 10" in head and "element face 1" in head


def test_compute_fscore():
    d1 = jnp.array([[0.001, 0.02, 0.5]])
    d2 = jnp.array([[0.005, 0.009, 0.9]])
    f = metrics.compute_fscore(d1, d2, [0.01, 1.0])
    # t=0.01: P=1/3, R=2/3 -> F=2*(1/3)(2/3)/(1) = 4/9
    np.testing.assert_allclose(float(f[0, 0]), 4 / 9, rtol=1e-5)
    np.testing.assert_allclose(float(f[0, 1]), 1.0, rtol=1e-6)
    # nan -> 0
    f0 = metrics.compute_fscore(jnp.ones((1, 4)), jnp.ones((1, 4)), [0.1])
    assert float(f0[0, 0]) == 0.0


def test_normalize_pc():
    pc = jnp.array([[[0.0, 0, 0], [2, 0, 0], [0, 4, 1]]])
    out = np.asarray(metrics.normalize_pc(pc))
    # zero mean
    np.testing.assert_allclose(out.mean(1), 0.0, atol=1e-6)
    # max xy extent == 1
    ext = max(out[0, :, 0].max() - out[0, :, 0].min(),
              out[0, :, 1].max() - out[0, :, 1].min())
    np.testing.assert_allclose(ext, 1.0, rtol=1e-5)


def test_dense_grid_eval_matches_direct(base_opt):
    opt = base_opt.deepcopy()
    opt.eval.vox_res = 16
    from shapeclipper_tpu.models.implicit import SDFNetwork
    net = SDFNetwork()
    pts0 = jnp.zeros((1, 4, 3))
    lat0 = jnp.zeros((1, 4, 64))
    params = net.init(jax.random.PRNGKey(0), pts0, lat0)["params"]
    latent = jax.random.normal(jax.random.PRNGKey(1), (2, 64)) * 0.1
    level = metrics.compute_level_grid(opt, net.apply, params, latent)
    assert level.shape == (2, 17, 17, 17)
    # spot check against direct evaluation
    pts = metrics.dense_grid_points(opt).reshape(-1, 3)
    direct = net.apply(
        {"params": params}, pts[None],
        jnp.broadcast_to(latent[0][None, None], (1, pts.shape[0], 64)))[..., 0]
    np.testing.assert_allclose(np.asarray(level[0]).reshape(-1),
                               np.asarray(direct[0]), atol=1e-5)


def test_eval_metrics_sphere_end_to_end(base_opt):
    """Analytic sphere SDF -> CD vs a sampled sphere cloud should be ~0."""
    opt = base_opt.deepcopy()
    opt.eval.vox_res = 32
    opt.eval.num_points = 4096

    import flax.linen as nn

    class AnalyticSphere(nn.Module):
        @nn.compact
        def __call__(self, pts, lat):
            sdf = jnp.linalg.norm(pts, axis=-1, keepdims=True) - 0.5
            return jnp.concatenate([sdf, jnp.zeros_like(pts)], axis=-1)

    net = AnalyticSphere()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 3)),
                      jnp.zeros((1, 1, 64))).get("params", {})

    # GT cloud: points on the same sphere
    rng = np.random.RandomState(0)
    gt = rng.randn(1, 4096, 3).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True) / 0.5

    eye_pose = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1), (1, 3, 4))
    var = edict(proj_latent_sdf=jnp.zeros((1, 64)),
                dpc_points=jnp.asarray(gt),
                pose=eye_pose, pose_gt=eye_pose)
    acc, comp = metrics.eval_metrics(opt, var, net.apply, params,
                                     rng=np.random.RandomState(1))
    # clouds are normalized to unit XY extent; CD ~ grid resolution scale
    assert acc < 0.03 and comp < 0.03
    assert var.f_score.shape == (1, len(opt.eval.f_thresholds))
    # F-score at the loosest threshold ~ 1
    assert float(var.f_score[0, -1]) > 0.99
