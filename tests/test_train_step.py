import os

import jax
import numpy as np
import pytest

from shapeclipper_tpu.config import options
from shapeclipper_tpu.train.trainer import Runner
from shapeclipper_tpu.utils.easydict import EasyDict as edict


def tiny_opt(tmp_path, **over):
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/pix3d/config.yaml"))
    opt.update(
        image_size=[32, 32], batch_size=4, max_epoch=1,
        output_path=str(tmp_path), seed=0, resume=False, tb=None, load=None)
    opt.H, opt.W = opt.image_size
    opt.data.update(dataset="synthetic", num_workers=0, k_nearest=2,
                    max_img_cat=8)
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.render.update(rand_sample=64, n_samples_uniform=16)
    opt.reg.n_views = 1
    opt.eval.update(batch_size=2, image_size=[16, 16], vox_res=12,
                    num_points=512, n_vis=1, n_vis_classes=1)
    opt.freq.update(scalar=10000, vis=10000, save_vis=10000,
                    ckpt_latest=10000, eval=10000)
    opt.tpu.encoder_dtype = "float32"
    opt.tpu.implicit_dtype = "float32"
    opt.tpu.mesh = {"data": 1}
    for k, v in over.items():
        opt[k] = v
    return opt


@pytest.fixture(scope="module")
def trained_runner(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    opt = tiny_opt(tmp)
    runner = Runner(opt)
    runner.load_dataset(opt)
    runner.build_networks(opt)
    runner.setup_optimizer(opt)
    runner.restore_checkpoint(opt)
    return opt, runner


def test_train_iterations_decrease_loss(trained_runner):
    opt, runner = trained_runner
    runner.ep = 0
    runner.it = 0
    runner.best_val = np.inf
    from shapeclipper_tpu.train.trainer import _batch_to_var
    from shapeclipper_tpu import parallel
    losses = []
    runner.train_loader.set_epoch(0)
    from shapeclipper_tpu.utils.log import Timer
    runner.timer = Timer()
    for epoch in range(6):
        runner.train_loader.set_epoch(epoch)
        for batch in runner.train_loader:
            var = parallel.shard_batch(runner.mesh, _batch_to_var(batch))
            loss = runner.train_iteration(opt, var)
            losses.append(float(loss["all"]))
    assert all(np.isfinite(losses))
    # render/mask losses should drop over a few epochs of the tiny set
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    # all configured loss terms present
    for key in ("render", "mask", "normal", "eikonal", "cam_uniform",
                "cam_margin", "cam_sym", "nearest_img", "nearest_mask",
                "nearest_normal"):
        assert key in loss, key


def test_evaluate_end_to_end(trained_runner):
    opt, runner = trained_runner
    val = runner.evaluate(opt, ep=1, training=True)
    assert np.isfinite(val) and val > 0


def test_metric_forward_render_skip_matches(trained_runner):
    """render=False: no recon fields, and the pose/latents the metric path
    consumes are identical to the rendering forward's."""
    opt, runner = trained_runner
    from shapeclipper_tpu import parallel
    from shapeclipper_tpu.train.trainer import _batch_to_var
    batch = next(iter(runner.test_loader))
    var = parallel.shard_batch(runner.mesh, _batch_to_var(batch))
    full = runner.graph_eval.forward(runner.params, runner.batch_stats, var,
                                     rng=None, training=False,
                                     get_loss=False)[0]
    lean = runner.graph_eval.forward(runner.params, runner.batch_stats, var,
                                     rng=None, training=False,
                                     get_loss=False, render=False)[0]
    assert "rgb_recon" not in lean and "mask_recon" not in lean
    np.testing.assert_array_equal(np.asarray(full.pose),
                                  np.asarray(lean.pose))
    np.testing.assert_array_equal(np.asarray(full.proj_latent_sdf),
                                  np.asarray(lean.proj_latent_sdf))


def test_eval_reports_written(trained_runner, tmp_path):
    opt, runner = trained_runner
    runner.evaluate(opt, ep=1, training=False)
    assert os.path.exists(f"{opt.output_path}/cd_cat.txt")
    assert os.path.exists(f"{opt.output_path}/f_score.txt")
    assert os.path.exists(f"{opt.output_path}/chamfer.txt")
    with open(f"{opt.output_path}/f_score.txt") as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == len(opt.eval.f_thresholds)


def test_checkpoint_save_restore_roundtrip(trained_runner):
    opt, runner = trained_runner
    runner.save_checkpoint(opt, ep=1, it=5, best_val=1.0, latest=True)
    params_before = jax.device_get(runner.params)
    opt2 = opt.deepcopy()
    opt2.resume = True
    runner2 = Runner(opt2)
    runner2.load_dataset(opt2)
    runner2.build_networks(opt2)
    runner2.setup_optimizer(opt2)
    runner2.restore_checkpoint(opt2)
    params_after = jax.device_get(runner2.params)
    a = jax.tree_util.tree_leaves(params_before)
    b = jax.tree_util.tree_leaves(params_after)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    assert runner2.iter_start == 5


def test_vis_rotate(trained_runner):
    opt, runner = trained_runner
    from shapeclipper_tpu.train.trainer import _batch_to_var
    from shapeclipper_tpu import parallel
    batch = next(iter(runner.test_loader))
    var = parallel.shard_batch(runner.mesh, _batch_to_var(batch))
    var = runner._eval_forward(runner.params, runner.batch_stats, var)
    var = runner.vis_rotate(opt, var, n_views=3)
    assert len(var.rotating_imgs) == 3
    He, We = runner.graph_eval.opt.H, runner.graph_eval.opt.W
    assert var.rotating_imgs[0].shape == (2, He, We, 3)


def test_dump_results_normal_tail_and_vis_extras(trained_runner):
    """`dump_results` writes the normal_input_viewpoint / normal_input_canonical
    PNGs (reference `model/runner.py:477-480`), and viz batches run with
    visualize=True so the renderer's 200-ray sample extras are populated
    (reference `runner.py:352` + `renderer.py:179-182`)."""
    opt, runner = trained_runner
    from shapeclipper_tpu.train.trainer import _batch_to_var
    from shapeclipper_tpu import parallel

    batch = runner.viz_data[0]
    var = parallel.shard_batch(runner.mesh, _batch_to_var(batch),
                               allow_replicate=True)
    var = runner._eval_forward_vis(runner.params, runner.batch_stats, var)
    S = opt.render.n_samples_uniform
    B = np.asarray(var.idx).shape[0]
    n_rays = min(200, runner.graph_eval.opt.H * runner.graph_eval.opt.W)
    assert var.rendering_points.shape == (B, n_rays, S, 3)
    assert var.rendering_transparency.shape == (B, n_rays, S, 3)
    assert var.rendering_rgb.shape == (B, n_rays, S, 4)

    runner._dump_rotating_vis(opt, ep=99)
    folder = f"{opt.output_path}/vis_99"
    files = os.listdir(folder)
    assert any("normal_input_viewpoint" in f for f in files), files
    assert any("normal_input_canonical" in f for f in files), files


def test_forward_nn_per_view_latents(trained_runner):
    """forward_NN stores per-view NN RGB latents (proj_latent_rgb_NN_{v})
    plus the reference-parity last-view alias (`model/graph.py:199-200`)."""
    opt, runner = trained_runner
    import jax.numpy as jnp
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate

    ds = synthetic.Dataset(opt, split="train")
    batch = default_collate([ds[0], ds[1]])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})
    graph = runner.graph
    var, _, _ = graph.forward(
        jax.device_get(runner.params), jax.device_get(runner.batch_stats),
        batch, jax.random.PRNGKey(3), training=True, get_loss=False)
    for v in range(opt.reg.n_views):
        assert f"proj_latent_rgb_NN_{v}" in var
    last = opt.reg.n_views - 1
    np.testing.assert_array_equal(
        np.asarray(var.proj_latent_rgb_NN),
        np.asarray(var[f"proj_latent_rgb_NN_{last}"]))


def test_merged_nn_render_matches_sequential(tmp_path):
    """tpu.merge_nn_render batches query+NN views through ONE field
    evaluation; per-view outputs must equal separate render calls (checked
    at the renderer level, deterministic training=False), and the merged
    train step must produce the same loss structure as the sequential path."""
    import jax.numpy as jnp
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    from shapeclipper_tpu.models.graph import Graph, summarize_loss

    opt = tiny_opt(tmp_path)
    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params = state["params"]

    # renderer-level: one 2B call == two B calls (deterministic at eval)
    B, C = 2, 64
    from shapeclipper_tpu import camera
    rngk = jax.random.PRNGKey(1)
    azim = jax.random.uniform(rngk, (2 * B,), minval=-3.0, maxval=3.0)
    R = camera.azim_to_rotation_matrix(azim)
    t = jnp.tile(jnp.array([0.0, 0.0, opt.camera.dist]), (2 * B, 1))
    pose = camera.pose(R=R, t=t)
    intr = camera.get_intr(opt, jnp.ones(2 * B))
    scale = jnp.ones(2 * B)
    lat_s = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2 * B, C))
    lat_r = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (2 * B, C))
    merged = graph.render(params, pose, intr, scale, lat_s, lat_r, None,
                          None, training=False)
    for lo, hi in ((0, B), (B, 2 * B)):
        single = graph.render(params, pose[lo:hi], intr[lo:hi],
                              scale[lo:hi], lat_s[lo:hi], lat_r[lo:hi],
                              None, None, training=False)
        np.testing.assert_allclose(np.asarray(merged.rgb[lo:hi]),
                                   np.asarray(single.rgb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(merged.normal[lo:hi]),
                                   np.asarray(single.normal), atol=1e-4)

    # graph-level: merged vs sequential train forward — same keys, same loss
    # structure, losses in the same ballpark (RNG streams differ)
    ds = synthetic.Dataset(opt, split="train")
    batch = default_collate([ds[0], ds[1]])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})
    losses = {}
    for merge in (True, False):
        o = opt.deepcopy()
        o.tpu.merge_nn_render = merge
        g = Graph(o)
        var, loss, _ = g.forward(state["params"], state["batch_stats"],
                                 batch, jax.random.PRNGKey(7), training=True)
        loss = summarize_loss(o, loss)
        assert bool(loss.finite)
        assert var.grad_eikonal.shape == (2, 2 * o.render.rand_sample)
        for v in range(o.reg.n_views):
            assert f"rgb_recon_NN_{v}" in var
        losses[merge] = float(loss.all)
    assert abs(losses[True] - losses[False]) < 0.5 * (
        abs(losses[False]) + 1e-3)


def test_merged_encoders_match_sequential(tmp_path):
    """tpu.merge_encoders: ONE grouped-BN ResNet34 + ONE ResNet18 call per
    step must reproduce the sequential per-view formulation — poses, latents,
    per-view NN fields, every loss term, and the running-stats updates."""
    import jax.numpy as jnp
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    from shapeclipper_tpu.models.graph import Graph, summarize_loss

    # 64x64: at 32x32 the layer4 BN moments average only B samples (1x1
    # spatial) and amplify the env's conv-lowering noise (see test_group_bn)
    opt = tiny_opt(tmp_path)
    opt.update(image_size=[64, 64])
    opt.H, opt.W = opt.image_size
    ds = synthetic.Dataset(opt, split="train")
    batch = default_collate([ds[0], ds[1], ds[2], ds[3]])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})

    results = {}
    for merge in (True, False):
        o = opt.deepcopy()
        o.tpu.merge_encoders = merge
        o.tpu.merge_flip_estimator = merge  # off-arm: fully sequential
        g = Graph(o)
        state = g.init(jax.random.PRNGKey(0))
        var, loss, stats = g.forward(state["params"], state["batch_stats"],
                                     batch, jax.random.PRNGKey(7),
                                     training=True)
        loss = summarize_loss(o, loss)
        assert bool(loss.finite)
        results[merge] = (var, loss, stats)

    var_m, loss_m, stats_m = results[True]
    var_s, loss_s, stats_s = results[False]
    # proj_latent_rgb_NN_0 is excluded here: the 8-virtual-device env lowers
    # batch-(1+V)B and batch-B convs differently (~2e-6 on the latents) and
    # train-mode BN on the near-constant pooled latents of similar synthetic
    # images amplifies that input noise ~1e4x (intrinsic BN sensitivity, the
    # torch reference has it too). test_merged_encoders_exact_single_device
    # checks it strictly where convs are bit-exact.
    for key in ("pose", "intr", "scale_dist", "trig_azim", "trig_elev",
                "trig_theta", "proj_latent_sdf", "proj_latent_rgb",
                "idx_NN", "pose_NN_0", "scale_dist_NN_0"):
        np.testing.assert_allclose(np.asarray(var_m[key]),
                                   np.asarray(var_s[key]),
                                   rtol=1e-3, atol=1e-4, err_msg=key)
    # the flipped trigs only exist on the merged arm's flip group; compare
    # against the off-arm's in-loss separate call via the loss value instead
    for key in loss_m:
        if key in ("finite",):
            continue
        np.testing.assert_allclose(float(np.mean(np.asarray(loss_m[key]))),
                                   float(np.mean(np.asarray(loss_s[key]))),
                                   rtol=5e-3, atol=5e-4, err_msg=key)
    # stats of the latent-proj BNs sit downstream of the amplified latents;
    # the single-device test pins them at 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(stats_m),
                    jax.tree_util.tree_leaves(stats_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=2e-3)


def test_merged_encoders_exact_single_device(tmp_path):
    """Strict merged-vs-sequential parity (incl. proj_latent_rgb_NN_0) in a
    single-XLA-device subprocess, where concat-vs-slice convs are bit-exact
    and nothing masks a wiring bug."""
    import subprocess
    import sys

    script = r"""
import sys, tempfile
sys.path.insert(0, "tests")
import jax, jax.numpy as jnp, numpy as np
from test_train_step import tiny_opt
from shapeclipper_tpu.data import synthetic
from shapeclipper_tpu.data.base import default_collate
from shapeclipper_tpu.models.graph import Graph, summarize_loss
from shapeclipper_tpu.utils.easydict import EasyDict as edict
opt = tiny_opt(tempfile.mkdtemp())
opt.update(image_size=[64, 64]); opt.H, opt.W = opt.image_size
ds = synthetic.Dataset(opt, split="train")
batch = default_collate([ds[0], ds[1], ds[2], ds[3]])
batch = edict({k: jnp.asarray(v) for k, v in batch.items()})
results = {}
for merge in (True, False):
    o = opt.deepcopy()
    o.tpu.merge_encoders = merge
    o.tpu.merge_flip_estimator = merge
    g = Graph(o)
    state = g.init(jax.random.PRNGKey(0))
    var, loss, stats = g.forward(state["params"], state["batch_stats"],
                                 batch, jax.random.PRNGKey(7), training=True)
    results[merge] = (var, summarize_loss(o, loss), stats)
var_m, loss_m, stats_m = results[True]
var_s, loss_s, stats_s = results[False]
for key in ("pose", "intr", "scale_dist", "trig_azim", "trig_elev",
            "trig_theta", "proj_latent_sdf", "proj_latent_rgb", "idx_NN",
            "pose_NN_0", "scale_dist_NN_0", "proj_latent_rgb_NN_0",
            "rgb_recon", "mask_recon", "grad_eikonal", "rgb_recon_NN_0"):
    np.testing.assert_allclose(np.asarray(var_m[key]),
                               np.asarray(var_s[key]),
                               rtol=1e-5, atol=1e-5, err_msg=key)
for key in loss_m:
    if key == "finite":
        continue
    np.testing.assert_allclose(float(np.mean(np.asarray(loss_m[key]))),
                               float(np.mean(np.asarray(loss_s[key]))),
                               rtol=1e-5, atol=1e-6, err_msg=key)
for a, b in zip(jax.tree_util.tree_leaves(stats_m),
                jax.tree_util.tree_leaves(stats_s)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
print("SINGLE_DEVICE_PARITY_OK")
"""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["SCL_PLATFORM"] = "cpu"
    r = subprocess.run([sys.executable, "-c", script], cwd=os.path.join(
        os.path.dirname(__file__), ".."), env=env, capture_output=True,
        text=True, timeout=1200)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SINGLE_DEVICE_PARITY_OK" in r.stdout


def test_flip_merged_estimator_matches_separate(tmp_path):
    """tpu.merge_flip_estimator batches the query + horizontally-flipped
    estimator passes with PER-GROUP BN moments (GroupBatchNorm) — each half
    must match a separate call."""
    import jax.numpy as jnp
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    from shapeclipper_tpu.models.graph import Graph

    opt = tiny_opt(tmp_path)
    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params, stats = state["params"], state["batch_stats"]

    ds = synthetic.Dataset(opt, split="train")
    batch = default_collate([ds[0], ds[1], ds[2], ds[3]])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})

    var, _, _ = graph.forward(params, stats, batch, jax.random.PRNGKey(5),
                              training=True, get_loss=False)
    assert "trig_azim_flipped" in var

    # legacy separate calls (training-mode BN, per-call batch stats)
    est_q, _ = graph._apply_bn(graph.estimator, params["estimator"],
                               stats["estimator"], (batch.rgb_input_map,),
                               True, False)
    flipped = batch.rgb_input_map[:, :, ::-1, :]
    est_f, _ = graph._apply_bn(graph.estimator, params["estimator"],
                               stats["estimator"], (flipped,), True, False)
    # conv-BN reassociation over the doubled batch gives fp-noise-level
    # deltas amplified through the backbone — tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(var.trig_azim),
                               np.asarray(est_q.trig_azim), atol=5e-3)
    np.testing.assert_allclose(np.asarray(var.trig_azim_flipped),
                               np.asarray(est_f.trig_azim), atol=5e-3)
    np.testing.assert_allclose(np.asarray(var.trig_theta_flipped),
                               np.asarray(est_f.trig_theta), atol=5e-3)
    np.testing.assert_allclose(np.asarray(var.scale_dist),
                               np.asarray(est_q.scale_dist), atol=5e-3)


def test_evaluate_ragged_last_batch(tmp_path):
    """5 eval samples at eval.batch_size=2 -> the last batch is padded to the
    compiled shape and padded rows are excluded from metrics/reports."""
    opt = tiny_opt(tmp_path)
    opt.data.max_img_cat = 5
    runner = Runner(opt)
    runner.load_dataset(opt)
    runner.build_networks(opt)
    runner.setup_optimizer(opt)
    runner.restore_checkpoint(opt)
    val = runner.evaluate(opt, ep=1, training=False)
    assert np.isfinite(val)
    with open(f"{opt.output_path}/chamfer.txt") as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 5  # one per REAL sample, no padded duplicates
    with open(f"{opt.output_path}/cd_cat.txt") as f:
        cat_line = f.read().splitlines()[1].split()
    assert int(cat_line[3]) == 5  # per-category count excludes padding


def test_evaluate_dump_false_fast_path(tmp_path):
    """eval.dump=false: full eval takes the fused metric path — no dump/
    folder, no renders, no host meshes — while the metric value and the
    report artifacts (chamfer/cd_cat/f_score) match the dumping run."""
    opt = tiny_opt(tmp_path / "dump_on")
    opt.data.max_img_cat = 4
    runner = Runner(opt)
    runner.load_dataset(opt)
    runner.build_networks(opt)
    runner.setup_optimizer(opt)
    runner.restore_checkpoint(opt)
    val_dump = runner.evaluate(opt, ep=1, training=False)
    assert os.path.isdir(f"{opt.output_path}/dump")
    with open(f"{opt.output_path}/chamfer.txt") as f:
        chamfer_dump = f.read()

    opt2 = tiny_opt(tmp_path / "dump_off")
    opt2.data.max_img_cat = 4
    opt2.eval.dump = False
    runner2 = Runner(opt2)
    runner2.load_dataset(opt2)
    runner2.build_networks(opt2)
    runner2.setup_optimizer(opt2)
    runner2.restore_checkpoint(opt2)
    val_fast = runner2.evaluate(opt2, ep=1, training=False)
    assert not os.path.isdir(f"{opt2.output_path}/dump")
    assert os.path.exists(f"{opt2.output_path}/cd_cat.txt")
    assert os.path.exists(f"{opt2.output_path}/f_score.txt")
    # identical init (same seed) -> same metrics through either program
    np.testing.assert_allclose(val_fast, val_dump, rtol=1e-4)
    with open(f"{opt2.output_path}/chamfer.txt") as f:
        chamfer_fast = f.read()
    assert len(chamfer_fast.strip().splitlines()) == 4
    for line_a, line_b in zip(chamfer_dump.strip().splitlines(),
                              chamfer_fast.strip().splitlines()):
        ia, aa, ca = line_a.split()
        ib, ab, cb = line_b.split()
        assert ia == ib
        np.testing.assert_allclose(float(aa), float(ab), rtol=1e-3,
                                   atol=1e-6)
        np.testing.assert_allclose(float(ca), float(cb), rtol=1e-3,
                                   atol=1e-6)


def test_implicit_bf16_option(tmp_path):
    """tpu.implicit_dtype=bfloat16 runs and stays close to the f32 loss."""
    import jax
    import jax.numpy as jnp
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    from shapeclipper_tpu.models.graph import Graph, summarize_loss

    opt = tiny_opt(tmp_path)
    ds = synthetic.Dataset(opt, split="train")
    batch = default_collate([ds[0], ds[1]])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})

    losses = {}
    for dtype in ("float32", "bfloat16"):
        o = opt.deepcopy()
        o.tpu.implicit_dtype = dtype
        graph = Graph(o)
        state = graph.init(jax.random.PRNGKey(0))
        _, loss, _ = graph.forward(state["params"], state["batch_stats"],
                                   batch, jax.random.PRNGKey(1),
                                   training=True)
        loss = summarize_loss(o, loss)
        assert bool(loss.finite)
        losses[dtype] = float(loss.all)
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.15 * (
        abs(losses["float32"]) + 1e-3)


def test_train_visualize_nn_panels_integration(trained_runner):
    """train_iteration at a vis step writes CLIP-NN input panels from the
    live batch via the jit-step aux (idx_NN + pose_NN_v)."""
    opt, runner = trained_runner

    class FakeTB:
        def __init__(self):
            self.tags = []

        def add_image(self, tag, img, step, dataformats):
            self.tags.append(tag)

        def add_scalar(self, *a, **k):
            pass

    opt2 = opt.deepcopy()
    opt2.freq.vis = 1
    opt2.tb = edict(num_images=[2, 2])
    runner.tb = FakeTB()
    runner.it = 5  # past the camera phase
    from shapeclipper_tpu.train.trainer import _batch_to_var
    from shapeclipper_tpu import parallel
    from shapeclipper_tpu.utils.log import Timer
    runner.timer = Timer()
    runner.train_loader.set_epoch(0)
    batch = next(iter(runner.train_loader))
    var = parallel.shard_batch(runner.mesh, _batch_to_var(batch))
    runner.train_iteration(opt2, var)
    tags = set(runner.tb.tags)
    for expect in ("train/image_input_map", "train/image_input_map_NN_0",
                   "train/mask_input_map_NN_0"):
        assert expect in tags, (expect, tags)
    runner.tb = None
