import os

import numpy as np

from shapeclipper_tpu import vis
from shapeclipper_tpu.utils.easydict import EasyDict as edict


def _opt(tmp_path):
    return edict(output_path=str(tmp_path), tb=edict(num_images=[2, 4]))


def test_to_uint8_ranges():
    x = np.array([[[[-1.0, 0.0, 1.0]]]])
    out = vis.to_uint8(x, from_range=(-1, 1))
    np.testing.assert_array_equal(out[0, 0, 0], [0, 127, 255])


def test_heatmap_single_channel():
    x = np.random.rand(2, 8, 8, 1).astype(np.float32)
    rgb = vis._ensure_rgb(x)
    assert rgb.shape == (2, 8, 8, 3)


def test_image_grid():
    imgs = np.zeros((5, 4, 4, 3), np.uint8)
    grid = vis.image_grid(imgs, num_cols=4)
    assert grid.shape == (8, 16, 3)  # 2 rows x 4 cols


def test_draw_pose_axes_runs():
    img = np.zeros((32, 32, 3), np.uint8)
    pose = np.concatenate([np.eye(3), [[0], [0], [5.0]]], axis=1)
    out = vis.draw_pose_axes(img, pose)
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn


def test_dump_images_and_gifs(tmp_path):
    opt = _opt(tmp_path)
    imgs = np.random.rand(2, 8, 8, 3).astype(np.float32)
    masks = np.ones((2, 8, 8, 1), np.float32)
    vis.dump_images(opt, np.array([3, 7]), "test", imgs, masks=masks,
                    folder="d")
    assert os.path.exists(f"{tmp_path}/d/3_test.png")
    assert os.path.exists(f"{tmp_path}/d/7_test.png")
    frames = [np.random.rand(2, 8, 8, 3).astype(np.float32) for _ in range(3)]
    vis.dump_gifs(opt, np.array([3, 7]), "rot", frames, folder="d")
    assert os.path.exists(f"{tmp_path}/d/3_rot.gif")


def test_dump_pointclouds_compare(tmp_path):
    opt = _opt(tmp_path)
    pred = np.random.rand(1, 10, 3).astype(np.float32)
    gt = np.random.rand(1, 12, 3).astype(np.float32)
    vis.dump_pointclouds_compare(opt, np.array([1]), "pc", pred, gt,
                                 folder="d")
    path = f"{tmp_path}/d/1_pc.ply"
    assert os.path.exists(path)
    head = open(path, "rb").read(220).decode("ascii", errors="ignore")
    assert "element vertex 22" in head and "uchar red" in head


def test_draw_scale_text():
    img = np.zeros((32, 32, 3), np.uint8)
    out = vis.draw_scale_text(img, 1.234)
    assert out.sum() > 0


def test_tb_image_writes(tmp_path):
    class FakeTB:
        def __init__(self):
            self.calls = []

        def add_image(self, tag, img, step, dataformats):
            self.calls.append((tag, img.shape, step, dataformats))

    opt = _opt(tmp_path)
    tb = FakeTB()
    imgs = np.random.rand(3, 8, 8, 3).astype(np.float32)
    vis.tb_image(opt, tb, 5, "train", "panel", imgs)
    assert tb.calls[0][0] == "train/panel"
    assert tb.calls[0][3] == "HWC"


def test_scales_overlay_plumbed(tmp_path):
    """`scales=` flows through tb_image and dump_images (reference
    `utils/util_vis.py:17,26-27,54,59-60`)."""
    class FakeTB:
        def __init__(self):
            self.imgs = []

        def add_image(self, tag, img, step, dataformats):
            self.imgs.append(img)

    opt = _opt(tmp_path)
    tb = FakeTB()
    imgs = np.zeros((2, 32, 32, 3), np.float32)
    vis.tb_image(opt, tb, 0, "train", "panel", imgs, scales=np.array([1.0, 2.0]))
    assert tb.imgs[0].sum() > 0  # text was drawn on black images

    vis.dump_images(opt, np.array([0, 1]), "sc", imgs,
                    scales=np.array([0.5, 1.5]), folder="d")
    out = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(
        f"{tmp_path}/d/0_sc.png"))
    assert out.sum() > 0


def test_trainer_visualize_nn_panels(tmp_path):
    """The train-split visualize emits CLIP-NN input/recon panels when the
    var carries NN selections (reference `model/runner.py:449-459`)."""
    from shapeclipper_tpu.train.trainer import Runner
    from tests.test_train_step import tiny_opt

    class FakeTB:
        def __init__(self):
            self.tags = []

        def add_image(self, tag, img, step, dataformats):
            self.tags.append(tag)

        def add_scalar(self, *a, **k):
            pass

    opt = tiny_opt(tmp_path)
    opt.tb = edict(num_images=[2, 4])
    runner = Runner(opt)
    runner.tb = FakeTB()
    runner.graph = type("G", (), {"opt": opt})()

    B, K, H, W = 2, 3, 8, 8
    var = edict(
        rgb_input_map=np.random.rand(B, H, W, 3).astype(np.float32),
        mask_input_map=np.ones((B, H, W, 1), np.float32),
        rgb_input_map_NN=np.random.rand(B, K, H, W, 3).astype(np.float32),
        mask_input_map_NN=np.ones((B, K, H, W, 1), np.float32),
        idx_NN=np.array([[1], [2]]),
        pose_NN_0=np.tile(np.concatenate([np.eye(3), [[0], [0], [5.0]]], 1),
                          (B, 1, 1)).astype(np.float32),
        normal_input_map=np.random.rand(B, H, W, 3).astype(np.float32) * 2 - 1,
    )
    runner.visualize(opt, var, step=0, split="train")
    tags = set(runner.tags if hasattr(runner, "tags") else runner.tb.tags)
    for expect in ("train/image_input_map", "train/mask_input_map",
                   "train/image_input_map_NN_0", "train/mask_input_map_NN_0",
                   "train/normal_input_viewpoint_map"):
        assert expect in tags, (expect, tags)

    # recon NN maps -> recon panels
    var["rgb_recon_map_NN_0"] = np.random.rand(B, H, W, 3).astype(np.float32)
    var["mask_recon_map_NN_0"] = np.ones((B, H, W, 1), np.float32)
    runner.tb.tags.clear()
    runner.visualize(opt, var, step=1, split="train")
    assert "train/image_recon_map_NN_0" in runner.tb.tags
    assert "train/mask_recon_map_NN_0" in runner.tb.tags


def test_dump_results_nn_panels(tmp_path):
    """dump_results writes NN-view input/recon PNGs when the var carries NN
    maps (reference `model/runner.py:484-491`)."""
    from shapeclipper_tpu.train.trainer import Runner
    from tests.test_train_step import tiny_opt

    opt = tiny_opt(tmp_path)
    opt.reg.n_views = 1
    runner = Runner(opt)
    B, H, W = 2, 8, 8
    pose = np.tile(np.concatenate([np.eye(3), [[0], [0], [5.0]]], 1),
                   (B, 1, 1)).astype(np.float32)
    var = edict(
        idx=np.array([0, 1]),
        rgb_input_map=np.random.rand(B, H, W, 3).astype(np.float32),
        mask_input_map=np.ones((B, H, W, 1), np.float32),
        input_NN_0=edict(
            rgb_input_map=np.random.rand(B, H, W, 3).astype(np.float32),
            mask_input_map=np.ones((B, H, W, 1), np.float32)),
        pose_NN_0=pose,
        rgb_recon_map_NN_0=np.random.rand(B, H, W, 3).astype(np.float32),
        mask_recon_map_NN_0=np.ones((B, H, W, 1), np.float32),
    )
    runner.dump_results(opt, var, ep=1, train=True)
    for name in ("image_input_NN_0", "image_recon_NN_0"):
        assert os.path.exists(f"{opt.output_path}/vis_1/0_{name}.png"), name
        assert os.path.exists(f"{opt.output_path}/vis_1/1_{name}.png"), name


def test_vis_rotate_vis_nn_latent_selection(tmp_path):
    """vis_rotate(vis_NN=True) textures with the NN view's RGB latent
    (reference `model/runner.py:406,416`)."""
    import jax.numpy as jnp
    from shapeclipper_tpu.models.graph import Graph
    from shapeclipper_tpu.render.renderer import RenderOutputs
    from shapeclipper_tpu.train.trainer import Runner
    from tests.test_train_step import tiny_opt

    opt = tiny_opt(tmp_path)
    runner = Runner(opt)
    runner.graph = Graph(opt)
    opt_e = opt.deepcopy()
    opt_e.H, opt_e.W = 4, 4
    runner.graph_eval = Graph(opt_e)
    runner.params = {}

    seen = []

    def fake_render(params, pose, intr, scale_dist, proj_sdf, proj_rgb,
                    ray_idx, rng, training, **kw):
        seen.append(proj_rgb)
        B, R = pose.shape[0], opt_e.H * opt_e.W
        z = jnp.zeros((B, R, 3))
        return RenderOutputs(rgb=z, mask=z[..., :1], mask_hard=z[..., :1],
                             depth=z[..., :1], normal=z, grad_eikonal=None,
                             extras={})

    runner.graph_eval.render = fake_render
    var = edict(idx=np.array([0]), intr=jnp.eye(3)[None],
                scale_dist=jnp.ones((1,)),
                proj_latent_sdf=jnp.zeros((1, 64)),
                proj_latent_rgb=jnp.full((1, 64), 1.0),
                proj_latent_rgb_NN=jnp.full((1, 64), 2.0))
    runner.vis_rotate(opt, var, n_views=2, vis_NN=False)
    assert float(seen[-1][0, 0]) == 1.0
    runner.vis_rotate(opt, var, n_views=2, vis_NN=True)
    assert float(seen[-1][0, 0]) == 2.0
