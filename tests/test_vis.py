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
