"""Augmentation apply path (reference `data/base.py:41-68`,
`data/pix3d.py:317-326`): every generated knob (color jitter, hflip,
crop_ratio, rot_angle) must be effective on the loaded maps, with ray-index
and pose consistency."""

import os
import sys

import numpy as np
import pytest

from shapeclipper_tpu.config import options
from shapeclipper_tpu.data import base, synthetic
from shapeclipper_tpu.utils.easydict import EasyDict as edict

sys.path.insert(0, os.path.dirname(__file__))
from test_pix3d_data import pix3d_root, _opt  # noqa: E402,F401 (fixture reuse)
from shapeclipper_tpu.data import pix3d  # noqa: E402


def _noop_aug(**over):
    aug = dict(brightness=1.0, contrast=1.0, saturation=1.0, hue=0.0,
               flip=False, crop_ratio=1.0, rot_angle=0.0)
    aug.update(over)
    return aug


def _maps(rng, H=16, W=16):
    rgb = rng.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W, 1), np.float32)
    mask[3:12, 5:14] = 1.0
    n = rng.randn(H, W, 3).astype(np.float32)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    return rgb, mask * 0 + mask, n * mask


class _Host(base.Dataset):
    def __init__(self):
        self.opt = None
        self.split = "train"
        self.augment = True


def test_hflip_exact():
    rng = np.random.RandomState(0)
    rgb, mask, normal = _maps(rng)
    opt = edict(data=edict(bgcolor=1))
    ds = _Host()
    r2, m2, n2 = ds.apply_augmentation(opt, rgb, mask, normal,
                                       _noop_aug(flip=True))
    np.testing.assert_allclose(r2, rgb[:, ::-1], atol=1e-6)
    np.testing.assert_allclose(m2, mask[:, ::-1], atol=1e-6)
    np.testing.assert_allclose(n2[..., 0], -normal[:, ::-1, 0], atol=1e-6)
    np.testing.assert_allclose(n2[..., 1:], normal[:, ::-1, 1:], atol=1e-6)


def test_rot90_impulse():
    """A 90-degree rotation maps content exactly one quarter turn."""
    H = W = 15
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[7, 11] = 1.0  # right of center
    out = base._warp_rot_zoom(rgb, np.deg2rad(90.0), 1.0, 0.0)
    peak = np.unravel_index(np.argmax(out[..., 0]), (H, W))
    # output pixel p samples input at c + R(90)(p-c); the impulse at
    # (7, 11) = c + (0, +4) appears where (p-c) satisfies R@(p-c) = (0, 4)
    # -> p-c = (4, 0) -> p = (11, 7)
    assert peak == (11, 7), peak
    assert out[..., 0].max() > 0.99


def test_zoom_out_shrinks_mask():
    rng = np.random.RandomState(1)
    rgb, mask, normal = _maps(rng)
    opt = edict(data=edict(bgcolor=1))
    ds = _Host()
    r2, m2, n2 = ds.apply_augmentation(opt, rgb, mask, normal,
                                       _noop_aug(crop_ratio=1.5))
    assert m2.sum() < mask.sum()
    assert set(np.unique(m2)) <= {0.0, 1.0}
    # background fill is bgcolor
    assert r2[0, 0, 0] == pytest.approx(1.0, abs=1e-5)
    fg = n2[m2[..., 0] == 1]
    if len(fg):
        np.testing.assert_allclose(np.linalg.norm(fg, axis=-1), 1.0,
                                   atol=1e-3)


def test_augment_pose_flip_is_azim_theta_negation():
    from shapeclipper_tpu import camera
    import jax.numpy as jnp
    a, e, t = 0.7, 0.3, -0.4
    def R_of(a_, e_, t_):
        Ry = np.asarray(camera.azim_to_rotation_matrix(jnp.array([a_]), "rad"))[0]
        Rx = np.asarray(camera.elev_to_rotation_matrix(jnp.array([e_]), "rad"))[0]
        Rz = np.asarray(camera.roll_to_rotation_matrix(jnp.array([t_]), "rad"))[0]
        return Rz @ Rx @ Ry
    pose = np.concatenate([R_of(a, e, t),
                           np.array([[0.0], [0.0], [2.0]], np.float32)], 1)
    ds = _Host()
    flipped = ds.augment_pose(pose, _noop_aug(flip=True))
    np.testing.assert_allclose(flipped[:, :3], R_of(-a, e, -t), atol=1e-6)
    np.testing.assert_allclose(flipped[:, 3], pose[:, 3], atol=1e-6)


def _augment_all():
    return edict(brightness=0.2, contrast=0.2, saturation=0.2, hue=0.05,
                 hflip=True, crop_scale=0.2, rotate=15)


def test_pix3d_augmented_samples_consistent(pix3d_root):  # noqa: F811
    opt = _opt(pix3d_root)
    opt.data.augment = _augment_all()
    ds = pix3d.Dataset(opt, split="train")
    s = ds[1]
    # structure intact
    assert s["rgb_input_map"].shape == (32, 32, 3)
    assert set(np.unique(s["mask_input_map"])) <= {0.0, 1.0}
    # ray samples drawn from the augmented maps
    np.testing.assert_allclose(
        s["mask_input"],
        s["mask_input_map"].reshape(-1, 1)[s["ray_idx"]])
    np.testing.assert_allclose(
        s["rgb_input"], s["rgb_input_map"].reshape(-1, 3)[s["ray_idx"]])
    # deterministic under the per-sample rng
    s2 = ds[1]
    np.testing.assert_allclose(s2["rgb_input_map"], s["rgb_input_map"])
    np.testing.assert_allclose(s2["pose_gt"], s["pose_gt"])


def test_pix3d_augment_preselect_ray_consistency(pix3d_root):  # noqa: F811
    """The preselect-NN path draws neighbor ray indices from the augmented
    mask BEFORE the full load — indices must match the final maps."""
    opt = _opt(pix3d_root)
    opt.data.augment = _augment_all()
    opt.data.preselect_NN = True
    opt.reg.n_views = 2
    ds = pix3d.Dataset(opt, split="train")
    s = ds[2]
    V = opt.reg.n_views
    assert s["rgb_input_map_NN"].shape[0] == V
    for v in range(V):
        np.testing.assert_allclose(
            s["mask_input_NN"][v],
            s["mask_input_map_NN"][v].reshape(-1, 1)[s["ray_idx_NN"][v]])


def test_synthetic_augmented_loader_batches():
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/synthetic/config.yaml"))
    opt.update(image_size=[16, 16], batch_size=2, seed=0)
    opt.H, opt.W = opt.image_size
    opt.data.num_workers = 0
    opt.data.max_img_cat = 4
    opt.data.augment = _augment_all()
    opt.render.rand_sample = 16
    ds = synthetic.Dataset(opt, split="train")
    batch = next(iter(ds.setup_loader(opt, shuffle=True)))
    assert batch["rgb_input_map"].shape == (2, 16, 16, 3)
    assert batch["ray_idx"].shape == (2, 16)
    np.testing.assert_allclose(
        batch["mask_input"][0],
        batch["mask_input_map"][0].reshape(-1, 1)[batch["ray_idx"][0]])
    # color jitter / warp actually changed the pixels vs augment-off
    opt2 = opt.deepcopy()
    opt2.data.augment = None
    ds2 = synthetic.Dataset(opt2, split="train")
    raw = ds2[0]["rgb_input_map"]
    augd = ds[0]["rgb_input_map"]
    assert np.abs(raw - augd).max() > 1e-3
