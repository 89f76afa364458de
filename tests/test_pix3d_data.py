"""Exercise the real Pix3D dataset code against a generated miniature
on-disk fixture (images/masks/normals/lists/annotations/pointclouds/CLIP-NN
CSVs in the exact layout the reference data loader expects)."""

import csv
import json
import os

import numpy as np
import PIL.Image
import pytest

from shapeclipper_tpu.config import options
from shapeclipper_tpu.data import pix3d
from shapeclipper_tpu.data.base import default_collate
from shapeclipper_tpu.utils.easydict import EasyDict as edict

N_SAMPLES = 6
CAT = "chair"


@pytest.fixture(scope="module")
def pix3d_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("Pix3D")
    rng = np.random.RandomState(0)
    names = [f"{i:04d}" for i in range(N_SAMPLES)]

    os.makedirs(root / "lists", exist_ok=True)
    for split in ("train", "val", "test"):
        with open(root / "lists" / f"{CAT}_{split}.txt", "w") as f:
            f.write("\n".join(names) + "\n")

    for sub in (f"img_processed/{CAT}", f"mask_processed/{CAT}",
                f"normal_processed/{CAT}", f"annotation/{CAT}",
                f"pointclouds/{CAT}", "CLIP_NN"):
        os.makedirs(root / sub, exist_ok=True)

    for i, name in enumerate(names):
        img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(
            root / "img_processed" / CAT / f"{name}.png")
        mask = np.zeros((48, 48), np.uint8)
        mask[10 + i:38, 12:40 - i] = 255
        PIL.Image.fromarray(mask, "L").save(
            root / "mask_processed" / CAT / f"{name}.png")
        normal = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(normal).save(
            root / "normal_processed" / CAT / f"{name}.png")
        # rotation: identity-ish with a small azimuth
        th = 0.1 * i
        R = [[np.cos(th), 0, np.sin(th)],
             [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]]
        meta = dict(
            focal_length=35.0,
            cam_position=[0.0, 0.0, 2.0],
            rot_mat=R,
            trans_mat=[0.0, 0.0, 2.0],
            img=f"img/{CAT}/{name}.png",
            mask=f"mask/{CAT}/{name}.png",
            model=f"model/{CAT}/model_{name}/model.obj",
            bbox=[0, 0, 48, 48],
        )
        with open(root / "annotation" / CAT / f"{name}.json", "w") as f:
            json.dump(meta, f)
        os.makedirs(root / "pointclouds" / CAT / f"model_{name}",
                    exist_ok=True)
        pc = rng.randn(256, 3).astype(np.float32)
        np.save(root / "pointclouds" / CAT / f"model_{name}" / "model.npy", pc)

    # CLIP-NN CSVs: neighbors = next entries cyclically
    k = 5
    for split in ("train", "val", "test"):
        with open(root / "CLIP_NN" / f"{CAT}_{split}.csv", "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(["Query"] + [f"Top_{j}" for j in range(1, k + 1)]
                       + [f"Top_{j}_score" for j in range(1, k + 1)])
            for i, name in enumerate(names):
                nn = [f"{CAT}/{names[(i + j) % N_SAMPLES]}.png"
                      for j in range(1, k + 1)]
                w.writerow([f"{CAT}/{name}.png"] + nn + ["0.9"] * k)
    return str(root)


def _opt(pix3d_root):
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/pix3d/config.yaml"))
    opt.update(image_size=[32, 32], batch_size=2, seed=0)
    opt.H, opt.W = opt.image_size
    opt.data.root = pix3d_root
    opt.data.num_workers = 0
    opt.data.k_nearest = 3
    # exercise the full-K NN stack path; preselect-on (the measured flagship
    # default) is covered by test_preselect_nn_views
    opt.data.preselect_NN = False
    opt.render.rand_sample = 64
    return opt


def test_pix3d_sample_schema(pix3d_root):
    opt = _opt(pix3d_root)
    ds = pix3d.Dataset(opt, split="train")
    assert len(ds) == N_SAMPLES
    s = ds[0]
    assert s["rgb_input_map"].shape == (32, 32, 3)
    assert s["mask_input_map"].shape == (32, 32, 1)
    assert s["normal_input_map"].shape == (32, 32, 3)
    assert s["rgb_input"].shape == (64, 3)
    assert s["ray_idx"].shape == (64,)
    assert s["pose_gt"].shape == (3, 4)
    assert s["intr"].shape == (3, 3)
    assert s["dpc_points"].shape == (256, 3)
    K = opt.data.k_nearest
    assert s["rgb_input_map_NN"].shape == (K, 32, 32, 3)
    assert s["ray_idx_NN"].shape == (K, 64)
    assert s["pose_gt_NN"].shape == (K, 3, 4)
    # quirk parity: neighbor poses repeat the query's pose
    np.testing.assert_allclose(s["pose_gt_NN"][0], s["pose_gt"])
    # mask binarized, background white
    assert set(np.unique(s["mask_input_map"])) <= {0.0, 1.0}
    bg = s["rgb_input_map"][s["mask_input_map"][..., 0] == 0]
    np.testing.assert_allclose(bg, 1.0, atol=1e-6)
    # normals unit length inside the mask
    fg = s["normal_input_map"][s["mask_input_map"][..., 0] == 1]
    np.testing.assert_allclose(np.linalg.norm(fg, axis=-1), 1.0, atol=1e-3)


def test_pix3d_eval_split_full_maps(pix3d_root):
    opt = _opt(pix3d_root)
    ds = pix3d.Dataset(opt, split="val")
    s = ds[0]
    # no ray subsampling at eval
    assert "ray_idx" not in s
    assert s["rgb_input"].shape == (32 * 32, 3)


def test_pix3d_ray_sampling_concentrates_near_boundary(pix3d_root):
    opt = _opt(pix3d_root)
    ds = pix3d.Dataset(opt, split="train")
    s = ds[0]
    mask = s["mask_input_map"][..., 0]
    from shapeclipper_tpu.data.sampling import boundary_distance
    dist = boundary_distance(mask > 0.5).reshape(-1)
    sampled_dist = dist[s["ray_idx"]].mean()
    assert sampled_dist < dist.mean()  # biased toward the boundary


def test_pix3d_train_step_runs(pix3d_root):
    import jax
    import jax.numpy as jnp
    from shapeclipper_tpu.models.graph import Graph, summarize_loss

    opt = _opt(pix3d_root)
    opt.render.n_samples_uniform = 8
    opt.reg.n_views = 1
    opt.tpu.encoder_dtype = "float32"
    opt.tpu.implicit_dtype = "float32"
    ds = pix3d.Dataset(opt, split="train")
    batch = default_collate([ds[0], ds[1]])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})
    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    _, loss, _ = graph.forward(state["params"], state["batch_stats"], batch,
                               jax.random.PRNGKey(1), training=True)
    loss = summarize_loss(opt, loss)
    assert bool(loss.finite)


def test_id_filename_mapping(pix3d_root, tmp_path):
    opt = _opt(pix3d_root)
    ds = pix3d.Dataset(opt, split="test")
    out = str(tmp_path / "data_list.txt")
    ds.id_filename_mapping(opt, out)
    lines = open(out).read().strip().splitlines()
    assert len(lines) == N_SAMPLES
    assert lines[0].split()[0] == "0"
    assert "img_processed" in lines[0]


def test_preselect_nn_views(pix3d_root):
    opt = _opt(pix3d_root)
    opt.data.preselect_NN = True
    opt.reg.n_views = 1
    ds = pix3d.Dataset(opt, split="train")
    s = ds[0]
    # only the selected view is loaded/stacked
    assert s["rgb_input_map_NN"].shape == (1, 32, 32, 3)
    assert s["ray_idx_NN"].shape == (1, 64)
    assert s["pose_gt_NN"].shape == (1, 3, 4)

    # graph consumes the preselected stack (K == n_views -> no resampling)
    import jax
    import jax.numpy as jnp
    from shapeclipper_tpu.data.base import default_collate
    from shapeclipper_tpu.models.graph import Graph, summarize_loss
    from shapeclipper_tpu.utils.easydict import EasyDict as edict
    opt.render.n_samples_uniform = 8
    opt.tpu.encoder_dtype = "float32"
    opt.tpu.implicit_dtype = "float32"
    batch = default_collate([ds[0], ds[1]])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})
    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    _, loss, _ = graph.forward(state["params"], state["batch_stats"], batch,
                               jax.random.PRNGKey(1), training=True)
    loss = summarize_loss(opt, loss)
    assert bool(loss.finite)
    assert "nearest_img" in loss


def _loader_batches(opt, pix3d_root, **data_over):
    o = opt.deepcopy()
    o.data.update(**data_over)
    ds = pix3d.Dataset(o, split="train")
    loader = ds.setup_loader(o, shuffle=True)
    return list(loader)


def test_worker_pools_match_serial(pix3d_root):
    """Thread- and process-pool loading must produce byte-identical batches
    to serial loading (per-sample RNG is index-seeded, so worker scheduling
    cannot change the data)."""
    opt = _opt(pix3d_root)
    serial = _loader_batches(opt, pix3d_root, num_workers=0)
    assert len(serial) == N_SAMPLES // opt.batch_size
    for wtype in ("thread", "process"):
        pooled = _loader_batches(opt, pix3d_root, num_workers=2,
                                 worker_type=wtype)
        assert len(pooled) == len(serial)
        for a, b in zip(serial, pooled):
            assert sorted(a) == sorted(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{wtype}:{k}")


def test_abandoned_iterator_shuts_pool_down(pix3d_root):
    """Dropping a loader iterator mid-epoch must unblock the producer so its
    worker pool shuts down (no leaked processes/threads)."""
    import threading
    import time
    opt = _opt(pix3d_root)
    opt.data.update(num_workers=2, worker_type="thread")
    ds = pix3d.Dataset(opt, split="train")
    loader = ds.setup_loader(opt, shuffle=False)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # triggers the generator's finally: stop + drain
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_preselect_distribution_prefers_low_iou(pix3d_root):
    """Selection probability must favor neighbors with LOW mask IoU to the
    query (score = (1 - iou)^temp), matching the in-graph sampler."""
    from shapeclipper_tpu.data.base import select_nn_views
    from shapeclipper_tpu.utils.easydict import EasyDict as edict
    opt = edict(reg=edict(sample_temp=4, n_views=1))
    q = np.ones(64, np.float32)
    similar = np.ones(64, np.float32)          # iou 1 -> score 0
    dissimilar = np.zeros(64, np.float32)      # iou 0 -> score 1
    rng = np.random.RandomState(0)
    picks = [select_nn_views(opt, q, [similar, dissimilar], rng)[0]
             for _ in range(20)]
    assert all(p == 1 for p in picks)
