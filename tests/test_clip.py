import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapeclipper_tpu.clipnn.annotator import Pix3DAnnotator
from shapeclipper_tpu.clipnn.vit import CLIPVisionTower, clip_preprocess
from shapeclipper_tpu.config import options
from shapeclipper_tpu.utils.easydict import EasyDict as edict


def test_vit_tower_shapes():
    tower = CLIPVisionTower(patch_size=8, width=64, layers=2, heads=4,
                            embed_dim=32)
    x = jnp.zeros((2, 32, 32, 3))
    params = tower.init(jax.random.PRNGKey(0), x)["params"]
    out = tower.apply({"params": params}, x)
    assert out.shape == (2, 32)
    assert params["positional_embedding"].shape == (17, 64)  # 16 patches + cls


def test_clip_preprocess_stats():
    rgb = np.full((4, 4, 3), 0.5, np.float32)
    out = clip_preprocess(rgb)
    assert out.shape == (4, 4, 3)
    # 0.5 normalized: (0.5 - mean)/std, known values
    np.testing.assert_allclose(out[0, 0, 0], (0.5 - 0.48145466) / 0.26862954,
                               rtol=1e-5)


def _anno_opt(tmp_path):
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/clip/pix3d.yaml"))
    opt.update(image_size=[32, 32], batch_size=4, seed=0,
               output_path=str(tmp_path), anno_root=str(tmp_path / "CLIP_NN"),
               k_nearest=3)
    opt.H, opt.W = opt.image_size
    opt.data.update(dataset="synthetic", num_workers=0, max_img_cat=8)
    opt.data.synthetic = edict(cat="synthetic")
    opt.clip = edict(model="vit_b32", weights=None)
    return opt


def test_annotator_end_to_end(tmp_path, monkeypatch):
    opt = _anno_opt(tmp_path)
    # shrink the tower for CPU speed
    from shapeclipper_tpu.clipnn import annotator as anno_mod
    monkeypatch.setattr(
        anno_mod.CLIPVisionTower, "from_name",
        staticmethod(lambda name, dtype=jnp.float32: CLIPVisionTower(
            patch_size=8, width=64, layers=2, heads=4, embed_dim=32)))
    ann = Pix3DAnnotator(opt)
    ann.load_dataset(opt)
    ann.compute_NN(opt)
    csv_path = os.path.join(opt.anno_root, "synthetic_train.csv")
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    # header: Query, Top_1, Top_2, Top_1_score, Top_2_score
    assert header[0] == "Query" and header[1] == "Top_1"
    assert len(header) == 1 + 2 * (opt.k_nearest - 1)
    assert len(body) == 8
    # sorted by query path
    assert body == sorted(body, key=lambda r: r[0])
    # scores parse as floats in [-1, 1]
    for row in body:
        for v in row[opt.k_nearest:]:
            assert -1.0001 <= float(v) <= 1.0001


def test_calc_matches_self_first(tmp_path):
    opt = _anno_opt(tmp_path)
    opt.thres = None
    ann = object.__new__(Pix3DAnnotator)  # skip tower init
    ann.opt = opt
    feats = np.random.RandomState(0).randn(10, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    idx, vals = Pix3DAnnotator.calc_matches(ann, opt, feats, k_nearest=3)
    np.testing.assert_array_equal(idx[:, 0], np.arange(10))
    np.testing.assert_allclose(vals[:, 0], 1.0, rtol=1e-5)
    # descending similarity
    assert (np.diff(vals, axis=1) <= 1e-5).all()
