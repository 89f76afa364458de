"""Multi-host plumbing tests (no cluster needed): the (shard_id, num_shards)
loader split replaces the reference's DistributedSampler (reference
`data/base.py:17-19`), and Runner.load_dataset wires jax.process_index/count
into it (reference divides the global batch per rank, `model/runner.py:35`).
"""

import os

import numpy as np
import pytest

from shapeclipper_tpu.config import options
from shapeclipper_tpu.utils.easydict import EasyDict as edict


def _synthetic_opt(tmp_path, n_items=16):
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/pix3d/config.yaml"))
    opt.update(image_size=[16, 16], batch_size=4, seed=0, resume=False,
               output_path=str(tmp_path), tb=None, load=None)
    opt.H, opt.W = opt.image_size
    opt.data.update(dataset="synthetic", num_workers=0, k_nearest=2,
                    max_img_cat=n_items)
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.render.update(rand_sample=16, n_samples_uniform=8)
    opt.tpu.mesh = {"data": 1}
    return opt


def _epoch_idx(loader, epoch):
    loader.set_epoch(epoch)
    idx = []
    for batch in loader:
        idx.extend(np.asarray(batch["idx"]).tolist())
    return idx


def test_loader_shard_split_disjoint_and_complete(tmp_path):
    from shapeclipper_tpu.data import synthetic
    opt = _synthetic_opt(tmp_path)
    ds = synthetic.Dataset(opt, split="train")
    n = len(ds)
    loaders = [ds.setup_loader(opt, shuffle=True, seed=3, batch_size=2,
                               shard_id=i, num_shards=2, drop_last=False)
               for i in range(2)]
    for epoch in (0, 1):
        a = _epoch_idx(loaders[0], epoch)
        b = _epoch_idx(loaders[1], epoch)
        assert not (set(a) & set(b)), "shards must be disjoint"
        assert sorted(a + b) == list(range(n)), "shards must cover the set"
    # different epochs reshuffle
    assert _epoch_idx(loaders[0], 0) != _epoch_idx(loaders[0], 1)


def test_runner_load_dataset_shards_by_process(tmp_path, monkeypatch):
    """With jax.process_count mocked to 2, each 'host' loads half the global
    batch from its own disjoint index shard."""
    import jax
    from shapeclipper_tpu.train.trainer import Runner

    opt = _synthetic_opt(tmp_path)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    loaders = {}
    for rank in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        runner = Runner(opt.deepcopy())
        runner.load_dataset(opt.deepcopy())
        loaders[rank] = runner.train_loader

    for rank in (0, 1):
        assert loaders[rank].batch_size == opt.batch_size // 2
        assert loaders[rank].num_shards == 2
        assert loaders[rank].shard_id == rank
    a = _epoch_idx(loaders[0], 0)
    b = _epoch_idx(loaders[1], 0)
    assert not (set(a) & set(b))
    assert len(a) == len(b)


def test_distributed_cli_flag_parses():
    opt_cmd = options.parse_arguments(["--distributed"])
    assert opt_cmd["distributed"] is True
    # train.py pops it before option merging, so it never hits the
    # unknown-key guard
    assert opt_cmd.pop("distributed", False) is True
