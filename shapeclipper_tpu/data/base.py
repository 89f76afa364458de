"""Dataset base + host-side batch loader.

The reference uses torch DataLoader worker processes + DistributedSampler
(reference `data/base.py:16-30`). TPU-native replacement: a single-controller
thread-pool loader producing stacked numpy batches; multi-host sharding slices
the index space by (shard_id, num_shards) (jax.process_index/count) instead of
a DistributedSampler.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(samples):
    """Stack a list of dict samples (values: np arrays / scalars / dicts)."""
    out = {}
    for key in samples[0]:
        v0 = samples[0][key]
        if isinstance(v0, dict):
            out[key] = default_collate([s[key] for s in samples])
        else:
            out[key] = np.stack([np.asarray(s[key]) for s in samples], axis=0)
    return out


class Dataset:
    def __init__(self, opt, split):
        self.opt = opt.deepcopy() if hasattr(opt, "deepcopy") else opt
        self.split = split
        self.augment = (split == "train" and opt.data.get("augment"))

    # ------------------------------------------------------ augmentation
    def generate_augmentation(self, opt, rng=None):
        """Per-sample augmentation parameters (reference
        `data/base.py:41-58`): color jitter ranges, horizontal flip, crop
        ratio, rotation angle."""
        rng = rng or np.random
        aug = opt.data.augment
        return dict(
            brightness=1 + (rng.rand() * 2 - 1) * (aug.get("brightness") or 0),
            contrast=1 + (rng.rand() * 2 - 1) * (aug.get("contrast") or 0),
            saturation=1 + (rng.rand() * 2 - 1) * (aug.get("saturation") or 0),
            hue=(rng.rand() * 2 - 1) * (aug.get("hue") or 0),
            flip=bool(rng.randn() > 0) if aug.get("hflip") else False,
            crop_ratio=(1 + (rng.rand() * 2 - 1) * aug.crop_scale
                        if aug.get("crop_scale") else 1),
            rot_angle=((rng.rand() * 2 - 1) * aug.rotate
                       if aug.get("rotate") else 0),
        )

    def apply_color_jitter(self, rgb, aug):
        """rgb: [H, W, 3] float in [0,1] -> jittered (brightness/contrast/
        saturation/hue), host-side numpy."""
        x = np.asarray(rgb, np.float32)
        x = np.clip(x * aug["brightness"], 0, 1)
        mean = x.mean(axis=(0, 1), keepdims=True)
        x = np.clip((x - mean) * aug["contrast"] + mean, 0, 1)
        grey = x.mean(axis=-1, keepdims=True)
        x = np.clip((x - grey) * aug["saturation"] + grey, 0, 1)
        if aug["hue"]:
            # cheap hue rotation via channel roll interpolation
            rolled = np.roll(x, 1, axis=-1)
            t = abs(aug["hue"])
            x = np.clip((1 - t) * x + t * rolled, 0, 1)
        return x

    def __len__(self):
        return len(self.list)

    def __getitem__(self, idx):
        raise NotImplementedError

    def setup_loader(self, opt, shuffle=False, drop_last=True, batch_size=None,
                     shard_id=0, num_shards=1, seed=0):
        batch_size = batch_size or opt.batch_size
        return DataLoader(self, batch_size=batch_size, shuffle=shuffle,
                          drop_last=drop_last,
                          num_workers=opt.data.get("num_workers", 4) or 0,
                          shard_id=shard_id, num_shards=num_shards, seed=seed)


def select_nn_views(opt, query_mask_sampled, nn_masks_sampled, rng):
    """Host-side IoU-weighted sampling (without replacement) of
    reg.n_views of the k neighbors — identical scoring to the in-graph
    selection (reference `model/graph.py:119-142`). With data.preselect_NN
    the pipeline loads/ships ONLY the selected views (the reference loads
    and uploads all k and selects on device)."""
    q = np.asarray(query_mask_sampled, np.float32).reshape(-1)
    ious = []
    for m in nn_masks_sampled:
        m = np.asarray(m, np.float32).reshape(-1)
        inter = (m * q).sum()
        union = (m + q - m * q + 1e-8).sum()
        ious.append(inter / union)
    scores = (1.0 - np.asarray(ious)) ** opt.reg.sample_temp
    total = scores.sum()
    if total <= 0:
        probs = np.full(len(ious), 1.0 / len(ious))
    else:
        probs = scores / total
    rng = rng or np.random
    return rng.choice(len(ious), size=opt.reg.n_views, replace=False, p=probs)


class DataLoader:
    """Epoch-based loader: shuffles indices, loads samples with a thread pool,
    prefetches collated batches on a background thread."""

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=True,
                 num_workers=4, shard_id=0, num_shards=1, seed=0,
                 prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(int(num_workers), 0)
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.seed = seed
        self.epoch = 0
        self.prefetch = prefetch

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _epoch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        idx = idx[self.shard_id::self.num_shards]
        return idx

    def __len__(self):
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        indices = self._epoch_indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        if self.num_workers == 0:
            for b in batches:
                yield default_collate([self.dataset[int(i)] for i in b])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__,
                                            [int(i) for i in b]))
                    q.put(default_collate(samples))
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
