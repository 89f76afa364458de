"""CLIP nearest-neighbor annotator.

Port of the reference annotator (reference `CLIP_anno.py`): encode every
train/val/test image with the CLIP image tower, L2-normalize, take per-sample
cosine top-k (or threshold sampling), write sorted CSVs consumed at train
time by `data/pix3d.py:get_NN_anno`, plus a matplotlib contact sheet.

TPU-first: the O(N^2) per-sample python loop (reference `CLIP_anno.py:28-57`)
becomes ONE matmul + jax.lax.top_k on device.
"""

from __future__ import annotations

import csv
import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.log import log
from .vit import CLIPVisionTower, clip_preprocess, load_clip_npz


class NNAnnotator:
    def __init__(self, opt):
        self.opt = opt
        name = opt.get("clip", {}).get("model", "vit_l14")
        self.tower = CLIPVisionTower.from_name(name)
        rng = jax.random.PRNGKey(opt.seed or 0)
        dummy = jnp.zeros((1, opt.image_size[0], opt.image_size[1], 3))
        self.params = self.tower.init(rng, dummy)["params"]
        weights = opt.get("clip", {}).get("weights")
        if weights and os.path.exists(weights):
            log.info(f"loading CLIP weights from {weights}...")
            self.params = load_clip_npz(self.params, weights)
        else:
            log.warn("no CLIP weights found — running randomly initialized "
                     "(set clip.weights to a converted visual.* .npz)")
        self._encode = jax.jit(
            lambda p, x: self.tower.apply({"params": p}, x))

    # ---------------------------------------------------------------- encode
    def encode_split(self, opt, loader):
        feats = []
        for batch in loader:
            x = jnp.asarray(batch["rgb_input"])
            emb = self._encode(self.params, x)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            feats.append(np.asarray(emb))
        return np.concatenate(feats, axis=0)

    # --------------------------------------------------------------- matches
    def calc_matches(self, opt, features, k_nearest=6):
        """features: [N, D] L2-normalized. Returns (indices [N, k],
        values [N, k]); position 0 is self (reference `CLIP_anno.py:28-57`)."""
        f = jnp.asarray(features)
        sims = f @ f.T                                 # [N, N]
        if opt.get("thres") is None:
            values, indices = jax.lax.top_k(sims, k_nearest)
            return np.asarray(indices), np.asarray(values)
        # threshold mode: random k-1 among sims in [thres, 1), self first
        sims = np.asarray(sims)
        N = sims.shape[0]
        rng = np.random.RandomState(opt.seed or 0)
        indices, values = [], []
        for i in range(N):
            cand = np.nonzero((sims[i] >= opt.thres) & (sims[i] < 1.0))[0]
            if len(cand) < k_nearest - 1:
                order = np.argsort(-sims[i])[:k_nearest]
            else:
                pick = cand[rng.permutation(len(cand))[:k_nearest - 1]]
                order = np.concatenate([[i], pick])
            indices.append(order)
            values.append(sims[i][order])
        return np.stack(indices), np.stack(values)

    # ------------------------------------------------------------------ save
    def save_anno(self, opt, labels, index_topk, value_topk, split,
                  k_nearest=6):
        category_name = opt.data[opt.data.dataset].cat.replace(", ", "_")
        os.makedirs(opt.anno_root, exist_ok=True)
        csv_path = os.path.join(opt.anno_root,
                                f"{category_name}_{split}.csv")
        header = (["Query"]
                  + [f"Top_{i}" for i in range(1, k_nearest)]
                  + [f"Top_{i}_score" for i in range(1, k_nearest)])
        rows = []
        for i, label in enumerate(labels):
            row = [label]
            row += [labels[j] for j in index_topk[i][1:]]
            row += [f"{v:.4f}" for v in value_topk[i][1:]]
            rows.append(row)
        rows.sort(key=lambda r: r[0])
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
        return csv_path

    def save_vis(self, opt, image_paths, indices, values, split,
                 k_nearest=6, n_vis=15):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import PIL.Image
        N = len(image_paths)
        n_vis = min(n_vis, N)
        sample_id = [N // n_vis * i for i in range(n_vis)]
        plt.figure(figsize=(5 * k_nearest, 5 * n_vis))
        count = 1
        for i in sample_id:
            img = PIL.Image.open(image_paths[i]).convert("RGB")
            plt.subplot(n_vis, k_nearest, count)
            plt.imshow(img)
            plt.xticks([]); plt.yticks([])
            count += 1
            for j, index in enumerate(indices[i][1:]):
                img = PIL.Image.open(image_paths[index]).convert("RGB")
                plt.subplot(n_vis, k_nearest, count)
                plt.imshow(img)
                plt.title(f"{values[i, j + 1]:.3f}", fontweight="bold")
                plt.xticks([]); plt.yticks([])
                count += 1
        plt.tight_layout()
        out = os.path.join(opt.output_path, f"CLIP_NN_{split}.png")
        plt.savefig(out)
        plt.close()
        return out


class Pix3DAnnotator(NNAnnotator):
    def load_dataset(self, opt):
        data = importlib.import_module(
            f"shapeclipper_tpu.data.{opt.data.dataset}")
        self.datasets, self.loaders = {}, {}
        for split in ("train", "val", "test"):
            log.info(f"loading {split} data...")
            ds = data.Dataset(opt, split=split, transform=clip_preprocess)
            self.datasets[split] = ds
            self.loaders[split] = ds.setup_loader(
                opt, shuffle=False, drop_last=False)

    def compute_NN(self, opt):
        for split, loader in self.loaders.items():
            feats = self.encode_split(opt, loader)
            idx, vals = self.calc_matches(opt, feats,
                                          k_nearest=opt.k_nearest)
            ds = self.datasets[split]
            labels = getattr(ds, "rel_path_list",
                             [f"{c}/{n}.png" for c, n in ds.list])
            img_paths = getattr(ds, "img_path_list", None)
            self.save_anno(opt, labels, idx, vals, split,
                           k_nearest=opt.k_nearest)
            if img_paths:
                try:
                    self.save_vis(opt, img_paths, idx, vals, split,
                                  k_nearest=opt.k_nearest)
                except Exception as e:
                    log.warn(f"contact sheet failed: {e}")
