"""Host input-pipeline throughput: can the loader feed the chip?

Builds a scaled on-disk Pix3D-layout fixture (256x256 PNGs, k_nearest=5),
then measures loader-only batches/s at the flagship shapes (batch 12,
image 224^2, 512 rays) across worker counts / worker types / preselect_NN.
The TPU step rate to sustain is BENCH (17.7 it/s on v5e as of r03).

Usage: python scripts/bench_loader.py [n_samples] [seconds_per_config]
Writes one JSON line per config; run on an otherwise idle host.
"""

import itertools
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
os.environ.setdefault("SCL_PLATFORM", "cpu")

import numpy as np
import PIL.Image

from shapeclipper_tpu.config import options
from shapeclipper_tpu.data import pix3d


def build_fixture(root, n, cat="chair", res=256, k=5):
    rng = np.random.RandomState(0)
    names = [f"{i:04d}" for i in range(n)]
    os.makedirs(f"{root}/lists", exist_ok=True)
    with open(f"{root}/lists/{cat}_train.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    for sub in (f"img_processed/{cat}", f"mask_processed/{cat}",
                f"normal_processed/{cat}", f"annotation/{cat}", "CLIP_NN"):
        os.makedirs(f"{root}/{sub}", exist_ok=True)
    for i, name in enumerate(names):
        img = (rng.rand(res, res, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(f"{root}/img_processed/{cat}/{name}.png")
        mask = np.zeros((res, res), np.uint8)
        mask[res // 5: 4 * res // 5, res // 4: 3 * res // 4] = 255
        PIL.Image.fromarray(mask, "L").save(
            f"{root}/mask_processed/{cat}/{name}.png")
        normal = (rng.rand(res, res, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(normal).save(
            f"{root}/normal_processed/{cat}/{name}.png")
        meta = dict(focal_length=35.0, rot_mat=np.eye(3).tolist(),
                    img=f"img/{cat}/{name}.png", mask=f"mask/{cat}/{name}.png",
                    model=f"model/{cat}/model_{name}/model.obj",
                    bbox=[0, 0, res, res])
        os.makedirs(f"{root}/pointclouds/{cat}/model_{name}", exist_ok=True)
        np.save(f"{root}/pointclouds/{cat}/model_{name}/model.npy",
                rng.randn(1024, 3).astype(np.float32))
        with open(f"{root}/annotation/{cat}/{name}.json", "w") as f:
            json.dump(meta, f)
    import csv
    with open(f"{root}/CLIP_NN/{cat}_train.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Query"] + [f"Top_{j}" for j in range(1, k + 1)]
                   + [f"Top_{j}_score" for j in range(1, k + 1)])
        for i, name in enumerate(names):
            nn = [f"{cat}/{names[(i + j) % n]}.png" for j in range(1, k + 1)]
            w.writerow([f"{cat}/{name}.png"] + nn + ["0.9"] * k)


def bench(opt, seconds):
    ds = pix3d.Dataset(opt, split="train")
    loader = ds.setup_loader(opt, shuffle=True)
    it = iter(loader)
    next(it)  # warm caches / pools
    t0, nb = time.perf_counter(), 0
    while time.perf_counter() - t0 < seconds:
        try:
            next(it)
        except StopIteration:
            loader.set_epoch(loader.epoch + 1)
            it = iter(loader)
            continue
        nb += 1
    dt = time.perf_counter() - t0
    return nb / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    tmp = tempfile.mkdtemp(prefix="scl_loaderbench_")
    build_fixture(tmp, n)

    opt = options.load_options(os.path.join(
        os.path.dirname(__file__), "..", "options/pix3d/config.yaml"))
    opt.H, opt.W = opt.image_size
    opt.data.root = tmp
    opt.batch_size = 12
    opt.seed = 0

    for preselect, wtype, workers in itertools.product(
            (False, True), ("thread", "process"), (4, 12)):
        o = opt.deepcopy()
        o.data.preselect_NN = preselect
        o.data.worker_type = wtype
        o.data.num_workers = workers
        bps = bench(o, seconds)
        print(json.dumps(dict(
            preselect_NN=preselect, worker_type=wtype, num_workers=workers,
            batch_size=o.batch_size, image=o.image_size, k_nearest=5,
            batches_per_s=round(bps, 3), samples_per_s=round(bps * 12, 2),
            cpus=os.cpu_count())), flush=True)


if __name__ == "__main__":
    main()
