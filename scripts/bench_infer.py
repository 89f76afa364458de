"""Single-image inference (serving) latency: image -> SDF grid -> mesh.

Measures the steady-state per-image latency of the `infer.py` pipeline
(reference has no standalone inference path; its reconstructions go through
`model/runner.py:468-503` dataset dumps):

  1. forward  — encoder + estimator + eval-image render (device) and the
                dense SDF grid eval (device), one fused dispatch chain,
                timed to a host fetch of the level grid (honest through the
                axon tunnel, where block_until_ready does not block).
  2. mesh     — host marching tetrahedra on the fetched grid (world units).

    python scripts/bench_infer.py [n_iters] [vox_res ...]

Prints one JSON line per vox_res with median/mean ms per stage.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from shapeclipper_tpu.config import options  # noqa: E402
from shapeclipper_tpu.utils.easydict import EasyDict as edict  # noqa: E402


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    vox_list = [int(v) for v in sys.argv[2:]] or [64, 100]

    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/pix3d/config.yaml"))
    opt.H, opt.W = opt.image_size
    tmp = "/tmp/scl_bench_infer"
    os.makedirs(tmp, exist_ok=True)
    opt.update(batch_size=1, max_epoch=1, output_path=tmp, seed=0,
               resume=False, tb=None, load=None)
    opt.data.update(dataset="synthetic", num_workers=0, k_nearest=2,
                    max_img_cat=2)
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.eval.update(batch_size=1, n_vis=0)

    from shapeclipper_tpu.eval3d import isosurface
    from shapeclipper_tpu.train.trainer import Runner

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    runner = Runner(opt)
    runner.build_networks(opt)
    runner.setup_optimizer(opt)
    runner.restore_checkpoint(opt)

    rng = np.random.default_rng(0)
    rgb = rng.random((1, opt.H, opt.W, 3), dtype=np.float32)
    mask = (rng.random((1, opt.H, opt.W, 1)) > 0.3).astype(np.float32)
    range_min, range_max = opt.eval.range

    for vox in vox_list:
        opt.eval.vox_res = vox
        runner.graph_eval.opt.eval.vox_res = vox
        # vox_res is a closure constant of the jitted fwd+grid program (not
        # a traced input), so rebuild the jits for each grid resolution
        runner.setup_optimizer(opt)
        var0 = edict(idx=np.array([0]),
                     rgb_input_map=jax.numpy.asarray(rgb),
                     mask_input_map=jax.numpy.asarray(mask))
        fwd_ms, mesh_ms, n_faces = [], [], 0
        for i in range(n_iters + 2):            # 2 warmup/compile iters
            t0 = time.perf_counter()
            _, level = runner._eval_forward_and_grid(
                runner.params, runner.batch_stats, var0)
            grid = np.asarray(jax.device_get(level))[0]   # host fetch
            t1 = time.perf_counter()
            mesh = isosurface.marching_cubes_world(grid, range_min,
                                                   range_max)
            t2 = time.perf_counter()
            if i >= 2:
                fwd_ms.append((t1 - t0) * 1e3)
                mesh_ms.append((t2 - t1) * 1e3)
            n_faces = len(mesh.faces)
        tot = np.asarray(fwd_ms) + np.asarray(mesh_ms)
        print(json.dumps({
            "metric": "single_image_infer_latency",
            "vox_res": vox, "iters": n_iters, "n_faces": int(n_faces),
            "forward_grid_ms_median": round(float(np.median(fwd_ms)), 2),
            "mesh_ms_median": round(float(np.median(mesh_ms)), 2),
            "total_ms_median": round(float(np.median(tot)), 2),
            "total_ms_mean": round(float(np.mean(tot)), 2),
            "images_per_sec": round(1e3 / float(np.median(tot)), 2),
            "device": jax.devices()[0].device_kind,
        }))


if __name__ == "__main__":
    main()
