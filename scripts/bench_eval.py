"""Eval-pipeline throughput: pipelined (host isosurface overlaps device) vs
serial (reference behavior) at the real eval configuration.

Runs Runner.evaluate on synthetic data with vox_res/num_points from the CLI
eval config (vox 100, 100k points) and reports samples/sec for
tpu.eval_pipeline = {false, true}. VERDICT round-2 item 4.

    python scripts/bench_eval.py [n_samples] [vox_res] [eval_batch] [modes]

eval_batch (default 4) sets eval.batch_size — larger batches amortize the
per-batch tunnel dispatch/fetch RTTs. modes='host' restricts the sweep to
the default host-isosurface pipelined configuration.
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from shapeclipper_tpu.config import options  # noqa: E402
from shapeclipper_tpu.train.trainer import Runner  # noqa: E402
from shapeclipper_tpu.utils.easydict import EasyDict as edict  # noqa: E402


def build_opt(tmp, n_samples, vox_res, eval_batch=4):
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/pix3d/config.yaml"))
    opt.H, opt.W = opt.image_size
    opt.update(batch_size=4, max_epoch=1, output_path=tmp, seed=0,
               resume=False, tb=None, load=None)
    opt.data.update(dataset="synthetic", num_workers=0, k_nearest=2,
                    max_img_cat=n_samples)
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.eval.update(batch_size=eval_batch, vox_res=vox_res,
                    num_points=100_000, n_vis=0)
    return opt


def main():
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    vox_res = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    eval_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    modes = sys.argv[4] if len(sys.argv) > 4 else "all"
    tmp = "/tmp/scl_bench_eval"
    os.makedirs(tmp, exist_ok=True)
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          "eval_batch:", eval_batch)

    opt = build_opt(tmp, n_samples, vox_res, eval_batch)
    runner = Runner(opt)
    runner.load_dataset(opt, eval_split="test")
    runner.build_networks(opt)
    runner.setup_optimizer(opt)
    runner.restore_checkpoint(opt)
    runner.viz_data = []

    results = {}
    # (device_isosurface, eval_pipeline); host+pipelined is the default
    combos = (((False, True),) if modes == "host"
              else ((True, True), (True, False), (False, True)))
    for dev_iso, pipelined in combos:
        opt.tpu.device_isosurface = dev_iso
        opt.tpu.eval_pipeline = pipelined
        # the finish path reads the eval graph's opt copy
        runner.graph_eval.opt.tpu.device_isosurface = dev_iso
        runner.evaluate(opt, ep=0, training=True)    # warmup/compile
        t0 = time.perf_counter()
        val = runner.evaluate(opt, ep=0, training=True)
        dt = time.perf_counter() - t0
        results[(dev_iso, pipelined)] = dt
        print(f"device_isosurface={dev_iso} eval_pipeline={pipelined}: "
              f"{dt:.2f}s for {n_samples} samples "
              f"= {n_samples / dt:.3f} samples/s (val {val:.4f})")
    if modes != "host":
        speedup = results[(True, False)] / results[(True, True)]
        host_vs_dev = results[(False, True)] / results[(True, True)]
        print(f"--> pipelined/serial {speedup:.2f}x, device/host isosurface "
              f"{host_vs_dev:.2f}x (vox {vox_res}, 100k pts)")


if __name__ == "__main__":
    main()
