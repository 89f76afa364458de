"""Convergence validation: train the full graph on the synthetic dataset for
a few hundred steps and verify losses decrease and eval Chamfer improves
over the initialization. Writes a JSON summary.

Run on TPU:  python scripts/validate_training.py [n_steps] [--seed=N]
             [--implicit_dtype=bfloat16] [--tag=name]

The seed/dtype flags drive the bf16-implicit A/B (VERDICT round-1 item 4).
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main(n_steps=300, seed=0, implicit_dtype=None, tag="", mesh=None,
         merge=None, fast=False):
    import numpy as np
    from shapeclipper_tpu.config import options
    from shapeclipper_tpu.train.trainer import Runner, _batch_to_var
    from shapeclipper_tpu import parallel
    from shapeclipper_tpu.utils.log import Timer, log

    opt = options.load_options("options/synthetic/config.yaml")
    opt.update(name="validate", seed=seed, resume=False, load=None, tb=None,
               batch_size=8, image_size=[64, 64], max_epoch=10 ** 6)
    if implicit_dtype:
        opt.tpu.implicit_dtype = implicit_dtype
    if mesh:
        opt.tpu.mesh = {"data": int(mesh)}
    if merge is not None:  # --merge=0 disables the batched render/estimator
        opt.tpu.merge_nn_render = bool(int(merge))
        opt.tpu.merge_flip_estimator = bool(int(merge))
        opt.tpu.merge_encoders = bool(int(merge))
    opt.H, opt.W = opt.image_size
    opt.data.update(max_img_cat=32, num_workers=2)
    opt.render.update(rand_sample=256, n_samples_uniform=32)
    opt.eval.update(batch_size=2, image_size=[32, 32], vox_res=32,
                    num_points=8192, n_vis=1)
    if fast:  # much cheaper steps/evals for single-core CPU A/B studies
        # (must come AFTER the standard-profile updates above, which would
        # otherwise overwrite it — round-3 advisor finding)
        opt.render.update(rand_sample=128, n_samples_uniform=16)
        # n_vis=0 skips the 50-view rotating-vis dumps per eval (the
        # dominant eval cost on a single-core host)
        opt.eval.update(vox_res=24, num_points=4096, n_vis=0)
        opt.data.update(max_img_cat=16, num_workers=0)
    opt.freq.update(scalar=10 ** 6, vis=10 ** 6, save_vis=10 ** 6,
                    ckpt_latest=10 ** 6, eval=10 ** 6)
    opt.output_path = f"output/validate{tag}"
    os.makedirs(opt.output_path, exist_ok=True)

    runner = Runner(opt)
    runner.load_dataset(opt)
    runner.build_networks(opt)
    runner.setup_optimizer(opt)
    runner.restore_checkpoint(opt)
    runner.best_val = np.inf
    runner.ep = 0
    runner.it = 0
    runner.timer = Timer()

    cd_init = runner.evaluate(opt, ep=0, training=True)
    losses = []
    step = 0
    while step < n_steps:
        runner.train_loader.set_epoch(step)
        for batch in runner.train_loader:
            var = parallel.shard_batch(runner.mesh, _batch_to_var(batch))
            loss = runner.train_iteration(opt, var)
            losses.append(float(loss["all"]))
            step += 1
            if step >= n_steps:
                break
    cd_final = runner.evaluate(opt, ep=1, training=True)

    summary = dict(
        steps=n_steps, seed=seed,
        implicit_dtype=str(os.environ.get("SCL_IMPLICIT_DTYPE")
                           or opt.tpu.get("implicit_dtype") or "float32"),
        loss_first10=float(np.mean(losses[:10])),
        loss_last10=float(np.mean(losses[-10:])),
        cd_init=float(cd_init),
        cd_final=float(cd_final),
        it_per_sec=runner.timer.it_per_sec,
    )
    print(json.dumps(summary, indent=2))
    with open(f"{opt.output_path}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    assert summary["loss_last10"] < summary["loss_first10"], "loss did not decrease"
    assert cd_final < cd_init, "chamfer did not improve"
    log.info("training convergence validated")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    main(int(args[0]) if args else 300, seed=int(kw.get("seed", 0)),
         implicit_dtype=kw.get("implicit_dtype"), tag=kw.get("tag", ""),
         mesh=kw.get("mesh"), merge=kw.get("merge"),
         fast=bool(int(kw.get("fast", "0"))))
