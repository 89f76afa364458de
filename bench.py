"""Benchmark: Pix3D training iterations/sec/chip on the flagship config.

Measures the steady-state jit'd train step (forward + all losses incl. the
CLIP-NN consistency branch + grad + Adam) at the reference's training
configuration (reference `options/pix3d/config.yaml`): global batch 12,
224x224 images, 512 rays/image, 64 samples/ray, ResNet34 encoder + ResNet18
viewpoint estimator, k_nearest=5, n_views=1. Synthetic image data is used so
the number is pure device throughput (the reference's host dataloader is
overlapped/prefetched in real training).

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
driver north star is ">=5x A100 training throughput"; we take an estimated
2.0 it/s for the PyTorch reference on one A100 at this config (double
-backward SDF rendering dominates) and report vs_baseline against the 5x
target-denominator of 2.0 it/s, i.e. vs_baseline = value / 2.0 — >=10 means
the 5x goal is met.

Prints ONE JSON line:
  {"metric": "pix3d_train_iters_per_sec_per_chip", "value": N,
   "unit": "it/s", "vs_baseline": N/2.0}
"""

import json
import os
import sys
import time

os.environ.setdefault("SCL_BENCH", "1")

ASSUMED_A100_REFERENCE_ITS = 2.0


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from shapeclipper_tpu.config import options
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    from shapeclipper_tpu.models.graph import Graph, summarize_loss
    from shapeclipper_tpu.train.pretrainer import make_optimizer
    from shapeclipper_tpu.utils.easydict import EasyDict as edict

    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "options/pix3d/config.yaml"))
    opt.H, opt.W = opt.image_size       # 224 x 224
    opt.data.dataset = "synthetic"
    opt.data.num_workers = 0
    opt.data.max_img_cat = opt.batch_size
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.seed = 0

    n_chips = len(jax.devices())
    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params, stats = state["params"], state["batch_stats"]
    tx = make_optimizer(opt, params, lambda p: True)
    opt_state = tx.init(params)

    ds = synthetic.Dataset(opt, split="train")
    batch = default_collate([ds[i] for i in range(opt.batch_size)])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})

    def step(params, stats, opt_state, batch, rng):
        def loss_fn(p):
            _, loss, new_stats = graph.forward(p, stats, batch, rng,
                                               training=True, get_loss=True)
            loss = summarize_loss(opt, loss)
            return loss.all, (loss, new_stats)

        (_, (loss, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, loss["all"]

    step = jax.jit(step, donate_argnums=(0, 1, 2))

    import numpy as np

    rng = jax.random.PRNGKey(1)
    # warmup / compile; float() forces a true device->host sync (some TPU
    # attach transports make block_until_ready effectively async)
    for _ in range(3):
        rng, r = jax.random.split(rng)
        params, stats, opt_state, loss_all = step(params, stats, opt_state,
                                                  batch, r)
    float(np.asarray(loss_all))

    n_iters = int(os.environ.get("SCL_BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        rng, r = jax.random.split(rng)
        params, stats, opt_state, loss_all = step(params, stats, opt_state,
                                                  batch, r)
    float(np.asarray(loss_all))
    dt = time.perf_counter() - t0

    its = n_iters / dt / max(n_chips, 1)
    print(json.dumps({
        "metric": "pix3d_train_iters_per_sec_per_chip",
        "value": round(its, 4),
        "unit": "it/s",
        "vs_baseline": round(its / ASSUMED_A100_REFERENCE_ITS, 4),
    }))


if __name__ == "__main__":
    main()
