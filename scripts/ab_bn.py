"""Per-replica vs global BN convergence A/B on an 8-virtual-device mesh
(VERDICT r4 item 4).

Runs the SAME tiny-shape train steps (identical init, identical global batch,
identical rng) on an 8-device data-parallel mesh twice: once with the default
GLOBAL batch-stats BN and once with `tpu.bn_mode=per_replica` (DDP-parity
moments: per-shard BN groups, running stats follow shard 0 — reference
`model/runner.py:121` + DDP broadcast_buffers). Records both loss
trajectories; the delta quantifies the BN-semantics deviation PARITY.md
previously called unquantifiable.

Sized for this single-core machine: no evals, no dataloader, tiny
`__graft_entry__` shapes (32px, 16 rays, 8 samples), one compile per arm.

Usage: SCL_PLATFORM=cpu python scripts/ab_bn.py [steps]
Writes output/bn_ab_r5.json and prints a summary line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = 8


def run_arm(bn_mode, steps, batches):
    import jax
    import optax

    import __graft_entry__ as ge
    from shapeclipper_tpu import parallel
    from shapeclipper_tpu.models.graph import Graph, summarize_loss
    from shapeclipper_tpu.train.pretrainer import make_optimizer

    opt = ge._tiny_opt(n_devices=N_DEV, image=32, rays=16, samples=8)
    opt.tpu.mesh = {"data": N_DEV}
    opt.tpu.bn_mode = bn_mode
    mesh = parallel.make_mesh(opt, devices=jax.devices()[:N_DEV])
    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params = parallel.replicate(mesh, state["params"])
    stats = parallel.replicate(mesh, state["batch_stats"])
    tx = make_optimizer(opt, state["params"], lambda p: True)
    opt_state = parallel.replicate(mesh, tx.init(state["params"]))

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

    step = jax.jit(step)
    losses = []
    for i in range(steps):
        batch = parallel.shard_batch(mesh, batches[i % len(batches)])
        rng = jax.device_put(jax.random.PRNGKey(100 + i),
                             parallel.replicate_sharding(mesh))
        params, stats, opt_state, loss = step(params, stats, opt_state,
                                              batch, rng)
        losses.append(float(loss))
    return losses


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_DEV}"
        ).strip()
    os.environ.setdefault("SCL_PLATFORM", "cpu")

    import jax

    # Pin BEFORE any backend query — the axon plugin ignores JAX_PLATFORMS
    # and jax.default_backend() would initialize (and lock) the TPU backend.
    jax.config.update("jax_platforms", "cpu")

    import __graft_entry__ as ge

    assert jax.default_backend() == "cpu", "platform pin failed"

    opt = ge._tiny_opt(n_devices=N_DEV, image=32, rays=16, samples=8)
    batches = []
    for k in range(4):
        opt.seed = k
        batches.append(ge._make_batch(opt))

    loss_g = run_arm("global", steps, batches)
    loss_r = run_arm("per_replica", steps, batches)
    rel = [abs(a - b) / max(abs(a), 1e-12) for a, b in zip(loss_g, loss_r)]
    n = max(steps // 5, 1)
    rec = {
        "steps": steps, "n_devices": N_DEV,
        "loss_global": loss_g, "loss_per_replica": loss_r,
        "rel_delta": rel, "max_rel_delta": max(rel),
        "final_rel_delta": rel[-1],
        "mean_last5_global": sum(loss_g[-n:]) / n,
        "mean_last5_per_replica": sum(loss_r[-n:]) / n,
        "note": ("identical init/global-batch/rng on the same 8-device "
                 "mesh; the two arms differ ONLY in BN moment scope "
                 "(global batch vs per-shard groups + shard-0 running "
                 "stats). Quantifies the DDP-BN semantic deviation."),
    }
    out = os.path.join(os.path.dirname(__file__), "..", "output",
                       "bn_ab_r5.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("steps", "max_rel_delta", "final_rel_delta",
                       "mean_last5_global", "mean_last5_per_replica")}))


if __name__ == "__main__":
    main()
