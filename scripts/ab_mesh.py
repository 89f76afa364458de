"""Mesh=8 vs mesh=1 multi-step convergence A/B (VERDICT r3 item 4).

Runs the SAME 20 tiny-shape train steps (identical init, identical global
batch of 8, identical rng) on a 1-device mesh and an 8-virtual-CPU-device
data-parallel mesh, and records the per-step loss trajectories plus their
relative deltas. In this framework both arms compute GLOBAL batch-stats BN
with identical math, so the delta measures only SPMD conv-reduction
reassociation drift — pinned at ~5.7e-5/step at the loss level by
`scripts/validate_sharding_drift.py` (PARITY.md). This A/B extends that
single-step bound to a 20-step compounding trajectory.

Sized for this single-core machine: no evals, no dataloader, tiny
`__graft_entry__` shapes (32px, 16 rays, 8 samples), one compile per arm.

Usage: SCL_PLATFORM=cpu python scripts/ab_mesh.py [steps]
Writes output/mesh_ab_r4.json and prints a summary line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = 8


def run_arm(n_mesh, steps, batches):
    import jax
    import optax

    import __graft_entry__ as ge
    from shapeclipper_tpu import parallel
    from shapeclipper_tpu.models.graph import Graph, summarize_loss
    from shapeclipper_tpu.train.pretrainer import make_optimizer

    # Same model/global-batch config in both arms; only the mesh differs.
    opt = ge._tiny_opt(n_devices=N_DEV, image=32, rays=16, samples=8)
    opt.tpu.mesh = {"data": n_mesh}
    mesh = parallel.make_mesh(opt, devices=jax.devices()[:n_mesh])
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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

    # Pre-build a few deterministic batches shared verbatim by both arms.
    opt = ge._tiny_opt(n_devices=N_DEV, image=32, rays=16, samples=8)
    batches = []
    for k in range(4):
        opt.seed = k
        batches.append(ge._make_batch(opt))

    loss1 = run_arm(1, steps, batches)
    loss8 = run_arm(N_DEV, steps, batches)
    rel = [abs(a - b) / max(abs(a), 1e-12) for a, b in zip(loss1, loss8)]
    rec = {
        "steps": steps, "n_devices": N_DEV,
        "loss_mesh1": loss1, "loss_mesh8": loss8,
        "rel_delta": rel, "max_rel_delta": max(rel),
        "final_rel_delta": rel[-1],
        "note": ("identical init/global-batch/rng; delta = SPMD "
                 "conv-reassociation drift compounding over the trajectory "
                 "(single-step loss drift pinned at 5.7e-5, PARITY.md)"),
    }
    out = os.path.join(os.path.dirname(__file__), "..", "output",
                       "mesh_ab_r4.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("steps", "max_rel_delta", "final_rel_delta")}))


if __name__ == "__main__":
    main()
