"""Capture a jax.profiler trace of the flagship train step and print the
top ops by device self-time.

Reuses bench.py's exact setup (synthetic data, pix3d flagship config, the
same jit'd step), traces a few steady-state steps, then parses the XPlane
with xprof's converter into an op-level table. This replaces guesswork
about where the 55 ms step goes (conv chains vs implicit MLPs vs losses).

Usage: python scripts/trace_step.py [n_traced_steps]
Output: top-40 op table on stdout + the raw trace under /tmp/scl_trace.
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SCL_BENCH", "1")

TRACE_DIR = "/tmp/scl_trace"


def capture(n_traced):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from shapeclipper_tpu.config import options
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    from shapeclipper_tpu.models.graph import Graph, summarize_loss
    from shapeclipper_tpu.train.pretrainer import make_optimizer
    from shapeclipper_tpu.utils.easydict import EasyDict as edict

    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "../options/pix3d/config.yaml"))
    opt.H, opt.W = opt.image_size
    opt.data.dataset = "synthetic"
    opt.data.num_workers = 0
    opt.data.max_img_cat = opt.batch_size
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.seed = 0

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
        return optax.apply_updates(params, updates), new_stats, \
            new_opt_state, loss["all"]

    step = jax.jit(step, donate_argnums=(0, 1, 2))
    rng = jax.random.PRNGKey(1)
    for _ in range(3):  # compile + warm
        rng, r = jax.random.split(rng)
        params, stats, opt_state, loss_all = step(params, stats, opt_state,
                                                  batch, r)
    float(np.asarray(loss_all))
    print("warm; tracing...", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    for _ in range(n_traced):
        rng, r = jax.random.split(rng)
        params, stats, opt_state, loss_all = step(params, stats, opt_state,
                                                  batch, r)
    float(np.asarray(loss_all))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {n_traced} steps @ {dt / n_traced * 1e3:.2f} ms/step",
          flush=True)


def report():
    paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("NO xplane captured (transport may not support device tracing)")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    # op_profile gives the device op breakdown grouped by category
    for tool in ("op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([paths[-1]], tool, {})
        except Exception as e:  # tool naming differs across versions
            print(f"[{tool}] failed: {e}")
            continue
        out = f"/tmp/scl_trace_{tool}.json"
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print(f"[{tool}] written to {out}")
    # quick top-N from op_profile json
    try:
        with open("/tmp/scl_trace_op_profile.json") as f:
            prof = json.load(f)

        def walk(node, depth=0, out=None):
            m = node.get("metrics", {})
            out.append((m.get("rawTime", 0), depth, node.get("name", "?"),
                        m.get("flops", 0)))
            for c in node.get("children", []):
                walk(c, depth + 1, out)
            return out

        root = prof.get("byCategory", prof)
        rows = walk(root, 0, [])
        rows.sort(reverse=True)
        print("\ntop op-profile nodes by raw time:")
        for t, d, name, fl in rows[:40]:
            print(f"  {t / 1e9 * 1e3:9.3f} ms  depth{d}  {name[:90]}")
    except Exception as e:
        print(f"(op_profile summary failed: {e})")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    capture(n)
    report()
