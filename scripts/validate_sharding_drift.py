"""Sharded-vs-single-device drift, measured WITHOUT the oneDNN excuse.

The sharded-equivalence tests tolerate percent-level drift on the CPU test
backend because oneDNN conv kernels accumulate in a batch-shape-dependent
order (CLAUDE.md). This script pins the claim down: it re-runs the
loss/gradient comparison on an 8-virtual-device CPU mesh with oneDNN
DISABLED (--xla_cpu_use_onednn=false), where XLA's own conv emitters are
batch-shape-stable, and reports the true SPMD drift at tight tolerance.

    python scripts/validate_sharding_drift.py [--onednn]

Results go to PARITY.md (VERDICT round-2 item 7).
"""
import os
import sys

flags = "--xla_force_host_platform_device_count=8"
if "--onednn" not in sys.argv:
    flags += " --xla_cpu_use_onednn=false"
os.environ["XLA_FLAGS"] = flags + " " + os.environ.get("XLA_FLAGS", "")
os.environ["SCL_PLATFORM"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from shapeclipper_tpu import parallel  # noqa: E402
from shapeclipper_tpu.config import options  # noqa: E402
from shapeclipper_tpu.models.graph import Graph, summarize_loss  # noqa: E402
from shapeclipper_tpu.utils.easydict import EasyDict as edict  # noqa: E402


def main():
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/pix3d/config.yaml"))
    opt.update(image_size=[64, 64], batch_size=8, seed=0)
    opt.H, opt.W = opt.image_size
    opt.data.update(dataset="synthetic", num_workers=0, k_nearest=2,
                    max_img_cat=8)
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.render.update(rand_sample=64, n_samples_uniform=16)
    opt.reg.n_views = 1
    opt.tpu.encoder_dtype = "float32"
    opt.tpu.implicit_dtype = "float32"

    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    ds = synthetic.Dataset(opt, split="train")
    batch = edict({k: jnp.asarray(v) for k, v in default_collate(
        [ds[i] for i in range(opt.batch_size)]).items()})

    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params, stats = state["params"], state["batch_stats"]
    rng = jax.random.PRNGKey(5)

    def loss_and_grad(p, batch_in):
        def loss_fn(pp):
            _, loss, _ = graph.forward(pp, stats, batch_in, rng,
                                       training=True, get_loss=True)
            return summarize_loss(opt, loss).all
        return jax.value_and_grad(loss_fn)(p)

    fn = jax.jit(loss_and_grad)
    l1, g1 = jax.device_get(fn(params, batch))

    mesh = parallel.make_mesh()
    assert mesh.size == 8, mesh
    params_r = parallel.replicate(mesh, params)
    batch_s = parallel.shard_batch(mesh, batch)
    l8, g8 = jax.device_get(fn(params_r, batch_s))

    loss_rel = abs(float(l1) - float(l8)) / max(abs(float(l1)), 1e-12)
    leaves1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    leaves8 = jax.tree_util.tree_leaves(g8)
    global_norm = float(np.sqrt(sum(
        float((np.asarray(x) ** 2).sum()) for _, x in leaves1)))
    worst = (0.0, 1.0, "")
    for (path, x), y in zip(leaves1, leaves8):
        x, y = np.asarray(x), np.asarray(y)
        nx, ny = np.linalg.norm(x), np.linalg.norm(y)
        if nx < 1e-6 * global_norm:   # denormal leaves: rel metrics explode
            continue
        rel = float(np.linalg.norm(x - y) / max(nx, 1e-12))
        cos = float((x * y).sum() / max(nx * ny, 1e-24))
        if rel > worst[0]:
            worst = (rel, cos, jax.tree_util.keystr(path) + f" |g|={nx:.2e}")
    onednn = "on" if "--onednn" in sys.argv else "off"
    print(f"oneDNN={onednn}: loss rel delta {loss_rel:.3e}; worst "
          f"non-denormal grad leaf: rel-norm delta {worst[0]:.3e} cosine "
          f"{worst[1]:.6f} at {worst[2]}")


if __name__ == "__main__":
    main()
