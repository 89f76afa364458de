"""Multi-chip correctness without a cluster: 8 virtual CPU devices.

The sharded jit'd train step over a (data=8) mesh must produce the same
parameters as the single-device step on the same global batch (gradient
all-reduce emitted by XLA == summing per-shard grads).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapeclipper_tpu import parallel
from shapeclipper_tpu.config import options
from shapeclipper_tpu.models.graph import Graph, summarize_loss
from shapeclipper_tpu.train.pretrainer import make_optimizer
from shapeclipper_tpu.utils.easydict import EasyDict as edict

import optax


def _tiny_opt():
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..",
                     "options/pix3d/config.yaml"))
    opt.update(image_size=[32, 32], batch_size=8, seed=0)
    opt.H, opt.W = opt.image_size
    opt.data.update(dataset="synthetic", num_workers=0, k_nearest=2,
                    max_img_cat=8)
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.render.update(rand_sample=32, n_samples_uniform=8)
    opt.reg.n_views = 1
    opt.tpu.encoder_dtype = "float32"
    opt.tpu.implicit_dtype = "float32"
    return opt


def _batch(opt):
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    ds = synthetic.Dataset(opt, split="train")
    return default_collate([ds[i] for i in range(opt.batch_size)])


def _make_step(graph, opt, tx):
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
            new_opt_state, loss

    return jax.jit(step)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    opt = _tiny_opt()
    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params, stats = state["params"], state["batch_stats"]
    tx = make_optimizer(opt, params, lambda p: True)
    opt_state = tx.init(params)
    batch = edict({k: jnp.asarray(v) for k, v in _batch(opt).items()})
    rng = jax.random.PRNGKey(5)
    step = _make_step(graph, opt, tx)

    # single device
    p1, s1, _, l1 = step(params, stats, opt_state, batch, rng)

    # 8-device data-parallel
    mesh = parallel.make_mesh()
    assert mesh.size == 8
    params_r = parallel.replicate(mesh, params)
    stats_r = parallel.replicate(mesh, stats)
    opt_state_r = parallel.replicate(mesh, opt_state)
    batch_s = parallel.shard_batch(mesh, batch)
    rng_r = jax.device_put(rng, parallel.replicate_sharding(mesh))
    p8, s8, _, l8 = step(params_r, stats_r, opt_state_r, batch_s, rng_r)

    np.testing.assert_allclose(float(l1["all"]), float(l8["all"]),
                               rtol=2e-4, atol=1e-5)
    # post-Adam params: a near-zero gradient can flip its normalized update
    # sign under different reduction orders, so bound by ~one lr step
    a = jax.tree_util.tree_leaves(jax.device_get(p1))
    b = jax.tree_util.tree_leaves(jax.device_get(p8))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=5e-3, atol=2.5e-4)

    # NOTE on tolerances: XLA guarantees SEMANTIC equivalence across SPMD
    # layouts, not bitwise gradient equality — on the CPU test backend the
    # oneDNN conv kernels use different accumulation orders per batch shape,
    # and those ~1e-7 seeds amplify through 30+ conv/BN layers. The loss
    # values (first-order, well-conditioned) match to ~1e-4 above; per-leaf
    # gradient direction cosine is checked loosely below.
    def grad_fn(p, batch_in):
        def loss_fn(pp):
            _, loss, _ = graph.forward(pp, stats, batch_in, rng,
                                       training=True, get_loss=True)
            return summarize_loss(opt, loss).all
        return jax.grad(loss_fn)(p)

    g1 = jax.device_get(jax.jit(grad_fn)(params, batch))
    g8 = jax.device_get(jax.jit(grad_fn)(params_r, batch_s))
    for x, y in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        nx, ny = np.linalg.norm(x), np.linalg.norm(y)
        if nx < 1e-6 or ny < 1e-6:
            assert abs(nx - ny) < 1e-5
            continue
        cos = float((x * y).sum() / (nx * ny))
        assert cos > 0.98, f"gradient direction diverged: cos={cos}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_batch_layout():
    opt = _tiny_opt()
    mesh = parallel.make_mesh()
    batch = edict({k: jnp.asarray(v) for k, v in _batch(opt).items()})
    sharded = parallel.shard_batch(mesh, batch)
    x = sharded["rgb_input_map"]
    assert x.shape[0] == 8
    # leading axis split across the 8 devices
    assert len(x.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_batch_raises_on_non_divisible():
    mesh = parallel.make_mesh()
    batch = edict(x=jnp.zeros((3, 4)))
    with pytest.raises(ValueError, match="does not divide"):
        parallel.shard_batch(mesh, batch)
    # explicit opt-in replicates
    out = parallel.shard_batch(mesh, batch, allow_replicate=True)
    assert out["x"].shape == (3, 4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_eval_sharded_matches_single_device(tmp_path):
    """Eval contract under sharding (reference `model/runner.py:307-396`):
    the Runner rounds eval.batch_size up to a mesh multiple, eval batches are
    genuinely sharded, and metrics match the single-device run."""
    from shapeclipper_tpu.train.trainer import Runner
    from tests.test_train_step import tiny_opt

    vals = {}
    for n_dev in (1, 8):
        opt = tiny_opt(tmp_path / f"mesh{n_dev}")
        opt.tpu.mesh = {"data": n_dev}
        opt.batch_size = 8  # train batch must divide the mesh
        opt.eval.update(batch_size=2, n_vis=0)
        runner = Runner(opt)
        if n_dev == 8:
            assert opt.eval.batch_size == 8  # rounded up to the mesh
        runner.load_dataset(opt)
        runner.build_networks(opt)
        runner.setup_optimizer(opt)
        runner.restore_checkpoint(opt)
        vals[n_dev] = runner.evaluate(opt, ep=1, training=True)
    # same params (seed-fixed init), same data. On the CPU test backend the
    # oneDNN convs accumulate in a batch-shape-dependent order (CLAUDE.md), so
    # the latents differ at percent level and marching cubes amplifies that
    # into a few percent of CD (measured 2.9%); the contract under test is
    # that sharded eval is the SAME computation, not bitwise equality.
    assert 0.01 < vals[1] < 1.0 and 0.01 < vals[8] < 1.0
    np.testing.assert_allclose(vals[1], vals[8], rtol=6e-2)
