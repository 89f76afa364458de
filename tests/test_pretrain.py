import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from shapeclipper_tpu.models.pretrain_graph import PretrainGraph
from shapeclipper_tpu.train.pretrainer import make_optimizer, pretrain_trainable
from shapeclipper_tpu.utils.easydict import EasyDict as edict


@pytest.fixture(scope="module")
def small_opt(request):
    import os
    from shapeclipper_tpu.config import options
    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "..", "options/pix3d/config.yaml"))
    opt.H, opt.W = 32, 32
    opt.image_size = [32, 32]
    opt.batch_size = 2
    opt.pre.sample_points = 512
    opt.pre.viewpoint = False
    opt.optim.lr = 1e-3  # faster convergence for the short CPU test
    return opt


def test_pretrain_fits_sphere(small_opt):
    opt = small_opt
    graph = PretrainGraph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params, stats = state["params"], state["batch_stats"]
    tx = make_optimizer(opt, params, pretrain_trainable)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, rng):
        def loss_fn(p):
            _, loss, new_stats = graph.forward(p, stats, edict(), rng,
                                               training=True)
            return loss.all, (loss, new_stats)
        (_, (loss, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, \
            new_opt_state, loss

    rng = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(300):
        rng, r = jax.random.split(rng)
        params, stats, opt_state, loss = step(params, stats, opt_state, r)
        if first_loss is None:
            first_loss = float(loss["sdf"])
    final_loss = float(loss["sdf"])
    assert final_loss < first_loss * 0.5

    # check the SDF is now close to ||x|| - 0.5 for a random latent
    rng_lat = jax.random.PRNGKey(2)
    latent = jax.random.normal(rng_lat, (1, opt.arch.latent_dim_shape))
    proj = graph.latent_proj_shape.apply(
        {"params": params["latent_proj_shape"],
         "batch_stats": stats["latent_proj_shape"]}, latent, train=False)
    # the well-sampled radial band (uniform sampling rarely hits r<0.25;
    # the center converges over the full 2000-iter schedule)
    r = jnp.linspace(0.3, 0.9, 12)
    pts = jnp.stack([r, jnp.zeros_like(r), jnp.zeros_like(r)], -1)[None]
    lat = jnp.broadcast_to(proj[:, None, :], (1, 12, proj.shape[-1]))
    sdf = graph.sdf_network.apply({"params": params["sdf_network"]}, pts, lat)[..., 0]
    np.testing.assert_allclose(np.asarray(sdf[0]), np.asarray(r) - 0.5,
                               atol=0.1)


def test_pretrain_optimizer_freezes_backbone(small_opt):
    opt = small_opt.deepcopy()
    opt.pre.viewpoint = True
    graph = PretrainGraph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params, stats = state["params"], state["batch_stats"]
    tx = make_optimizer(opt, params, pretrain_trainable)
    opt_state = tx.init(params)
    var = edict(rgb_input_map=jax.random.uniform(
        jax.random.PRNGKey(3), (2, 32, 32, 3)))

    def loss_fn(p):
        _, loss, new_stats = graph.forward(p, stats, var,
                                           jax.random.PRNGKey(4), training=True)
        return loss.all, new_stats

    grads, _ = jax.grad(loss_fn, has_aux=True)(params)
    updates, _ = tx.update(grads, opt_state, params)
    # backbone conv update must be exactly zero
    backbone_upd = updates["estimator"]["ResNet_0"]
    assert all(float(jnp.abs(l).sum()) == 0.0
               for l in jax.tree_util.tree_leaves(backbone_upd))
    # fc heads do update
    assert float(jnp.abs(updates["estimator"]["extr_fc"]["kernel"]).sum()) > 0
    # sdf network updates
    assert float(jnp.abs(
        updates["sdf_network"]["lin0"]["kernel"]).sum()) > 0


def test_checkpoint_roundtrip(tmp_path, small_opt):
    from shapeclipper_tpu.utils import checkpoint as ckpt
    graph = PretrainGraph(small_opt)
    state = graph.init(jax.random.PRNGKey(0))
    out = str(tmp_path)
    ckpt.save_checkpoint(out, state, ep=3, it=77, best_val=0.5, latest=False)
    # full resume restores exact values
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, _, ep, it, best = ckpt.restore_checkpoint(out, zeros, resume=True)
    assert (ep, it) == (3, 77) and best == 0.5
    a = jax.tree_util.tree_leaves(state["params"])
    b = jax.tree_util.tree_leaves(restored["params"])
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_checkpoint_child_filter_and_partial_restore(tmp_path, small_opt):
    from shapeclipper_tpu.utils import checkpoint as ckpt
    graph = PretrainGraph(small_opt)
    state = graph.init(jax.random.PRNGKey(0))
    out = str(tmp_path)
    ckpt.save_checkpoint(out, state, ep=1, it=10,
                         children=("sdf_network", "latent_proj_shape"))
    raw = ckpt.load_raw(f"{out}/latest.ckpt")
    assert set(raw["graph"]["params"].keys()) == {"sdf_network",
                                                  "latent_proj_shape"}
    # partial restore into a zeroed tree: filtered children replaced,
    # everything else kept
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, _, _, _, _ = ckpt.restore_checkpoint(
        out, zeros, load_name=f"{out}/latest.ckpt")
    assert np.allclose(
        np.asarray(restored["params"]["sdf_network"]["lin0"]["kernel"]),
        np.asarray(state["params"]["sdf_network"]["lin0"]["kernel"]))
    assert float(jnp.abs(
        jax.tree_util.tree_leaves(restored["params"]["encoder"])[0]).sum()) == 0
