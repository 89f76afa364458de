"""Pretrain runner: sphere-fit the SDF MLP (+ viewpoint uniformity).

Reference `model/pretrainer.py:15-113`. One jit'd train step; the optimizer
excludes the estimator backbone but keeps its fc heads (reference
`model/pretrainer.py:48-51`), implemented as an optax.multi_transform param
mask instead of parameter-list surgery. Checkpoints keep the reference's
child-prefix contract ("reconstructor" matches nothing — preserved quirk).
"""

from __future__ import annotations

import importlib
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from ..models.pretrain_graph import PretrainGraph
from ..utils import checkpoint as ckpt
from ..utils.easydict import EasyDict as edict
from ..utils.log import Timer, log


def make_optimizer(opt, params, trainable_fn):
    """Adam with per-parameter freeze mask. `trainable_fn(path_tuple) -> bool`."""
    kwargs = {}
    for k, v in (opt.optim.get("params") or {}).items():
        kwargs[k.replace("betas", "b1_b2")] = v
    if "b1_b2" in kwargs:
        b1, b2 = kwargs.pop("b1_b2")
        kwargs.update(b1=b1, b2=b2)
    assert opt.optim.algo.lower() == "adam", opt.optim.algo
    tx = optax.adam(opt.optim.lr, **kwargs)
    flat = traverse_util.flatten_dict(params)
    labels = traverse_util.unflatten_dict(
        {p: ("train" if trainable_fn(p) else "frozen") for p in flat})
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)


def pretrain_trainable(path):
    """Exclude the estimator backbone; keep its fc heads (reference
    `model/pretrainer.py:48-51`: skip 'estimator' params without 'fc')."""
    if path[0] != "estimator":
        return True
    return any("fc" in p for p in path)


class Runner:
    def __init__(self, opt):
        self.opt = opt

    def load_dataset(self, opt):
        data = importlib.import_module(
            f"shapeclipper_tpu.data.{opt.data.dataset}")
        log.info("loading pretrain data...")
        self.pretrain_data = data.Dataset(opt, split="train")
        self.pretrain_loader = self.pretrain_data.setup_loader(
            opt, shuffle=True, batch_size=opt.batch_size, seed=opt.seed or 0)

    def build_networks(self, opt):
        log.info("building networks...")
        self.graph = PretrainGraph(opt)
        rng = jax.random.PRNGKey(opt.seed or 0)
        state = self.graph.init(rng)
        self.params, self.batch_stats = state["params"], state["batch_stats"]

    def setup_optimizer(self, opt):
        log.info("setting up optimizers...")
        self.tx = make_optimizer(opt, self.params, pretrain_trainable)
        self.opt_state = self.tx.init(self.params)
        self._build_step(opt)

    def _build_step(self, opt):
        graph, tx = self.graph, self.tx

        def step(params, stats, opt_state, batch, rng):
            def loss_fn(p):
                _, loss, new_stats = graph.forward(p, stats, batch, rng,
                                                   training=True)
                return loss.all, (loss, new_stats)

            (loss_all, (loss, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt_state, dict(loss)

        self.step = jax.jit(step, donate_argnums=(0, 1, 2))

    def train(self, opt):
        log.title("PRETRAINING START")
        timer = Timer()
        self.it = 0
        rng = jax.random.PRNGKey((opt.seed or 0) + 1)
        self.save_checkpoint(opt, ep=0, it=self.it + 1, latest=True)
        needs_images = bool(opt.pre.viewpoint)
        loader = iter(self.pretrain_loader) if needs_images else None
        t_log = time.time()
        for _ in range(opt.pre.iter):
            timer.begin_iter()
            if needs_images:
                try:
                    batch = next(loader)
                except StopIteration:
                    loader = iter(self.pretrain_loader)
                    batch = next(loader)
                var = edict(rgb_input_map=jnp.asarray(batch["rgb_input_map"]))
            else:
                var = edict()
            rng, rng_step = jax.random.split(rng)
            self.params, self.batch_stats, self.opt_state, loss = self.step(
                self.params, self.batch_stats, self.opt_state, var, rng_step)
            if (self.it + 1) % opt.freq.ckpt_latest == 0:
                self.save_checkpoint(opt, ep=0, it=self.it + 1, latest=True)
            self.it += 1
            timer.end_iter(1, 0, opt.pre.iter)
            if time.time() - t_log > 10 or self.it == opt.pre.iter:
                print(f"  pretrain it {self.it}/{opt.pre.iter} "
                      f"loss={float(loss['all']):.4f} "
                      f"({timer.it_per_sec:.2f} it/s)")
                t_log = time.time()
        self.final_loss = {k: float(np.asarray(v)) for k, v in loss.items()}
        self.save_checkpoint(opt, ep=1, it=self.it)
        log.title("PRETRAINING DONE")

    def save_checkpoint(self, opt, ep=0, it=0, latest=False):
        children = ("reconstructor", "sdf_network", "latent_proj_shape")
        if opt.pre.viewpoint:
            children = children + ("estimator",)
        ckpt.save_checkpoint(
            opt.output_path,
            {"params": self.params, "batch_stats": self.batch_stats},
            optim_states={"optim": self.opt_state},
            ep=ep, it=it, latest=latest, children=children)
        if not latest:
            log.info(f"checkpoint saved: ({opt.group}) {opt.name}, "
                     f"epoch {ep} (iteration {it})")
