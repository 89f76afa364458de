"""Main train/eval engine.

Port of the reference Runner (reference `model/runner.py:21-511`), re-designed
single-controller TPU-first:

  * ONE jit'd train step (forward + loss + grad + Adam update) with the batch
    sharded over a 'data' mesh axis; gradient all-reduce is implicit in
    sharded autodiff (replaces DDP/mp.spawn/NCCL + find_unused_parameters)
  * the two-optimizer camera-phase logic (reference `runner.py:235-256`)
    becomes two compiled steps: the camera step masks all non-estimator
    updates (optax.set_to_zero), runs BatchNorm in eval mode, and zero-weights
    the NN/eikonal losses
  * eval renders at eval.image_size via a second Graph bound to an eval-res
    config (shapes are static under jit)
  * checkpoints keep the latest/best/ep{N} + optim_full/optim_V contract
"""

from __future__ import annotations

import importlib
import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import parallel
from ..eval3d import metrics as eval_3D
from ..models.graph import Graph, summarize_loss
from ..models.estimator import reset_scale_params
from ..utils import checkpoint as ckpt
from ..utils.easydict import EasyDict as edict
from ..utils.log import Timer, log
from .. import vis as util_vis
from .pretrainer import make_optimizer

CAMERA_PHASE_INACTIVE = ("nearest_img", "nearest_mask", "nearest_normal",
                         "eikonal")

# var keys (small tensors) returned from the jit'd step for logging/metrics
_STEP_AUX_KEYS = ("proj_latent_sdf", "proj_latent_rgb", "pose", "scale_dist",
                  "trig_azim", "trig_elev", "trig_theta", "scale_focal")


def _batch_to_var(batch):
    var = edict()
    for k, v in batch.items():
        var[k] = v
    return var


class Runner:
    def __init__(self, opt):
        self.opt = opt
        self.tb = None  # set by setup_visualizer
        if (os.path.isdir(opt.output_path) and not opt.resume):
            for filename in os.listdir(opt.output_path):
                if "tfevents" in filename:
                    os.remove(os.path.join(opt.output_path, filename))
                if "vis" in filename:
                    shutil.rmtree(os.path.join(opt.output_path, filename),
                                  ignore_errors=True)
        os.makedirs(opt.output_path, exist_ok=True)
        self.mesh = parallel.make_mesh(opt)
        if self.mesh.size > 1:
            assert opt.batch_size % self.mesh.size == 0, (
                f"global batch {opt.batch_size} must divide the "
                f"{self.mesh.size}-device mesh")
            # eval batches are padded to the compiled eval batch size; round
            # that size up to a mesh multiple so eval work is actually
            # sharded (not silently replicated) on every device
            eval_bs = -(-opt.eval.batch_size // self.mesh.size) * self.mesh.size
            if eval_bs != opt.eval.batch_size:
                log.info(f"eval.batch_size {opt.eval.batch_size} -> {eval_bs} "
                         f"(rounded up to the {self.mesh.size}-device mesh)")
                opt.eval.batch_size = eval_bs

    # ------------------------------------------------------------------ data
    def load_dataset(self, opt, eval_split="val"):
        data = importlib.import_module(
            f"shapeclipper_tpu.data.{opt.data.dataset}")
        log.info("loading training data...")
        self.train_data = data.Dataset(opt, split="train")
        # multi-host: each host loads its slice of the global batch
        # (replaces DistributedSampler, reference `data/base.py:17-19`)
        self.train_loader = self.train_data.setup_loader(
            opt, shuffle=True, seed=opt.seed or 0,
            batch_size=opt.batch_size // jax.process_count(),
            shard_id=jax.process_index(), num_shards=jax.process_count())
        self.num_batches = len(self.train_loader)
        log.info("loading test data...")
        self.test_data = data.Dataset(opt, split=eval_split)
        self.test_loader = self.test_data.setup_loader(
            opt, shuffle=False, drop_last=False,
            batch_size=opt.eval.batch_size)
        log.info("creating data for visualization...")
        self.viz_data = self._collect_viz_data(opt)

    def _collect_viz_data(self, opt):
        """One sample per category, up to eval.n_vis_classes, repeated
        eval.n_vis times (reference `runner.py:60-89`)."""
        n_vis_classes = min(opt.eval.get("n_vis_classes", opt.data.num_classes),
                            opt.data.num_classes)
        viz_loader = self.test_data.setup_loader(
            opt, shuffle=True, drop_last=False,
            batch_size=opt.eval.batch_size, seed=1234)
        n_vis = opt.eval.n_vis
        rounds = [[0] * opt.data.num_classes for _ in range(n_vis)]
        picks = [[] for _ in range(n_vis)]
        for batch in viz_loader:
            for i, cat in enumerate(np.asarray(batch["category_label"])):
                for r in range(n_vis):  # first round missing this category
                    if (rounds[r][int(cat)] < 1
                            and sum(rounds[r]) < n_vis_classes):
                        rounds[r][int(cat)] += 1
                        picks[r].append(jax.tree_util.tree_map(
                            lambda v, i=i: v[i:i + 1], batch))
                        break
            if all(sum(r) >= n_vis_classes for r in rounds):
                break
        return [sample for r in picks for sample in r]

    # ------------------------------------------------------------- networks
    def build_networks(self, opt):
        log.info("building networks...")
        self.graph = Graph(opt)
        opt_eval = opt.deepcopy()
        opt_eval.H, opt_eval.W = opt.eval.image_size
        self.graph_eval = Graph(opt_eval)
        rng = jax.random.PRNGKey(opt.seed or 0)
        state = self.graph.init(rng)
        self.params = parallel.replicate(self.mesh, state["params"])
        self.batch_stats = parallel.replicate(self.mesh, state["batch_stats"])
        self.rng = jax.random.PRNGKey((opt.seed or 0) + 7)

    # ------------------------------------------------------------ optimizer
    def setup_optimizer(self, opt):
        log.info("setting up optimizers...")
        self.tx_full = make_optimizer(opt, self.params, lambda p: True)
        self.tx_V = make_optimizer(opt, self.params,
                                   lambda p: p[0] == "estimator")
        self.optim_full = self.tx_full.init(self.params)
        self.optim_V = self.tx_V.init(self.params)
        self._step_full = self._build_step(opt, camera_phase=False)
        self._step_V = self._build_step(opt, camera_phase=True)
        self._eval_forward = jax.jit(
            lambda p, s, v: self.graph_eval.forward(
                p, s, v, rng=None, training=False, get_loss=False)[0])

        # metric-eval loop: forward + dense SDF grid scan in ONE program —
        # through a remote-attach transport each dispatch costs a full RTT.
        # render=False drops the eval-resolution volume render when nothing
        # reads the maps (periodic metric evals; dumps use the render=True
        # variant)
        def _make_fwd_and_grid(render):
            def _fwd_and_grid(p, s, v):
                var = self.graph_eval.forward(p, s, v, rng=None,
                                              training=False, get_loss=False,
                                              render=render)[0]
                level = eval_3D.compute_level_grid(
                    self.graph_eval.opt, self.graph.sdf_network.apply,
                    p["sdf_network"], var.proj_latent_sdf)
                return var, level
            return jax.jit(_fwd_and_grid)
        self._eval_forward_and_grid = _make_fwd_and_grid(render=True)
        self._eval_forward_and_grid_metrics = _make_fwd_and_grid(render=False)

        # the whole metric-eval batch as ONE device program: forward + grid
        # scan + marching tets + sampling + chamfer + F-score — per batch,
        # one dispatch and one bulk fetch
        def _metric_eval_all(p, s, v, key):
            opt_e = self.graph_eval.opt
            var = self.graph_eval.forward(p, s, v, rng=None, training=False,
                                          get_loss=False, render=False)[0]
            level = eval_3D.compute_level_grid(
                opt_e, self.graph.sdf_network.apply, p["sdf_network"],
                var.proj_latent_sdf)
            outs = eval_3D.metric_finish_body(
                opt_e, level, var.dpc_points, var.pose, var.pose_gt, key)
            return var, outs
        self._metric_eval_all = jax.jit(_metric_eval_all)
        # viz batches run with visualize=True (reference `runner.py:352`):
        # the renderer returns 200-ray point/transparency/rgb sample extras
        self._eval_forward_vis = jax.jit(
            lambda p, s, v: self.graph_eval.forward(
                p, s, v, rng=None, training=False, get_loss=False,
                visualize=True)[0])

    def _build_step(self, opt, camera_phase):
        graph = self.graph
        tx = self.tx_V if camera_phase else self.tx_full
        non_act = CAMERA_PHASE_INACTIVE if camera_phase else ()

        def step(params, stats, opt_state, batch, rng):
            aux_keys = (_STEP_AUX_KEYS + ("idx_NN",)
                        + tuple(f"pose_NN_{v}" for v in range(opt.reg.n_views))
                        + tuple(f"scale_dist_NN_{v}"
                                for v in range(opt.reg.n_views)))

            def loss_fn(p):
                var, loss, new_stats = graph.forward(
                    p, stats, batch, rng, training=True, get_loss=True,
                    bn_eval=camera_phase)
                loss = summarize_loss(opt, loss, non_act_loss_keys=non_act)
                aux_var = edict({k: var[k] for k in aux_keys if k in var})
                return loss.all, (loss, new_stats, aux_var)

            (_, (loss, new_stats, aux_var)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if camera_phase:
                new_stats = stats  # BN frozen in the camera phase
            return new_params, new_stats, new_opt_state, loss, aux_var

        donate = (0, 1, 2) if opt.get("tpu", {}).get("donate_state", True) \
            else ()
        return jax.jit(step, donate_argnums=donate)

    # ------------------------------------------------------------ checkpoint
    def restore_checkpoint(self, opt, best=False, evaluate=False):
        epoch_start, iter_start = None, None
        graph_state = {"params": self.params, "batch_stats": self.batch_stats}
        optim_states = {"optim_full": self.optim_full, "optim_V": self.optim_V}
        if opt.resume:
            log.info("resuming from previous checkpoint...")
            graph_state, optim_states, epoch_start, iter_start, best_val = \
                ckpt.restore_checkpoint(opt.output_path, graph_state,
                                        optim_states, resume=opt.resume,
                                        best=best, evaluate=evaluate)
            self.best_val = best_val
            self.optim_full = optim_states["optim_full"]
            self.optim_V = optim_states["optim_V"]
        elif opt.get("load"):
            log.info(f"loading weights from checkpoint {opt.load}...")
            graph_state, _, _, _, _ = ckpt.restore_checkpoint(
                opt.output_path, graph_state, load_name=opt.load)
        else:
            log.info("initializing weights from scratch...")
        self.params = parallel.replicate(self.mesh, graph_state["params"])
        self.batch_stats = parallel.replicate(self.mesh,
                                              graph_state["batch_stats"])
        self.epoch_start = epoch_start or 0
        self.iter_start = iter_start or 0

    def save_checkpoint(self, opt, ep=0, it=0, best_val=np.inf, latest=False,
                        best=False):
        ckpt.save_checkpoint(
            opt.output_path,
            {"params": self.params, "batch_stats": self.batch_stats},
            optim_states={"optim_full": self.optim_full,
                          "optim_V": self.optim_V},
            ep=ep, it=it, best_val=best_val, latest=latest, best=best)
        if not latest:
            log.info(f"checkpoint saved: ({opt.group}) {opt.name}, "
                     f"epoch {ep} (iteration {it})")
        if best:
            log.info("Saving the current model as the best...")

    # ------------------------------------------------------------ visualizer
    def setup_visualizer(self, opt):
        log.info("setting up visualizers...")
        self.tb = None
        if opt.get("tb"):
            from tensorboardX import SummaryWriter
            self.tb = SummaryWriter(logdir=opt.output_path, flush_secs=10)

    # ----------------------------------------------------------------- train
    def train(self, opt):
        log.title("TRAINING START")
        self.params = dict(self.params)
        self.params["estimator"] = reset_scale_params(
            self.params["estimator"])
        self.timer = Timer()
        self.iter_skip = self.iter_start % max(self.num_batches, 1)
        self.it = self.iter_start
        if not opt.resume:
            self.best_val = np.inf
            self.best_ep = 1

        if self.iter_start == 0:
            self.evaluate(opt, ep=0, training=True)
        for self.ep in range(self.epoch_start, opt.max_epoch):
            self.train_epoch(opt)

        self.save_checkpoint(opt, ep=self.ep + 1, it=self.it,
                             best_val=self.best_val)
        if self.tb:
            self.tb.flush()
            self.tb.close()
        log.title("TRAINING DONE")
        log.info("Best CD: %.4f @ epoch %d" % (self.best_val, self.best_ep))

    def _device_prefetch(self, loader, depth=2):
        """Shard+device_put batches `depth` ahead of consumption: the (async)
        host->device transfer of batch k+1 overlaps the device executing
        step k (replaces DataLoader pin_memory/prefetch)."""
        import collections
        queue = collections.deque()
        for batch in loader:
            if self.iter_skip > 0:  # resume fast-forward, host-side only
                self.iter_skip -= 1
                continue
            queue.append(parallel.shard_batch(self.mesh, _batch_to_var(batch)))
            if len(queue) >= depth:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    def train_epoch(self, opt):
        self.train_loader.set_epoch(self.ep)
        loss = None
        for var in self._device_prefetch(self.train_loader):
            loss = self.train_iteration(opt, var)
        if loss is not None:
            log.loss_train(opt, self.ep + 1, opt.optim.lr, loss["all"],
                           self.timer)
        if (self.ep + 1) % opt.freq.eval == 0:
            current_val = self.evaluate(opt, ep=self.ep + 1, training=True)
            if current_val < self.best_val:
                self.best_val = current_val
                self.best_ep = self.ep + 1
                self.save_checkpoint(opt, ep=self.ep + 1, it=self.it,
                                     best_val=self.best_val, best=True,
                                     latest=True)

    def train_iteration(self, opt, var):
        self.timer.begin_iter()
        # optional profiler trace window (aux subsystem; reference has only a
        # wall-clock EMA timer, `utils/util.py:64-70`)
        prof = opt.get("tpu", {}).get("profile_iters")
        if prof and self.it == prof[0]:
            os.makedirs(f"{opt.output_path}/profile", exist_ok=True)
            jax.profiler.start_trace(f"{opt.output_path}/profile")
        if prof and self.it == prof[1]:
            jax.profiler.stop_trace()
            log.info(f"profiler trace written to {opt.output_path}/profile")
        # reference `runner.py:241`: optim_full only when it > iter_camera —
        # iteration 0 is ALWAYS a camera-phase step (estimator-only update,
        # BN frozen, NN/eikonal losses inactive), even with iter_camera=0
        camera_phase = self.it <= opt.optim.iter_camera
        step = self._step_V if camera_phase else self._step_full
        opt_state = self.optim_V if camera_phase else self.optim_full
        self.rng, rng_step = jax.random.split(self.rng)
        (self.params, self.batch_stats, new_opt_state, loss,
         aux_var) = step(self.params, self.batch_stats, opt_state, var,
                         rng_step)
        if camera_phase:
            self.optim_V = new_opt_state
        else:
            self.optim_full = new_opt_state

        # one-step-delayed finite check: fetching this iteration's scalars
        # would synchronize the pipeline every step (the reference asserts
        # inline, `runner.py:301-302`; here the check trails by one step so
        # dispatch of step k+1 overlaps device execution of step k)
        if getattr(self, "_pending_loss", None) is not None:
            pending_it, pending = self._pending_loss
            if not bool(pending["finite"]):
                terms = {k: float(np.mean(np.asarray(v)))
                         for k, v in pending.items() if k != "finite"}
                raise AssertionError(
                    f"non-finite loss at iter {pending_it}: {terms}")
        self._pending_loss = (self.it, loss)

        if self.it % opt.freq.vis == 0 and self.tb:
            # train-split panels from the live train batch, incl. the CLIP-NN
            # input views chosen this step (reference `runner.py:260-261`,
            # `runner.py:449-459`)
            train_var = edict(var)
            train_var.update(aux_var)
            self.visualize(opt, train_var, step=self.it, split="train")
        if (self.it + 1) % opt.freq.ckpt_latest == 0:
            self.save_checkpoint(opt, ep=self.ep, it=self.it + 1,
                                 best_val=self.best_val, latest=True)
        if self.it % opt.freq.scalar == 0 and self.tb:
            self.log_scalars(opt, var, aux_var, loss, step=self.it)
        if self.it % opt.freq.save_vis == 0:
            self.save_vis_dumps(opt, folder=f"vis_log/iter_{self.it}")
        self.it += 1
        self.timer.end_iter(opt.max_epoch, self.ep, self.num_batches)
        return loss

    # -------------------------------------------------------------- logging
    def log_scalars(self, opt, var, aux_var, loss, step=0, split="train"):
        for key, value in loss.items():
            if key in ("all", "finite"):
                continue
            self.tb.add_scalar(f"{split}/loss_{key}",
                               float(np.mean(np.asarray(value))), step)
        self.tb.add_scalar(f"{split}/loss_all", float(loss["all"]), step)
        self.tb.add_scalar(
            "train/beta", float(np.abs(np.asarray(
                self.params["density"]["beta"]))), step)
        if split == "train" and "dpc_points" in var:
            mvar = edict(proj_latent_sdf=aux_var.proj_latent_sdf,
                         pose=aux_var.pose, pose_gt=var.pose_gt,
                         dpc_points=var.dpc_points)
            try:
                dist_acc, dist_cov = eval_3D.eval_metrics(
                    opt, mvar, self.graph.sdf_network.apply,
                    self.params["sdf_network"],
                    rng=np.random.RandomState(step), seed=step,
                    need_meshes=False)
                self.tb.add_scalar(f"{split}/dist_acc", dist_acc, step)
                self.tb.add_scalar(f"{split}/dist_cov", dist_cov, step)
            except Exception as e:  # metric eval must never kill training
                log.warn(f"train-split metric eval failed: {e}")

    def visualize_viz_data(self, opt, step=0, split="train"):
        opt_e = self.graph_eval.opt
        for i, batch in enumerate(self.viz_data):
            # single-sample vis batches replicate explicitly (tiny, vis-only)
            var = parallel.shard_batch(self.mesh, _batch_to_var(batch),
                                       allow_replicate=True)
            var_out = self._eval_forward(self.params, self.batch_stats, var)
            self.visualize(opt_e, var_out, step=step, split=split)

    def visualize(self, opt, var, step=0, split="train"):
        if not self.tb:
            return
        H, W = self.graph.opt.H, self.graph.opt.W
        util_vis.tb_image(opt, self.tb, step, split, "image_input_map",
                          var.rgb_input_map, from_range=(0, 1),
                          poses=var.get("pose_gt"))
        util_vis.tb_image(opt, self.tb, step, split, "mask_input_map",
                          var.mask_input_map)
        if "rgb_recon_map" in var:
            util_vis.tb_image(opt, self.tb, step, split, "image_recon_map",
                              var.rgb_recon_map, from_range=(0, 1),
                              poses=var.get("pose"))
            util_vis.tb_image(opt, self.tb, step, split, "mask_recon_map",
                              var.mask_recon_map)
        if "normal_recon_map" in var:
            util_vis.tb_image(opt, self.tb, step, split, "normal_recon_map",
                              var.normal_recon_map, from_range=(-1, 1))
        if "normal_input_map" in var:
            util_vis.tb_image(opt, self.tb, step, split,
                              "normal_input_viewpoint_map",
                              var.normal_input_map, from_range=(-1, 1))
        if "normal_transformed_map" in var:
            util_vis.tb_image(opt, self.tb, step, split,
                              "normal_input_canonical_map",
                              var.normal_transformed_map, from_range=(-1, 1))
        # CLIP-NN view panels (reference `model/runner.py:449-459`): the
        # selected neighbor inputs (gathered host-side by idx_NN) and, when
        # full-grid NN renders exist, their reconstructions
        n_views = self.graph.opt.reg.n_views
        if "idx_NN" in var and "rgb_input_map_NN" in var:
            idx_NN = np.asarray(var.idx_NN)
            rows = np.arange(idx_NN.shape[0])
            for v in range(n_views):
                sel = idx_NN[:, min(v, idx_NN.shape[1] - 1)]
                util_vis.tb_image(
                    opt, self.tb, step, split, f"image_input_map_NN_{v}",
                    np.asarray(var.rgb_input_map_NN)[rows, sel],
                    from_range=(0, 1), poses=var.get(f"pose_NN_{v}"))
                util_vis.tb_image(
                    opt, self.tb, step, split, f"mask_input_map_NN_{v}",
                    np.asarray(var.mask_input_map_NN)[rows, sel])
        if "rgb_recon_map_NN_0" in var and "mask_recon_map_NN_0" in var:
            for v in range(n_views):
                util_vis.tb_image(
                    opt, self.tb, step, split, f"image_recon_map_NN_{v}",
                    var[f"rgb_recon_map_NN_{v}"], from_range=(0, 1),
                    poses=var.get(f"pose_NN_{v}"))
                util_vis.tb_image(
                    opt, self.tb, step, split, f"mask_recon_map_NN_{v}",
                    var[f"mask_recon_map_NN_{v}"])

    # ------------------------------------------------------------------ eval
    def evaluate(self, opt, ep, training=False):
        """Software-pipelined evaluation: the device forward + dense-grid SDF
        eval for batch k+1 is dispatched (async) BEFORE the host isosurface
        extraction of batch k runs, so host marching-tetrahedra overlaps
        device execution (the reference is fully serial,
        `utils/eval_3D.py:52-103` inside `model/runner.py:307-396`)."""
        opt_e = self.graph_eval.opt
        f_scores = []
        metric_eval = dict(dist_acc=0.0, dist_cov=0.0)
        acc_cat = [0.0] * opt.data.num_classes
        comp_cat = [0.0] * opt.data.num_classes
        counts_cat = [0.001] * opt.data.num_classes
        n_seen = 0

        # periodic metric evals run the fully fused single-program path
        # (no renders, no meshes); full eval keeps the two-program path for
        # host-mesh extraction + dumps — unless eval.dump=false, in which
        # case meshes are never dumped so full eval takes the metric fast
        # path too (host marching tets + renders exist only to be dumped,
        # reference `model/runner.py:359-361,469-497`)
        dump = (not training) and bool(opt.eval.get("dump", True))
        device_metrics = (not dump) and eval_3D.use_device_isosurface(opt_e)

        def finish(it, n_valid, var, payload, cats):
            nonlocal n_seen
            if device_metrics:  # payload = finish-output tuple
                eval_3D.consume_finish_outputs(var, payload)
            else:               # payload = level grid
                eval_3D.eval_metrics_finish(opt_e, var, payload,
                                            rng=np.random.RandomState(it),
                                            seed=it,
                                            need_meshes=dump)
            f_scores.append(np.asarray(var.f_score)[:n_valid])
            n_seen += n_valid
            cd_acc = np.asarray(var.cd_acc)[:n_valid]
            cd_comp = np.asarray(var.cd_comp)[:n_valid]
            for i in range(n_valid):
                cat_idx = int(cats[i])
                counts_cat[cat_idx] += 1
                acc_cat[cat_idx] += float(cd_acc[i])
                comp_cat[cat_idx] += float(cd_comp[i])
            metric_eval["dist_acc"] += float(cd_acc.mean()) * n_valid
            metric_eval["dist_cov"] += float(cd_comp.mean()) * n_valid

            if it == 0 and training and self.viz_data:
                if self.tb:
                    self.visualize_viz_data(opt, step=ep, split="eval")
                self._dump_rotating_vis(opt, ep)
            if dump:
                B_c = opt.eval.batch_size
                if n_valid < B_c:  # drop padded rows from dumps
                    mesh_pred = var.get("mesh_pred")
                    var = edict({
                        k: (v[:n_valid] if getattr(v, "ndim", 0) >= 1
                            and getattr(v, "shape", (0,))[0] == B_c else v)
                        for k, v in var.items() if k != "mesh_pred"})
                    if mesh_pred is not None:
                        var.mesh_pred = mesh_pred[:n_valid]
                self.dump_results(opt_e, var, ep, write_new=(it == 0))
            elif not training:
                # eval.dump=false still records the per-sample chamfer
                # report (normally written inside dump_results)
                with open(f"{self.opt.output_path}/chamfer.txt",
                          "w" if it == 0 else "a") as f:
                    for i, acc, comp in zip(np.asarray(var.idx)[:n_valid],
                                            np.asarray(var.cd_acc)[:n_valid],
                                            np.asarray(var.cd_comp)[:n_valid]):
                        f.write(f"{i} {acc:.8f} {comp:.8f}\n")

        pipelined = opt.get("tpu", {}).get("eval_pipeline", True)
        pending = None
        for it, batch in enumerate(self.test_loader):
            # pad ragged final batches to the compiled batch size (a new
            # shape would trigger a full recompile of the eval programs);
            # padded rows are sliced out of every metric in finish()
            n_valid = int(np.asarray(batch["idx"]).shape[0])
            B_c = opt.eval.batch_size
            if n_valid < B_c:
                batch = jax.tree_util.tree_map(
                    lambda v: np.concatenate(
                        [v, np.repeat(v[-1:], B_c - n_valid, axis=0)]),
                    batch)
            # host copy of the labels: fetching var.category_label back off
            # the device costs a full tunnel RTT per batch
            cats = np.asarray(batch["category_label"])
            var = parallel.shard_batch(self.mesh, _batch_to_var(batch))
            if device_metrics:
                var, payload = self._metric_eval_all(
                    self.params, self.batch_stats, var,
                    jax.random.PRNGKey(it))
            else:
                # full eval (dumping) renders for dump_results; the
                # host-isosurface fallback needs the level grid
                fwd = (self._eval_forward_and_grid if dump
                       else self._eval_forward_and_grid_metrics)
                var, payload = fwd(self.params, self.batch_stats, var)
            if pending is not None:
                finish(*pending)
            if pipelined:
                pending = (it, n_valid, var, payload, cats)
            else:  # serial mode (tpu.eval_pipeline=false; for A/B timing)
                finish(it, n_valid, var, payload, cats)
        if pending is not None:
            finish(*pending)

        if not training:
            self._write_eval_reports(opt, acc_cat, comp_cat, counts_cat,
                                     f_scores)
        for key in metric_eval:
            metric_eval[key] /= max(n_seen, 1)
        log.loss_eval(opt, chamfer=(metric_eval["dist_acc"],
                                    metric_eval["dist_cov"]))
        return (metric_eval["dist_acc"] + metric_eval["dist_cov"]) / 2

    def _write_eval_reports(self, opt, acc_cat, comp_cat, counts_cat,
                            f_scores):
        per_cat_cd_file = os.path.join(opt.output_path, "cd_cat.txt")
        with open(per_cat_cd_file, "w") as outfile:
            outfile.write("CD     Acc    Comp   Count Cat\n")
            for i in range(opt.data.num_classes):
                acc_i = acc_cat[i] / counts_cat[i]
                comp_i = comp_cat[i] / counts_cat[i]
                cd_i = (acc_i + comp_i) / 2
                outfile.write("%.4f %.4f %.4f %5d %s\n" % (
                    cd_i, acc_i, comp_i, counts_cat[i],
                    self.test_data.label2cat[i]))
        if f_scores:
            f_all = np.concatenate(f_scores, axis=0).mean(axis=0)
            print("##############################")
            for i, t in enumerate(opt.eval.f_thresholds):
                print("F-score @ %.2f: %.4f" % (t * 100, f_all[i]))
            print("##############################")
            with open(os.path.join(opt.output_path, "f_score.txt"), "w") as f:
                for i, t in enumerate(opt.eval.f_thresholds):
                    f.write("F-score @ %.2f: %.4f\n" % (t * 100, f_all[i]))

    def dump_results(self, opt, var, ep, write_new=False, train=False):
        folder = "dump" if not train else f"vis_{ep}"
        os.makedirs(f"{self.opt.output_path}/{folder}", exist_ok=True)
        o = self.opt
        util_vis.dump_images(o, var.idx, "image_input", var.rgb_input_map,
                             from_range=(0, 1), poses=var.get("pose_gt"),
                             folder=folder)
        if "rgb_recon_map" in var:
            util_vis.dump_images(o, var.idx, "image_recon", var.rgb_recon_map,
                                 masks=var.mask_hard_map, from_range=(0, 1),
                                 poses=var.get("pose"), folder=folder)
            util_vis.dump_images(o, var.idx, "mask_recon", var.mask_recon_map,
                                 folder=folder)
        util_vis.dump_images(o, var.idx, "mask_input", var.mask_input_map,
                             folder=folder)
        if "normal_input_map" in var:
            util_vis.dump_images(o, var.idx, "normal_input_viewpoint",
                                 var.normal_input_map, from_range=(-1, 1),
                                 folder=folder)
        if "normal_transformed_map" in var:
            util_vis.dump_images(o, var.idx, "normal_input_canonical",
                                 var.normal_transformed_map,
                                 from_range=(-1, 1), folder=folder)
        if "normal_recon_map" in var:
            util_vis.dump_images(o, var.idx, "normal_recon",
                                 var.normal_recon_map, from_range=(-1, 1),
                                 folder=folder)
        # NN-view panels when the NN branch produced maps (reference
        # `model/runner.py:484-491`)
        if "input_NN_0" in var:
            for v in range(o.reg.n_views):
                sel = var[f"input_NN_{v}"]
                util_vis.dump_images(
                    o, var.idx, f"image_input_NN_{v}", sel.rgb_input_map,
                    masks=sel.mask_input_map, from_range=(0, 1),
                    poses=var.get(f"pose_NN_{v}"), folder=folder)
        if "rgb_recon_map_NN_0" in var and "mask_recon_map_NN_0" in var:
            for v in range(o.reg.n_views):
                util_vis.dump_images(
                    o, var.idx, f"image_recon_NN_{v}",
                    var[f"rgb_recon_map_NN_{v}"],
                    masks=var[f"mask_recon_map_NN_{v}"], from_range=(0, 1),
                    poses=var.get(f"pose_NN_{v}"), folder=folder)
        if "mesh_pred" in var:
            util_vis.dump_meshes(o, var.idx, "mesh", var.mesh_pred,
                                 folder=folder)
        if "dpc_points" in var and "dpc_pred" in var:
            util_vis.dump_pointclouds_compare(
                o, var.idx, "pointclouds_comp", var.dpc_pred,
                var.dpc_points, folder=folder)
        if not train and "cd_acc" in var:
            chamfer_fname = f"{self.opt.output_path}/chamfer.txt"
            with open(chamfer_fname, "w" if write_new else "a") as f:
                for i, acc, comp in zip(np.asarray(var.idx),
                                        np.asarray(var.cd_acc),
                                        np.asarray(var.cd_comp)):
                    f.write(f"{i} {acc:.8f} {comp:.8f}\n")

    def save_vis_dumps(self, opt, folder):
        if not self.viz_data:
            return
        os.makedirs(f"{opt.output_path}/{folder}", exist_ok=True)
        for batch in self.viz_data:
            var = parallel.shard_batch(self.mesh, _batch_to_var(batch),
                                       allow_replicate=True)
            var = self._eval_forward(self.params, self.batch_stats, var)
            util_vis.dump_images(opt, var.idx, "image_input",
                                 var.rgb_input_map, from_range=(0, 1),
                                 folder=folder)
            if "rgb_recon_map" in var:
                util_vis.dump_images(opt, var.idx, "image_recon",
                                     var.rgb_recon_map,
                                     masks=var.mask_hard_map,
                                     from_range=(0, 1), poses=var.pose,
                                     folder=folder)
                util_vis.dump_images(opt, var.idx, "mask_recon",
                                     var.mask_recon_map, folder=folder)
            util_vis.dump_images(opt, var.idx, "mask_input",
                                 var.mask_input_map, folder=folder)
            if "normal_recon_map" in var:
                util_vis.dump_images(opt, var.idx, "normal_recon",
                                     var.normal_recon_map,
                                     from_range=(-1, 1), folder=folder)

    def _dump_rotating_vis(self, opt, ep, n_views=50):
        """Per-eval visualization dumps for the viz samples: predicted mesh,
        pred/GT point-cloud compare, rotating-view GIFs (reference
        `runner.py:349-357` + `dump_results(train=True)`)."""
        opt_e = self.graph_eval.opt
        folder = f"vis_{ep}"
        for batch in self.viz_data:
            var = parallel.shard_batch(self.mesh, _batch_to_var(batch),
                                       allow_replicate=True)
            var = self._eval_forward_vis(self.params, self.batch_stats, var)
            try:
                eval_3D.eval_metrics(opt_e, var, self.graph.sdf_network.apply,
                                     self.params["sdf_network"],
                                     vis_only=True,
                                     rng=np.random.RandomState(ep))
                var = self.vis_rotate(opt, var, n_views=n_views)
                self.dump_results(opt_e, var, ep, train=True)
                util_vis.dump_gifs(self.opt, var.idx, "image_rotate",
                                   var.rotating_imgs, from_range=(0, 1),
                                   folder=folder)
                util_vis.dump_gifs(self.opt, var.idx, "mask_rotate",
                                   var.rotating_masks, folder=folder)
                util_vis.dump_gifs(self.opt, var.idx, "normal_rotate",
                                   var.rotating_normals, from_range=(0, 1),
                                   folder=folder)
            except Exception as e:  # vis must never kill training
                log.warn(f"rotating vis failed: {e}")

    # -------------------------------------------------------- rotating views
    def vis_rotate(self, opt, var, n_views=50, vis_NN=False):
        """Render rotating-azimuth views for GIFs (reference
        `runner.py:406-427`); `vis_NN` textures with the NN view's RGB latent
        (reference `runner.py:416`)."""
        opt_e = self.graph_eval.opt
        vis_pose = self.graph.get_rotate_pose(n_views=n_views)
        B = np.asarray(var.idx).shape[0]
        proj_rgb = var.proj_latent_rgb_NN if vis_NN else var.proj_latent_rgb
        imgs, masks, normals = [], [], []
        for i in range(n_views):
            pose_i = jnp.broadcast_to(vis_pose[i][None], (B, 3, 4))
            out = self.graph_eval.render(
                self.params, pose_i, var.intr,
                jnp.ones_like(var.scale_dist), var.proj_latent_sdf,
                proj_rgb, None, None, training=False)
            H, W = opt_e.H, opt_e.W
            imgs.append(np.asarray(out.rgb).reshape(B, H, W, 3))
            masks.append(np.asarray(out.mask).reshape(B, H, W, 1))
            normals.append(np.asarray(out.normal).reshape(B, H, W, 3) / 2
                           + 0.5)
        var.rotating_imgs = imgs
        var.rotating_masks = masks
        var.rotating_normals = normals
        return var
