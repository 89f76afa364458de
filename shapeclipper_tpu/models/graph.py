"""Training computation graph: encoder -> latents -> pose -> render -> losses.

Functional port of the reference Graph (reference `model/graph.py:42-321`).
The Graph is a plain-python bundle of flax modules exposing pure functions
over a (params, batch_stats) pytree, so the entire forward + loss traces into
one jit'd XLA computation (including the CLIP-NN consistency branch and the
flip-symmetry estimator pass).

Input layout is NHWC (TPU-native); NN stacks are [B, K, ...] (the reference
stacks neighbors on a trailing dim, `data/pix3d.py:203-222`).

Device-side NN view selection: the reference scores neighbors by mask-IoU and
does weighted sampling without replacement with host numpy
(`model/graph.py:119-142`); here the same Plackett-Luce sampling is done with
Gumbel top-k under `jax.random`, keeping the step fully on device.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .. import camera
from .. import losses as L
from ..render import renderer as renderlib
from ..utils.easydict import EasyDict as edict
from .estimator import Estimator
from .implicit import RGBNetwork, SDFNetwork, init_density_params
from .layers import LatentProjection
from .resnet import make_encoder

# canonical-frame permutation applied after Rz·Rx·Ry (reference
# `model/graph.py:276-281`)
R_PERMUTE = jnp.array([[-1.0, 0.0, 0.0],
                       [0.0, 0.0, -1.0],
                       [0.0, -1.0, 0.0]], dtype=jnp.float32)


def _dtype_from_str(s):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[s or "float32"]


def pose_from_trig(opt, trig_azim, trig_elev, trig_theta, scale_focal,
                   scale_dist):
    """Compose estimator outputs into (pose [B,3,4], intr [B,3,3]).

    Rotation = Rz·Rx·Ry·R_permute, translation = [0, 0, dist·scale_dist]
    (reference `model/graph.py:267-293` pred_pose)."""
    Ry = camera.azim_to_rotation_matrix(trig_azim, "trig")
    Rx = camera.elev_to_rotation_matrix(trig_elev, "trig")
    Rz = camera.roll_to_rotation_matrix(trig_theta, "trig")
    R = Rz @ Rx @ Ry @ R_PERMUTE[None]
    pose_R = camera.pose(R=R)
    trans_z = scale_dist * opt.camera.dist
    trans = jnp.stack([jnp.zeros_like(trans_z), jnp.zeros_like(trans_z),
                       trans_z], axis=-1)
    pose_T = camera.pose(t=trans)
    pose = camera.compose([pose_R, pose_T])
    intr = camera.get_intr(opt, scale_focal)
    return pose, intr


class Graph:
    """Model bundle + pure forward/loss functions."""

    def __init__(self, opt):
        self.opt = opt
        self.bn_replicas = self._resolve_bn_replicas(opt)
        enc_dtype = _dtype_from_str(opt.get("tpu", {}).get("encoder_dtype"))
        self.encoder = make_encoder(opt, dtype=enc_dtype)
        self.estimator = Estimator.from_opt(opt, dtype=enc_dtype)
        self.latent_proj_shape = LatentProjection(
            opt.arch.latent_dim_shape, opt.arch.impl_sdf.proj_latent_dim)
        self.latent_proj_rgb = LatentProjection(
            opt.arch.latent_dim_rgb, opt.arch.impl_rgb.proj_latent_dim)
        self.sdf_network = SDFNetwork.from_opt(opt)
        self.rgb_network = RGBNetwork.from_opt(opt)

    # ------------------------------------------------------------------ init
    def init(self, rng) -> Dict[str, Any]:
        opt = self.opt
        keys = jax.random.split(rng, 8)
        img = jnp.zeros((1, opt.H, opt.W, 3), jnp.float32)
        latent_shape = jnp.zeros((1, opt.arch.latent_dim_shape))
        latent_rgb = jnp.zeros((1, opt.arch.latent_dim_rgb))
        pts = jnp.zeros((1, 4, 3))
        lat_s = jnp.zeros((1, 4, opt.arch.impl_sdf.proj_latent_dim))
        lat_r = jnp.zeros((1, 4, opt.arch.impl_rgb.proj_latent_dim))
        feat = jnp.zeros((1, 4, opt.arch.impl_sdf.n_channels))

        v_enc = self.encoder.init(keys[0], img, train=False)
        v_est = self.estimator.init(keys[1], img, train=False)
        v_ps = self.latent_proj_shape.init(keys[2], latent_shape, train=False)
        v_pr = self.latent_proj_rgb.init(keys[3], latent_rgb, train=False)
        v_sdf = self.sdf_network.init(keys[4], pts, lat_s)
        v_rgb = self.rgb_network.init(keys[5], pts, lat_r, feat)

        params = {
            "encoder": v_enc["params"],
            "estimator": v_est["params"],
            "latent_proj_shape": v_ps["params"],
            "latent_proj_rgb": v_pr["params"],
            "sdf_network": v_sdf["params"],
            "rgb_network": v_rgb["params"],
            "density": init_density_params(opt),
        }
        if opt.loss_weight.get("category_reg") is not None:
            params["category_centers"] = 0.02 * jax.random.normal(
                keys[6], (opt.data.num_classes, opt.arch.impl_sdf.proj_latent_dim))
        batch_stats = {
            "encoder": v_enc.get("batch_stats", {}),
            "estimator": v_est.get("batch_stats", {}),
            "latent_proj_shape": v_ps.get("batch_stats", {}),
            "latent_proj_rgb": v_pr.get("batch_stats", {}),
        }
        params, batch_stats = self._load_pretrained_encoders(params,
                                                             batch_stats)
        return {"params": params, "batch_stats": batch_stats}

    def _load_pretrained_encoders(self, params, batch_stats):
        """ImageNet-pretrained initialization from converted .npz artifacts
        (scripts/convert_weights.py). Parity: the reference initializes the
        image encoder from torchvision pretrained weights gated by
        arch.enc_pretrained (reference `model/graph.py:50-51`) and the
        estimator's ResNet18 backbone pretrained unconditionally
        (`model/view_estimator.py:41`). With no network access, weights are
        offline artifacts; a configured-but-missing artifact degrades to
        scratch init with a loud warning."""
        import os

        from ..utils.log import log
        from .resnet import load_pretrained_npz, merge_tree

        opt = self.opt
        jobs = []
        if opt.arch.get("enc_pretrained"):
            jobs.append(("encoder", (),
                         opt.arch.get("enc_weights")
                         or f"weights/{opt.arch.enc_network}.npz"))
        # the estimator backbone is pretrained UNCONDITIONALLY in the
        # reference (`model/view_estimator.py:41`, pretrained=True) — not
        # gated by arch.enc_pretrained
        jobs.append(("estimator", ("ResNet_0",),
                     opt.arch.get("est_weights") or "weights/resnet18.npz"))
        for top, sub, path in jobs:
            if not os.path.isfile(path):
                log.warn(f"pretrained weights {path} missing — {top} trains "
                         f"from scratch (convert weights with "
                         f"scripts/convert_weights.py; see RUNBOOK.md)")
                continue
            node_p = params[top]
            node_s = batch_stats[top]
            for k in sub:
                node_p, node_s = node_p[k], node_s[k]
            new_p, stats_updates = load_pretrained_npz(node_p, path,
                                                       skip_fc=True)
            new_s = merge_tree(node_s, stats_updates)

            def set_subtree(holder, value):
                if not sub:
                    holder[top] = value
                    return
                node = holder[top] = dict(holder[top])
                for k in sub[:-1]:
                    node = node[k] = dict(node[k])
                node[sub[-1]] = value

            set_subtree(params, new_p)
            set_subtree(batch_stats, new_s)
            log.info(f"loaded pretrained {top} weights from {path}")
        return params, batch_stats

    # --------------------------------------------------------------- helpers
    @staticmethod
    def _resolve_bn_replicas(opt):
        """Per-replica BN group count (tpu.bn_mode=per_replica).

        The reference's DDP computes BN moments per GPU over its local
        minibatch (reference `model/runner.py:121`); under GSPMD the whole
        step is traced globally, so the default is GLOBAL-batch moments
        (PARITY.md). `tpu.bn_mode=per_replica` recovers DDP semantics: a 1-D
        data mesh shards the batch axis into contiguous equal blocks, so
        sub-grouping every BN group by the mesh size computes exactly the
        per-device moments. Shard count comes from tpu.bn_replicas when set,
        else the mesh size."""
        tpu = opt.get("tpu", {})
        if tpu.get("bn_mode", "global") != "per_replica":
            return 1
        n = tpu.get("bn_replicas")
        if n:
            return int(n)
        from ..parallel import make_mesh
        return make_mesh(opt).size

    def _apply_bn(self, module, params, stats, args, train, bn_eval,
                  groups=1, stats_groups=None, **kwargs):
        """Apply a BN-bearing module; returns (out, new_stats).

        With per-replica BN (see _resolve_bn_replicas), every view-group is
        sub-grouped by the shard count, and running stats update from shard
        0's moments only — matching DDP's broadcast_buffers semantics where
        rank 0's buffer EMA wins each step (torch DDP default)."""
        rep = self.bn_replicas
        if rep > 1 and train and not bn_eval:
            base = (stats_groups if stats_groups is not None
                    else tuple(range(groups)))
            groups = groups * rep
            stats_groups = tuple(g * rep for g in base)
        if groups != 1 or stats_groups is not None:
            kwargs = dict(kwargs, groups=groups, stats_groups=stats_groups)
        variables = {"params": params, "batch_stats": stats}
        if train and not bn_eval:
            out, mut = module.apply(variables, *args, train=True,
                                    mutable=["batch_stats"], **kwargs)
            return out, mut["batch_stats"]
        out = module.apply(variables, *args, train=False, **kwargs)
        return out, stats

    def pred_pose(self, params, stats, images, train, bn_eval, groups=1,
                  stats_groups=None):
        """Estimator -> (pose [B,3,4], intr, scale_dist, trig tuple, new_stats).

        Rotation composed as Rz·Rx·Ry·R_permute with z-translation
        dist·scale_dist (reference `model/graph.py:267-293`). `groups` batches
        several estimator passes into one ResNet18 call with per-group BN
        moments (exact parity with separate calls — see GroupBatchNorm).
        """
        opt = self.opt
        est, new_stats = self._apply_bn(self.estimator, params["estimator"],
                                        stats["estimator"], (images,),
                                        train, bn_eval, groups=groups,
                                        stats_groups=stats_groups)
        pose, intr = pose_from_trig(opt, est.trig_azim, est.trig_elev,
                                    est.trig_theta, est.scale_focal,
                                    est.scale_dist)
        return pose, intr, est, new_stats

    def encode(self, params, stats, images, train, bn_eval):
        """Image -> (proj_latent_sdf, proj_latent_rgb, latent_raw, new_stats)."""
        opt = self.opt
        latent_raw, s_enc = self._apply_bn(
            self.encoder, params["encoder"], stats["encoder"], (images,),
            train, bn_eval)
        latent_shape = latent_raw[:, :opt.arch.latent_dim_shape]
        latent_rgb = latent_raw[:, opt.arch.latent_dim_shape:]
        proj_sdf, s_ps = self._apply_bn(
            self.latent_proj_shape, params["latent_proj_shape"],
            stats["latent_proj_shape"], (latent_shape,), train, bn_eval)
        proj_rgb, s_pr = self._apply_bn(
            self.latent_proj_rgb, params["latent_proj_rgb"],
            stats["latent_proj_rgb"], (latent_rgb,), train, bn_eval)
        new_stats = dict(stats)
        new_stats.update(encoder=s_enc, latent_proj_shape=s_ps,
                         latent_proj_rgb=s_pr)
        return proj_sdf, proj_rgb, latent_raw, new_stats

    def _implicit_applies(self):
        """(sdf_apply, rgb_apply), optionally compute-casting the implicit
        MLPs to tpu.implicit_dtype (default bfloat16 since the 3-seed, 300-step
        convergence A/B in output/ab_bf16.json matched float32 on loss and
        final chamfer; SCL_IMPLICIT_DTYPE env overrides for A/B runs)."""
        dtype = _dtype_from_str(
            os.environ.get("SCL_IMPLICIT_DTYPE")
            or self.opt.get("tpu", {}).get("implicit_dtype"))
        if dtype == jnp.float32:
            return self.sdf_network.apply, self.rgb_network.apply
        sdf_f, rgb_f = self.sdf_network.apply, self.rgb_network.apply

        def cast(tree):
            return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)

        def sdf_apply(v, pts, lat):
            return sdf_f(cast(v), pts.astype(dtype),
                         lat.astype(dtype)).astype(jnp.float32)

        def rgb_apply(v, pts, lat, feat):
            return rgb_f(cast(v), pts.astype(dtype), lat.astype(dtype),
                         feat.astype(dtype)).astype(jnp.float32)

        return sdf_apply, rgb_apply

    def render(self, params, pose, intr, scale_dist, proj_sdf, proj_rgb,
               ray_idx, rng, training, visualize=False, compute_eikonal=None,
               eikonal_batch=None):
        sdf_apply, rgb_apply = self._implicit_applies()

        def run(params, pose, intr, scale_dist, proj_sdf, proj_rgb, ray_idx,
                rng):
            return renderlib.render(
                self.opt, sdf_apply, rgb_apply,
                params, pose, intr, scale_dist, proj_sdf, proj_rgb,
                ray_idx=ray_idx, rng=rng, training=training,
                visualize=visualize, compute_eikonal=compute_eikonal,
                eikonal_batch=eikonal_batch)

        env_remat = os.environ.get("SCL_REMAT_RENDERER")  # A/B override
        cfg_remat = (self.opt.get("tpu", {}).get("remat_renderer")
                     if env_remat is None else env_remat != "0")
        if training and cfg_remat:
            # rematerialize renderer activations in the backward pass (trades
            # FLOPs for HBM; useful for large ray/sample counts)
            run = jax.checkpoint(run)
        return run(params, pose, intr, scale_dist, proj_sdf, proj_rgb,
                   ray_idx, rng)

    # --------------------------------------------------------------- forward
    def forward(self, params, stats, var, rng, training=False, get_loss=True,
                bn_eval=False, visualize=False, render=True):
        """Full forward. `var` is an EasyDict batch; returns (var, loss,
        new_stats) with reconstruction fields added.

        `render=False` skips the volume render entirely (metric-only eval:
        the 3D metrics consume just the SDF latent + predicted pose, but the
        reference renders full eval-resolution maps anyway,
        `model/runner.py:398-404` — pure waste on the metric path).

        Reference `model/graph.py:68-112`.
        """
        assert render or not get_loss, "losses require rendered maps"
        opt = self.opt
        var = edict(var)
        rng_render, rng_nn, rng_nn_render = (
            jax.random.split(rng, 3) if rng is not None else (None, None, None))
        ray_idx = var.get("ray_idx") if (opt.render.rand_sample and training) \
            else None

        sym_merge = (training and opt.loss_weight.get("cam_sym") is not None
                     and opt.get("tpu", {}).get("merge_flip_estimator", True))
        nn_active = ((opt.loss_weight.get("nearest_img") is not None
                      or opt.loss_weight.get("nearest_mask") is not None)
                     and training and "rgb_input_map_NN" in var)
        # merge the query + NN-view encoder AND estimator chains into ONE
        # grouped-BN call each (per step: one ResNet34 + one ResNet18 instead
        # of the reference's (1+V) + (2+V) chains, `model/graph.py:174-218`)
        merge_enc = (nn_active and "latent" not in var
                     and opt.get("tpu", {}).get("merge_encoders", True))

        prep = None
        if merge_enc:
            sels = self._nn_select(var, rng_nn, training)
            (proj_sdf, proj_rgb, latent_raw, pose, intr, est, prep,
             new_stats) = self._encode_and_pose_merged(
                params, stats, var, sels, training, bn_eval, sym_merge)
        else:
            if "latent" in var:  # pretraining injects random latents
                latent_raw = var.latent
                latent_shape = latent_raw[:, :opt.arch.latent_dim_shape]
                latent_rgb = latent_raw[:, opt.arch.latent_dim_shape:]
                proj_sdf, s_ps = self._apply_bn(
                    self.latent_proj_shape, params["latent_proj_shape"],
                    stats["latent_proj_shape"], (latent_shape,), training,
                    bn_eval)
                proj_rgb, s_pr = self._apply_bn(
                    self.latent_proj_rgb, params["latent_proj_rgb"],
                    stats["latent_proj_rgb"], (latent_rgb,), training, bn_eval)
                new_stats = dict(stats)
                new_stats.update(latent_proj_shape=s_ps, latent_proj_rgb=s_pr)
            else:
                proj_sdf, proj_rgb, latent_raw, new_stats = self.encode(
                    params, stats, var.rgb_input_map, training, bn_eval)
            if sym_merge:
                # query AND horizontally-flipped estimator passes as ONE
                # ResNet18 batch with PER-GROUP BN moments — each half is
                # normalized exactly as a separate call would be (the
                # reference runs the flip pass in-loss, `model/loss.py:114`),
                # and only the query half updates the running stats (the
                # reference's duplicate update is discarded).
                B = var.rgb_input_map.shape[0]
                both = jnp.concatenate(
                    [var.rgb_input_map, var.rgb_input_map[:, :, ::-1, :]])
                pose2, intr2, est2, s_est = self.pred_pose(
                    params, new_stats, both, training, bn_eval, groups=2,
                    stats_groups=(0,))
                pose, intr = pose2[:B], intr2[:B]
                est = jax.tree_util.tree_map(lambda a: a[:B], est2)
                var.trig_azim_flipped = est2.trig_azim[B:]
                var.trig_elev_flipped = est2.trig_elev[B:]
                var.trig_theta_flipped = est2.trig_theta[B:]
            else:
                pose, intr, est, s_est = self.pred_pose(
                    params, new_stats, var.rgb_input_map, training, bn_eval)
            new_stats = dict(new_stats)
            new_stats["estimator"] = s_est
        var.proj_latent_sdf, var.proj_latent_rgb = proj_sdf, proj_rgb
        var.pose, var.intr, var.scale_dist = pose, intr, est.scale_dist
        var.trig_azim, var.trig_elev, var.trig_theta = (
            est.trig_azim, est.trig_elev, est.trig_theta)
        var.scale_focal = est.scale_focal

        # canonicalize the supervision normal map
        normal_sup = var.get("normal_gt", var.get("normal_input"))
        if normal_sup is not None:
            var.normal_transformed = camera.transform_normal(normal_sup, pose)

        merge_nn = (nn_active and not visualize
                    and bool(opt.render.rand_sample)
                    and ray_idx is not None and "ray_idx_NN" in var
                    and opt.get("tpu", {}).get("merge_nn_render", True))

        if not render:
            return var, None, new_stats

        if merge_nn:
            new_stats = self._forward_merged(
                params, new_stats, var, (rng_render, rng_nn), training,
                bn_eval, pose, intr, est, proj_sdf, proj_rgb, ray_idx,
                prep=prep)
        else:
            out = self.render(params, pose, intr, est.scale_dist, proj_sdf,
                              proj_rgb, ray_idx, rng_render, training,
                              visualize=visualize)
            var.rgb_recon, var.mask_recon = out.rgb, out.mask
            var.mask_hard, var.depth_recon = out.mask_hard, out.depth
            var.normal_recon, var.grad_eikonal = out.normal, out.grad_eikonal
            if visualize:
                var.rendering_points = out.extras["points"]
                var.rendering_transparency = out.extras["transparency"]
                var.rendering_rgb = out.extras["rgb_samples"]
            if nn_active:
                new_stats = self.forward_NN(params, new_stats, var, rng_nn,
                                            rng_nn_render, training, bn_eval,
                                            prep=prep)

        if not (opt.render.rand_sample and training):
            B = var.rgb_recon.shape[0]
            var.rgb_recon_map = var.rgb_recon.reshape(B, opt.H, opt.W, 3)
            var.mask_recon_map = var.mask_recon.reshape(B, opt.H, opt.W, 1)
            var.mask_hard_map = var.mask_hard.reshape(B, opt.H, opt.W, 1)
            var.normal_recon_map = var.normal_recon.reshape(B, opt.H, opt.W, 3)
            if normal_sup is not None:
                # data resolution, not render resolution (reference
                # `model/graph.py:101` uses opt.image_size here)
                var.normal_transformed_map = var.normal_transformed.reshape(
                    B, opt.image_size[0], opt.image_size[1], 3)

        loss = None
        if get_loss:
            loss = self.compute_loss(params, new_stats, var, training, bn_eval)
        return var, loss, new_stats

    def _forward_merged(self, params, stats, var, rngs, training, bn_eval,
                        pose, intr, est, proj_sdf, proj_rgb, ray_idx,
                        prep=None):
        """ONE batched field evaluation for the query + all NN views
        (tpu.merge_nn_render): the SDF/RGB fwd+bwd chains dominate the train
        step and the reference runs them once per view
        (`model/graph.py:87-90,203-209`); batching them multiplies the matmul
        M-dimension by (1+n_views) and removes a full per-view chain of op
        dispatches. Semantically identical per view (the eikonal sampling is
        restricted to the query slice); only the stratified-jitter RNG stream
        differs from the sequential formulation. `prep` carries the per-view
        render inputs when the encoder merge already computed them."""
        opt = self.opt
        rng_render, rng_nn = rngs
        B = pose.shape[0]
        V = opt.reg.n_views
        new_stats = stats
        if prep is None:
            prep, new_stats = self._nn_prepare(params, stats, var, rng_nn,
                                               training, bn_eval)
        pose_all = jnp.concatenate([pose] + [p["pose"] for p in prep])
        intr_all = jnp.concatenate([intr] + [p["intr"] for p in prep])
        scale_all = jnp.concatenate([est.scale_dist]
                                    + [p["scale_dist"] for p in prep])
        proj_sdf_all = jnp.concatenate([proj_sdf] * (1 + V))
        proj_rgb_all = jnp.concatenate([proj_rgb]
                                       + [p["proj_rgb"] for p in prep])
        ray_idx_all = (jnp.concatenate([ray_idx]
                                       + [p["ray_idx"] for p in prep])
                       if ray_idx is not None else None)
        out = self.render(params, pose_all, intr_all, scale_all,
                          proj_sdf_all, proj_rgb_all, ray_idx_all,
                          rng_render, training, eikonal_batch=B)
        var.rgb_recon = out.rgb[:B]
        var.mask_recon = out.mask[:B]
        var.mask_hard = out.mask_hard[:B]
        var.depth_recon = out.depth[:B]
        var.normal_recon = out.normal[:B]
        var.grad_eikonal = out.grad_eikonal          # query slice only [B,2R]
        for v in range(V):
            lo, hi = B * (1 + v), B * (2 + v)
            var[f"rgb_recon_NN_{v}"] = out.rgb[lo:hi]
            var[f"mask_recon_NN_{v}"] = out.mask[lo:hi]
            var[f"depth_recon_NN_{v}"] = out.depth[lo:hi]
            var[f"normal_recon_NN_{v}"] = out.normal[lo:hi]
        return new_stats

    # ------------------------------------------------------------- NN branch
    def _nn_select(self, var, rng_select, training):
        """IoU-weighted neighbor selection + per-view input gathering
        (reference `model/graph.py:119-142`): stores idx_NN / input_NN_v in
        var and returns the per-view input edicts. NN tensors are
        [B, K, ...]; selection is device-side Gumbel top-k."""
        opt = self.opt
        K = var.rgb_input_map_NN.shape[1]
        V = opt.reg.n_views
        assert V <= K
        B = var.rgb_input_map.shape[0]

        if K == V:
            # the data pipeline pre-selected the views (data.preselect_NN):
            # only the chosen views were loaded/uploaded
            idx_NN = jnp.broadcast_to(jnp.arange(V)[None], (B, V))
        else:
            # IoU-scored selection weights (no gradient), reference
            # `model/graph.py:119-142`
            cur_masks = jax.lax.stop_gradient(
                var.mask_input_NN.reshape(B, K, -1))          # [B,K,N]
            inp_mask = jax.lax.stop_gradient(
                var.mask_input.reshape(B, 1, -1))
            inter = jnp.sum(cur_masks * inp_mask, axis=-1)
            union = jnp.sum(cur_masks + inp_mask - cur_masks * inp_mask
                            + 1e-8, axis=-1)
            scores = (1.0 - inter / union) ** opt.reg.sample_temp  # [B,K]
            var.nn_scores = scores  # selection weights (vis / parity tests)
            # Gumbel top-k == weighted sampling without replacement
            logp = jnp.log(jnp.maximum(scores, 1e-20))
            gumbel = -jnp.log(-jnp.log(jax.random.uniform(
                rng_select, (B, K), minval=1e-20, maxval=1.0)))
            _, idx_NN = jax.lax.top_k(logp + gumbel, V)        # [B,V]
        var.idx_NN = idx_NN  # which neighbors were selected (for vis)

        def take(arr, v):
            # arr: [B, K, ...] -> [B, ...] at per-sample index idx_NN[:, v]
            idx = idx_NN[:, v]
            return jnp.take_along_axis(
                arr, idx.reshape(B, *([1] * (arr.ndim - 1))), axis=1)[:, 0]

        sels = []
        for v in range(V):
            sel = edict()
            for key in ("rgb_input_map", "mask_input_map", "normal_input_map",
                        "rgb_input", "mask_input", "normal_input"):
                sel[key] = take(var[f"{key}_NN"], v)
            if opt.render.rand_sample and training and "ray_idx_NN" in var:
                sel.ray_idx = take(var.ray_idx_NN, v)
            if "pose_gt_NN" in var:
                sel.pose_gt = take(var.pose_gt_NN, v)
            var[f"input_NN_{v}"] = sel
            sels.append(sel)
        return sels

    def _encode_and_pose_merged(self, params, stats, var, sels, training,
                                bn_eval, sym_merge):
        """ONE grouped-BN ResNet34 call for the query + NN-view encoders and
        ONE grouped-BN ResNet18 call for the query (+ flipped) + NN-view
        estimator passes (tpu.merge_encoders). Numerically equal to the
        sequential per-view calls (reference `model/graph.py:174-218`,
        `model/loss.py:114`): each view-group is normalized by its own batch
        moments and the running stats compose the same sequential EMA —
        query first, then each NN view; the flip group's update is discarded
        exactly as in the unmerged path."""
        opt = self.opt
        B = var.rgb_input_map.shape[0]
        V = len(sels)
        D_s = opt.arch.latent_dim_shape

        # ---- encoder: groups [query, NN_0..NN_{V-1}]
        imgs = jnp.concatenate([var.rgb_input_map]
                               + [s.rgb_input_map for s in sels])
        latent_all, s_enc = self._apply_bn(
            self.encoder, params["encoder"], stats["encoder"], (imgs,),
            training, bn_eval, groups=1 + V)
        latent_raw = latent_all[:B]
        latent_shape = latent_raw[:, :D_s]
        proj_sdf, s_ps = self._apply_bn(
            self.latent_proj_shape, params["latent_proj_shape"],
            stats["latent_proj_shape"], (latent_shape,), training, bn_eval)
        # the NN views re-use the QUERY's SDF latent (cross-instance shape
        # consistency) but project their OWN RGB latent — batch those too
        proj_rgb_all, s_pr = self._apply_bn(
            self.latent_proj_rgb, params["latent_proj_rgb"],
            stats["latent_proj_rgb"], (latent_all[:, D_s:],), training,
            bn_eval, groups=1 + V)
        proj_rgb = proj_rgb_all[:B]
        new_stats = dict(stats)
        new_stats.update(encoder=s_enc, latent_proj_shape=s_ps,
                         latent_proj_rgb=s_pr)

        # ---- estimator: groups [query (, flipped), NN_0..NN_{V-1}]
        f = 1 if sym_merge else 0
        est_imgs = [var.rgb_input_map]
        if sym_merge:
            est_imgs.append(var.rgb_input_map[:, :, ::-1, :])
        est_imgs += [s.rgb_input_map for s in sels]
        G = 1 + f + V
        pose_all, intr_all, est_all, s_est = self.pred_pose(
            params, new_stats, jnp.concatenate(est_imgs), training, bn_eval,
            groups=G, stats_groups=(0,) + tuple(range(1 + f, G)))
        new_stats["estimator"] = s_est
        pose, intr = pose_all[:B], intr_all[:B]
        est = jax.tree_util.tree_map(lambda a: a[:B], est_all)
        if sym_merge:
            var.trig_azim_flipped = est_all.trig_azim[B:2 * B]
            var.trig_elev_flipped = est_all.trig_elev[B:2 * B]
            var.trig_theta_flipped = est_all.trig_theta[B:2 * B]

        prep = []
        for v in range(V):
            lo, hi = (1 + f + v) * B, (2 + f + v) * B
            proj_rgb_NN = proj_rgb_all[(1 + v) * B:(2 + v) * B]
            var[f"proj_latent_rgb_NN_{v}"] = proj_rgb_NN
            # reference parity: `proj_latent_rgb_NN` is overwritten every NN
            # view and so holds the LAST view's latent (reference
            # `model/graph.py:199-200`); vis_rotate(vis_NN=True) reads it
            var.proj_latent_rgb_NN = proj_rgb_NN
            var[f"pose_NN_{v}"] = pose_all[lo:hi]
            var[f"intr_NN_{v}"] = intr_all[lo:hi]
            var[f"scale_dist_NN_{v}"] = est_all.scale_dist[lo:hi]
            prep.append(dict(pose=pose_all[lo:hi], intr=intr_all[lo:hi],
                             scale_dist=est_all.scale_dist[lo:hi],
                             proj_rgb=proj_rgb_NN,
                             ray_idx=sels[v].get("ray_idx")))
        return (proj_sdf, proj_rgb, latent_raw, pose, intr, est, prep,
                new_stats)

    def _nn_prepare(self, params, stats, var, rng_select, training, bn_eval):
        """Neighbor selection + SEQUENTIAL per-view encode/pose (reference
        `model/graph.py:114-205`): stores input_NN_v / idx_NN / pose_NN_v /
        intr_NN_v / scale_dist_NN_v / proj_latent_rgb_NN_v in var and returns
        (per-view render inputs, new_stats). The training fast path replaces
        this with _encode_and_pose_merged (tpu.merge_encoders)."""
        opt = self.opt
        sels = self._nn_select(var, rng_select, training)
        prep = []
        for v, sel in enumerate(sels):
            # re-encode the NN image for its RGB latent; the SDF latent stays
            # the QUERY's (cross-instance shape consistency)
            latent_NN, s_enc = self._apply_bn(
                self.encoder, params["encoder"], stats["encoder"],
                (sel.rgb_input_map,), training, bn_eval)
            latent_rgb_NN = latent_NN[:, opt.arch.latent_dim_shape:]
            proj_rgb_NN, s_pr = self._apply_bn(
                self.latent_proj_rgb, params["latent_proj_rgb"],
                stats["latent_proj_rgb"], (latent_rgb_NN,), training, bn_eval)
            var[f"proj_latent_rgb_NN_{v}"] = proj_rgb_NN
            # reference parity: `proj_latent_rgb_NN` is overwritten every NN
            # view and so holds the LAST view's latent (reference
            # `model/graph.py:199-200`); vis_rotate(vis_NN=True) reads it
            var.proj_latent_rgb_NN = proj_rgb_NN

            pose_NN, intr_NN, est_NN, s_est = self.pred_pose(
                params, stats, sel.rgb_input_map, training, bn_eval)
            var[f"pose_NN_{v}"] = pose_NN
            var[f"intr_NN_{v}"] = intr_NN
            var[f"scale_dist_NN_{v}"] = est_NN.scale_dist

            ray_idx = sel.get("ray_idx") if (opt.render.rand_sample
                                             and training) else None
            prep.append(dict(pose=pose_NN, intr=intr_NN,
                             scale_dist=est_NN.scale_dist,
                             proj_rgb=proj_rgb_NN, ray_idx=ray_idx))
            stats = dict(stats)
            stats.update(encoder=s_enc, latent_proj_rgb=s_pr, estimator=s_est)
        return prep, stats

    def forward_NN(self, params, stats, var, rng_select, rng_render,
                   training, bn_eval, prep=None):
        """CLIP nearest-neighbor consistency branch, one render per view
        (reference `model/graph.py:114-218`). The training fast path batches
        these renders with the query's instead (_forward_merged); `prep`
        carries per-view render inputs when the encoder merge already
        computed them."""
        opt = self.opt
        B = var.rgb_input_map.shape[0]
        V = opt.reg.n_views
        if prep is None:
            prep, stats = self._nn_prepare(params, stats, var, rng_select,
                                           training, bn_eval)
        rngs_r = (jax.random.split(rng_render, V) if rng_render is not None
                  else [None] * V)
        for v, p in enumerate(prep):
            # compute_eikonal=False: NN-view eikonal gradients are never read
            # by any loss (eikonal uses only the query view's grad_eikonal)
            out = self.render(params, p["pose"], p["intr"], p["scale_dist"],
                              var.proj_latent_sdf, p["proj_rgb"],
                              p["ray_idx"], rngs_r[v], training,
                              compute_eikonal=False)
            var[f"rgb_recon_NN_{v}"] = out.rgb
            var[f"mask_recon_NN_{v}"] = out.mask
            var[f"depth_recon_NN_{v}"] = out.depth
            var[f"normal_recon_NN_{v}"] = out.normal
            if not (opt.render.rand_sample and training):
                # full-grid NN renders -> TB panels (reference
                # `model/graph.py:211-217`)
                var[f"rgb_recon_map_NN_{v}"] = out.rgb.reshape(
                    B, opt.H, opt.W, 3)
                var[f"mask_recon_map_NN_{v}"] = out.mask.reshape(
                    B, opt.H, opt.W, 1)
                var[f"normal_recon_map_NN_{v}"] = out.normal.reshape(
                    B, opt.H, opt.W, 3)
        return stats

    # ----------------------------------------------------------------- loss
    def compute_loss(self, params, stats, var, training, bn_eval=False):
        """Loss assembly gated by opt.loss_weight.* (reference
        `model/graph.py:220-265`)."""
        opt = self.opt
        lw = opt.loss_weight
        loss = edict()
        B = var.rgb_recon.shape[0]
        cat_w = var.get("category_weight")
        w3 = cat_w.reshape(B, 1, 1) if cat_w is not None else None

        if lw.get("render") is not None:
            target = var.get("rgb_gt", var.get("rgb_input"))
            loss.render = L.mse_loss(var.rgb_recon, target, weight=w3)
        if lw.get("mask") is not None:
            target = var.get("mask_gt", var.get("mask_input"))
            loss.mask = L.mask_loss(var.mask_recon, target,
                                    mask_mse=opt.reg.mask_mse, weight=w3)
        if lw.get("normal") is not None:
            mask_sup = var.get("mask_gt", var.get("mask_input")) > 0.5
            mask_pred = var.mask_recon > 0.5
            loss.normal = L.normal_loss(
                var.normal_recon, var.normal_transformed,
                mask_sup & mask_pred, normal_l1=opt.reg.normal_l1,
                weight=w3, tolerance=opt.reg.normal_tol)
        if lw.get("eikonal") is not None and training:
            loss.eikonal = L.mse_loss(
                var.grad_eikonal.reshape(B, -1), 1.0,
                weight=cat_w.reshape(B, 1) if cat_w is not None else None)
        if lw.get("cam_margin") is not None and training:
            loss.cam_margin = L.cam_margin_loss(opt, var.trig_elev,
                                                var.trig_theta)
        if lw.get("cam_uniform") is not None and training:
            loss.cam_uniform = L.cam_uniform_loss(var.trig_azim,
                                                  emd_p=opt.reg.emd_p)
        if lw.get("cam_sym") is not None and training:
            if "trig_azim_flipped" in var:
                # flipped pass already ran batched with the query estimator
                # pass (tpu.merge_flip_estimator; exact BN parity — see
                # forward())
                trig_f = (var.trig_azim_flipped, var.trig_elev_flipped,
                          var.trig_theta_flipped)
            else:
                flipped = var.rgb_input_map[:, :, ::-1, :]
                # train-mode BN on the flipped batch, matching the
                # reference's in-graph estimator call (`model/loss.py:114`,
                # also train-mode BN; past conv1 the flipped activations
                # have their own batch statistics); the duplicate
                # running-stats update is dropped
                est_f, _ = self._apply_bn(
                    self.estimator, params["estimator"], stats["estimator"],
                    (flipped,), not bn_eval, bn_eval)
                trig_f = (est_f.trig_azim, est_f.trig_elev, est_f.trig_theta)
            loss.cam_sym = L.cam_sym_loss(
                (var.trig_azim, var.trig_elev, var.trig_theta), trig_f)
        if lw.get("category_reg") is not None and training:
            loss.category_reg = L.category_reg_loss(
                var.proj_latent_sdf, params["category_centers"],
                var.category_label)
        if lw.get("nearest_img") is not None and training and "rgb_recon_NN_0" in var:
            loss.nearest_img = sum(
                L.mse_loss(var[f"rgb_recon_NN_{v}"],
                           var[f"input_NN_{v}"].rgb_input, weight=w3)
                for v in range(opt.reg.n_views))
        if lw.get("nearest_mask") is not None and training and "mask_recon_NN_0" in var:
            loss.nearest_mask = sum(
                L.mask_loss(var[f"mask_recon_NN_{v}"],
                            var[f"input_NN_{v}"].mask_input,
                            mask_mse=opt.reg.mask_mse, weight=w3)
                for v in range(opt.reg.n_views))
        if lw.get("nearest_normal") is not None and training and "normal_recon_NN_0" in var:
            total = 0.0
            for v in range(opt.reg.n_views):
                sel = var[f"input_NN_{v}"]
                mask_sup = sel.mask_input > 0.5
                mask_pred = var[f"mask_recon_NN_{v}"] > 0.5
                total = total + L.normal_loss(
                    var[f"normal_recon_NN_{v}"],
                    camera.transform_normal(sel.normal_input,
                                            var[f"pose_NN_{v}"]),
                    mask_sup & mask_pred, normal_l1=opt.reg.normal_l1,
                    weight=w3, tolerance=opt.reg.normal_tol)
            loss.nearest_normal = total
        return loss

    # -------------------------------------------------------- rotating poses
    def get_rotate_pose(self, n_views=50):
        """[n_views, 3, 4] azimuth-rotating poses for visualization
        (reference `model/graph.py:296-321`)."""
        opt = self.opt
        ranges = opt.data[opt.data.dataset]
        angle_azim = jnp.linspace(0, 2, n_views)[:, None] * jnp.pi
        mean_elev = (jnp.zeros((n_views, 1))
                     + (ranges.elev_range[1] + ranges.elev_range[0]) / 2 + 15)
        mean_theta = (jnp.zeros((n_views, 1))
                      + (ranges.theta_range[1] + ranges.theta_range[0]) / 2)
        angle_elev = mean_elev * jnp.pi / 180
        angle_theta = mean_theta * jnp.pi / 180
        trig_azim = jnp.concatenate([jnp.cos(angle_azim), jnp.sin(angle_azim)], 1)
        trig_elev = jnp.concatenate([jnp.cos(angle_elev), jnp.sin(angle_elev)], 1)
        trig_theta = jnp.concatenate([jnp.cos(angle_theta), jnp.sin(angle_theta)], 1)
        Ry = camera.azim_to_rotation_matrix(trig_azim, "trig")
        Rx = camera.elev_to_rotation_matrix(trig_elev, "trig")
        Rz = camera.roll_to_rotation_matrix(trig_theta, "trig")
        R = Rz @ Rx @ Ry @ R_PERMUTE[None]
        pose = camera.pose(R=R)
        pose_cam = camera.pose(t=jnp.array([0.0, 0.0, float(opt.camera.dist)]))
        return camera.compose([pose, jnp.broadcast_to(pose_cam, pose.shape)])


def summarize_loss(opt, loss, non_act_loss_keys=()):
    """Weighted sum of loss terms; inactive keys contribute 0 but stay in the
    dict (reference `model/runner.py:294-305`). NaN/Inf asserts become a
    `loss_finite` flag the host checks asynchronously."""
    loss = edict(loss)
    assert "all" not in loss
    loss_all = 0.0
    finite = jnp.array(True)
    for key in list(loss.keys()):
        assert key in opt.loss_weight, key
        if opt.loss_weight[key] is not None:
            term = jnp.mean(loss[key])
            finite = finite & jnp.isfinite(term)
            if key not in non_act_loss_keys:
                loss_all = loss_all + float(opt.loss_weight[key]) * term
    loss.all = loss_all
    loss.finite = finite
    return loss
