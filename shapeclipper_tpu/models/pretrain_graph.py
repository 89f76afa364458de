"""Sphere-initialization pretraining graph.

Port of the reference pretrainer graph (reference `model/pretrainer.py:117-181`):
random latents ~ N(0, pre.latent_std) replace the encoder output; the SDF MLP
is fit to the analytic sphere SDF ||x|| - radius on uniform points; optionally
the viewpoint estimator's azimuth distribution is pushed toward uniform with a
1-D Wasserstein loss on real images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import losses as L
from ..utils.easydict import EasyDict as edict
from .graph import Graph


class PretrainGraph(Graph):
    def forward(self, params, stats, var, rng, training=True):
        opt = self.opt
        var = edict(var)
        rng_lat, rng_pts = jax.random.split(rng)
        B = (var.rgb_input_map.shape[0] if "rgb_input_map" in var
             else opt.batch_size)
        latent_dim = opt.arch.latent_dim_shape + opt.arch.latent_dim_rgb
        latent_raw = (jax.random.normal(rng_lat, (B, latent_dim))
                      * opt.pre.latent_std)
        latent_shape = latent_raw[:, :opt.arch.latent_dim_shape]

        proj_sdf, s_ps = self._apply_bn(
            self.latent_proj_shape, params["latent_proj_shape"],
            stats["latent_proj_shape"], (latent_shape,), training, False)
        var.proj_latent_sdf = proj_sdf
        new_stats = dict(stats)
        new_stats["latent_proj_shape"] = s_ps

        loss = edict(all=0.0)
        if opt.pre.density:
            loss.sdf = self.get_sdf_loss(params, rng_pts, proj_sdf)
            loss.all = loss.all + loss.sdf
        if opt.pre.viewpoint:
            est, s_est = self._apply_bn(
                self.estimator, params["estimator"], stats["estimator"],
                (var.rgb_input_map,), training, False)
            new_stats["estimator"] = s_est
            loss.w_dist = L.cam_uniform_loss(est.trig_azim, emd_p=1)
            loss.all = loss.all + loss.w_dist
        return var, loss, new_stats

    def get_sdf_loss(self, params, rng, proj_latent_sdf):
        """MSE(sdf(x), ||x|| - radius) on pre.sample_points uniform points per
        batch element (reference `model/pretrainer.py:174-181`)."""
        opt = self.opt
        B = proj_latent_sdf.shape[0]
        P = opt.pre.sample_points
        lo, hi = opt.pre.sample_range
        points = jax.random.uniform(rng, (B, P, 3), minval=lo, maxval=hi)
        out = self.sdf_network.apply({"params": params["sdf_network"]},
                                     points, proj_latent_sdf)
        sdf = out[..., :1]
        sdf_gt = jnp.linalg.norm(points, axis=-1, keepdims=True) - opt.pre.radius
        return L.mse_loss(sdf, sdf_gt)
