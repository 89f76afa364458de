"""VolSDF-style differentiable volume renderer — one fused, jittable function.

Functional port of the reference renderer (reference `model/renderer.py`).
The whole block — ray generation, depth sampling, SDF/RGB field evaluation,
volume-density normals, compositing, eikonal sampling — traces into a single
XLA computation over a static [B, R, S] lattice with no host round-trips.

TPU-first design points:
  * rays are generated only at the sampled pixels (camera.get_center_and_ray
    with ray_idx) instead of building the dense HxW grid and gathering
  * volume normals: -∇x density = -density'(sdf) · ∇x sdf, where ∇x sdf comes
    from one jax.vjp pass; this nests cleanly under the outer training
    gradient (the reference needed create_graph=True double backward,
    `model/renderer.py:93-107`)
  * batch/ray axes stay separate ([B, R, ...]) so the batch axis can be
    sharded over the device mesh; there is no cross-ray communication
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import camera
from ..models.implicit import (SplitLatent, laplace_density,
                               laplace_density_dsdf, sdf_with_gradient)
from ..ops.fused_sdf import fused_sdf_train, sdf_fwdmode_xla


def _sdf_grad_fn(opt, sdf_apply, params):
    """(points [B,N,3], latent [B,C], detach_latent) -> (sdf, feat, grad).

    tpu.sdf_grad_mode selects the formulation:
      * 'vjp' (default off-TPU): nested jax.vjp (the reference's
        create_graph=True shape, `model/renderer.py:93-107`)
      * 'fwd': hand-rolled forward-mode tangents in one 4x-wide first-order
        XLA pass (ops/fused_sdf.sdf_fwdmode_xla); measured 2x SLOWER than
        'vjp' on v5e — the 4x rows quadruple HBM activation traffic
      * 'pallas': fused Pallas forward+backward pair
        (ops/fused_sdf.fused_sdf_train) — the same forward-mode math, but
        both passes keep the tile's activations in VMEM; the training
        backward is a single hand-derived reverse kernel with no [B*N, W]
        HBM activations (TPU only; parity-tested against 'vjp')
    """
    mode = opt.get("tpu", {}).get("sdf_grad_mode", "vjp")
    if mode == "vjp":
        return lambda pts, lat, detach: sdf_with_gradient(
            sdf_apply, params["sdf_network"], pts, lat, detach_latent=detach)
    a = opt.arch.impl_sdf
    if mode == "pallas":
        return lambda pts, lat, detach: fused_sdf_train(
            params["sdf_network"], pts, lat, n_freqs=a.pos_enc,
            skip_in=tuple(a.skip_connection), n_hidden=a.n_hidden_layers,
            force_symmetry=opt.arch.force_symmetry, detach_latent=detach)
    assert mode == "fwd", mode
    dtype = {"bfloat16": jnp.bfloat16}.get(
        os.environ.get("SCL_IMPLICIT_DTYPE")
        or opt.get("tpu", {}).get("implicit_dtype"), jnp.float32)
    return lambda pts, lat, detach: sdf_fwdmode_xla(
        params["sdf_network"], pts, lat, n_freqs=a.pos_enc,
        skip_in=tuple(a.skip_connection), n_hidden=a.n_hidden_layers,
        force_symmetry=opt.arch.force_symmetry, detach_latent=detach,
        dtype=dtype)


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray          # [B, R, 3]
    mask: jnp.ndarray         # [B, R, 1]
    mask_hard: jnp.ndarray    # [B, R, 1]
    depth: jnp.ndarray        # [B, R, 1]
    normal: jnp.ndarray       # [B, R, 3]
    grad_eikonal: Optional[jnp.ndarray]  # [B, 2R] when training else None
    extras: Dict[str, Any]


def _safe_normalize(x, axis=-1, eps=1e-12):
    """x / max(|x|, eps) with a FINITE gradient at x == 0.

    `jnp.linalg.norm`'s VJP is NaN at exactly-zero vectors (torch defines
    the subgradient as 0, `model/renderer.py` relies on that): once beta
    anneals down, background rays' volume weights underflow to exact zero,
    the weighted normal sum is a zero vector, and one NaN poisons the whole
    step even though the loss masks it out (0 * NaN = NaN). sqrt(max(sq,
    eps^2)) is forward-IDENTICAL to max(norm, eps) and differentiable
    everywhere."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def sample_z_vals(opt, rng, n_rays, scale_dist, training):
    """Uniform depth samples in [dist*scale - 0.7, dist*scale + 0.7] with
    stratified jitter when training, plus one random per-ray eikonal depth.

    Reference `model/renderer.py:13-37`. Returns (z_vals [B,R,S],
    z_eik [B,R,1]).
    """
    S = opt.render.n_samples_uniform
    B = scale_dist.shape[0]
    near = opt.camera.dist * scale_dist[:, None, None] - 0.7  # [B,1,1]
    far = opt.camera.dist * scale_dist[:, None, None] + 0.7
    t_vals = jnp.linspace(0.0, 1.0, S, dtype=jnp.float32)
    z_vals = near * (1.0 - t_vals) + far * t_vals              # [B,1,S]
    z_vals = jnp.broadcast_to(z_vals, (B, n_rays, S))

    rng_strat, rng_eik = (jax.random.split(rng) if rng is not None
                          else (None, None))
    if training:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(rng_strat, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand

    if rng_eik is not None:
        idx = jax.random.randint(rng_eik, (B, n_rays, 1), 0, S)
    else:
        idx = jnp.zeros((B, n_rays, 1), jnp.int32)
    z_eik = jnp.take_along_axis(z_vals, idx, axis=-1)           # [B,R,1]
    return z_vals, z_eik


def volume_rendering(z_vals, density):
    """alpha = 1 - e^{-dist·density}; T = e^{-cumsum(shifted free energy)};
    weights = alpha · T. Reference `model/renderer.py:187-209`.

    z_vals, density: [B, R, S] -> (weights, alpha) [B, R, S].
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.zeros_like(dists[..., :1])], axis=-1)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[..., :1]), free_energy[..., :-1]], axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    weights = alpha * transmittance
    return weights, alpha


def render(
    opt,
    sdf_apply: Callable,
    rgb_apply: Callable,
    params: Dict[str, Any],
    pose: jnp.ndarray,          # [B, 3, 4]
    intr: jnp.ndarray,          # [B, 3, 3]
    scale_dist: jnp.ndarray,    # [B]
    proj_latent_sdf: jnp.ndarray,  # [B, Csdf]
    proj_latent_rgb: jnp.ndarray,  # [B, Crgb]
    ray_idx: Optional[jnp.ndarray] = None,  # [B, R] flat pixel indices
    rng: Optional[jax.Array] = None,
    training: bool = True,
    visualize: bool = False,
    compute_eikonal: Optional[bool] = None,
    eikonal_batch: Optional[int] = None,
) -> RenderOutputs:
    """Render rgb/mask/depth/normal maps (+ eikonal gradients when training).

    `compute_eikonal` defaults to `training`; the NN-consistency branch passes
    False — its eikonal gradients are never consumed by any loss (the eikonal
    loss reads only the query view's, reference `model/graph.py:251-253`), so
    computing them there is pure throwaway work.

    `eikonal_batch` restricts the eikonal sampling to the FIRST k batch
    entries: the merged query+NN render (tpu.merge_nn_render) batches all
    views through one field evaluation but only the query views contribute
    eikonal gradients.

    Reference semantics: `model/renderer.py:57-185`.
    """
    if compute_eikonal is None:
        compute_eikonal = training
    B = pose.shape[0]
    S = opt.render.n_samples_uniform
    assert opt.render.sampler == "uniform"
    assert opt.render.normal_model == "volume"

    # --- rays ------------------------------------------------------------
    cam_loc, ray_raw = camera.get_center_and_ray(opt, pose, intr=intr,
                                                 ray_idx=ray_idx)
    ray_dirs = _safe_normalize(ray_raw)
    # depth factor converts ray length (z) to real depth along the optical axis
    depth_fac = 1.0 / jnp.sqrt(jnp.maximum(
        jnp.sum(ray_raw * ray_raw, axis=-1, keepdims=True), 1e-24))  # [B,R,1]
    R = ray_dirs.shape[1]
    if opt.camera.model == "perspective":
        cam_loc = jnp.broadcast_to(cam_loc, (B, R, 3))

    # --- depth samples -----------------------------------------------------
    rng_z, rng_eik_pts = (jax.random.split(rng) if rng is not None
                          else (None, None))
    z_vals, z_eik = sample_z_vals(opt, rng_z, R, scale_dist, training)

    # --- sample points [B, R, S, 3] -> flatten ray/sample axes -------------
    points = cam_loc[:, :, None, :] + z_vals[..., None] * ray_dirs[:, :, None, :]
    points_flat = points.reshape(B, R * S, 3)

    # --- SDF + spatial gradient + density ----------------------------------
    # latent passed per-sample [B, C]; the MLP factors it into a broadcast
    # bias (no per-point repetition)
    sdf_grad = _sdf_grad_fn(opt, sdf_apply, params)
    grad_mode = opt.get("tpu", {}).get("sdf_grad_mode", "vjp")
    # Folding the eikonal points into the main field evaluation removes a
    # separate [B,2R] fwd+bwd dispatch chain but measured SLOWER end-to-end
    # (TPU v5e, output/tpu_queue_r5.log: 17.43 it/s folded vs 18.57 unfolded
    # at bf16) — the concat pushes the [B,R*S+2R] chain off the fast tile
    # multiple and the bwd pays for it. Kept opt-in (tpu.fold_eikonal) with
    # the parity test; default is the measured winner.
    env_fold = os.environ.get("SCL_FOLD_EIKONAL")  # A/B override
    cfg_fold = (opt.get("tpu", {}).get("fold_eikonal", False)
                if env_fold is None else env_fold != "0")
    fold_eikonal = compute_eikonal and grad_mode == "vjp" and cfg_fold
    grad_eikonal = None
    if fold_eikonal:
        # Fold the eikonal points into the SAME field evaluation so one
        # fwd+bwd MLP chain serves both — the separate [B, 2R] chain was
        # pure fixed-overhead (its point count is ~0.5% of the render's).
        # SplitLatent keeps the eikonal slice's latent detached (reference
        # `model/implicit.py:168-169`) while the render slice stays attached.
        Be = eikonal_batch if eikonal_batch is not None else B
        lo, hi = opt.arch.impl_sdf.eikonal_sample_range
        eik_uniform = jax.random.uniform(
            rng_eik_pts, (Be, R, 3), minval=lo, maxval=hi)
        if Be < B:  # pad discarded rows (merged NN render: only the first
            eik_uniform = jnp.concatenate(  # Be rows feed the eikonal loss)
                [eik_uniform, jnp.zeros((B - Be, R, 3), eik_uniform.dtype)],
                axis=0)
        eik_near = cam_loc + z_eik * ray_dirs                     # [B,R,3]
        eik_block = jnp.concatenate([eik_uniform, eik_near], axis=1)
        n_main = R * S
        merged_points = jnp.concatenate([points_flat, eik_block], axis=1)
        latent = SplitLatent(proj_latent_sdf,
                             jax.lax.stop_gradient(proj_latent_sdf), n_main)
        sdf_all, feat_all, grad_all = sdf_grad(merged_points, latent, False)
        sdf = sdf_all[:, :n_main]
        sdf_feat = feat_all[:, :n_main]
        grad_sdf = grad_all[:, :n_main]
        grad_eik = grad_all[:Be, n_main:]                         # [Be,2R,3]
        # sqrt(max(.)) keeps the gradient finite at a zero SDF gradient
        # (critical points of the field); forward differs only below 1e-12
        grad_eikonal = jnp.sqrt(jnp.maximum(
            jnp.sum(grad_eik * grad_eik, axis=-1), 1e-24))        # [Be,2R]
    else:
        sdf, sdf_feat, grad_sdf = sdf_grad(points_flat, proj_latent_sdf,
                                           False)
    beta = params["density"]["beta"]
    density = laplace_density(sdf, beta).reshape(B, R, S)

    # volume normal = -∇x density = -density'(sdf) * ∇x sdf
    normal_flat = -laplace_density_dsdf(sdf, beta) * grad_sdf   # [B,RS,3]

    # --- RGB field ----------------------------------------------------------
    rgb_flat = rgb_apply({"params": params["rgb_network"]},
                         points_flat, proj_latent_rgb, sdf_feat)  # [B,RS,3]
    rgb = rgb_flat.reshape(B, R, S, 3)

    # --- composite -----------------------------------------------------------
    weights, alphas = volume_rendering(z_vals, density)          # [B,R,S]

    depth_samples = z_vals * depth_fac                            # [B,R,S]
    depth_values = jnp.sum(weights * depth_samples, axis=-1, keepdims=True)

    normal = _safe_normalize(normal_flat).reshape(B, R, S, 3)
    normal_weights = weights[..., None] ** opt.reg.normal_pow
    normal_values = _safe_normalize(jnp.sum(normal_weights * normal, axis=-2))

    acc_map = jnp.sum(weights, axis=-1)                           # [B,R]
    rgb_values = jnp.sum(weights[..., None] * rgb, axis=-2)       # [B,R,3]
    bg = float(opt.data.bgcolor) if opt.data.bgcolor is not None else 0.0
    rgb_output = rgb_values + (1.0 - acc_map[..., None]) * bg
    mask = acc_map[..., None]
    mask_hard = (mask > 0.5).astype(rgb_output.dtype)

    # --- eikonal points (training only; non-folded fallback) -----------------
    if compute_eikonal and not fold_eikonal:
        Be = eikonal_batch if eikonal_batch is not None else B
        lo, hi = opt.arch.impl_sdf.eikonal_sample_range
        eik_uniform = jax.random.uniform(
            rng_eik_pts, (Be, R, 3), minval=lo, maxval=hi)
        eik_near = (cam_loc[:Be] + z_eik[:Be] * ray_dirs[:Be])    # [Be,R,3]
        eik_points = jnp.concatenate([eik_uniform, eik_near], axis=1)
        _, _, grad_eik = sdf_grad(eik_points, proj_latent_sdf[:Be], True)
        # sqrt(max(.)) keeps the gradient finite at a zero SDF gradient
        # (critical points of the field); forward differs only below 1e-12
        grad_eikonal = jnp.sqrt(jnp.maximum(
            jnp.sum(grad_eik * grad_eik, axis=-1), 1e-24))        # [Be,2R]

    extras: Dict[str, Any] = {}
    if visualize:
        # subsample 200 rays (reference `model/renderer.py:179-182` uses an
        # unseeded randperm; a fixed-key permutation is deterministic here)
        n_vis = min(200, R)
        perm_key = rng if rng is not None else jax.random.PRNGKey(0)
        ray_sel = jax.random.permutation(perm_key, R)[:n_vis]
        opacity = alphas[:, ray_sel, :, None]                     # [B,r,S,1]
        extras["points"] = points[:, ray_sel]                      # [B,r,S,3]
        extras["transparency"] = jnp.concatenate(
            [opacity, 1.0 - opacity, jnp.zeros_like(opacity)], axis=-1)
        extras["rgb_samples"] = jnp.concatenate(
            [rgb[:, ray_sel], opacity], axis=-1)

    return RenderOutputs(rgb=rgb_output, mask=mask, mask_hard=mask_hard,
                         depth=depth_values, normal=normal_values,
                         grad_eikonal=grad_eikonal, extras=extras)
