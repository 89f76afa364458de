"""3D evaluation: dense SDF grid -> isosurface -> Chamfer-L1 + F-score.

Port of the reference eval (reference `utils/eval_3D.py`). Host/device
choreography, TPU-first:
  * the (vox_res+1)^3 SDF grid evaluates on device in bounded chunks
    (one jit'd scan — no per-row python loop like the reference's
    `compute_level_grid`, `utils/eval_3D.py:20-38`)
  * only the scalar grid (~4 MB fp32 at vox 100) transfers to host for
    isosurface extraction + surface sampling
  * point-cloud rotation/normalization and the Pallas Chamfer kernel +
    F-score run back on device
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import chamfer_dists_sq
from . import device_isosurface, isosurface

# view-centric frame axis flips for Pix3D (reference `utils/eval_3D.py:78-90`)
R_TRANS_PRED_PIX3D = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
R_TRANS_GT_PIX3D = np.diag([-1.0, 1.0, 1.0]).astype(np.float32)


def dense_grid_points(opt, N=None):
    """[(N+1)^3, 3] lattice over opt.eval.range (reference
    `utils/eval_3D.py:8-18`)."""
    N = N or opt.eval.vox_res
    range_min, range_max = opt.eval.range
    grid = jnp.linspace(range_min, range_max, N + 1)
    pts = jnp.stack(jnp.meshgrid(grid, grid, grid, indexing="ij"), axis=-1)
    return pts.reshape(-1, 3)


@partial(jax.jit, static_argnames=("sdf_apply", "n_chunks", "fused_cfg"))
def _eval_grid_chunked(sdf_apply, params_sdf, points, latent, n_chunks,
                       fused_cfg=None):
    """points: [P, 3] (P divisible by n_chunks), latent: [B, C] ->
    sdf [B, P]. Scans over chunks to bound peak activation memory.

    `fused_cfg` = (n_freqs, skip_in, n_hidden, force_symmetry) routes the
    chunk through the fused Pallas SDF kernel (ops/fused_sdf.py) — the whole
    MLP stays in VMEM per tile; None keeps the plain XLA apply."""
    B = latent.shape[0]
    P = points.shape[0]
    chunk = P // n_chunks
    pts = points.reshape(n_chunks, chunk, 3)

    def body(carry, pts_chunk):
        p = jnp.broadcast_to(pts_chunk[None], (B, chunk, 3))
        if fused_cfg is not None:
            from ..ops.fused_sdf import fused_sdf_forward
            n_freqs, skip_in, n_hidden, force_symmetry = fused_cfg
            sdf, _, _ = fused_sdf_forward(
                params_sdf, p, latent, n_freqs=n_freqs, skip_in=skip_in,
                n_hidden=n_hidden, compute_grad=False,
                force_symmetry=force_symmetry)
            return carry, sdf[..., 0]
        out = sdf_apply({"params": params_sdf}, p, latent)
        return carry, out[..., 0]

    _, sdf = jax.lax.scan(body, None, pts)          # [n_chunks, B, chunk]
    return jnp.moveaxis(sdf, 1, 0).reshape(B, P)


def _fused_eval_cfg(opt):
    """Pallas-kernel config when the fused eval path should be used, else
    None. Default OFF by measurement (the XLA path is 1.8x faster at the
    eval chunk shape on v5e — see STATUS.md round 3); opt.tpu.fused_eval or
    SCL_FUSED_EVAL=1 opts in, single-device TPU backends only."""
    import os
    env = os.environ.get("SCL_FUSED_EVAL")
    enabled = (opt.get("tpu", {}).get("fused_eval", False)
               if env is None else env != "0")
    if not enabled or jax.default_backend() != "tpu":
        return None
    if jax.device_count() > 1:
        # pallas_call under a sharded jit (without shard_map) would at best
        # replicate the dense-grid eval on every chip; keep the XLA path,
        # which shards the batch axis like the rest of eval
        return None
    a = opt.arch.impl_sdf
    if a.get("weight_norm") or a.pos_enc <= 0:
        return None
    return (a.pos_enc, tuple(a.skip_connection), a.n_hidden_layers,
            bool(opt.arch.force_symmetry))


def compute_level_grid(opt, sdf_apply, params_sdf, proj_latent_sdf, N=None):
    """[B, (N+1)^3] SDF values -> reshaped [B, N+1, N+1, N+1]."""
    N = N or opt.eval.vox_res
    pts = dense_grid_points(opt, N)
    P = pts.shape[0]
    fused_cfg = _fused_eval_cfg(opt)
    # chunk to ~128k points (32k on the fused path: its output tile is
    # padded to 128 lanes, so smaller chunks bound the transient buffer)
    limit = 32768 if fused_cfg is not None else 131072
    n_chunks = 1
    while P // n_chunks > limit or P % n_chunks:
        n_chunks += 1
    sdf = _eval_grid_chunked(sdf_apply, params_sdf, pts, proj_latent_sdf,
                             n_chunks, fused_cfg=fused_cfg)
    return sdf.reshape(-1, N + 1, N + 1, N + 1)


def normalize_pc(pc):
    """Zero-mean, XY-extent-max normalization (reference
    `utils/eval_3D.py:40-49`)."""
    pc_mean = pc.mean(axis=1, keepdims=True)
    pc_z = pc - pc_mean
    length_x = pc_z[:, :, 0].max(-1) - pc_z[:, :, 0].min(-1)
    length_y = pc_z[:, :, 1].max(-1) - pc_z[:, :, 1].min(-1)
    length_max = jnp.maximum(length_x, length_y)[:, None, None]
    return pc_z / (length_max + 1e-7)


def compute_fscore(dist1, dist2, thresholds):
    """dist*: [B, N] (L1); F = 2PR/(P+R) with nan->0
    (reference `utils/eval_3D.py:105-121`)."""
    fscores = []
    for threshold in thresholds:
        precision = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
        recall = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
        f = 2 * precision * recall / (precision + recall)
        fscores.append(jnp.nan_to_num(f, nan=0.0))
    return jnp.stack(fscores, axis=1)


def extract_meshes_and_pointclouds(opt, level_grids, rng=None):
    """Host: isosurface + area-weighted resampling per batch element."""
    meshes, clouds = [], []
    range_min, range_max = opt.eval.range
    for level in np.asarray(level_grids):
        mesh = isosurface.marching_cubes_world(level, range_min, range_max,
                                               isovalue=0.0)
        meshes.append(mesh)
        clouds.append(isosurface.sample_surface(mesh, opt.eval.num_points,
                                                rng=rng))
    return meshes, np.stack(clouds, axis=0)


@jax.jit
def _rotate_and_normalize_pix3d(dpc_pred, dpc_gt, pose, pose_gt):
    R_pred = pose[..., :3]
    R_gt = pose_gt[..., :3]
    pred = jnp.einsum("bij,bnj->bni", R_pred, dpc_pred)
    gt = jnp.einsum("bij,bnj->bni", R_gt, dpc_gt)
    pred = jnp.einsum("ij,bnj->bni", jnp.asarray(R_TRANS_PRED_PIX3D), pred)
    gt = jnp.einsum("ij,bnj->bni", jnp.asarray(R_TRANS_GT_PIX3D), gt)
    return normalize_pc(pred), normalize_pc(gt)


# one fused device program per f_thresholds tuple: rotate + normalize +
# Chamfer + F-score + per-sample and batch CD means in a SINGLE dispatch.
# Through a remote-attach transport every dispatch/fetch costs a full RTT
# (measured 52 ms on this tunnel), so the split rotate -> chamfer ->
# fscore -> mean chain was pure latency.
_FINISH_CACHE = {}
_FINISH_FULL_CACHE = {}


def use_device_isosurface(opt):
    """Device-side marching tetrahedra + surface sampling (default OFF:
    the round-4 default-on was set while the tunnel was down and the first
    real-TPU measurements, twice on 2026-08-18, put the fused device path
    at 0.32x/0.68x of the pipelined host path at vox100/100k — the device
    MT+inverse-CDF program is gather-bound at ~2 s/sample while host MT is
    ~72 ms/sample overlapped by the eval pipeline. opt.tpu.device_isosurface
    =true or SCL_DEVICE_ISOSURFACE=1 re-enables; the path stays parity-
    tested (tests/test_device_isosurface.py) for many-core-starved hosts."""
    import os
    env = os.environ.get("SCL_DEVICE_ISOSURFACE")
    if env is not None:
        return env != "0"
    return bool(opt.get("tpu", {}).get("device_isosurface", False))


_use_device_isosurface = use_device_isosurface


def metric_finish_body(opt, level, dpc_gt, pose, pose_gt, rng_key):
    """TRACEABLE fully fused finish: level grid -> marching tets ->
    area-weighted sampling -> rotate/normalize -> Chamfer -> F-score.
    Returns the finish-output tuple consumed by `consume_finish_outputs`;
    compose inside a larger jit (the trainer fuses it with the eval forward
    + grid scan into ONE metric-eval program) or use the cached jit wrapper
    `_finish_full_device_fn`."""
    range_min, range_max = opt.eval.range
    thr = tuple(float(t) for t in opt.eval.f_thresholds)
    dpc_pred = device_isosurface.sample_level_surface_batch(
        level, int(opt.eval.num_points), range_min, range_max, rng_key)
    pred, gt = _rotate_and_normalize_pix3d(dpc_pred, dpc_gt, pose, pose_gt)
    d1_sq, d2_sq = chamfer_dists_sq(pred, gt)
    dist_acc, dist_comp = jnp.sqrt(d1_sq), jnp.sqrt(d2_sq)
    f_score = compute_fscore(dist_acc, dist_comp, thr)
    return (dpc_pred, pred, gt, f_score,
            dist_acc.mean(axis=1), dist_comp.mean(axis=1),
            dist_acc.mean(), dist_comp.mean())


def consume_finish_outputs(var, outs):
    """Mutate `var` with the finish-output tuple (ONE bulk host fetch for
    every host-consumed metric) and return (dist_acc_mean, dist_comp_mean)."""
    (dpc_pred, pred, gt, f_score, cd_acc, cd_comp, acc_m, comp_m) = outs
    var.dpc_pred = dpc_pred
    var.dpc_pred_normalized = pred
    var.dpc_gt_normalized = gt
    var.f_score, var.cd_acc, var.cd_comp, acc_m, comp_m = jax.device_get(
        (f_score, cd_acc, cd_comp, acc_m, comp_m))
    return float(acc_m), float(comp_m)


def _finish_full_device_fn(opt):
    """Cached jit wrapper around `metric_finish_body` for callers that
    already hold a level grid."""
    key = (tuple(float(t) for t in opt.eval.f_thresholds),
           int(opt.eval.num_points),
           float(opt.eval.range[0]), float(opt.eval.range[1]))
    fn = _FINISH_FULL_CACHE.get(key)
    if fn is None:
        fn = jax.jit(partial(metric_finish_body, opt))
        _FINISH_FULL_CACHE[key] = fn
    return fn


def _finish_device_fn(thresholds):
    key = tuple(float(t) for t in thresholds)
    fn = _FINISH_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(dpc_pred, dpc_gt, pose, pose_gt):
            pred, gt = _rotate_and_normalize_pix3d(dpc_pred, dpc_gt,
                                                   pose, pose_gt)
            d1_sq, d2_sq = chamfer_dists_sq(pred, gt)
            dist_acc, dist_comp = jnp.sqrt(d1_sq), jnp.sqrt(d2_sq)
            f_score = compute_fscore(dist_acc, dist_comp, key)
            return (pred, gt, f_score,
                    dist_acc.mean(axis=1), dist_comp.mean(axis=1),
                    dist_acc.mean(), dist_comp.mean())
        _FINISH_CACHE[key] = fn
    return fn


def eval_metrics_submit(opt, var, sdf_apply, params_sdf):
    """Stage A (device, async): dispatch the dense SDF grid eval and return
    the level-grid device array immediately. Pairs with eval_metrics_finish
    so the host isosurface work for batch k overlaps the device computing
    batch k+1 (the reference is fully serial, `utils/eval_3D.py:52-103`)."""
    return compute_level_grid(opt, sdf_apply, params_sdf, var.proj_latent_sdf)


def eval_metrics(opt, var, sdf_apply, params_sdf, vis_only=False, rng=None,
                 seed=0, need_meshes=True):
    """Full metric evaluation for one batch (reference
    `utils/eval_3D.py:52-103`). Mutates `var` with mesh_pred/dpc_pred/
    f_score/cd_acc/cd_comp; returns (dist_acc_mean, dist_comp_mean)."""
    level = eval_metrics_submit(opt, var, sdf_apply, params_sdf)
    return eval_metrics_finish(opt, var, level, vis_only=vis_only, rng=rng,
                               seed=seed, need_meshes=need_meshes)


def eval_metrics_finish(opt, var, level, vis_only=False, rng=None, seed=0,
                        need_meshes=True):
    """Stage B/C. Default (tpu.device_isosurface): marching tets + surface
    sampling + rotate/normalize + Chamfer + F-score all in ONE device
    program keyed by `seed` — host meshes extracted only when the caller
    dumps them (`need_meshes`). Fallback/vis path: host isosurface then the
    fused device metric finish."""
    if _use_device_isosurface(opt) and not vis_only:
        outs = _finish_full_device_fn(opt)(
            level, var.dpc_points, var.pose, var.pose_gt,
            jax.random.PRNGKey(seed))
        acc_m, comp_m = consume_finish_outputs(var, outs)
        if need_meshes:  # only PLY dumps read meshes — skip the host MT
            range_min, range_max = opt.eval.range
            var.mesh_pred = [
                isosurface.marching_cubes_world(lv, range_min, range_max)
                for lv in np.asarray(jax.device_get(level))]
        return acc_m, comp_m

    meshes, clouds = extract_meshes_and_pointclouds(
        opt, jax.device_get(level), rng=rng)
    var.mesh_pred = meshes
    var.dpc_pred = jnp.asarray(clouds)

    dpc_gt = var.dpc_points
    if vis_only:
        pred, gt = _rotate_and_normalize_pix3d(var.dpc_pred, dpc_gt,
                                               var.pose, var.pose_gt)
        var.dpc_pred_normalized = pred
        var.dpc_gt_normalized = gt
        return None

    (pred, gt, f_score, cd_acc, cd_comp, acc_m, comp_m) = _finish_device_fn(
        opt.eval.f_thresholds)(var.dpc_pred, dpc_gt, var.pose, var.pose_gt)
    var.dpc_pred_normalized = pred
    var.dpc_gt_normalized = gt
    # ONE bulk fetch for every host-consumed metric (f_score / per-sample
    # CDs / batch means) instead of a fetch per downstream np.asarray
    var.f_score, var.cd_acc, var.cd_comp, acc_m, comp_m = jax.device_get(
        (f_score, cd_acc, cd_comp, acc_m, comp_m))
    return float(acc_m), float(comp_m)
