"""Loss library — pure functions, static shapes, jit-safe.

Port of the reference loss collection (reference `model/loss.py`). The one
semantic adaptation: `normal_loss`'s robust trim keeps the best
(1 - tolerance) fraction of *masked* pixels; the reference gathers masked
pixels into a dynamic-length vector and sorts (`model/loss.py:58-66`), which
has data-dependent shapes. Here the same selection is computed with a
full-size rank: invalid pixels sort to the end (+inf key) and a per-element
rank < floor(n_valid * (1 - tol)) comparison reproduces the kept set with
static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def aggregate_loss(loss, weight=None):
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss)


def l1_loss(pred, label=0.0, weight=None):
    return aggregate_loss(jnp.abs(pred - label), weight=weight)


def mse_loss(pred, label=0.0, weight=None, tolerance=0.0):
    loss = (pred - label) ** 2
    if tolerance > 1e-5:
        assert pred.ndim == 3 and pred.shape[2] in (1, 3)
        assert weight is None
        loss_pixel = loss.mean(axis=2).reshape(-1) if pred.shape[2] == 3 \
            else loss.reshape(-1)
        loss_sorted = jnp.sort(loss_pixel)
        end_idx = int((1 - tolerance) * loss_pixel.shape[0])
        return jnp.mean(loss_sorted[:end_idx])
    return aggregate_loss(loss, weight=weight)


def ce_loss(logits, labels, weight=None):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return aggregate_loss(nll, weight=weight)


def bce_loss(pred, label, weight=None, tolerance=0.0, eps=1e-7):
    pred = jnp.clip(pred, eps, 1 - eps)
    label = jnp.broadcast_to(label, pred.shape)
    loss = -(label * jnp.log(pred) + (1 - label) * jnp.log(1 - pred))
    if tolerance > 1e-5:
        batch_size = pred.shape[0]
        loss_pixel = loss.reshape(batch_size, -1)
        loss_sorted = jnp.sort(loss_pixel, axis=-1)
        end_idx = int((1 - tolerance) * loss_pixel.shape[1])
        return aggregate_loss(loss_sorted[:, :end_idx], weight=weight)
    return aggregate_loss(loss, weight=weight)


def normal_loss(normal_pred, normal_gt, mask, normal_l1=5.0, weight=None,
                tolerance=0.0):
    """5·L1 + (1 - cos) on masked pixels, robust-trimmed by angular error.

    normal_pred/gt: [B, R, 3]; mask: [B, R] or [B, R, 1] bool.
    Reference `model/loss.py:52-67`.
    """
    if mask.ndim == 3:
        mask = mask[..., 0]
    assert normal_pred.shape == normal_gt.shape and normal_pred.ndim == 3
    maskf = mask.astype(normal_pred.dtype)
    cos_sim = jnp.sum(normal_pred * normal_gt, axis=-1)
    angular = 1.0 - cos_sim
    l1 = jnp.sum(jnp.abs(normal_pred - normal_gt), axis=-1)
    loss = normal_l1 * l1 + angular                       # [B, R]

    flat_loss = loss.reshape(-1)
    flat_mask = maskf.reshape(-1)
    flat_ang = angular.reshape(-1)
    n_valid = jnp.sum(flat_mask)
    # rank each pixel among valid pixels by angular error; invalid sort last
    key = jnp.where(flat_mask > 0, flat_ang, jnp.inf)
    order = jnp.argsort(key)
    ranks = jnp.argsort(order)
    keep_count = jnp.floor(n_valid * (1.0 - tolerance))
    keep = (ranks < keep_count).astype(flat_loss.dtype) * flat_mask

    if weight is not None:
        # per-sample weights arrive as [B, 1, 1] (reference expands over the
        # trailing normal axis, `model/loss.py:62-63`); drop trailing axes
        # beyond loss's [B, R] rank before broadcasting
        w = jnp.asarray(weight)
        while w.ndim > loss.ndim:
            w = w[..., 0]
        w = jnp.broadcast_to(w, loss.shape).reshape(-1)
        flat_loss = flat_loss * w
    denom = jnp.maximum(jnp.sum(keep), 1.0)
    return jnp.sum(flat_loss * keep) / denom


def iou_loss(inputs, targets, weight=None, tolerance=0.0):
    """Soft IoU with optional outlier replacement (reference
    `model/loss.py:75-91`)."""
    batch_size = inputs.shape[0]
    x = inputs.reshape(batch_size, -1)
    y = targets.reshape(batch_size, -1)
    if tolerance > 1e-5:
        assert weight is None
        diff = jnp.abs(x - y).reshape(-1)
        idx_sorted = jnp.argsort(diff)
        end_idx = int((1 - tolerance) * diff.shape[0])
        idx_outlier = idx_sorted[end_idx:]
        x_flat = x.reshape(-1)
        x_flat = x_flat.at[idx_outlier].set(y.reshape(-1)[idx_outlier])
        x = x_flat.reshape(batch_size, -1)
    inter = jnp.sum(x * y, axis=1)
    union = jnp.sum(x + y - x * y + 1e-8, axis=1)
    loss = 1.0 - inter / union
    if weight is not None:
        loss = loss * weight.reshape(batch_size)
    return jnp.mean(loss)


def mask_loss(inputs, targets, mask_mse=0.0, weight=None, tolerance=0.0):
    loss = iou_loss(inputs, targets, weight=weight, tolerance=tolerance)
    if mask_mse:
        loss = loss + mask_mse * mse_loss(inputs, targets, weight=weight,
                                          tolerance=tolerance)
    return loss


def cam_margin(trig, ranges, eps=5.0):
    """Hinge on the angle (degrees) outside [ranges[0], ranges[1]]
    (reference `model/loss.py:99-105`)."""
    assert ranges[0] > -180 and ranges[1] < 180
    angle = jnp.arctan2(trig[:, 1], trig[:, 0]) * 180.0 / jnp.pi
    lo = jnp.maximum(-angle + ranges[0] - eps, 0.0)
    hi = jnp.maximum(angle - ranges[1] - eps, 0.0)
    return jnp.mean(lo) + jnp.mean(hi)


def cam_margin_loss(opt, trig_elev, trig_theta):
    ranges = opt.data[opt.data.dataset]
    return (cam_margin(trig_elev, ranges.elev_range)
            + cam_margin(trig_theta, ranges.theta_range))


def cam_sym_loss(trig_orig, trig_flipped):
    """Flip-consistency: azim/theta negate, elev invariant
    (reference `model/loss.py:113-132`). trig_* are (azim, elev, theta)
    tuples of [B, 2] (cos, sin) arrays for the original / flipped images."""
    (a, e, t), (af, ef, tf) = trig_orig, trig_flipped
    loss_azim = (a[:, 0] - af[:, 0]) ** 2 + (-a[:, 1] - af[:, 1]) ** 2
    loss_elev = (e[:, 0] - ef[:, 0]) ** 2 + (e[:, 1] - ef[:, 1]) ** 2
    loss_theta = (t[:, 0] - tf[:, 0]) ** 2 + (-t[:, 1] - tf[:, 1]) ** 2
    return loss_azim.mean() + loss_elev.mean() + loss_theta.mean()


def cam_uniform_loss(trig, emd_p=2):
    """1-D Wasserstein between batch azimuth trig stats and a uniform circle
    prior (reference `model/loss.py:134-167`)."""
    batch_size = trig.shape[0]
    cos_e, sin_e = trig[:, 0], trig[:, 1]
    prod_e = cos_e * sin_e

    grid = jnp.arange(1.0, 2 * batch_size, 2.0) * jnp.pi / batch_size
    cos_p, sin_p = jnp.cos(grid), jnp.sin(grid)
    prod_p = cos_p * sin_p

    dists = [jnp.sort(p) - jnp.sort(e) for p, e in
             ((cos_p, cos_e), (sin_p, sin_e), (prod_p, prod_e))]
    if emd_p == 1:
        return sum(jnp.abs(d).mean() for d in dists) / 3.0
    if emd_p == 2:
        # sqrt(sum^2 + tiny): finite gradient at d == 0 (jnp.linalg.norm's
        # VJP is NaN there); value perturbation <= 1e-12
        return sum(jnp.sqrt(jnp.sum(d ** 2) + 1e-24)
                   for d in dists) / (3.0 * batch_size)
    return sum(jnp.linalg.norm(d, ord=emd_p)
               for d in dists) / (3.0 * batch_size)


def category_reg_loss(proj_latent_sdf, shape_centers, category_labels,
                      temperature=0.3):
    """InfoNCE-style CE of normalized shape codes vs per-category centers
    (reference `model/loss.py:169-174`)."""
    def _nrm(x, eps=1e-12):  # finite gradient at x == 0 (forward-identical)
        sq = jnp.sum(x * x, axis=-1, keepdims=True)
        return x / jnp.sqrt(jnp.maximum(sq, eps * eps))

    code = _nrm(proj_latent_sdf)
    centers = _nrm(shape_centers)
    logits = code @ centers.T
    return ce_loss(logits / temperature, category_labels)
