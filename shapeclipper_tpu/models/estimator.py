"""Viewpoint estimator: ResNet-18 backbone + trig extrinsic & scale heads.

Parity with the reference estimator (reference `model/view_estimator.py:35-103`):
extrinsics as three L2-normalized (cos, sin) pairs (azim/elev/theta), plus
tanh-bounded size & perspective scales. Initialization forces elev = theta = 0
and scales = 1; `reset_scale_params` re-zeros the scale heads (called at train
start, reference `model/runner.py:172`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BottleneckLinear
from .resnet import resnet18


class EstimatorOutputs(NamedTuple):
    trig_azim: jnp.ndarray    # [B, 2] (cos, sin)
    trig_elev: jnp.ndarray    # [B, 2]
    trig_theta: jnp.ndarray   # [B, 2]
    scale_focal: jnp.ndarray  # [B]
    scale_dist: jnp.ndarray   # [B]


def _extr_kernel_init(key, shape, dtype=jnp.float32):
    # torch: zero rows 2:6 of the [6, in] weight; flax kernel is [in, 6]
    from .implicit import _torch_linear_kernel_init
    w = _torch_linear_kernel_init(key, shape, dtype)
    col = jnp.arange(shape[1])
    return jnp.where((col >= 2)[None, :], 0.0, w)


def _extr_bias_init(key, shape, dtype=jnp.float32):
    # cos(0)=1, sin(0)=0 for elev and theta; azim bias stays zero
    assert shape == (6,)
    return jnp.array([0.0, 0.0, 1.0, 0.0, 1.0, 0.0], dtype)


def _normalize(x, axis=-1, eps=1e-12):
    # forward-identical to x / max(|x|, eps) but with a finite gradient at
    # x == 0 (jnp.linalg.norm's VJP is NaN there; torch_F.normalize is not)
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


class Estimator(nn.Module):
    size_range: float = 0.2
    perspect_range: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        # attribute names ARE the param-tree names (setup-style); ResNet_0
        # keeps the name the original compact module auto-assigned so
        # existing checkpoints/param trees load unchanged
        self.ResNet_0 = resnet18(num_classes=None, dtype=self.dtype)
        n = 512  # resnet18 final feature width
        self.extr_head = BottleneckLinear(n, zero_init=True)
        self.extr_fc = nn.Dense(6, kernel_init=_extr_kernel_init,
                                bias_init=_extr_bias_init)
        self.size_head = BottleneckLinear(n, zero_init=True)
        self.size_fc = nn.Dense(1, kernel_init=nn.initializers.zeros_init(),
                                bias_init=nn.initializers.zeros_init())
        self.perspect_head = BottleneckLinear(n, zero_init=True)
        self.perspect_fc = nn.Dense(
            1, kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init())

    def heads(self, feat, train: bool = True, groups: int = 1,
              stats_groups: tuple | None = None) -> EstimatorOutputs:
        """Trig extrinsic + scale heads on backbone features [B, 512]
        (reference `model/view_estimator.py:80-103`). Exposed separately so
        the head composition can be parity-tested without the backbone."""
        hkw = dict(train=train, groups=groups, stats_groups=stats_groups)
        trig = self.extr_fc(self.extr_head(feat, **hkw))
        scale_size_raw = jnp.tanh(self.size_fc(self.size_head(feat, **hkw)))
        scale_persp_raw = jnp.tanh(
            self.perspect_fc(self.perspect_head(feat, **hkw)))
        scale_size = 1.0 + scale_size_raw[..., 0] * self.size_range
        scale_perspect = 1.0 + scale_persp_raw[..., 0] * self.perspect_range
        return EstimatorOutputs(
            trig_azim=_normalize(trig[:, 0:2]),
            trig_elev=_normalize(trig[:, 2:4]),
            trig_theta=_normalize(trig[:, 4:6]),
            scale_focal=scale_perspect,
            scale_dist=scale_size * scale_perspect)

    def __call__(self, images, train: bool = True, groups: int = 1,
                 stats_groups: tuple | None = None) -> EstimatorOutputs:
        """`groups=G` treats the batch as G equal view-groups and computes
        every BatchNorm's train-time moments per group (GroupBatchNorm) — so
        ONE ResNet18 call reproduces the reference's G separate estimator
        calls exactly (query / flipped / per-NN-view,
        `model/loss.py:114`, `model/graph.py:174-218`); `stats_groups`
        selects which groups update running stats (the flip pass's update is
        discarded, matching the unmerged path)."""
        feat = self.ResNet_0(images, train=train, groups=groups,
                             stats_groups=stats_groups)      # [B, 512]
        return self.heads(feat, train=train, groups=groups,
                          stats_groups=stats_groups)

    @staticmethod
    def from_opt(opt, dtype=jnp.float32):
        return Estimator(size_range=opt.camera.size_range,
                         perspect_range=opt.camera.perspect_range,
                         dtype=dtype)


def reset_scale_params(estimator_params):
    """Zero the size/perspect fc heads so scales start at exactly 1
    (reference `model/view_estimator.py:72-77`)."""
    p = dict(estimator_params)
    for head in ("size_fc", "perspect_fc"):
        sub = dict(p[head])
        sub["kernel"] = jnp.zeros_like(sub["kernel"])
        sub["bias"] = jnp.zeros_like(sub["bias"])
        p[head] = sub
    return p
