"""Shared building blocks: GroupBatchNorm + BottleneckLinear residual block.

BottleneckLinear ports the reference `Bottleneck_Linear` (reference
`model/graph.py:16-40`, `model/view_estimator.py:6-33`): two bias-free 1x1
"convs" on a [B, C] vector (i.e. Dense layers) with BatchNorm + residual. The
estimator variant zero-inits the second BN's scale so the block starts as
identity.

GroupBatchNorm is the TPU-native trick that lets ONE batched ResNet call
replace the reference's per-view re-runs of the encoders (reference
`model/graph.py:174-218` re-encodes every NN view; `model/loss.py:114`
re-runs the estimator on the flipped batch): a [G*B, ...] batch laid out as G
view-groups of B is normalized with PER-GROUP batch moments, which is exactly
what G separate BatchNorm calls would compute — so convs/matmuls batch onto
the MXU while the statistics stay bit-comparable to the sequential
formulation. Running statistics compose the same sequential EMA the separate
calls would apply, with an optional mask (`stats_groups`) for passes whose
update the reference discards (the flip-symmetry pass).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class GroupBatchNorm(nn.Module):
    """BatchNorm over per-group batch moments of a [G*B, ..., C] batch.

    With ``groups=1`` this reproduces ``nn.BatchNorm`` (same variable names
    and shapes: params ``scale``/``bias``, batch_stats ``mean``/``var``), so
    it is checkpoint- and pretrained-weight-compatible. With ``groups=G`` the
    train-time normalization of group g uses ONLY group g's moments —
    numerically equal to G separate BatchNorm calls on the slices.

    ``stats_groups``: ordered tuple of group indices whose moments update the
    running statistics, composing the same EMA as sequential separate calls
    (ra <- m*ra + (1-m)*mom applied per listed group, in order). ``None``
    means all groups in order; ``()`` freezes the running stats.

    In eval mode (``use_running_average=True``) every row is normalized by
    the running statistics and grouping is irrelevant.
    """

    use_running_average: bool
    groups: int = 1
    stats_groups: tuple | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    scale_init: Any = nn.initializers.ones_init()

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (C,),
                          jnp.float32)
        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        if self.use_running_average:
            mean_b, var_b = ra_mean.value, ra_var.value  # [C], broadcasts
            x = x.astype(jnp.float32)
        else:
            G = self.groups
            N = x.shape[0]
            assert N % G == 0, f"batch {N} not divisible into {G} groups"
            # stats AND normalization in f32, final result cast to dtype —
            # mirrors flax (_compute_stats promotes half inputs; _normalize
            # keeps the f32 moments un-downcast through the arithmetic)
            xf = x.astype(jnp.float32).reshape(G, N // G, *x.shape[1:])
            axes = tuple(range(1, xf.ndim - 1))
            mean = jnp.mean(xf, axes)                      # [G, C]
            mean2 = jnp.mean(jax.lax.square(xf), axes)
            var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)  # [G, C]

            sg = (tuple(range(G)) if self.stats_groups is None
                  else tuple(self.stats_groups))
            if not self.is_initializing() and sg:
                # sequential-EMA composition: applying ra <- m*ra + (1-m)*mom
                # for each listed group in order collapses to one update
                m = self.momentum
                k = len(sg)
                new_mean = ra_mean.value * (m ** k)
                new_var = ra_var.value * (m ** k)
                for j, g in enumerate(sg):
                    w = (1.0 - m) * (m ** (k - 1 - j))
                    new_mean = new_mean + w * mean[g]
                    new_var = new_var + w * var[g]
                ra_mean.value, ra_var.value = new_mean, new_var

            # per-group broadcast shape [G, 1, ..., C]
            bshape = (G,) + (1,) * (xf.ndim - 2) + (C,)
            mean_b, var_b = mean.reshape(bshape), var.reshape(bshape)
            x = xf

        y = x - mean_b
        mul = jax.lax.rsqrt(var_b + self.epsilon) * scale
        y = y * mul + bias
        if not self.use_running_average:
            y = y.reshape(-1, *y.shape[2:])
        return y.astype(dtype)


class BottleneckLinear(nn.Module):
    n_channels: int
    zero_init: bool = False  # zero-init bn2 scale (estimator variant)

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1,
                 stats_groups: tuple | None = None):
        residual = x
        out = nn.Dense(self.n_channels, use_bias=False, name="linear1")(x)
        out = GroupBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, groups=groups,
                             stats_groups=stats_groups, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Dense(self.n_channels, use_bias=False, name="linear2")(out)
        scale_init = (nn.initializers.zeros_init() if self.zero_init
                      else nn.initializers.ones_init())
        out = GroupBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, groups=groups,
                             stats_groups=stats_groups, scale_init=scale_init,
                             name="bn2")(out)
        out = out + residual
        return nn.relu(out)


class LatentProjection(nn.Module):
    """2x BottleneckLinear + Dense -> low-dim conditioning code
    (reference `model/graph.py:56-65`)."""

    n_channels: int
    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1,
                 stats_groups: tuple | None = None):
        x = BottleneckLinear(self.n_channels, name="block0")(
            x, train=train, groups=groups, stats_groups=stats_groups)
        x = BottleneckLinear(self.n_channels, name="block1")(
            x, train=train, groups=groups, stats_groups=stats_groups)
        return nn.Dense(self.out_dim, name="proj")(x)
