"""Shared building blocks: BottleneckLinear residual MLP block.

Port of the reference `Bottleneck_Linear` (reference `model/graph.py:16-40`,
`model/view_estimator.py:6-33`): two bias-free 1x1 "convs" on a [B, C] vector
(i.e. Dense layers) with BatchNorm + residual. The estimator variant zero-inits
the second BN's scale so the block starts as identity.
"""

from __future__ import annotations

import flax.linen as nn


class BottleneckLinear(nn.Module):
    n_channels: int
    zero_init: bool = False  # zero-init bn2 scale (estimator variant)

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Dense(self.n_channels, use_bias=False, name="linear1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Dense(self.n_channels, use_bias=False, name="linear2")(out)
        scale_init = (nn.initializers.zeros_init() if self.zero_init
                      else nn.initializers.ones_init())
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, scale_init=scale_init, name="bn2")(out)
        out = out + residual
        return nn.relu(out)


class LatentProjection(nn.Module):
    """2x BottleneckLinear + Dense -> low-dim conditioning code
    (reference `model/graph.py:56-65`)."""

    n_channels: int
    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = BottleneckLinear(self.n_channels, name="block0")(x, train=train)
        x = BottleneckLinear(self.n_channels, name="block1")(x, train=train)
        return nn.Dense(self.out_dim, name="proj")(x)
