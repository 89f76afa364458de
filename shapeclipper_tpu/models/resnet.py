"""ResNet-18/34 image encoders in flax (NHWC, TPU-native layout).

Architecture parity with the torchvision BasicBlock ResNets used by the
reference as image/viewpoint encoders (reference `model/graph.py:50-55`,
`model/view_estimator.py:41-43`). Native re-implementation — weights can be
loaded from a converted checkpoint via `load_pretrained_npz` (ImageNet weights
are a data artifact; no network access is assumed).

The compute dtype is configurable (bfloat16 by default on TPU for the encoder
towers); parameters and BN statistics stay float32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import GroupBatchNorm

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    groups: int = 1
    stats_groups: tuple | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(GroupBatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       groups=self.groups, stats_groups=self.stats_groups)
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    padding=1, use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name="conv2")(y)
        y = norm(name="bn2")(y)
        if residual.shape[-1] != self.filters or self.strides != 1:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, kernel_init=conv_init,
                               dtype=self.dtype, name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """BasicBlock ResNet. `num_classes=None` returns pooled features
    (torchvision `fc = Identity()` equivalent)."""

    stage_sizes: Sequence[int]
    num_classes: int | None = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1,
                 stats_groups: tuple | None = None):
        """`groups=G` treats the batch as G view-groups of equal size and
        computes BatchNorm moments per group (see GroupBatchNorm) — the
        machinery behind the one-call query+flip+NN encoder merge."""
        # x: [B, H, W, 3] float in [0, 1]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)
        x = GroupBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, groups=groups,
                           stats_groups=stats_groups, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, block_count in enumerate(self.stage_sizes):
            filters = 64 * 2 ** i
            for j in range(block_count):
                strides = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock(filters, strides=strides, dtype=self.dtype,
                               groups=groups, stats_groups=stats_groups,
                               name=f"layer{i + 1}_block{j}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 512]
        x = x.astype(jnp.float32)
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, name="fc")(x)
        return x


def resnet18(num_classes=None, dtype=jnp.float32):
    return ResNet(stage_sizes=(2, 2, 2, 2), num_classes=num_classes, dtype=dtype)


def resnet34(num_classes=None, dtype=jnp.float32):
    return ResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes, dtype=dtype)


def make_encoder(opt, dtype=jnp.float32):
    """Image encoder with fc resized to shape+rgb latent dims
    (reference `model/graph.py:50-55`)."""
    out_dim = opt.arch.latent_dim_shape + opt.arch.latent_dim_rgb
    if opt.arch.enc_network == "resnet34":
        return resnet34(num_classes=out_dim, dtype=dtype)
    if opt.arch.enc_network == "resnet18":
        return resnet18(num_classes=out_dim, dtype=dtype)
    raise ValueError(opt.arch.enc_network)


# ---------------------------------------------------------------------------
# pretrained weight loading (offline artifact)
# ---------------------------------------------------------------------------

def load_pretrained_npz(params, path, skip_fc=True):
    """Merge a converted torchvision state_dict (saved as .npz with original
    torch names) into a flax ResNet param tree. Conversion rules:
      conv weight  [out,in,kh,kw] -> kernel [kh,kw,in,out]
      linear weight [out,in]      -> kernel [in,out]
      bn weight/bias              -> scale/bias
    Returns (params, batch_stats_updates).
    """
    import re

    data = np.load(path)
    params = _to_mutable(params)
    stats = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)

    def flax_path(torch_name):
        # torchvision names: conv1, bn1, layer{i}.{j}.conv{k}/bn{k},
        # layer{i}.{j}.downsample.{0,1}, fc
        parts = torch_name.split(".")
        if parts[0] in ("conv1", "bn1", "fc"):
            return [parts[0]], parts[1:]
        m = re.match(r"layer(\d)", parts[0])
        if m:
            stage, block = parts[0], parts[1]
            rest = parts[2:]
            base = [f"{stage}_block{block}"]
            if rest[0] == "downsample":
                name = "downsample_conv" if rest[1] == "0" else "downsample_bn"
                return base + [name], rest[2:]
            return base + [rest[0]], rest[1:]
        raise KeyError(torch_name)

    for torch_name in data.files:
        value = data[torch_name]
        if torch_name.startswith("fc.") and skip_fc:
            continue
        if torch_name.endswith("num_batches_tracked"):
            continue
        path_keys, rest = flax_path(torch_name)
        leaf = rest[-1]
        is_bn = "bn" in path_keys[-1] or leaf in ("running_mean", "running_var")
        if leaf == "weight" and value.ndim == 4:
            put(params, path_keys + ["kernel"], value.transpose(2, 3, 1, 0))
        elif leaf == "weight" and value.ndim == 2:
            put(params, path_keys + ["kernel"], value.transpose(1, 0))
        elif leaf == "weight" and is_bn:
            put(params, path_keys + ["scale"], value)
        elif leaf == "bias":
            put(params, path_keys + ["bias"], value)
        elif leaf == "running_mean":
            put(stats, path_keys + ["mean"], value)
        elif leaf == "running_var":
            put(stats, path_keys + ["var"], value)
        else:
            raise KeyError(torch_name)
    return params, stats


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def merge_tree(dst, updates):
    """Recursively merge `updates` leaves into (a copy of) `dst`."""
    out = dict(dst)
    for k, v in updates.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_tree(out[k], v)
        else:
            out[k] = v
    return out
