"""NeRF-style positional encoding (functional).

Feature order matches the reference embedder (reference
`model/implicit.py:7-52`): [x, sin(f0·x), cos(f0·x), sin(f1·x), cos(f1·x), ...]
with log-sampled frequency bands f_k = 2^k, k = 0..num_freqs-1.
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_dim(num_freqs, input_dims=3, include_input=True):
    return (input_dims if include_input else 0) + 2 * num_freqs * input_dims


def positional_encoding(x, num_freqs, include_input=True):
    """x: [..., D] -> [..., D + 2*num_freqs*D] (or without the leading D)."""
    if num_freqs <= 0:
        return x
    feats = [x] if include_input else []
    # frequencies 2^0 .. 2^(num_freqs-1)
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    # [..., num_freqs, D]
    xf = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # interleave per frequency: sin(f0), cos(f0), sin(f1), cos(f1), ...
    sc = jnp.stack([sin, cos], axis=-2)  # [..., num_freqs, 2, D]
    sc = sc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    feats.append(sc)
    return jnp.concatenate(feats, axis=-1)
