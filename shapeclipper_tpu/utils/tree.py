"""Pytree utilities — JAX equivalents of the reference tensor helpers
(reference `utils/util.py:73-110`)."""

from __future__ import annotations

import contextlib
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def move_to_device(tree, sharding=None):
    """Host pytree -> device arrays (optionally with a sharding);
    replaces `move_to_device` (reference `utils/util.py:73-86`)."""
    if sharding is not None:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), sharding), tree)
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), tree)


def detach_tensors(tree):
    """stop_gradient over a pytree (reference `utils/util.py:89-102`)."""
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


def to_host(tree):
    """Device pytree -> numpy."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def tree_norm(tree):
    """Global L2 norm of a pytree (gradient diagnostics; reference
    `print_grad`, `utils/util.py:261-262`)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))


def get_layer_dims(layers):
    """[(k_in, k_out), ...] pairs (reference `utils/util.py:205-207`)."""
    return list(zip(layers[:-1], layers[1:]))


@contextlib.contextmanager
def suppress(stdout=False, stderr=False):
    """Silence stdout/stderr (reference `utils/util.py:209-217`)."""
    with open(os.devnull, "w") as devnull:
        old_out, old_err = sys.stdout, sys.stderr
        if stdout:
            sys.stdout = devnull
        if stderr:
            sys.stderr = devnull
        try:
            yield
        finally:
            sys.stdout, sys.stderr = old_out, old_err
