"""Device-mesh data parallelism helpers.

TPU-native replacement for the reference's DDP machinery (reference
`train.py:34-41`, `utils/util.py:250-255`, `data/base.py:17-19`): a
single-controller `jax.sharding.Mesh` with the batch axis sharded over a
'data' axis. Gradient all-reduce is emitted by XLA from sharded autodiff; no
process groups, rendezvous ports, or samplers.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and shard
the host data pipeline with (jax.process_index(), jax.process_count()).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(opt=None, devices=None):
    """1-D data-parallel mesh over all (or given) devices. `opt.tpu.mesh`
    may request a specific layout, e.g. {data: 8}."""
    devices = devices if devices is not None else jax.devices()
    spec = (opt or {}).get("tpu", {}).get("mesh") if opt is not None else None
    if spec:
        assert list(spec.keys()) == ["data"], "only a data axis is used"
        n = int(spec["data"])
        devices = devices[:n]
    return Mesh(np.asarray(devices), axis_names=("data",))


def replicate_sharding(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh, batch, allow_replicate=False):
    """Device-put a host batch with the leading axis sharded over 'data'.
    Scalars/0-d entries are replicated.

    A leading axis that does not divide the mesh is an ERROR unless the
    caller explicitly opts into replication (`allow_replicate=True`, e.g.
    single-sample visualization batches): silent replication makes every
    device redo identical work and hides sharding mistakes. Pad the batch to
    a mesh multiple instead (the trainer's eval loop does)."""
    data = batch_sharding(mesh)
    repl = replicate_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, repl)
        if x.shape[0] % mesh.size != 0:
            if allow_replicate:
                return jax.device_put(x, repl)
            raise ValueError(
                f"batch leading axis {x.shape[0]} does not divide the "
                f"{mesh.size}-device mesh; pad the batch to a mesh multiple "
                f"or pass allow_replicate=True to replicate it explicitly")
        return jax.device_put(x, data)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh, tree):
    return jax.device_put(tree, replicate_sharding(mesh))
