"""Checkpoint save/restore for pytree train state.

Keeps the reference's file contract (reference `utils/util.py:123-192`):
  * `latest.ckpt` every freq.ckpt_latest iters
  * `best.ckpt` on improved eval CD
  * `checkpoint/ep{N}.ckpt` per-epoch copies
  * payload: epoch, iter, best_val, graph ({params, batch_stats}), optimizer
    states
  * `children=(...)` filters the graph to top-level subtrees (the
    pretrain -> train partial handoff); restore merges per-child subtrees
  * evaluate-mode restore is non-strict and reports missing/unexpected keys

Serialization: flax msgpack over numpy-converted pytrees (host-side, no
device sync beyond the copy).
"""

from __future__ import annotations

import os
import shutil

import jax
import numpy as np
from flax import serialization

from .log import log


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(output_path, graph_state, optim_states=None, ep=0, it=0,
                    best_val=np.inf, latest=False, best=False, children=None):
    """graph_state: {'params': ..., 'batch_stats': ...}; optim_states: dict of
    name -> optax state pytree."""
    os.makedirs(os.path.join(output_path, "checkpoint"), exist_ok=True)
    if children is not None:
        graph_state = {
            group: {k: v for k, v in sub.items() if k.startswith(tuple(children))}
            for group, sub in graph_state.items()
        }
    payload = dict(
        epoch=ep, iter=it, best_val=float(best_val),
        graph=serialization.to_state_dict(_to_numpy(graph_state)),
    )
    for name, state in (optim_states or {}).items():
        payload[name] = serialization.to_state_dict(_to_numpy(state))
    blob = serialization.msgpack_serialize(payload)
    latest_path = os.path.join(output_path, "latest.ckpt")
    tmp = latest_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, latest_path)
    if best:
        shutil.copy(latest_path, os.path.join(output_path, "best.ckpt"))
    if not latest:
        shutil.copy(latest_path,
                    os.path.join(output_path, "checkpoint", f"ep{ep}.ckpt"))


def load_raw(path):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _merge_children(target, loaded, group):
    """Per-child (top-level subtree) restore: children present in the
    checkpoint replace the target's; others are kept (reference
    `utils/util.py:148-156`)."""
    out = dict(target)
    for name in target:
        if name in loaded and loaded[name]:
            print(f"restoring {group}/{name}...")
            out[name] = serialization.from_state_dict(target[name], loaded[name])
        else:
            print(f"skipping {group}/{name}...")
    return out


def restore_checkpoint(output_path, graph_state, optim_states=None,
                       load_name=None, resume=False, best=False,
                       evaluate=False):
    """Returns (graph_state, optim_states, epoch, iter, best_val).

    resume=True/epoch-number: strict full restore (+ optimizer states).
    load_name: partial per-child restore, no optimizer.
    evaluate: non-strict restore of whatever keys exist.
    """
    assert (load_name is None) == (resume is not False)
    if resume:
        if best:
            load_name = os.path.join(output_path, "best.ckpt")
            if not os.path.exists(load_name):
                log.warn("best.ckpt not found; falling back to latest.ckpt")
                load_name = os.path.join(output_path, "latest.ckpt")
        elif resume is True:
            load_name = os.path.join(output_path, "latest.ckpt")
        else:
            load_name = os.path.join(output_path, "checkpoint",
                                     f"ep{resume}.ckpt")
    ckpt = load_raw(load_name)
    loaded_graph = ckpt.get("graph", {})

    if resume and not evaluate:
        graph_state = serialization.from_state_dict(graph_state, loaded_graph)
    elif evaluate:
        new_state = {}
        for group, target in graph_state.items():
            loaded = loaded_graph.get(group, {})
            missing = [k for k in target if k not in loaded]
            unexpected = [k for k in loaded if k not in target]
            if missing:
                log.info(f"missing {group} keys: {missing}")
            if unexpected:
                log.info(f"unexpected {group} keys: {unexpected}")
            new_state[group] = _merge_children(target, loaded, group)
        graph_state = new_state
    else:  # partial child load
        graph_state = {
            group: _merge_children(target, loaded_graph.get(group, {}), group)
            for group, target in graph_state.items()
        }

    if optim_states is not None and resume:
        optim_states = {
            name: (serialization.from_state_dict(state, ckpt[name])
                   if name in ckpt else state)
            for name, state in optim_states.items()
        }

    if resume:
        ep, it, best_val = ckpt["epoch"], ckpt["iter"], ckpt["best_val"]
        print(f"resuming from epoch {ep} (iteration {it})")
        if resume is not True and not best:
            assert resume == ep
    else:
        ep, it, best_val = None, None, None
    return graph_state, optim_states, ep, it, best_val
