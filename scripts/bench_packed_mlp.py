"""Microbenchmark: block-diagonal 2x-packing of width-64 MLP chains on TPU.

The implicit MLPs are width 64; the MXU is a 128x128 systolic array, so a
[N,64]x[64,64] matmul occupies 1/4 of each weight tile (64/128 on BOTH the
contraction and output lanes).  Packing two point-rows per lane-row —
x [N,64] -> [N/2,128], W -> blockdiag(W,W) [128,128] — streams half the rows
through full tiles: same useful math (adding zeros is exact), ~2x fewer MXU
cycles IF the chain is occupancy-bound.

Usage: python scripts/bench_packed_mlp.py [N] [depth] [iters]
Writes one JSON line per variant. Honest timing: host fetch per rep
(CLAUDE.md: block_until_ready does not block through the axon tunnel).
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def blockdiag2(w):
    k, f = w.shape
    z = jnp.zeros_like(w)
    return jnp.concatenate([
        jnp.concatenate([w, z], axis=1),
        jnp.concatenate([z, w], axis=1),
    ], axis=0)


def chain_plain(ws, x):
    for w in ws:
        x = jax.nn.softplus(100.0 * (x @ w)) / 100.0
    return x


def chain_packed(ws, x):
    n = x.shape[0]
    xp = jnp.concatenate([x[: n // 2], x[n // 2:]], axis=1)  # [N/2, 2k]
    for w in ws:
        xp = jax.nn.softplus(100.0 * (xp @ blockdiag2(w))) / 100.0
    f = ws[-1].shape[1]
    return jnp.concatenate([xp[:, :f], xp[:, f:]], axis=0)


def timeit(fn, args, iters):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_359_296  # 72*512*64
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    ws = [jax.random.normal(jax.random.fold_in(key, i), (64, 64), dtype) * 0.1
          for i in range(depth)]
    x = jax.random.normal(jax.random.fold_in(key, 99), (N, 64), dtype)

    # scalar outputs everywhere: a full-output fetch ships ~300 MB through
    # the tunnel and swamps the compute being measured
    fns = {
        "plain_fwd": jax.jit(
            lambda ws, x: chain_plain(ws, x).sum().astype(jnp.float32)),
        "packed_fwd": jax.jit(
            lambda ws, x: chain_packed(ws, x).sum().astype(jnp.float32)),
        "plain_fwdbwd": jax.jit(
            lambda ws, x: jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(),
                jax.grad(lambda w, y: chain_plain(w, y).sum().astype(
                    jnp.float32), argnums=(0,))(ws, x), 0.0)),
        "packed_fwdbwd": jax.jit(
            lambda ws, x: jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(),
                jax.grad(lambda w, y: chain_packed(w, y).sum().astype(
                    jnp.float32), argnums=(0,))(ws, x), 0.0)),
    }
    res = {}
    for name, fn in fns.items():
        ms = timeit(fn, (ws, x), iters)
        res[name] = ms
        print(json.dumps({"variant": name, "N": N, "depth": depth,
                          "ms": round(ms, 3)}), flush=True)
    print(json.dumps({
        "speedup_fwd": round(res["plain_fwd"] / res["packed_fwd"], 3),
        "speedup_fwdbwd": round(res["plain_fwdbwd"] / res["packed_fwdbwd"], 3),
        "device": jax.devices()[0].device_kind}), flush=True)

    # parity
    y0 = np.asarray(jax.jit(chain_plain)(ws, x), np.float32)
    y1 = np.asarray(jax.jit(chain_packed)(ws, x), np.float32)
    print(json.dumps({"max_abs_delta": float(np.abs(y0 - y1).max())}),
          flush=True)


if __name__ == "__main__":
    main()
