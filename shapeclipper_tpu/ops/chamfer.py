"""Brute-force bidirectional nearest-neighbor (Chamfer) distance — Pallas TPU.

TPU-native replacement for the reference CUDA kernel
(`external/chamfer3D/chamfer3D.cu:12-196` + autograd wrapper
`external/chamfer3D/dist_chamfer_3D.py`): per-point min squared distance and
argmin index in both directions, with a custom VJP.

Design (MXU-friendly): coordinates are padded 3 -> 8 on the feature axis and
the [T1, T2] cross-distance tile is computed as |x2|^2 - 2·x1@x2ᵀ on the MXU
(|x1|^2 is a constant per row — added at the end), with a running (min,
argmin) over x2 tiles held in VMEM. The backward pass needs no atomics: the
x1-side gradient is a pure gather of x2[argmin]; the x2-side scatter is a
segment-sum (reference used atomicAdd, `chamfer3D.cu:155-174`).

Pallas runs `interpret=True` off-TPU so the same kernel is unit-tested on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N1 = 512       # rows of cloud A processed per grid step
TILE_N2 = 2048      # columns of cloud B per inner loop iteration
PAD_D = 8           # coordinate dim padded for lane alignment
BIG = 1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _nn_kernel(x1_ref, x2_ref, dist_ref, idx_ref):
    """2-D reduction grid (i over A tiles, j over B tiles) — the canonical
    Pallas accumulation pattern: the (dist, idx) output blocks for tile i are
    revisited across all j steps and hold the running (min, argmin).

    x1_ref: [TILE_N1, PAD_D]; x2_ref: [TILE_N2, PAD_D];
    dist_ref/idx_ref: [8, TILE_N1] (sublane-aligned; row 0 is the result).
    """
    j = pl.program_id(1)
    x1 = x1_ref[:]                                     # [T1, D]
    x2 = x2_ref[:]                                     # [T2, D]
    x1_sq = jnp.sum(x1 * x1, axis=-1)                  # [T1]
    x2_sq = jnp.sum(x2 * x2, axis=-1)                  # [T2]
    cross = jax.lax.dot_general(
        x1, x2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # [T1, T2]
    d = x2_sq[None, :] - 2.0 * cross                   # [T1, T2]
    local_min = jnp.min(d, axis=1)                     # [T1]
    # argmin via a masked second min (jnp.argmin lowers poorly on Mosaic)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    local_arg = jnp.min(
        jnp.where(d <= local_min[:, None], col, jnp.int32(2 ** 30)),
        axis=1) + j * TILE_N2
    local_dist = jnp.maximum(local_min + x1_sq, 0.0)

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.broadcast_to(local_dist[None, :], dist_ref.shape)
        idx_ref[:] = jnp.broadcast_to(local_arg[None, :], idx_ref.shape)

    @pl.when(j > 0)
    def _():
        best_d = dist_ref[0, :]
        take = local_dist < best_d
        dist_ref[:] = jnp.broadcast_to(
            jnp.where(take, local_dist, best_d)[None, :], dist_ref.shape)
        idx_ref[:] = jnp.broadcast_to(
            jnp.where(take, local_arg, idx_ref[0, :])[None, :],
            idx_ref.shape)


def _nn_one_direction(x1, x2, interpret):
    """x1: [N1, 3], x2: [N2, 3] (single cloud) -> (dist [N1], idx [N1])."""
    n1, n2 = x1.shape[0], x2.shape[0]
    n1p = _round_up(max(n1, 8), TILE_N1)
    n2p = _round_up(max(n2, 8), TILE_N2)
    x1p = jnp.zeros((n1p, PAD_D), x1.dtype).at[:n1, :3].set(x1)
    # padded B points pushed far away so they are never the argmin
    x2p = jnp.full((n2p, PAD_D), 0.0, x2.dtype)
    x2p = x2p.at[:n2, :3].set(x2)
    x2p = x2p.at[n2:, 0].set(1e15)

    grid = (n1p // TILE_N1, n2p // TILE_N2)
    dist, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N1, PAD_D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N2, PAD_D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, TILE_N1), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_N1), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, n1p), jnp.float32),
            jax.ShapeDtypeStruct((8, n1p), jnp.int32),
        ),
        interpret=interpret,
    )(x1p, x2p)
    return dist[0, :n1], idx[0, :n1]


def _nn_dist_kernel(x1_ref, x2_ref, dist_ref):
    """Distance-only variant of `_nn_kernel` (no argmin): the eval metric
    consumes only the min squared distances (`eval3d/metrics.py:190` discards
    the indices), and dropping the masked-iota argmin removes ~half the VPU
    work per [T1, T2] tile."""
    j = pl.program_id(1)
    x1 = x1_ref[:]
    x2 = x2_ref[:]
    x1_sq = jnp.sum(x1 * x1, axis=-1)
    x2_sq = jnp.sum(x2 * x2, axis=-1)
    cross = jax.lax.dot_general(
        x1, x2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    local = jnp.maximum(jnp.min(x2_sq[None, :] - 2.0 * cross, axis=1)
                        + x1_sq, 0.0)

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.broadcast_to(local[None, :], dist_ref.shape)

    @pl.when(j > 0)
    def _():
        dist_ref[:] = jnp.broadcast_to(
            jnp.minimum(local, dist_ref[0, :])[None, :], dist_ref.shape)


def _nn_dist_one_direction(x1, x2, interpret):
    """Distance-only single-direction NN: x1 [N1,3], x2 [N2,3] -> dist [N1]."""
    n1, n2 = x1.shape[0], x2.shape[0]
    n1p = _round_up(max(n1, 8), TILE_N1)
    n2p = _round_up(max(n2, 8), TILE_N2)
    x1p = jnp.zeros((n1p, PAD_D), x1.dtype).at[:n1, :3].set(x1)
    x2p = jnp.full((n2p, PAD_D), 0.0, x2.dtype)
    x2p = x2p.at[:n2, :3].set(x2)
    x2p = x2p.at[n2:, 0].set(1e15)
    grid = (n1p // TILE_N1, n2p // TILE_N2)
    dist = pl.pallas_call(
        _nn_dist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N1, PAD_D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N2, PAD_D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE_N1), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n1p), jnp.float32),
        interpret=interpret,
    )(x1p, x2p)
    return dist[0, :n1]


def _nn_dists_xla_bidir(x1, x2, tile1=None, tile2=None):
    """Distance-only BIDIRECTIONAL tiled NN in one pass: each [tile1, tile2]
    cross-distance tile is computed once and min-reduced along BOTH axes
    (running dir-2 minima ride the outer scan carry), halving the matmul +
    distance-assembly work of two independent sweeps and skipping the argmin
    entirely. x1 [N1,3], x2 [N2,3] -> (dist1 [N1], dist2 [N2])."""
    import os
    # tile1=2048 by tile sweep: 295.7 vs 310.0 (4096) vs 325.1 (8192/32768)
    # ms/sample at [4, 100k] nodot (output/chamfer_timing_r4.jsonl)
    tile1 = tile1 or int(os.environ.get("SCL_CHAMFER_TILE1", 2048))
    tile2 = tile2 or int(os.environ.get("SCL_CHAMFER_TILE2", 16384))
    nodot = os.environ.get("SCL_CHAMFER_CROSS", "nodot") == "nodot"
    n1, n2 = x1.shape[0], x2.shape[0]
    n1p, n2p = _round_up(n1, tile1), _round_up(n2, tile2)
    # padded rows sit at 1e15 on both sides: never the minimum for real rows
    x1p = jnp.full((n1p, 3), 0.0, x1.dtype).at[:n1].set(x1)
    x1p = x1p.at[n1:, 0].set(1e15)
    x2p = jnp.full((n2p, 3), 0.0, x2.dtype).at[:n2].set(x2)
    x2p = x2p.at[n2:, 0].set(1e15)
    x1t = x1p.reshape(n1p // tile1, tile1, 3)
    x2t = x2p.reshape(n2p // tile2, tile2, 3)

    def outer(best2, a):                               # a: [tile1, 3]
        a_sq = jnp.sum(a * a, axis=-1)

        def inner(best1, xs):
            bt, b2 = xs                                # [tile2,3], [tile2]
            if nodot:
                d = ((a[:, None, 0] - bt[None, :, 0]) ** 2
                     + (a[:, None, 1] - bt[None, :, 1]) ** 2
                     + (a[:, None, 2] - bt[None, :, 2]) ** 2)
            else:
                b_sq = jnp.sum(bt * bt, axis=-1)
                cross = jax.lax.dot_general(
                    a, bt, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                d = (b_sq[None, :] - 2.0 * cross) + a_sq[:, None]
            best1 = jnp.minimum(best1, jnp.min(d, axis=1))
            return best1, jnp.minimum(b2, jnp.min(d, axis=0))

        init1 = jnp.full((a.shape[0],), BIG, jnp.float32)
        best1, best2 = jax.lax.scan(inner, init1, (x2t, best2))
        return best2, best1

    init2 = jnp.full(x2t.shape[:2], BIG, jnp.float32)
    best2, dist1 = jax.lax.scan(outer, init2, x1t)
    return (jnp.maximum(dist1.reshape(-1)[:n1], 0.0),
            jnp.maximum(best2.reshape(-1)[:n2], 0.0))


def _part1by2(v):
    """Spread the low 10 bits of v so there are two zero bits between each
    (Morton-code helper)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def _morton_keys(pts, lo, inv_extent):
    """[N, 3] -> uint-ish int32 Morton keys on a 1024^3 lattice over the
    joint bounding box (spatial sort key: nearby points get nearby keys)."""
    q = jnp.clip(((pts - lo) * inv_extent * 1023.0).astype(jnp.int32),
                 0, 1023)
    return (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
            | (_part1by2(q[:, 2]) << 2))


def _nn_dists_xla_bidir_prune(x1, x2, tile1=None, tile2=None):
    """EXACT bbox-culled bidirectional NN sweep (single cloud pair).

    Both clouds are Morton-sorted so scan tiles are spatially coherent;
    each [tile1] x [tile2] pair carries bounding boxes, and a lax.cond
    skips the whole pair when the box-to-box lower bound exceeds the
    largest still-improvable running minimum on BOTH sides — a pruned pair
    provably cannot change any row's min, so the result is bitwise equal
    to the unpruned bidir sweep (per-pair distances are computed
    identically and min is order-independent). A proportionally-aligned
    seed pass primes the running minima so pruning bites from the first
    row of the sweep.

    The reference's CUDA kernel (`external/chamfer3D/chamfer3D.cu:12-134`)
    is a pure brute-force sweep. MEASURED EXPECTATION (host simulation on
    realistic normalized eval clouds, blob-vs-chair at 98k pts): tile-level
    culling prunes almost nothing on OVERLAPPING clouds — the per-tile
    `worst` bound is set by the single hardest row, so 82-100% of pairs
    still compute (speedup bound 0.84-1.16x across tile sizes). It only
    pays on well-separated or tightly matching clouds; hence opt-in, not
    the default. Call via lax.map over the batch — under vmap the cond
    becomes a select and executes both branches."""
    import os
    tile1 = tile1 or int(os.environ.get("SCL_CHAMFER_TILE1", 2048))
    tile2 = tile2 or int(os.environ.get("SCL_CHAMFER_TILE2", 16384))
    n1, n2 = x1.shape[0], x2.shape[0]
    n1p, n2p = _round_up(n1, tile1), _round_up(n2, tile2)

    lo = jnp.minimum(x1.min(0), x2.min(0))
    hi = jnp.maximum(x1.max(0), x2.max(0))
    inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-12)
    p1 = jnp.argsort(_morton_keys(x1, lo, inv_extent))
    p2 = jnp.argsort(_morton_keys(x2, lo, inv_extent))
    x1s, x2s = x1[p1], x2[p2]

    # padded rows at +1e15: never the minimum for real rows, and their own
    # mins are sliced away after unsorting
    x1p = jnp.full((n1p, 3), 1e15, x1.dtype).at[:n1].set(x1s)
    x2p = jnp.full((n2p, 3), 1e15, x2.dtype).at[:n2].set(x2s)
    x1t = x1p.reshape(n1p // tile1, tile1, 3)
    x2t = x2p.reshape(n2p // tile2, tile2, 3)
    T1, T2 = x1t.shape[0], x2t.shape[0]

    # per-tile bounding boxes over REAL rows only (pad rows sit at 1e15 and
    # would inflate the hi corner; mask them out of the min/max)
    def _bbox(tiles):
        real = tiles[..., 0] < 1e14
        lo_t = jnp.min(jnp.where(real[..., None], tiles, 1e15), axis=1)
        hi_t = jnp.max(jnp.where(real[..., None], tiles, -1e15), axis=1)
        return lo_t, hi_t
    b1lo, b1hi = _bbox(x1t)                      # [T1, 3]
    b2lo, b2hi = _bbox(x2t)                      # [T2, 3]

    def _lb_sq(alo, ahi, blo, bhi):
        gap = jnp.maximum(jnp.maximum(alo - bhi, blo - ahi), 0.0)
        return jnp.sum(gap * gap)

    def _tile_mins(a, bt):                       # [t1,3], [t2,3]
        d = ((a[:, None, 0] - bt[None, :, 0]) ** 2
             + (a[:, None, 1] - bt[None, :, 1]) ** 2
             + (a[:, None, 2] - bt[None, :, 2]) ** 2)
        return jnp.min(d, axis=1), jnp.min(d, axis=0)

    # seed pass: proportionally aligned tile pairs (Morton-close tiles are
    # spatially close) prime finite upper bounds before the main sweep
    best1 = jnp.full((T1, tile1), BIG, jnp.float32)
    best2 = jnp.full((T2, tile2), BIG, jnp.float32)

    def seed1(i, b):
        j = jnp.minimum((i * T2) // T1, T2 - 1)
        m1, _ = _tile_mins(x1t[i], jax.lax.dynamic_index_in_dim(
            x2t, j, keepdims=False))
        return b.at[i].set(m1)
    best1 = jax.lax.fori_loop(0, T1, seed1, best1)

    def seed2(j, b):
        i = jnp.minimum((j * T1) // T2, T1 - 1)
        _, m2 = _tile_mins(jax.lax.dynamic_index_in_dim(
            x1t, i, keepdims=False), x2t[j])
        return b.at[j].set(m2)
    best2 = jax.lax.fori_loop(0, T2, seed2, best2)

    # pad rows' running best would otherwise sit near BIG until the
    # pad-containing opposite tile arrives, and `worst` (a max over rows)
    # would disable pruning for most of the sweep; seed them to 0 — they
    # are sliced away after unsorting, and min(0, d) keeps them at 0
    best1 = jnp.where((jnp.arange(n1p) >= n1).reshape(T1, tile1), 0.0, best1)
    best2 = jnp.where((jnp.arange(n2p) >= n2).reshape(T2, tile2), 0.0, best2)

    def outer(best2_all, xs):
        a, alo, ahi, b1 = xs                     # tile1 row block

        def inner(carry, ys):
            b1, = carry
            bt, blo, bhi, b2 = ys
            lb = _lb_sq(alo, ahi, blo, bhi)
            # prune iff the pair can improve NEITHER side's worst live row
            worst = jnp.maximum(jnp.max(b1), jnp.max(b2))

            def compute(_):
                m1, m2 = _tile_mins(a, bt)
                return jnp.minimum(b1, m1), jnp.minimum(b2, m2)

            b1n, b2n = jax.lax.cond(lb < worst, compute,
                                    lambda _: (b1, b2), None)
            return (b1n,), b2n

        (b1,), best2_new = jax.lax.scan(
            inner, (b1,), (x2t, b2lo, b2hi, best2_all))
        return best2_new, b1

    best2, best1 = jax.lax.scan(
        outer, best2, (x1t, b1lo, b1hi, best1))

    d1 = jnp.zeros((n1,), jnp.float32).at[p1].set(
        best1.reshape(-1)[:n1])
    d2 = jnp.zeros((n2,), jnp.float32).at[p2].set(
        best2.reshape(-1)[:n2])
    return jnp.maximum(d1, 0.0), jnp.maximum(d2, 0.0)


def _nn_dists_xla_onedir(x1, x2, tile1=None, tile2=None):
    """Distance-only single-direction tiled NN (the `_nn_one_direction_xla`
    sweep without the argmin bookkeeping). x1 [N1,3], x2 [N2,3] -> [N1].

    SCL_CHAMFER_CROSS picks how the [tile1, tile2] cross-distance tile is
    formed: 'dot' (|b|^2 - 2 a@b^T on the MXU — but the K=3 dot's huge
    output is materialized to HBM before the min, making the sweep
    HBM-bound) or 'nodot' (explicit per-coordinate (a_k - b_k)^2 sums —
    pure VPU work that XLA fuses with the min into ONE streaming reduction,
    no HBM tile traffic)."""
    import os
    tile1 = tile1 or int(os.environ.get("SCL_CHAMFER_TILE1", 4096))
    tile2 = tile2 or int(os.environ.get("SCL_CHAMFER_TILE2", 16384))
    nodot = os.environ.get("SCL_CHAMFER_CROSS", "nodot") == "nodot"
    n1, n2 = x1.shape[0], x2.shape[0]
    n1p, n2p = _round_up(n1, tile1), _round_up(n2, tile2)
    x1p = jnp.zeros((n1p, 3), x1.dtype).at[:n1].set(x1)
    x2p = jnp.full((n2p, 3), 0.0, x2.dtype).at[:n2].set(x2)
    x2p = x2p.at[n2:, 0].set(1e15)
    x1t = x1p.reshape(n1p // tile1, tile1, 3)
    x2t = x2p.reshape(n2p // tile2, tile2, 3)

    def outer(_, a):                                   # a: [tile1, 3]
        a_sq = jnp.sum(a * a, axis=-1)

        def inner(best, bt):                           # bt: [tile2, 3]
            if nodot:
                d = jnp.min(
                    (a[:, None, 0] - bt[None, :, 0]) ** 2
                    + (a[:, None, 1] - bt[None, :, 1]) ** 2
                    + (a[:, None, 2] - bt[None, :, 2]) ** 2, axis=1)
                return jnp.minimum(best, d), None
            b_sq = jnp.sum(bt * bt, axis=-1)
            cross = jax.lax.dot_general(
                a, bt, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            d = jnp.min(b_sq[None, :] - 2.0 * cross, axis=1)
            return jnp.minimum(best, d), None

        init = jnp.full((a.shape[0],), BIG, jnp.float32)
        best, _ = jax.lax.scan(inner, init, x2t)
        if nodot:
            return None, best                          # already exact |a-b|^2
        return None, jnp.maximum(best + a_sq, 0.0)

    _, dist = jax.lax.scan(outer, None, x1t)
    return dist.reshape(-1)[:n1]


def chamfer_dists_sq(x1, x2):
    """Forward-only bidirectional squared NN distances (no argmin indices).

    x1: [B, N1, 3], x2: [B, N2, 3] -> (dist1 [B, N1], dist2 [B, N2]).
    The metric path (`eval3d/metrics.py`) uses this: it never reads the
    indices and never differentiates, so the index bookkeeping of
    `chamfer_distance_sq` is pure waste there.

    Defaults are set by round-4 v5e measurement at [4, 100k] (solo chip,
    ms/sample, output/chamfer_timing_r4.jsonl):
      bidir+nodot 310 | twopass+nodot 458 | prod dist+argmin nodot 809 |
      prod dot 975 | bidir+dot 1960 | twopass+dot 3834.
    'nodot' wins because XLA fuses the per-coordinate squared differences
    WITH the min into one streaming VPU reduction, while a K=3 MXU dot
    materializes every [tile1, tile2] f32 tile to HBM first; 'bidir' then
    halves the distance evaluations by min-reducing each tile along both
    axes. SCL_CHAMFER_DISTS / SCL_CHAMFER_CROSS override."""
    import os
    if _impl() == "pallas":
        f = partial(_nn_dist_one_direction, interpret=_use_interpret())
        return jax.vmap(f)(x1, x2), jax.vmap(f)(x2, x1)
    mode = os.environ.get("SCL_CHAMFER_DISTS", "bidir")
    if mode == "bidir_prune":
        # lax.map, not vmap: vmap would turn the tile-pair culling cond
        # into a select that executes both branches
        return jax.lax.map(
            lambda ab: _nn_dists_xla_bidir_prune(ab[0], ab[1]), (x1, x2))
    if mode == "bidir":
        return jax.vmap(_nn_dists_xla_bidir)(x1, x2)
    f = _nn_dists_xla_onedir
    return jax.vmap(f)(x1, x2), jax.vmap(f)(x2, x1)


def _use_interpret():
    return jax.default_backend() != "tpu"


def _impl():
    """'pallas' | 'xla'. XLA is the default: the tiled scan below compiles to
    MXU matmuls with running min/argmin and measures at HBM-bound speed; the
    Pallas kernel is kept behind SCL_CHAMFER_IMPL=pallas (some TPU attach
    modes have very slow Mosaic compile paths)."""
    import os
    return os.environ.get("SCL_CHAMFER_IMPL", "xla")


def _nn_one_direction_xla(x1, x2, tile1=None, tile2=None):
    """Pure-XLA tiled NN: scan over x1 tiles; inner scan over x2 tiles keeps
    a running (min, argmin). Peak live tile is [tile1, tile2] fp32.

    SCL_CHAMFER_CROSS='nodot' swaps the MXU dot for explicit per-coordinate
    squared differences (see `_nn_dists_xla_onedir`): exact distances with
    no cancellation, and the whole tile fuses with the min/argmin into one
    streaming VPU reduction instead of an HBM-materialized dot output."""
    import os
    tile1 = tile1 or int(os.environ.get("SCL_CHAMFER_TILE1", 4096))
    tile2 = tile2 or int(os.environ.get("SCL_CHAMFER_TILE2", 16384))
    nodot = os.environ.get("SCL_CHAMFER_CROSS", "nodot") == "nodot"
    n1, n2 = x1.shape[0], x2.shape[0]
    n1p, n2p = _round_up(n1, tile1), _round_up(n2, tile2)
    x1p = jnp.zeros((n1p, 3), x1.dtype).at[:n1].set(x1)
    x2p = jnp.full((n2p, 3), 0.0, x2.dtype).at[:n2].set(x2)
    x2p = x2p.at[n2:, 0].set(1e15)
    x1t = x1p.reshape(n1p // tile1, tile1, 3)
    x2t = x2p.reshape(n2p // tile2, tile2, 3)

    def outer(_, a):                                   # a: [tile1, 3]
        a_sq = jnp.sum(a * a, axis=-1)

        def inner(carry, bt):                          # bt: [tile2, 3]
            best_d, best_i, offset = carry
            if nodot:
                d = ((a[:, None, 0] - bt[None, :, 0]) ** 2
                     + (a[:, None, 1] - bt[None, :, 1]) ** 2
                     + (a[:, None, 2] - bt[None, :, 2]) ** 2)
            else:
                b_sq = jnp.sum(bt * bt, axis=-1)
                # HIGHEST: fp32 matmul passes — bf16 default precision is
                # enough to corrupt the argmin for near-ties
                cross = jax.lax.dot_general(
                    a, bt, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                d = b_sq[None, :] - 2.0 * cross        # [tile1, tile2]
            local_min = jnp.min(d, axis=1)
            local_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + offset
            take = local_min < best_d
            return (jnp.where(take, local_min, best_d),
                    jnp.where(take, local_arg, best_i),
                    offset + bt.shape[0]), None

        init = (jnp.full((a.shape[0],), BIG, jnp.float32),
                jnp.zeros((a.shape[0],), jnp.int32),
                jnp.int32(0))
        (best_d, best_i, _), _ = jax.lax.scan(inner, init, x2t)
        dist = best_d if nodot else jnp.maximum(best_d + a_sq, 0.0)
        return None, (dist, best_i)

    _, (dist, idx) = jax.lax.scan(outer, None, x1t)
    return dist.reshape(-1)[:n1], idx.reshape(-1)[:n1]


@jax.custom_vjp
def chamfer_distance_sq(x1, x2):
    """Bidirectional squared NN distance.

    x1: [B, N1, 3], x2: [B, N2, 3] ->
      (dist1 [B, N1], dist2 [B, N2], idx1 [B, N1] int32, idx2 [B, N2] int32)

    Matches `chamfer_3D.forward` (squared distances; callers sqrt for
    Chamfer-L1, reference `utils/eval_3D.py:155-165`).
    """
    return _chamfer_forward(x1, x2)


def _chamfer_forward(x1, x2):
    if _impl() == "pallas":
        fwd = partial(_nn_one_direction, interpret=_use_interpret())
    else:
        fwd = _nn_one_direction_xla
    d1, i1 = jax.vmap(fwd)(x1, x2)
    d2, i2 = jax.vmap(fwd)(x2, x1)
    return d1, d2, i1, i2


def _chamfer_fwd(x1, x2):
    out = _chamfer_forward(x1, x2)
    d1, d2, i1, i2 = out
    return out, (x1, x2, i1, i2)


def _chamfer_bwd(res, g):
    """d1_i = |x1_i - x2_{i1_i}|^2 -> dx1_i += 2 g1_i (x1_i - x2_{i1_i}),
    dx2 gets the scatter (segment-sum); symmetric for direction 2."""
    x1, x2, i1, i2 = res
    g1, g2, _, _ = g
    B, N1, _ = x1.shape
    N2 = x2.shape[1]

    x2_at = jnp.take_along_axis(x2, i1[..., None], axis=1)    # [B,N1,3]
    diff1 = x1 - x2_at
    dx1 = 2.0 * g1[..., None] * diff1
    dx2_scatter = jax.vmap(
        lambda seg, idx: jax.ops.segment_sum(seg, idx, num_segments=N2)
    )(-2.0 * g1[..., None] * diff1, i1)

    x1_at = jnp.take_along_axis(x1, i2[..., None], axis=1)    # [B,N2,3]
    diff2 = x2 - x1_at
    dx2 = 2.0 * g2[..., None] * diff2 + dx2_scatter
    dx1_scatter = jax.vmap(
        lambda seg, idx: jax.ops.segment_sum(seg, idx, num_segments=N1)
    )(-2.0 * g2[..., None] * diff2, i2)
    return dx1 + dx1_scatter, dx2


chamfer_distance_sq.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_distance_sq_reference(x1, x2):
    """O(N^2) jnp reference (memory-heavy; for tests on small clouds)."""
    d = jnp.sum((x1[:, :, None, :] - x2[:, None, :, :]) ** 2, axis=-1)
    return (jnp.min(d, 2), jnp.min(d, 1),
            jnp.argmin(d, 2).astype(jnp.int32),
            jnp.argmin(d, 1).astype(jnp.int32))


def chamfer_distance(opt, X1, X2):
    """Chamfer-L1 distances (sqrt of squared NN distance), reference
    `utils/eval_3D.py:155-165`."""
    d1, d2, i1, i2 = chamfer_distance_sq(X1, X2)
    return jnp.sqrt(d1), jnp.sqrt(d2), i1, i2
