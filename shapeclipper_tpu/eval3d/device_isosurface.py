"""Device-side marching tetrahedra + area-weighted surface sampling.

TPU-native replacement for the host isosurface path at eval-metric time.
The reference extracts the surface on the HOST — PyMCubes per batch element
in Python threads plus trimesh area-weighted resampling (reference
`utils/eval_3D.py:123-153`) — which on this rebuild's measured eval profile
costs ~72 ms/sample of single-core host time (21 ms marching tets + 51 ms
sampling) plus a multi-MB level-grid device->host fetch per batch.

Here the whole pipeline is static-shape device code, so it fuses into the
SAME jit'd program as rotate/normalize/Chamfer/F-score and the level grid
never leaves the device:

  * every grid cell splits into the 6 main-diagonal tetrahedra; each tet
    emits exactly 2 triangle SLOTS (masked invalid by sign case) — a fixed
    [C, 6, 2] lattice XLA can tile, no host compaction;
  * triangle areas feed an inverse-CDF categorical draw (cumsum +
    searchsorted — the device equivalent of `np.random.choice(p=areas)`);
  * only the `n_points` drawn faces are re-gathered and barycentrically
    sampled (the [T, 3, 3] triangle tensor is never materialized — pass 1
    reduces straight to areas, pass 2 gathers 4 grid corners per drawn
    face).

The tet decomposition and per-case topology tables are imported from the
host `isosurface` module, so both paths extract the same surface by
construction; `tests/test_device_isosurface.py` asserts triangle-set and
end-to-end metric parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import isosurface


def _build_case_tables():
    """Per-case triangle topology as dense arrays: for sign case c and
    triangle slot s, vertex k lies on the tet edge (EDGE_A, EDGE_B) =
    (inside vertex, outside vertex); VALID masks unused slots."""
    edge_a = np.zeros((16, 2, 3), np.int32)
    edge_b = np.zeros((16, 2, 3), np.int32)
    valid = np.zeros((16, 2), np.bool_)
    for case in range(16):
        for s, tri in enumerate(isosurface._CASE_TRIS[case]):
            valid[case, s] = True
            for k, (a, b) in enumerate(tri):
                edge_a[case, s, k] = a
                edge_b[case, s, k] = b
    return edge_a, edge_b, valid


_EDGE_A, _EDGE_B, _VALID = _build_case_tables()
_TETS = isosurface._TETS          # [6, 4] cube-corner id per tet vertex
_CORNERS = isosurface._CORNERS    # [8, 3] (dx, dy, dz); corner = x + 2y + 4z


def _tet_corner_data(level, isovalue):
    """level [M, M, M] -> (case [C, 6] int32, tet_vals [C, 6, 4],
    base [C, 3] f32 cell coords), C = (M-1)^3. Corner stacking order matches
    the host `marching_tetrahedra` exactly (bit i of the corner id is axis i)."""
    c = level
    corner_vals = jnp.stack([
        c[:-1, :-1, :-1], c[1:, :-1, :-1], c[:-1, 1:, :-1], c[1:, 1:, :-1],
        c[:-1, :-1, 1:], c[1:, :-1, 1:], c[:-1, 1:, 1:], c[1:, 1:, 1:],
    ], axis=-1).reshape(-1, 8)                                  # [C, 8]
    tet_vals = corner_vals[:, jnp.asarray(_TETS)]               # [C, 6, 4]
    bits = (tet_vals < isovalue).astype(jnp.int32)
    case = jnp.sum(bits * (2 ** jnp.arange(4, dtype=jnp.int32)), axis=-1)
    n = level.shape[0] - 1
    cell = jnp.arange(n * n * n, dtype=jnp.int32)
    base = jnp.stack([cell // (n * n), (cell // n) % n, cell % n],
                     axis=-1).astype(jnp.float32)               # [C, 3]
    return case, tet_vals, base


def _lerp_vertex(va, vb, pa, pb, isovalue):
    """Edge-crossing interpolation, identical to the host path (same 1e-12
    guard and [0, 1] clip)."""
    denom = vb - va
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip((isovalue - va) / denom, 0.0, 1.0)[..., None]
    return pa * (1.0 - t) + pb * t


def _tri_vertex(case, tet_vals, base, s, k, isovalue):
    """Triangle vertex k of slot s for every (cell, tet): [C, 6, 3] f32 in
    grid-index coordinates."""
    a_idx = jnp.asarray(_EDGE_A[:, s, k])[case]                 # [C, 6]
    b_idx = jnp.asarray(_EDGE_B[:, s, k])[case]
    va = jnp.take_along_axis(tet_vals, a_idx[..., None], axis=-1)[..., 0]
    vb = jnp.take_along_axis(tet_vals, b_idx[..., None], axis=-1)[..., 0]
    tets = jnp.broadcast_to(jnp.asarray(_TETS), case.shape + (4,))
    ca = jnp.take_along_axis(tets, a_idx[..., None], axis=-1)[..., 0]
    cb = jnp.take_along_axis(tets, b_idx[..., None], axis=-1)[..., 0]
    corners = jnp.asarray(_CORNERS, jnp.float32)
    pa = base[:, None, :] + corners[ca]                         # [C, 6, 3]
    pb = base[:, None, :] + corners[cb]
    return _lerp_vertex(va, vb, pa, pb, isovalue)


def triangle_areas(level, isovalue=0.0):
    """level [M, M, M] -> areas [T] f32 with T = (M-1)^3 * 6 * 2, flattened
    as (cell, tet, slot); invalid slots have area 0. XLA fuses the vertex
    construction into the area reduction, so no [T, 3, 3] tensor is ever
    materialized."""
    case, tet_vals, base = _tet_corner_data(level, isovalue)
    per_slot = []
    for s in (0, 1):
        p0 = _tri_vertex(case, tet_vals, base, s, 0, isovalue)
        p1 = _tri_vertex(case, tet_vals, base, s, 1, isovalue)
        p2 = _tri_vertex(case, tet_vals, base, s, 2, isovalue)
        cr = jnp.cross(p1 - p0, p2 - p0)
        area = 0.5 * jnp.sqrt(jnp.sum(cr * cr, axis=-1))        # [C, 6]
        ok = jnp.asarray(_VALID[:, s])[case]
        per_slot.append(jnp.where(ok, area, 0.0))
    return jnp.stack(per_slot, axis=-1).reshape(-1)             # [T]


def _gather_face_vertices(level, face_idx, isovalue):
    """Re-derive the 3 vertices of the drawn faces only. level [M, M, M],
    face_idx [n] (flattened (cell, tet, slot)) -> 3 x [n, 3] f32."""
    M = level.shape[0]
    n = M - 1
    flat = level.reshape(-1)
    slot = face_idx % 2
    tet = (face_idx // 2) % 6
    cell = face_idx // 12
    base = jnp.stack([cell // (n * n), (cell // n) % n, cell % n], axis=-1)
    cid = jnp.asarray(_TETS)[tet]                               # [n, 4]
    off = jnp.asarray(_CORNERS)[cid]                            # [n, 4, 3]
    gi = base[:, None, :] + off
    vals = flat[(gi[..., 0] * M + gi[..., 1]) * M + gi[..., 2]]  # [n, 4]
    bits = (vals < isovalue).astype(jnp.int32)
    case = jnp.sum(bits * (2 ** jnp.arange(4, dtype=jnp.int32)), axis=-1)
    sel = case * 2 + slot                                       # [n] in 0..31
    pos = gi.astype(jnp.float32)                                # [n, 4, 3]
    ea = jnp.asarray(_EDGE_A.reshape(32, 3))
    eb = jnp.asarray(_EDGE_B.reshape(32, 3))
    pts = []
    npts = face_idx.shape[0]
    for k in range(3):
        a_idx = ea[sel, k]
        b_idx = eb[sel, k]
        va = jnp.take_along_axis(vals, a_idx[:, None], axis=-1)[:, 0]
        vb = jnp.take_along_axis(vals, b_idx[:, None], axis=-1)[:, 0]
        pa = jnp.take_along_axis(
            pos, jnp.broadcast_to(a_idx[:, None, None], (npts, 1, 3)),
            axis=1)[:, 0]
        pb = jnp.take_along_axis(
            pos, jnp.broadcast_to(b_idx[:, None, None], (npts, 1, 3)),
            axis=1)[:, 0]
        pts.append(_lerp_vertex(va, vb, pa, pb, isovalue))
    return pts


def sample_level_surface(level, n_points, range_min, range_max, key,
                         isovalue=0.0):
    """Area-weighted surface sampling of the isosurface of one level grid.

    level [M, M, M] -> [n_points, 3] f32 WORLD coordinates (the host
    convention verts / M * (range_max - range_min) + range_min, reference
    `utils/eval_3D.py:140-146`). Returns zeros when the grid has no
    isosurface, matching `isosurface.sample_surface` on an empty mesh."""
    areas = triangle_areas(level, isovalue)
    cdf = jnp.cumsum(areas)
    total = cdf[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    r = jax.random.uniform(k1, (n_points,)) * total
    face_idx = jnp.clip(jnp.searchsorted(cdf, r, side="right"),
                        0, areas.shape[0] - 1)
    p0, p1, p2 = _gather_face_vertices(level, face_idx, isovalue)
    # barycentric draw with the same flip trick as the host sampler
    u = jax.random.uniform(k2, (n_points, 1))
    w = jax.random.uniform(k3, (n_points, 1))
    flip = (u + w) > 1.0
    u = jnp.where(flip, 1.0 - u, u)
    w = jnp.where(flip, 1.0 - w, w)
    pts = p0 + u * (p1 - p0) + w * (p2 - p0)
    M = level.shape[0]
    pts = pts / M * (range_max - range_min) + range_min
    return jnp.where(total > 0.0, pts, 0.0).astype(jnp.float32)


def sample_level_surface_batch(level, n_points, range_min, range_max, key,
                               isovalue=0.0, mode=None):
    """Batched sampling: level [B, M, M, M] -> [B, n_points, 3].

    mode='map' (single-device default): sequential lax.map over the batch —
    each sample's area pass is a ~T-lane reduction that already saturates
    the chip, and mapping keeps peak HBM at one sample's transients instead
    of B of them. mode='vmap' (multi-device default): batched, preserving a
    batch sharding over the mesh (lax.map would serialize and gather)."""
    if mode is None:
        mode = "vmap" if jax.device_count() > 1 else "map"
    keys = jax.random.split(key, level.shape[0])
    f = partial(sample_level_surface, n_points=n_points,
                range_min=range_min, range_max=range_max, isovalue=isovalue)
    if mode == "vmap":
        return jax.vmap(lambda lv, k: f(lv, key=k))(level, keys)
    return jax.lax.map(lambda xs: f(xs[0], key=xs[1]), (level, keys))


def triangles_for_tests(level, isovalue=0.0):
    """Materialize every triangle slot for parity tests on SMALL grids:
    -> (tris [T, 3, 3] f32 index coords, valid [T] bool)."""
    case, tet_vals, base = _tet_corner_data(level, isovalue)
    slots, valids = [], []
    for s in (0, 1):
        ps = [_tri_vertex(case, tet_vals, base, s, k, isovalue)
              for k in range(3)]
        slots.append(jnp.stack(ps, axis=-2))                    # [C, 6, 3, 3]
        valids.append(jnp.asarray(_VALID[:, s])[case])
    tris = jnp.stack(slots, axis=2).reshape(-1, 3, 3)
    valid = jnp.stack(valids, axis=2).reshape(-1)
    return tris, valid
