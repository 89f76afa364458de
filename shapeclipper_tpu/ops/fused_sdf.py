"""Fused SDF-MLP forward (+ forward-mode point gradient) — Pallas TPU.

The renderer/eval hot loop evaluates a small conditional MLP (posenc -> 6
Dense layers with skips, softplus(100)) on 10^5..10^6 points. Under XLA each
layer's [N, 64] activation round-trips HBM; this kernel keeps a whole tile's
activations in VMEM and fuses posenc + all layers (+ optionally the spatial
gradient via forward-mode tangents, batched into the same MXU matmuls as the
primal).

Semantics: identical to `SDFNetwork.__call__` /
`sdf_with_gradient` (models/implicit.py) for the default architecture
(posenc 6, skip at {1, 2}, 5 hidden x 64, force_symmetry). The latent enters
as precomputed per-sample effective biases (the factored-latent form), so the
kernel sees only per-point math.

Used on no-grad paths (dense-grid eval, eval renders). Training keeps the
XLA implementation (which autodiff nests through).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512
INV_SQRT2 = 0.7071067811865476


def _round_up(x, m):
    return (x + m - 1) // m * m


def prepare_fused_params(params_sdf, latent, n_freqs=6, skip_in=(1, 2),
                         n_hidden=5):
    """Fold the latent into per-layer effective biases and pre-scale the skip
    kernels; returns a flat list of kernel arrays for the kernel call.

    params_sdf: flax param tree {lin0..lin5: {kernel, bias}};
    latent: [B, C].
    """
    pe_dim = 3 + 6 * n_freqs
    num_layers = n_hidden + 1  # 6 linear layers
    kernels, biases = [], []
    for l in range(num_layers):
        K = params_sdf[f"lin{l}"]["kernel"]
        b = params_sdf[f"lin{l}"]["bias"]
        if l == 0:
            Kpe, Klat = K[:pe_dim], K[pe_dim:]
            kernels.append((Kpe, None))
            biases.append(b[None] + latent @ Klat)           # [B, out]
        elif l in skip_in:
            C = K.shape[0] - pe_dim - latent.shape[-1]
            Kh = K[:C] * INV_SQRT2
            Kpe = K[C:C + pe_dim] * INV_SQRT2
            Klat = K[C + pe_dim:] * INV_SQRT2
            kernels.append((Kh, Kpe))
            biases.append(b[None] + latent @ Klat)
        else:
            kernels.append((K, None))
            biases.append(jnp.broadcast_to(b[None],
                                           (latent.shape[0], b.shape[0])))
    return kernels, biases


def make_posenc_constants(n_freqs):
    """Constant tables for the kernel (passed as inputs — Mosaic rejects
    captured constants): freqs [1, F], eye [3, 3], coord_mask [3, 6F]."""
    freqs = (2.0 ** np.arange(n_freqs, dtype=np.float32))[None]
    eye = np.eye(3, dtype=np.float32)
    coord_mask = np.tile(eye, (1, 2 * n_freqs)).reshape(3, -1)
    return (jnp.asarray(freqs), jnp.asarray(eye), jnp.asarray(coord_mask))


def _posenc_and_tangents(x, freqs, eye, coord_mask, compute_grad):
    """x: [T, 3] (|x| already applied). Returns pe [T, 39] and, when
    compute_grad, tangents dpe/dx_d stacked as [3, T, 39]."""
    f = freqs[0]                                             # [F]
    xf = x[:, None, :] * f[:, None]                          # [T, F, 3]
    sin, cos = jnp.sin(xf), jnp.cos(xf)
    sc = jnp.stack([sin, cos], axis=-2)                      # [T, F, 2, 3]
    pe = jnp.concatenate([x, sc.reshape(x.shape[0], -1)], axis=-1)
    if not compute_grad:
        return pe, None
    # d sin(f x_d)/dx_d = f cos, d cos/dx_d = -f sin; features of coord d
    # depend only on x_d
    dsc = jnp.stack([cos * f[:, None], -sin * f[:, None]], axis=-2)
    # tangent of the raw-x block: identity rows; of sc block: mask per coord
    t_x = jnp.broadcast_to(eye[:, None, :], (3, x.shape[0], 3))
    dsc_flat = dsc.reshape(1, x.shape[0], -1)                # [1, T, 36]
    t_sc = dsc_flat * coord_mask[:, None, :]                 # [3, T, 36]
    tangents = jnp.concatenate([t_x, t_sc], axis=-1)         # [3, T, 39]
    return pe, tangents


def _mlp_rows(pe_rows, kernels_flat, biases_row, skip_in, n_hidden,
              compute_grad, sp_select):
    """Shared MLP body on stacked rows [R, 39] where R = T (primal only) or
    4T (primal + 3 tangents). `sp_select(a_primal, rows)` applies the right
    nonlinearity per row group."""
    num_layers = n_hidden + 1
    ki = 0
    h = None
    for l in range(num_layers):
        if l == 0:
            W = kernels_flat[ki]; ki += 1
            out = jax.lax.dot_general(
                pe_rows, W, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif l in skip_in:
            Wh = kernels_flat[ki]; ki += 1
            Wpe = kernels_flat[ki]; ki += 1
            out = (jax.lax.dot_general(h, Wh, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(pe_rows, Wpe, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32))
        else:
            W = kernels_flat[ki]; ki += 1
            out = jax.lax.dot_general(h, W, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        out = out + biases_row[l]
        if l < num_layers - 1:
            out = sp_select(out, l)
        h = out
    return h


def fused_sdf_forward(params_sdf, points, latent, n_freqs=6, skip_in=(1, 2),
                      n_hidden=5, compute_grad=False, force_symmetry=True,
                      interpret=None):
    """points: [B, N, 3]; latent: [B, C] -> (sdf [B,N,1], feat [B,N,C],
    grad [B,N,3] or None). No autodiff support — eval paths only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, _ = points.shape
    kernels, biases = prepare_fused_params(params_sdf, latent, n_freqs,
                                           skip_in, n_hidden)
    out_width = kernels[-1][0].shape[-1]  # 1 + feat channels
    n_pad = _round_up(N, TILE_N)
    pts = jnp.zeros((B, n_pad, 3), jnp.float32).at[:, :N].set(points)

    kernels_flat = []
    for Ka, Kb in kernels:
        kernels_flat.append(Ka)
        if Kb is not None:
            kernels_flat.append(Kb)
    num_layers = n_hidden + 1

    def kernel(pts_ref, freqs_ref, eye_ref, mask_ref, *refs):
        bias_refs = refs[:num_layers]
        kern_refs = refs[num_layers:num_layers + len(kernels_flat)]
        out_ref = refs[-1]
        batch_idx = pl.program_id(0)
        x = pts_ref[0]                                        # [T, 3]
        if force_symmetry:
            sign0 = jnp.where(x[:, :1] < 0, -1.0, 1.0)
            x = jnp.concatenate([jnp.abs(x[:, :1]), x[:, 1:]], axis=-1)
        pe, tangents = _posenc_and_tangents(
            x, freqs_ref[:], eye_ref[:], mask_ref[:], compute_grad)
        T = pe.shape[0]
        if compute_grad:
            rows = jnp.concatenate([pe, tangents.reshape(3 * T, -1)], axis=0)
        else:
            rows = pe

        biases_row = []
        primal_sel = jax.lax.broadcasted_iota(
            jnp.int32, (rows.shape[0], 1), 0) < T

        for l in range(num_layers):
            b = bias_refs[l][batch_idx]                      # [out]
            if compute_grad:
                # tangent rows get zero bias
                biases_row.append(jnp.where(primal_sel, b[None, :], 0.0))
            else:
                biases_row.append(b[None, :])

        _acts = {}

        def sp_select(a, l):
            # softplus(100)/100 on primal rows; tangents multiply by the
            # primal rows' sigmoid(100a)
            if not compute_grad:
                return jax.nn.softplus(100.0 * a) / 100.0
            prim = a[:T]
            act = jax.nn.softplus(100.0 * prim) / 100.0
            sig = jax.nn.sigmoid(100.0 * prim)                # [T, out]
            tang = a[T:].reshape(3, T, -1) * sig[None]
            return jnp.concatenate([act, tang.reshape(3 * T, -1)], axis=0)

        out = _mlp_rows(rows, [k[:] for k in kern_refs], biases_row,
                        skip_in, n_hidden, compute_grad, sp_select)

        # assemble the padded output row block without scatters (Mosaic has
        # no scatter lowering): [out | grad | zero pad] -> [T, 128]
        pieces = [out[:T]]
        pad = 128 - out_width
        if compute_grad:
            g = out[T:].reshape(3, T, -1)[:, :, 0]            # [3, T] d sdf
            gx = g[0:1] * sign0[:, 0][None]                   # |x| chain rule
            pieces.append(jnp.concatenate([gx, g[1:]], axis=0).T)
            pad -= 3
        pieces.append(jnp.zeros((T, pad), jnp.float32))
        out_ref[0] = jnp.concatenate(pieces, axis=-1)

    grid = (B, n_pad // TILE_N)
    consts = make_posenc_constants(n_freqs)
    in_specs = [pl.BlockSpec((1, TILE_N, 3), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(c.shape, lambda b, i, nd=c.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for c in consts]
    inputs = [pts, *consts]
    for b in biases:
        # full [B, out] block (tiny); the kernel indexes its batch row —
        # per-batch (1, out) blocks violate the sublane tiling constraint
        in_specs.append(pl.BlockSpec(b.shape, lambda bb, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(b)
    for k in kernels_flat:
        in_specs.append(pl.BlockSpec(k.shape, lambda bb, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(k)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TILE_N, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, 128), jnp.float32),
        interpret=interpret,
    )(*inputs)

    out = out[:, :N]
    sdf = out[..., :1]
    feat = out[..., 1:out_width]
    grad = out[..., out_width:out_width + 3] if compute_grad else None
    return sdf, feat, grad
