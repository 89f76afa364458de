"""Fused SDF-MLP forward (+ forward-mode point gradient) — Pallas TPU.

The renderer/eval hot loop evaluates a small conditional MLP (posenc -> 6
Dense layers with skips, softplus(100)) on 10^5..10^6 points. Under XLA each
layer's [N, 64] activation round-trips HBM; this kernel keeps a whole tile's
activations in VMEM and fuses posenc + all layers (+ optionally the spatial
gradient via forward-mode tangents, batched into the same MXU matmuls as the
primal: rows = [primal; tangent_x; tangent_y; tangent_z]).

Semantics: identical to `SDFNetwork.__call__` / `sdf_with_gradient`
(models/implicit.py) for the default architecture (posenc 6, skip at {1, 2},
5 hidden x 64, force_symmetry). The latent enters as precomputed per-sample
effective biases (the factored-latent form), so the kernel sees only
per-point math.

Mosaic restrictions honored: no scatters, no captured constant arrays, no
>2D reshapes inside the kernel (everything is concat/slice on 2-D tiles),
frequencies folded in as scalar immediates.

Used on no-grad paths (dense-grid eval, eval renders). Training keeps the
XLA implementation (which autodiff nests through).
"""

from __future__ import annotations

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
    kernels; returns (kernels flat list, biases list [B, out])."""
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


def _coord_masks(n_freqs):
    """[3, 3 + 6F] 0/1 rows: which posenc features depend on coordinate d
    (feature order [x, sin(f0 x), cos(f0 x), sin(f1 x), ...])."""
    eye = np.eye(3, dtype=np.float32)
    blocks = [eye] + [eye, eye] * n_freqs
    return np.concatenate(blocks, axis=1)


def sdf_fwdmode_xla(params_sdf, points, latent, n_freqs=6, skip_in=(1, 2),
                    n_hidden=5, compute_grad=True, force_symmetry=True,
                    detach_latent=False, dtype=jnp.float32):
    """SDF + spatial gradient via hand-rolled forward-mode tangents, pure XLA.

    points: [B, N, 3]; latent: [B, C] -> (sdf [B,N,1], feat [B,N,C],
    grad [B,N,3] or None).

    Same math as the Pallas kernel above (rows = [primal; tangent_x; _y; _z]
    batched into each layer's matmul), but expressed in jnp so XLA fuses it —
    and, crucially, so the TRAINING backward through the spatial gradient is a
    single plain reverse pass over a 4x-wide first-order forward instead of
    the nested vjp-of-vjp the `sdf_with_gradient` formulation needs (the
    reference needed `torch.autograd.grad(create_graph=True)` double
    backward, `model/renderer.py:93-107`). Numerically identical to
    `sdf_with_gradient` up to fp reassociation.
    """
    if detach_latent:
        latent = jax.lax.stop_gradient(latent)
    kernels, biases = prepare_fused_params(params_sdf, latent, n_freqs,
                                           skip_in, n_hidden)
    if dtype != jnp.float32:
        cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: None if a is None else a.astype(dtype), t,
            is_leaf=lambda a: a is None)
        kernels, biases, points, = cast(kernels), cast(biases), cast(points)
    x = points
    if force_symmetry:
        sign0 = jnp.where(x[..., :1] < 0, -1.0, 1.0)          # [B,N,1]
        x = jnp.concatenate([jnp.abs(x[..., :1]), x[..., 1:]], axis=-1)

    pe_parts = [x]
    dpe_parts = [jnp.ones_like(x)] if compute_grad else None
    for k in range(n_freqs):
        f = 2.0 ** k
        xf = x * f
        s, c = jnp.sin(xf), jnp.cos(xf)
        pe_parts += [s, c]
        if compute_grad:
            dpe_parts += [f * c, -f * s]
    pe = jnp.concatenate(pe_parts, axis=-1)                    # [B,N,D]
    if compute_grad:
        dpe = jnp.concatenate(dpe_parts, axis=-1)              # [B,N,D]
        m = jnp.asarray(_coord_masks(n_freqs), dtype=pe.dtype)  # [3,D]
        tangents = dpe[:, None] * m[None, :, None]             # [B,3,N,D]
        rows = jnp.concatenate([pe[:, None], tangents], axis=1)  # [B,4,N,D]
    else:
        rows = pe[:, None]                                     # [B,1,N,D]

    h = None
    prim = None
    for l in range(n_hidden + 1):
        Ka, Kb = kernels[l]
        if l == 0:
            out = rows @ Ka                                    # [B,R,N,W]
        elif l in skip_in:
            out = h @ Ka + rows @ Kb
        else:
            out = h @ Ka
        prim = out[:, 0] + biases[l][:, None]                  # [B,N,W]
        if l < n_hidden:
            act = jax.nn.softplus(100.0 * prim) / 100.0
            if compute_grad:
                sig = jax.nn.sigmoid(100.0 * prim)
                h = jnp.concatenate([act[:, None], out[:, 1:] * sig[:, None]],
                                    axis=1)
            else:
                h = act[:, None]

    sdf = prim[..., :1].astype(jnp.float32)
    feat = prim[..., 1:].astype(jnp.float32)
    grad = None
    if compute_grad:
        g = jnp.moveaxis(out[:, 1:, :, 0], 1, -1)              # [B,N,3]
        if force_symmetry:
            g = jnp.concatenate([g[..., :1] * sign0, g[..., 1:]], axis=-1)
        grad = g.astype(jnp.float32)
    return sdf, feat, grad


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
    masks = jnp.asarray(_coord_masks(n_freqs))               # [3, 39]

    kernels_flat = []
    for Ka, Kb in kernels:
        kernels_flat.append(Ka)
        if Kb is not None:
            kernels_flat.append(Kb)
    num_layers = n_hidden + 1
    freq_vals = [float(2.0 ** k) for k in range(n_freqs)]

    def kernel(pts_ref, masks_ref, *refs):
        bias_refs = refs[:num_layers]
        kern_refs = refs[num_layers:num_layers + len(kernels_flat)]
        out_ref = refs[-1]
        batch_idx = pl.program_id(0)
        x = pts_ref[0]                                        # [T, 3]
        T = x.shape[0]
        if force_symmetry:
            sign0 = jnp.where(x[:, :1] < 0, -1.0, 1.0)
            x = jnp.concatenate([jnp.abs(x[:, :1]), x[:, 1:]], axis=-1)

        # posenc, 2-D ops only; scalar frequencies are immediates
        pe_parts = [x]
        dpe_parts = [jnp.ones((T, 3), jnp.float32)] if compute_grad else None
        for f in freq_vals:
            xf = x * f
            s, c = jnp.sin(xf), jnp.cos(xf)
            pe_parts += [s, c]
            if compute_grad:
                dpe_parts += [f * c, -f * s]
        pe = jnp.concatenate(pe_parts, axis=-1)               # [T, 39]

        if compute_grad:
            dpe = jnp.concatenate(dpe_parts, axis=-1)         # [T, 39]
            m = masks_ref[:]                                  # [3, 39]
            tangents = [dpe * m[d:d + 1] for d in range(3)]   # 3 x [T, 39]
            pe_rows = jnp.concatenate([pe] + tangents, axis=0)  # [4T, 39]
        else:
            pe_rows = pe

        h = None
        ki = 0
        for l in range(num_layers):
            if l == 0:
                W = kern_refs[ki][:]; ki += 1
                out = jax.lax.dot_general(
                    pe_rows, W, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif l in skip_in:
                Wh = kern_refs[ki][:]; ki += 1
                Wpe = kern_refs[ki][:]; ki += 1
                out = (jax.lax.dot_general(h, Wh, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
                       + jax.lax.dot_general(pe_rows, Wpe,
                                             (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32))
            else:
                W = kern_refs[ki][:]; ki += 1
                out = jax.lax.dot_general(h, W, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            b = bias_refs[l][batch_idx]                       # [out]
            if compute_grad:
                # bias applies to the primal rows only
                out = jnp.concatenate(
                    [out[:T] + b[None, :], out[T:]], axis=0)
            else:
                out = out + b[None, :]
            if l < num_layers - 1:
                if compute_grad:
                    prim = out[:T]
                    act = jax.nn.softplus(100.0 * prim) / 100.0
                    sig = jax.nn.sigmoid(100.0 * prim)        # [T, out]
                    sig3 = jnp.concatenate([sig, sig, sig], axis=0)
                    out = jnp.concatenate([act, out[T:] * sig3], axis=0)
                else:
                    out = jax.nn.softplus(100.0 * out) / 100.0
            h = out

        # assemble padded output rows without scatters: [out | grad | pad]
        pieces = [h[:T]]
        pad = 128 - out_width
        if compute_grad:
            gx = h[T:2 * T, :1] * sign0                       # |x| chain rule
            gy = h[2 * T:3 * T, :1]
            gz = h[3 * T:, :1]
            pieces.append(jnp.concatenate([gx, gy, gz], axis=-1))
            pad -= 3
        pieces.append(jnp.zeros((T, pad), jnp.float32))
        out_ref[0] = jnp.concatenate(pieces, axis=-1)

    grid = (B, n_pad // TILE_N)
    in_specs = [
        pl.BlockSpec((1, TILE_N, 3), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(masks.shape, lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [pts, masks]
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
