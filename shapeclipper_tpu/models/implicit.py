"""Conditional implicit fields: SDF MLP, RGB MLP, and the Laplace density.

Functional/flax port of the reference implicit networks (reference
`model/implicit.py:55-239`):

  * `laplace_density`: VolSDF CDF-of-Laplace density with a learnable beta
    parameter (stored in the param tree as `density/beta`); written
    branch-free with exp(-|s|/beta) so neither `where` branch overflows.
  * `SDFNetwork`: MLP on [posenc(xyz), latent] with skip connections
    (concat + /sqrt(2)), softplus(beta=100) activations, geometric sphere
    initialization, and optional yz-plane symmetry via |x|.
  * `RGBNetwork`: MLP on [posenc(xyz), rgb latent, sdf feature] -> sigmoid RGB.

Spatial SDF gradients are NOT baked in here — callers use `jax.vjp` over the
bound apply function (see render/renderer.py), which composes with reverse
-mode training gradients (the reference needed `torch.autograd.grad(...,
create_graph=True)`, `model/implicit.py:163-189`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .embedder import posenc_dim, positional_encoding

BETA_MIN = 1e-4


# ---------------------------------------------------------------------------
# Laplace density (VolSDF)
# ---------------------------------------------------------------------------

def laplace_beta(beta_param, beta_min=BETA_MIN):
    return jnp.abs(beta_param) + beta_min


def laplace_density(sdf, beta_param, beta_min=BETA_MIN):
    """alpha * (0.5 e^{-s/b}) for s>=0 ; alpha * (1 - 0.5 e^{s/b}) for s<0."""
    beta = laplace_beta(beta_param, beta_min)
    alpha = 1.0 / beta
    e = jnp.exp(-jnp.abs(sdf) / beta)
    return alpha * jnp.where(sdf >= 0, 0.5 * e, 1.0 - 0.5 * e)


def laplace_density_dsdf(sdf, beta_param, beta_min=BETA_MIN):
    """d(density)/d(sdf) = -alpha/(2 beta) * e^{-|s|/beta} (same both branches)."""
    beta = laplace_beta(beta_param, beta_min)
    alpha = 1.0 / beta
    return -(alpha / (2.0 * beta)) * jnp.exp(-jnp.abs(sdf) / beta)


def init_density_params(opt):
    return {"beta": jnp.asarray(float(opt.arch.impl_sdf.beta_init), jnp.float32)}


# ---------------------------------------------------------------------------
# torch-default linear init (for distributional parity with untrained ref nets)
# ---------------------------------------------------------------------------

def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernel
    # is [in, out] so fan_in = shape[0]
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_linear_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _softplus100(x):
    # softplus with beta=100 (reference `model/implicit.py:136`)
    return jax.nn.softplus(100.0 * x) / 100.0


@jax.tree_util.register_pytree_node_class
class SplitLatent:
    """Per-sample latent with a different gradient treatment across a
    point-axis split: points [:, :n_main] condition on `main`, the rest on
    `alt` (typically ``stop_gradient(main)``).

    Lets ONE MLP evaluation serve both the render samples (latent attached)
    and the eikonal points (latent detached, reference
    `model/implicit.py:168-169` compute_grad=True) — the two per-sample
    biases are each [B, 1, F]; the point-indexed select fuses into the
    matmul epilogue, so folding costs no extra HBM tensors."""

    def __init__(self, main, alt, n_main):
        self.main, self.alt, self.n_main = main, alt, n_main

    def tree_flatten(self):
        return (self.main, self.alt), self.n_main

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    def astype(self, dtype):
        return SplitLatent(self.main.astype(dtype), self.alt.astype(dtype),
                           self.n_main)

    @property
    def shape(self):
        return self.main.shape

    @property
    def ndim(self):
        return self.main.ndim


class _FactoredLinear(nn.Module):
    """Dense layer applied to a virtual concatenation of input segments.

    Mathematically identical to `Dense(concat(segments))` but never
    materializes the concat, and applies per-SAMPLE segments ([B, k], e.g.
    the conditioning latent) as a broadcast per-sample bias instead of
    repeating them per point — on TPU this removes the dominant HBM traffic
    of the implicit MLPs (the [B·R·S, 103..167] concat tensors) and ~30% of
    the MACs. Param tree matches nn.Dense ({kernel, bias})."""

    features: int
    in_dim: int
    kernel_init: object
    bias_init: object

    @nn.compact
    def __call__(self, segments):
        """segments: list of (array, scale) where array is [B, N, k]
        (per-point), [B, k] (per-sample), or a SplitLatent; segment widths
        must sum to in_dim in order."""
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_dim, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        out = None
        offset = 0
        deferred = []  # SplitLatent contributions applied once N is known
        for arr, scale in segments:
            if isinstance(arr, SplitLatent):
                k = arr.main.shape[-1]
                w = kernel[offset:offset + k]
                if scale != 1.0:
                    w = w * scale
                deferred.append(((arr.main @ w)[:, None, :],
                                 (arr.alt @ w)[:, None, :], arr.n_main))
                offset += k
                continue
            k = arr.shape[-1]
            w = kernel[offset:offset + k]
            if scale != 1.0:
                w = w * scale
            y = arr @ w
            if arr.ndim == 2:  # per-sample -> broadcast over points
                y = y[:, None, :]
            out = y if out is None else out + y
            offset += k
        assert offset == self.in_dim, (offset, self.in_dim)
        for y_main, y_alt, n_main in deferred:
            assert out is not None and out.ndim == 3, \
                "SplitLatent needs a per-point segment to define N"
            n = out.shape[1]
            mask = (jnp.arange(n) < n_main)[None, :, None]
            out = out + jnp.where(mask, y_main, y_alt)
        return out + bias


# ---------------------------------------------------------------------------
# SDF network
# ---------------------------------------------------------------------------

class SDFNetwork(nn.Module):
    """Conditional SDF field. Input points [..., 3] + latent [..., latent_dim]
    (same leading shape); output [..., 1 + n_channels] = [sdf, feature]."""

    proj_latent_dim: int = 64
    n_hidden: int = 5
    n_channels: int = 64
    skip_in: Sequence[int] = (1, 2)
    posenc_res: int = 6
    force_symmetry: bool = True
    geometric_init: bool = True
    init_sphere_radius: float = 0.5
    weight_norm: bool = False

    @staticmethod
    def from_opt(opt):
        a = opt.arch.impl_sdf
        assert not a.weight_norm, "weight_norm not supported (off in all configs)"
        return SDFNetwork(
            proj_latent_dim=a.proj_latent_dim,
            n_hidden=a.n_hidden_layers,
            n_channels=a.n_channels,
            skip_in=tuple(a.skip_connection),
            posenc_res=a.pos_enc,
            force_symmetry=opt.arch.force_symmetry,
            geometric_init=a.geometric_init,
            init_sphere_radius=a.init_sphere_radius,
        )

    def _dims(self):
        pe = posenc_dim(self.posenc_res) if self.posenc_res > 0 else 3
        d0 = pe + self.proj_latent_dim
        return [d0] + [self.n_channels] * self.n_hidden + [1 + self.n_channels]

    def _kernel_init(self, l, in_dim, out_dim, dims0):
        """Geometric sphere init (reference `model/implicit.py:114-128`);
        flax kernels are [in, out] (transpose of torch [out, in])."""
        num_layers = len(self._dims())
        if not self.geometric_init:
            return _torch_linear_kernel_init

        def init(key, shape, dtype=jnp.float32):
            assert shape == (in_dim, out_dim)
            if l == num_layers - 2:
                mean = np.sqrt(np.pi) / np.sqrt(in_dim)
                return mean + 0.0001 * jax.random.normal(key, shape, dtype)
            std = np.sqrt(2.0) / np.sqrt(out_dim)
            w = std * jax.random.normal(key, shape, dtype)
            if self.posenc_res > 0 and l == 0:
                # only raw-xyz input rows are nonzero
                mask = (jnp.arange(in_dim) < 3)[:, None]
                w = jnp.where(mask, w, 0.0)
            elif self.posenc_res > 0 and l in self.skip_in:
                # zero the skip-concatenated copy of [posenc-tail, latent]
                # (the last dims0 - 3 input rows)
                mask = (jnp.arange(in_dim) < in_dim - (dims0 - 3))[:, None]
                w = jnp.where(mask, w, 0.0)
            return w

        return init

    def _bias_init(self, l, in_dim):
        num_layers = len(self._dims())
        if not self.geometric_init:
            return _torch_linear_bias_init(in_dim)
        if l == num_layers - 2:
            radius = self.init_sphere_radius

            def init(key, shape, dtype=jnp.float32):
                return jnp.full(shape, -radius, dtype)

            return init
        return nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, points, latent):
        """points: [B, N, 3]; latent: [B, C] (factored fast path) or
        [B, N, C] (per-point). Output [B, N, 1 + n_channels].

        Same math as Dense-on-concat (reference `model/implicit.py:138-161`)
        but latent contributions apply as per-sample biases via
        _FactoredLinear — the concat tensors never hit HBM."""
        if self.force_symmetry:
            points = jnp.concatenate(
                [jnp.abs(points[..., :1]), points[..., 1:]], axis=-1)
        if self.posenc_res > 0:
            points = positional_encoding(points, self.posenc_res)
        dims = self._dims()
        num_layers = len(dims)
        inv_sqrt2 = 1.0 / np.sqrt(2.0)
        x = None
        for l in range(num_layers - 1):
            in_dim = dims[l] + (dims[0] if l in self.skip_in else 0)
            if l == 0:
                segments = [(points, 1.0), (latent, 1.0)]
            elif l in self.skip_in:
                segments = [(x, inv_sqrt2), (points, inv_sqrt2),
                            (latent, inv_sqrt2)]
            else:
                segments = [(x, 1.0)]
            x = _FactoredLinear(
                dims[l + 1], in_dim,
                kernel_init=self._kernel_init(l, in_dim, dims[l + 1], dims[0]),
                bias_init=self._bias_init(l, in_dim),
                name=f"lin{l}",
            )(segments)
            if l < num_layers - 2:
                x = _softplus100(x)
        return x  # [..., 1 + n_channels]


def sdf_and_feature(apply_fn, params, points, latent):
    """Split the raw SDF-network output into (sdf [...,1], feature [...,C])."""
    out = apply_fn({"params": params}, points, latent)
    return out[..., :1], out[..., 1:]


def sdf_with_gradient(apply_fn, params, points, latent, detach_latent=False):
    """(sdf, feature, d sdf / d points) via one reverse pass.

    Replaces the reference's `torch.autograd.grad(create_graph=True)` pattern
    (reference `model/implicit.py:163-189`); jax.vjp nests under outer
    reverse-mode training gradients. When `detach_latent`, the latent is
    stop-gradiented (parity with compute_grad=True in the reference).
    """
    if detach_latent:
        latent = jax.lax.stop_gradient(latent)

    def fn(pts):
        out = apply_fn({"params": params}, pts, latent)
        return out[..., :1], out[..., 1:]

    (sdf, feat), vjp_fn = jax.vjp(fn, points)
    grad = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(feat)))[0]
    return sdf, feat, grad


# ---------------------------------------------------------------------------
# RGB network
# ---------------------------------------------------------------------------

class RGBNetwork(nn.Module):
    """RGB field on [posenc(xyz), rgb latent, sdf feature] -> sigmoid RGB."""

    proj_latent_dim: int = 64
    n_hidden: int = 3
    n_channels: int = 64
    n_sdf_channels: int = 64
    posenc_res: int = 6
    force_symmetry: bool = True

    @staticmethod
    def from_opt(opt):
        a = opt.arch.impl_rgb
        assert not a.weight_norm, "weight_norm not supported (off in all configs)"
        return RGBNetwork(
            proj_latent_dim=a.proj_latent_dim,
            n_hidden=a.n_hidden_layers,
            n_channels=a.n_channels,
            n_sdf_channels=opt.arch.impl_sdf.n_channels,
            posenc_res=a.pos_enc,
            force_symmetry=opt.arch.force_symmetry,
        )

    @nn.compact
    def __call__(self, points, latent, sdf_feature):
        """points: [B, N, 3]; latent: [B, C] or [B, N, C]; sdf_feature:
        [B, N, Csdf]. Factored first layer (see SDFNetwork.__call__)."""
        if self.force_symmetry:
            points = jnp.concatenate(
                [jnp.abs(points[..., :1]), points[..., 1:]], axis=-1)
        if self.posenc_res > 0:
            points = positional_encoding(points, self.posenc_res)
        pe = posenc_dim(self.posenc_res) if self.posenc_res > 0 else 3
        dims = ([pe + self.proj_latent_dim + self.n_sdf_channels]
                + [self.n_channels] * self.n_hidden + [3])
        num_layers = len(dims)
        x = None
        for l in range(num_layers - 1):
            segments = ([(points, 1.0), (latent, 1.0), (sdf_feature, 1.0)]
                        if l == 0 else [(x, 1.0)])
            x = _FactoredLinear(
                dims[l + 1], dims[l],
                kernel_init=_torch_linear_kernel_init,
                bias_init=_torch_linear_bias_init(dims[l]),
                name=f"lin{l}",
            )(segments)
            if l < num_layers - 2:
                x = nn.relu(x)
        return nn.sigmoid(x)
