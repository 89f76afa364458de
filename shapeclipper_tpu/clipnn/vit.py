"""CLIP ViT image tower (flax) — offline nearest-neighbor annotation encoder.

Native re-implementation of the OpenAI CLIP visual transformer used by the
reference annotator (reference `CLIP_anno.py:16` loads "ViT-L/14"):
14x14 patch conv -> [CLS] + positional embeddings -> pre-LN transformer with
QuickGELU MLPs -> ln_post on the CLS token -> linear projection.

Pretrained weights are a data artifact: `load_clip_npz` merges a converted
OpenAI `visual.*` state_dict (saved as .npz) into the param tree; without a
weights file the tower runs randomly initialized (annotation quality then is
meaningless, but the pipeline is exercisable end-to-end).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

VIT_CONFIGS = {
    # name: (patch, width, layers, heads, embed_dim)
    "vit_l14": (14, 1024, 24, 16, 768),
    "vit_b32": (32, 768, 12, 12, 512),
    "vit_b16": (16, 768, 12, 12, 512),
}


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_preprocess(rgb):
    """[H, W, 3] float in [0,1] -> CLIP-normalized (resize is done by the
    dataset pipeline)."""
    return (np.asarray(rgb, np.float32) - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width,
            out_features=self.width, dtype=self.dtype, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class CLIPVisionTower(nn.Module):
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 768
    dtype: Any = jnp.float32

    @staticmethod
    def from_name(name, dtype=jnp.float32):
        patch, width, layers, heads, embed = VIT_CONFIGS[name]
        return CLIPVisionTower(patch_size=patch, width=width, layers=layers,
                               heads=heads, embed_dim=embed, dtype=dtype)

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] CLIP-normalized -> [B, embed_dim]."""
        B = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    use_bias=False, dtype=self.dtype, name="patch_embed")(
            images.astype(self.dtype))
        x = x.reshape(B, -1, self.width)                   # [B, N, W]
        n_tokens = x.shape[1] + 1
        cls = self.param("class_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, self.width)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (n_tokens, self.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       dtype=self.dtype,
                                       name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj",
                          nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.embed_dim))
        return (x @ proj).astype(jnp.float32)


def load_clip_npz(params, path):
    """Merge a converted OpenAI CLIP `visual.*` state_dict (.npz) into the
    flax param tree. Torch MHA in_proj is split into flax q/k/v deposits."""
    data = np.load(path)
    p = jax.tree_util.tree_map(np.asarray, params)

    def put(keys, val):
        node = p
        for k in keys[:-1]:
            node = node[k]
        assert node[keys[-1]].shape == val.shape, (
            keys, node[keys[-1]].shape, val.shape)
        node[keys[-1]] = val

    width = p["class_embedding"].shape[0]
    # heads read off the flax attention param shapes: kernel [W, heads, hd]
    heads_guess = p["block0"]["attn"]["query"]["kernel"].shape[1]

    put(["class_embedding"], data["visual.class_embedding"])
    put(["positional_embedding"], data["visual.positional_embedding"])
    put(["proj"], data["visual.proj"])
    put(["patch_embed", "kernel"],
        data["visual.conv1.weight"].transpose(2, 3, 1, 0))
    for ln, torch_ln in (("ln_pre", "visual.ln_pre"),
                         ("ln_post", "visual.ln_post")):
        put([ln, "scale"], data[f"{torch_ln}.weight"])
        put([ln, "bias"], data[f"{torch_ln}.bias"])

    n_layers = len(p) and sum(1 for k in p if k.startswith("block"))
    for i in range(n_layers):
        t = f"visual.transformer.resblocks.{i}"
        b = f"block{i}"
        for ln in ("ln_1", "ln_2"):
            put([b, ln, "scale"], data[f"{t}.{ln}.weight"])
            put([b, ln, "bias"], data[f"{t}.{ln}.bias"])
        w_in = data[f"{t}.attn.in_proj_weight"]        # [3W, W]
        b_in = data[f"{t}.attn.in_proj_bias"]
        wq, wk, wv = np.split(w_in, 3, axis=0)
        bq, bk, bv = np.split(b_in, 3, axis=0)
        head_dim = width // heads_guess
        for name, w, bias in (("query", wq, bq), ("key", wk, bk),
                              ("value", wv, bv)):
            put([b, "attn", name, "kernel"],
                w.T.reshape(width, heads_guess, head_dim))
            put([b, "attn", name, "bias"],
                bias.reshape(heads_guess, head_dim))
        w_out = data[f"{t}.attn.out_proj.weight"]      # [W, W]
        put([b, "attn", "out", "kernel"],
            w_out.T.reshape(heads_guess, head_dim, width))
        put([b, "attn", "out", "bias"], data[f"{t}.attn.out_proj.bias"])
        put([b, "mlp_fc", "kernel"], data[f"{t}.mlp.c_fc.weight"].T)
        put([b, "mlp_fc", "bias"], data[f"{t}.mlp.c_fc.bias"])
        put([b, "mlp_proj", "kernel"], data[f"{t}.mlp.c_proj.weight"].T)
        put([b, "mlp_proj", "bias"], data[f"{t}.mlp.c_proj.bias"])
    return jax.tree_util.tree_map(jnp.asarray, p)
