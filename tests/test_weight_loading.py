"""Offline pretrained-weight loaders: build fake torch-format .npz files
(correct names/shapes) and check every mapping/transpose lands in the right
flax leaf."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shapeclipper_tpu.clipnn.vit import CLIPVisionTower, load_clip_npz
from shapeclipper_tpu.models.resnet import load_pretrained_npz, resnet18


def _fake_resnet18_statedict(rng):
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)

    def bn(name, c):
        for suffix, val in (("weight", rng.rand(c)), ("bias", rng.randn(c)),
                            ("running_mean", rng.randn(c)),
                            ("running_var", rng.rand(c) + 0.5)):
            sd[f"{name}.{suffix}"] = val.astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.int64(7)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    sizes = [64, 128, 256, 512]
    for stage in range(4):
        cin = sizes[max(stage - 1, 0)]
        cout = sizes[stage]
        for block in range(2):
            base = f"layer{stage + 1}.{block}"
            c_in = cin if block == 0 else cout
            conv(f"{base}.conv1", cout, c_in, 3)
            bn(f"{base}.bn1", cout)
            conv(f"{base}.conv2", cout, cout, 3)
            bn(f"{base}.bn2", cout)
            if block == 0 and stage > 0:
                conv(f"{base}.downsample.0", cout, cin, 1)
                bn(f"{base}.downsample.1", cout)
    sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


def test_resnet_weight_loading(tmp_path):
    rng = np.random.RandomState(0)
    sd = _fake_resnet18_statedict(rng)
    path = str(tmp_path / "r18.npz")
    np.savez(path, **sd)

    net = resnet18(num_classes=None)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                         train=False)
    params, stats = load_pretrained_npz(variables["params"], path)

    # conv1: [64,3,7,7] -> kernel [7,7,3,64]
    np.testing.assert_allclose(np.asarray(params["conv1"]["kernel"]),
                               sd["conv1.weight"].transpose(2, 3, 1, 0))
    # bn scale/bias + running stats
    np.testing.assert_allclose(np.asarray(params["bn1"]["scale"]),
                               sd["bn1.weight"])
    np.testing.assert_allclose(np.asarray(stats["bn1"]["mean"]),
                               sd["bn1.running_mean"])
    # downsample mapping
    np.testing.assert_allclose(
        np.asarray(params["layer2_block0"]["downsample_conv"]["kernel"]),
        sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(stats["layer4_block1"]["bn2"]["var"]),
        sd["layer4.1.bn2.running_var"])


def _fake_clip_statedict(rng, width=64, layers=2, heads=4, patch=8,
                         img=32, embed=32):
    n_tokens = (img // patch) ** 2 + 1
    sd = {
        "visual.class_embedding": rng.randn(width).astype(np.float32),
        "visual.positional_embedding":
            rng.randn(n_tokens, width).astype(np.float32),
        "visual.proj": rng.randn(width, embed).astype(np.float32),
        "visual.conv1.weight":
            rng.randn(width, 3, patch, patch).astype(np.float32),
        "visual.ln_pre.weight": rng.rand(width).astype(np.float32),
        "visual.ln_pre.bias": rng.randn(width).astype(np.float32),
        "visual.ln_post.weight": rng.rand(width).astype(np.float32),
        "visual.ln_post.bias": rng.randn(width).astype(np.float32),
    }
    for i in range(layers):
        t = f"visual.transformer.resblocks.{i}"
        sd[f"{t}.ln_1.weight"] = rng.rand(width).astype(np.float32)
        sd[f"{t}.ln_1.bias"] = rng.randn(width).astype(np.float32)
        sd[f"{t}.ln_2.weight"] = rng.rand(width).astype(np.float32)
        sd[f"{t}.ln_2.bias"] = rng.randn(width).astype(np.float32)
        sd[f"{t}.attn.in_proj_weight"] = \
            rng.randn(3 * width, width).astype(np.float32)
        sd[f"{t}.attn.in_proj_bias"] = rng.randn(3 * width).astype(np.float32)
        sd[f"{t}.attn.out_proj.weight"] = \
            rng.randn(width, width).astype(np.float32)
        sd[f"{t}.attn.out_proj.bias"] = rng.randn(width).astype(np.float32)
        sd[f"{t}.mlp.c_fc.weight"] = \
            rng.randn(4 * width, width).astype(np.float32)
        sd[f"{t}.mlp.c_fc.bias"] = rng.randn(4 * width).astype(np.float32)
        sd[f"{t}.mlp.c_proj.weight"] = \
            rng.randn(width, 4 * width).astype(np.float32)
        sd[f"{t}.mlp.c_proj.bias"] = rng.randn(width).astype(np.float32)
    return sd


def test_clip_weight_loading_and_equivalence(tmp_path):
    """Load a fake OpenAI-format checkpoint and verify the flax tower output
    equals a direct numpy transformer implementation of the same weights."""
    rng = np.random.RandomState(1)
    width, layers, heads, patch, img, embed = 64, 2, 4, 8, 32, 32
    sd = _fake_clip_statedict(rng, width, layers, heads, patch, img, embed)
    # widths in load_clip_npz's head table
    sd_width_ok = {768: 12, 1024: 16}
    path = str(tmp_path / "clip.npz")
    np.savez(path, **sd)

    tower = CLIPVisionTower(patch_size=patch, width=width, layers=layers,
                            heads=heads, embed_dim=embed)
    x = rng.rand(2, img, img, 3).astype(np.float32)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params_loaded = load_clip_npz(params, path)
    out = tower.apply({"params": params_loaded}, jnp.asarray(x))

    ref = _numpy_clip_forward(sd, x, width, layers, heads, patch)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def _numpy_clip_forward(sd, x, width, layers, heads, patch):
    """Direct numpy re-implementation of the OpenAI CLIP visual tower."""
    B, H, W, _ = x.shape

    def ln(v, w, b):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * w + b

    # patch conv = unfold + matmul
    k = sd["visual.conv1.weight"]  # [width, 3, p, p]
    n = H // patch
    patches = x.reshape(B, n, patch, n, patch, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(B, n * n, patch * patch * 3)
    kmat = k.transpose(2, 3, 1, 0).reshape(patch * patch * 3, width)
    tok = patches @ kmat                                   # [B, N, width]
    cls = np.broadcast_to(sd["visual.class_embedding"], (B, 1, width))
    h = np.concatenate([cls, tok], axis=1) + sd["visual.positional_embedding"]
    h = ln(h, sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"])
    hd = width // heads
    for i in range(layers):
        t = f"visual.transformer.resblocks.{i}"
        y = ln(h, sd[f"{t}.ln_1.weight"], sd[f"{t}.ln_1.bias"])
        wq, wk, wv = np.split(sd[f"{t}.attn.in_proj_weight"], 3, axis=0)
        bq, bk, bv = np.split(sd[f"{t}.attn.in_proj_bias"], 3, axis=0)
        q = y @ wq.T + bq
        k_ = y @ wk.T + bk
        v = y @ wv.T + bv
        N = q.shape[1]
        q = q.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
        k_ = k_.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
        att = q @ k_.transpose(0, 1, 3, 2) / np.sqrt(hd)
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        o = (att @ v).transpose(0, 2, 1, 3).reshape(B, N, width)
        o = o @ sd[f"{t}.attn.out_proj.weight"].T + sd[f"{t}.attn.out_proj.bias"]
        h = h + o
        y = ln(h, sd[f"{t}.ln_2.weight"], sd[f"{t}.ln_2.bias"])
        y = y @ sd[f"{t}.mlp.c_fc.weight"].T + sd[f"{t}.mlp.c_fc.bias"]
        y = y * (1 / (1 + np.exp(-1.702 * y)))             # QuickGELU
        y = y @ sd[f"{t}.mlp.c_proj.weight"].T + sd[f"{t}.mlp.c_proj.bias"]
        h = h + y
    h = ln(h[:, 0], sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
    return h @ sd["visual.proj"]
