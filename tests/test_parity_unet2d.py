"""dim=2 U-Net numeric oracle (closes VERDICT r2 weak #6 for dim=2).

An INDEPENDENT torch implementation of the XUNet2d contract walks the flax
parameter tree directly and recomputes the forward with
torch.nn.functional ops — verifying level recursion, item ordering, skip
gating, modulation placement, patch down/upsampling, attention flattening,
and the final projection numerically (the dim=1 path has the same kind of
oracle in parity/torch_oracle.py; until round 3 dim=2 was only
self-consistency-tested).

Conventions mirrored from the flax stack: GroupNorm eps 1e-5 (flax
nn.GroupNorm default), LayerNorm eps 1e-6, GELU tanh approximation,
attention softmax scale 1/sqrt(head_dim), fused QKV for self-attention.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from audio_diffusion_tpu.ops.unet2d import XUNet2d

CFG = dict(
    in_channels=3,
    out_channels=3,
    channels=(8, 16, 32),
    factors=(1, 2, 2),
    items=(1, 2, 1),
    attentions=(0, 0, 1),
    cross_attentions=(0, 0, 1),
    context_channels=(0, 8, 0),
    attention_heads=2,
    attention_features=8,
    resnet_groups=4,
    use_modulation=True,
)
MOD_FEATURES = 16
EMB_LEN, EMB_FEATURES = 5, 12


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, np.float32).copy())


def _dense(p, x):
    return x @ _t(p["kernel"]) + (_t(p["bias"]) if "bias" in p else 0.0)


def _dense_nobias(p, x):
    return x @ _t(p["kernel"])


def _group_norm(p, x, groups):
    """x: [B, H, W, C] channels-last (flax layout)."""
    xc = x.permute(0, 3, 1, 2)  # NCHW
    y = F.group_norm(xc, groups, weight=_t(p["scale"]).reshape(-1),
                     bias=_t(p["bias"]).reshape(-1), eps=1e-5)
    return y.permute(0, 2, 3, 1)


def _conv2d(p, x):
    """flax nn.Conv kernel [kh, kw, cin, cout], SAME padding, k=3."""
    w = _t(p["kernel"]).permute(3, 2, 0, 1)  # [cout, cin, kh, kw]
    xc = x.permute(0, 3, 1, 2)
    y = F.conv2d(xc, w, bias=_t(p["bias"]), padding=w.shape[-1] // 2)
    return y.permute(0, 2, 3, 1)


def _layer_norm(p, x):
    return F.layer_norm(x, (x.shape[-1],), weight=_t(p["scale"]),
                        bias=_t(p["bias"]), eps=1e-6)


def _gelu(x):
    return F.gelu(x, approximate="tanh")


def _attention(p, x, context=None, heads=2, head_dim=8):
    if context is None:
        qkv = _dense_nobias(p["to_qkv"], x)
        q, k, v = qkv.chunk(3, dim=-1)
    else:
        q = _dense_nobias(p["to_q"], x)
        k = _dense_nobias(p["to_k"], context)
        v = _dense_nobias(p["to_v"], context)

    def split(t):
        b, s, _ = t.shape
        return t.reshape(b, s, heads, head_dim).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    att = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(head_dim), -1)
    out = (att @ v).permute(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], -1)
    return _dense_nobias(p["to_out"], out)


def _attention_item(p, x, context=None):
    h = _layer_norm(p["LayerNorm_0"], x)
    x = x + _attention(p["Attention_0"], h, context,
                       CFG["attention_heads"], CFG["attention_features"])
    h = _layer_norm(p["LayerNorm_1"], x)
    ff = p["FeedForward_0"]
    return x + _dense(ff["Dense_1"], _gelu(_dense(ff["Dense_0"], h)))


def _resnet(p, x, groups):
    h = _group_norm(p["GroupNorm_0"], x, groups)
    h = _conv2d(p["Conv2d_0"]["Conv_0"], F.silu(h))
    h = _group_norm(p["GroupNorm_1"], h, groups)
    h = _conv2d(p["Conv2d_1"]["Conv_0"], F.silu(h))
    return x + h


def _modulation(p, x, features, groups):
    h = _group_norm(p["GroupNorm_0"], x, groups)
    mod = _dense(p["Dense_0"], F.silu(features))
    scale, shift = mod[:, None, None, :].chunk(2, dim=-1)
    return x + h * (1.0 + scale) + shift


def _item_stack(p, x, level, features, embedding, context):
    g = CFG["resnet_groups"]
    dense_i = 0
    for k in range(CFG["items"][level]):
        x = _resnet(p[f"ResnetItem2d_{k}"], x, g)
        x = _modulation(p[f"ModulationItem2d_{k}"], x, features, g)
        if CFG["context_channels"][level] > 0:
            ctx = _t(context).permute(0, 2, 3, 1)  # [B, H, W, ctx]
            cat = torch.cat([x, ctx], dim=-1)
            x = x + _dense(p[f"Dense_{dense_i}"], cat)
            dense_i += 1
        b, h, w, c = x.shape
        if CFG["attentions"][level] or CFG["cross_attentions"][level]:
            flat = x.reshape(b, h * w, c)
            for a in range(CFG["attentions"][level]):
                flat = _attention_item(p[f"AttentionItem_{a + k * CFG['attentions'][level]}"], flat)
            for a in range(CFG["cross_attentions"][level]):
                flat = _attention_item(
                    p[f"CrossAttentionItem_{a + k * CFG['cross_attentions'][level]}"],
                    flat, context=embedding)
            x = flat.reshape(b, h, w, c)
    return x


def _downsample(p, x, factor):
    b, h, w, c = x.shape
    f = factor
    if f > 1:
        x = x.reshape(b, h // f, f, w // f, f, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f,
                                                f * f * c)
    return _dense(p, x)


def _upsample(p, x, factor, features):
    b, h, w, _ = x.shape
    f = factor
    x = _dense(p, x)
    if f > 1:
        x = x.reshape(b, h, w, f, f, features)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, features)
    return x


def oracle_forward(params, x, features, embedding, contexts):
    """Independent torch recomputation of XUNet2d.__call__."""
    p = jax.tree.map(np.asarray, params)["params"]
    n = len(CFG["channels"])
    h = _t(x).permute(0, 2, 3, 1)  # NHWC
    feats = _t(features)
    emb = _t(embedding)

    skips = []
    for i in range(n):
        h = _downsample(p[f"down_{i}"]["Dense_0"], h, CFG["factors"][i])
        h = _item_stack(p[f"items_down_{i}"], h, i, feats, emb, contexts[i])
        if i < n - 1:
            skips.append(h)
    for i in reversed(range(n)):
        if i < n - 1:
            skip = skips.pop()
            gate = _dense(p[f"skip_{i}"], F.silu(feats))
            h = h + skip * (1.0 + gate[:, None, None, :])
        h = _item_stack(p[f"items_up_{i}"], h, i, feats, emb, contexts[i])
        out_c = CFG["channels"][i - 1] if i > 0 else CFG["channels"][0]
        h = _upsample(p[f"up_{i}"]["Dense_0"], h, CFG["factors"][i], out_c)
    h = _group_norm(p["GroupNorm_0"], h, CFG["resnet_groups"])
    h = _conv2d(p["proj_out"]["Conv_0"], F.silu(h))
    return h.permute(0, 3, 1, 2)


def test_unet2d_matches_torch_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    features = rng.standard_normal((2, MOD_FEATURES)).astype(np.float32)
    embedding = rng.standard_normal(
        (2, EMB_LEN, EMB_FEATURES)).astype(np.float32)
    ctx1 = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)  # level-1 spatial
    contexts = [None, ctx1, None]

    net = XUNet2d(**CFG)
    params = net.init(jax.random.key(0), jnp.asarray(x),
                      features=jnp.asarray(features),
                      embedding=jnp.asarray(embedding),
                      channels=[None, jnp.asarray(ctx1), None])
    ours = np.asarray(net.apply(params, jnp.asarray(x),
                                features=jnp.asarray(features),
                                embedding=jnp.asarray(embedding),
                                channels=[None, jnp.asarray(ctx1), None]))
    theirs = oracle_forward(params, x, features, embedding,
                            contexts).numpy()
    assert ours.shape == theirs.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def test_unet2d_oracle_catches_wiring_change():
    """The oracle is sensitive: perturbing one skip-gate weight by 1e-2
    must break the match (guards against a vacuously-passing oracle)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    features = rng.standard_normal((1, MOD_FEATURES)).astype(np.float32)
    embedding = rng.standard_normal(
        (1, EMB_LEN, EMB_FEATURES)).astype(np.float32)
    ctx1 = rng.standard_normal((1, 8, 4, 4)).astype(np.float32)

    net = XUNet2d(**CFG)
    params = net.init(jax.random.key(0), jnp.asarray(x),
                      features=jnp.asarray(features),
                      embedding=jnp.asarray(embedding),
                      channels=[None, jnp.asarray(ctx1), None])
    ours = np.asarray(net.apply(params, jnp.asarray(x),
                                features=jnp.asarray(features),
                                embedding=jnp.asarray(embedding),
                                channels=[None, jnp.asarray(ctx1), None]))
    import flax

    mutated = flax.core.unfreeze(jax.tree.map(np.array, params))
    mutated["params"]["skip_1"]["bias"] += 1e-2
    theirs = oracle_forward(mutated, x, features, embedding,
                            [None, ctx1, None]).numpy()
    assert np.abs(ours - theirs).max() > 1e-4
