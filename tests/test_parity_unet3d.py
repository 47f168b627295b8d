"""dim=3 U-Net numeric oracle — torch recomputation A/B (VERDICT r2 weak
#6, completing the rigor tier for every dimensionality; dim=1 has
parity/torch_oracle.py, dim=2 has tests/test_parity_unet2d.py).

Same approach as the 2-D oracle: walk the flax parameter tree and
independently recompute the full XUNet3d forward in torch.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from audio_diffusion_tpu.ops.unet3d import XUNet3d

CFG = dict(
    in_channels=2,
    out_channels=2,
    channels=(8, 16),
    factors=(1, 2),
    items=(1, 1),
    attentions=(0, 1),
    cross_attentions=(0, 0),
    context_channels=(0, 0),
    attention_heads=2,
    attention_features=8,
    resnet_groups=4,
    use_modulation=True,
)
MOD_FEATURES = 16


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, np.float32).copy())


def _dense(p, x):
    return x @ _t(p["kernel"]) + (_t(p["bias"]) if "bias" in p else 0.0)


def _group_norm(p, x, groups):
    """x: [B, D, H, W, C] channels-last."""
    xc = x.permute(0, 4, 1, 2, 3)  # NCDHW
    y = F.group_norm(xc, groups, weight=_t(p["scale"]).reshape(-1),
                     bias=_t(p["bias"]).reshape(-1), eps=1e-5)
    return y.permute(0, 2, 3, 4, 1)


def _conv3d(p, x):
    w = _t(p["kernel"]).permute(4, 3, 0, 1, 2)  # [cout, cin, kd, kh, kw]
    xc = x.permute(0, 4, 1, 2, 3)
    y = F.conv3d(xc, w, bias=_t(p["bias"]), padding=w.shape[-1] // 2)
    return y.permute(0, 2, 3, 4, 1)


def _attention_item(p, x):
    def ln(q, t):
        return F.layer_norm(t, (t.shape[-1],), weight=_t(q["scale"]),
                            bias=_t(q["bias"]), eps=1e-6)

    heads, hd = CFG["attention_heads"], CFG["attention_features"]
    h = ln(p["LayerNorm_0"], x)
    qkv = h @ _t(p["Attention_0"]["to_qkv"]["kernel"])
    q, k, v = qkv.chunk(3, dim=-1)

    def split(t):
        b, s, _ = t.shape
        return t.reshape(b, s, heads, hd).permute(0, 2, 1, 3)

    att = torch.softmax(
        split(q) @ split(k).transpose(-1, -2) / math.sqrt(hd), -1)
    out = (att @ split(v)).permute(0, 2, 1, 3).reshape(
        x.shape[0], x.shape[1], -1)
    x = x + out @ _t(p["Attention_0"]["to_out"]["kernel"])
    h = ln(p["LayerNorm_1"], x)
    ff = p["FeedForward_0"]
    return x + _dense(ff["Dense_1"],
                      F.gelu(_dense(ff["Dense_0"], h), approximate="tanh"))


def _item_stack(p, x, level, features):
    g = CFG["resnet_groups"]
    for k in range(CFG["items"][level]):
        rp = p[f"ResnetItem3d_{k}"]
        h = _group_norm(rp["GroupNorm_0"], x, g)
        h = _conv3d(rp["Conv3d_0"]["Conv_0"], F.silu(h))
        h = _group_norm(rp["GroupNorm_1"], h, g)
        h = _conv3d(rp["Conv3d_1"]["Conv_0"], F.silu(h))
        x = x + h
        mp = p[f"ModulationItem3d_{k}"]
        hm = _group_norm(mp["GroupNorm_0"], x, g)
        mod = _dense(mp["Dense_0"], F.silu(features))
        scale, shift = mod[:, None, None, None, :].chunk(2, dim=-1)
        x = x + hm * (1.0 + scale) + shift
        if CFG["attentions"][level]:
            b, d, h_, w, c = x.shape
            flat = x.reshape(b, d * h_ * w, c)
            for a in range(CFG["attentions"][level]):
                flat = _attention_item(p[f"AttentionItem_{a}"], flat)
            x = flat.reshape(b, d, h_, w, c)
    return x


def oracle_forward(params, x, features):
    p = jax.tree.map(np.asarray, params)["params"]
    n = len(CFG["channels"])
    h = _t(x).permute(0, 2, 3, 4, 1)  # channels-last
    feats = _t(features)

    skips = []
    for i in range(n):
        f = CFG["factors"][i]
        b, d, hh, w, c = h.shape
        if f > 1:
            h = h.reshape(b, d // f, f, hh // f, f, w // f, f, c)
            h = h.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                b, d // f, hh // f, w // f, f * f * f * c)
        h = _dense(p[f"down_{i}"]["Dense_0"], h)
        h = _item_stack(p[f"items_down_{i}"], h, i, feats)
        if i < n - 1:
            skips.append(h)
    for i in reversed(range(n)):
        if i < n - 1:
            skip = skips.pop()
            gate = _dense(p[f"skip_{i}"], F.silu(feats))
            h = h + skip * (1.0 + gate[:, None, None, None, :])
        h = _item_stack(p[f"items_up_{i}"], h, i, feats)
        out_c = CFG["channels"][i - 1] if i > 0 else CFG["channels"][0]
        f = CFG["factors"][i]
        h = _dense(p[f"up_{i}"]["Dense_0"], h)
        if f > 1:
            b, d, hh, w, _ = h.shape
            h = h.reshape(b, d, hh, w, f, f, f, out_c)
            h = h.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(
                b, d * f, hh * f, w * f, out_c)
    h = _group_norm(p["GroupNorm_0"], h, CFG["resnet_groups"])
    h = _conv3d(p["proj_out"]["Conv_0"], F.silu(h))
    return h.permute(0, 4, 1, 2, 3)


def test_unet3d_matches_torch_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, 8, 8, 8)).astype(np.float32)
    features = rng.standard_normal((2, MOD_FEATURES)).astype(np.float32)

    net = XUNet3d(**CFG)
    params = net.init(jax.random.key(0), jnp.asarray(x),
                      features=jnp.asarray(features))
    ours = np.asarray(net.apply(params, jnp.asarray(x),
                                features=jnp.asarray(features)))
    theirs = oracle_forward(params, x, features).numpy()
    assert ours.shape == theirs.shape == (2, 2, 8, 8, 8)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)
