"""Torch oracle U-Net: an INDEPENDENT PyTorch implementation of the §2.9
network contract, written with standard torch modules (Conv1d, GroupNorm,
Linear, ConvTranspose1d) on the reference's [B, C, T] layout.

Purpose (SURVEY.md §7 step 3, BASELINE.json parity gate): the JAX net is
TPU-first (channels-last, lane folding, patch-matmul resampling); this oracle
expresses the SAME math in plain torch convs, so a matched-seed full-model
A/B proves (a) the assembled net geometry — skips, modulation, item ordering,
conditioning — and (b) that the TPU layout tricks are pure layout. The
importer (parity/importer.py) converts this oracle's weights into the JAX
parameter tree; when a pinned `a-unet` is installable, the same transform
functions apply to its state_dict (only the name walk changes).

Reference contract citations: /root/reference/components.py:34-105 (factory,
plugin order), diffusion.py:158-190 (v-sampler), SURVEY.md §2.9 (a-unet item
semantics, [reconstructed]).

Implementation notes for EXACT numeric parity with the JAX net:
- LayerNorm eps = 1e-6 (flax default; torch default is 1e-5).
- GELU uses the tanh approximation (flax nn.gelu default).
- GroupNorm eps = 1e-5, per-(batch, group) stats over (channels/g, length).
- Attention: fused qkv for self-attention, softmax scale 1/sqrt(head_dim).
- Everything float32.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import torch
import torch.nn.functional as F
from torch import Tensor, nn


def _gelu(x: Tensor) -> Tensor:
    return F.gelu(x, approximate="tanh")


class TResnetModItem(nn.Module):
    """(GN -> SiLU -> Conv3) x2 + identity, then optional AdaGN modulation
    (mirrors ops/unet.py ResnetModItem)."""

    def __init__(self, channels: int, groups: int, modulation_features: int,
                 use_modulation: bool):
        super().__init__()
        c = channels
        self.use_modulation = use_modulation
        self.gn1 = nn.GroupNorm(groups, c, eps=1e-5)
        self.conv1 = nn.Conv1d(c, c, 3, padding=1)
        self.gn2 = nn.GroupNorm(groups, c, eps=1e-5)
        self.conv2 = nn.Conv1d(c, c, 3, padding=1)
        if use_modulation:
            self.mod_gn = nn.GroupNorm(groups, c, eps=1e-5)
            self.mod_dense = nn.Linear(modulation_features, 2 * c)
            nn.init.zeros_(self.mod_dense.weight)
            nn.init.zeros_(self.mod_dense.bias)

    def forward(self, x: Tensor, features: Optional[Tensor]) -> Tensor:
        h = F.silu(self.gn1(x))
        h = self.conv1(h)
        h = F.silu(self.gn2(h))
        h = self.conv2(h)
        y = x + h
        if self.use_modulation:
            assert features is not None
            hm = self.mod_gn(y)
            mod = self.mod_dense(F.silu(features))  # [B, 2C]
            scale, shift = mod.chunk(2, dim=-1)
            y = y + hm * (1.0 + scale[:, :, None]) + shift[:, :, None]
        return y


class TInjectChannelsItem(nn.Module):
    """x + Conv1x1(cat([x, context])) (mirrors InjectChannelsItem)."""

    def __init__(self, channels: int, context_channels: int):
        super().__init__()
        self.Dense_0 = nn.Conv1d(channels + context_channels, channels, 1)

    def forward(self, x: Tensor, context: Tensor) -> Tensor:
        return x + self.Dense_0(torch.cat([x, context], dim=1))


class TAttention(nn.Module):
    """Multi-head attention, channels-last inside (mirrors ops/attention.py
    Attention: fused qkv for self, separate q/k/v for cross, no biases)."""

    def __init__(self, in_features: int, heads: int, head_features: int,
                 out_features: int, context_features: Optional[int] = None):
        super().__init__()
        inner = heads * head_features
        self.heads, self.head_features = heads, head_features
        if context_features is None:
            self.to_qkv = nn.Linear(in_features, 3 * inner, bias=False)
        else:
            self.to_q = nn.Linear(in_features, inner, bias=False)
            self.to_k = nn.Linear(context_features, inner, bias=False)
            self.to_v = nn.Linear(context_features, inner, bias=False)
        self.to_out = nn.Linear(inner, out_features, bias=False)

    def forward(self, x: Tensor, context: Optional[Tensor] = None) -> Tensor:
        if context is None:
            q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        else:
            q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)

        def split(t: Tensor) -> Tensor:
            b, s, _ = t.shape
            return t.view(b, s, self.heads, self.head_features).transpose(1, 2)

        out = F.scaled_dot_product_attention(split(q), split(k), split(v))
        b, h, s, d = out.shape
        out = out.transpose(1, 2).reshape(b, s, h * d)
        return self.to_out(out)


class TFeedForward(nn.Module):
    def __init__(self, features: int, multiplier: int = 4):
        super().__init__()
        self.Dense_0 = nn.Linear(features, features * multiplier)
        self.Dense_1 = nn.Linear(features * multiplier, features)

    def forward(self, x: Tensor) -> Tensor:
        return self.Dense_1(_gelu(self.Dense_0(x)))


class TAttentionItem(nn.Module):
    """Pre-LN self-attention + pre-LN feed-forward, both residual; operates
    channels-last internally on a [B, C, T] tensor."""

    def __init__(self, channels: int, heads: int, head_features: int,
                 context_features: Optional[int] = None):
        super().__init__()
        self.cross = context_features is not None
        self.LayerNorm_0 = nn.LayerNorm(channels, eps=1e-6)
        self.Attention_0 = TAttention(channels, heads, head_features,
                                      channels, context_features)
        self.LayerNorm_1 = nn.LayerNorm(channels, eps=1e-6)
        self.FeedForward_0 = TFeedForward(channels)

    def forward(self, x: Tensor, embedding: Optional[Tensor] = None) -> Tensor:
        h = x.transpose(1, 2)  # [B, T, C]
        ctx = embedding if self.cross else None
        h = h + self.Attention_0(self.LayerNorm_0(h), context=ctx)
        h = h + self.FeedForward_0(self.LayerNorm_1(h))
        return h.transpose(1, 2)


class TItemStack(nn.Module):
    """One level's repeated item sequence (reference components.py:83-98)."""

    def __init__(self, channels: int, items: int, attentions: int,
                 cross_attentions: int, context_channels: int,
                 use_modulation: bool, resnet_groups: int,
                 attention_heads: int, attention_features: int,
                 modulation_features: int, embedding_features: int):
        super().__init__()
        self.items = items
        self.has_context = context_channels > 0
        self.attentions = attentions
        self.cross_attentions = cross_attentions
        for r in range(items):
            self.add_module(f"ResnetModItem_{r}", TResnetModItem(
                channels, resnet_groups, modulation_features, use_modulation))
            if self.has_context:
                self.add_module(f"InjectChannelsItem_{r}", TInjectChannelsItem(
                    channels, context_channels))
            for a in range(attentions):
                self.add_module(f"AttentionItem_{r * attentions + a}",
                                TAttentionItem(channels, attention_heads,
                                               attention_features))
            for a in range(cross_attentions):
                self.add_module(
                    f"CrossAttentionItem_{r * cross_attentions + a}",
                    TAttentionItem(channels, attention_heads,
                                   attention_features,
                                   context_features=embedding_features))

    def forward(self, x: Tensor, features: Optional[Tensor],
                embedding: Optional[Tensor],
                context: Optional[Tensor]) -> Tensor:
        for r in range(self.items):
            x = getattr(self, f"ResnetModItem_{r}")(x, features)
            if self.has_context:
                x = getattr(self, f"InjectChannelsItem_{r}")(x, context)
            for a in range(self.attentions):
                x = getattr(self, f"AttentionItem_{r * self.attentions + a}")(x)
            for a in range(self.cross_attentions):
                x = getattr(
                    self,
                    f"CrossAttentionItem_{r * self.cross_attentions + a}")(
                        x, embedding)
        return x


class TSkipModulate(nn.Module):
    """x + skip * (1 + gate(features)), gate zero-init (mirrors SkipModulate)."""

    def __init__(self, channels: int, modulation_features: int):
        super().__init__()
        self.Dense_0 = nn.Linear(modulation_features, channels)
        nn.init.zeros_(self.Dense_0.weight)
        nn.init.zeros_(self.Dense_0.bias)

    def forward(self, x: Tensor, skip: Tensor, features: Tensor) -> Tensor:
        gate = self.Dense_0(F.silu(features))
        return x + skip * (1.0 + gate[:, :, None])


class TSkipCat(nn.Module):
    """Channel-concat + 1x1 conv back to width (mirrors SkipCat)."""

    def __init__(self, channels: int):
        super().__init__()
        self.Dense_0 = nn.Conv1d(2 * channels, channels, 1)

    def forward(self, x: Tensor, skip: Tensor,
                features: Optional[Tensor] = None) -> Tensor:
        return self.Dense_0(torch.cat([x, skip], dim=1))


class TXUNet(nn.Module):
    """The oracle U-Net core on [B, C, T] (mirrors ops/unet.py XUNet with
    plain strided convs instead of folded patch matmuls)."""

    def __init__(self, in_channels: int, out_channels: int,
                 channels: Sequence[int], factors: Sequence[int],
                 items: Sequence[int], attentions: Sequence[int],
                 cross_attentions: Sequence[int],
                 context_channels: Sequence[int],
                 attention_heads: int, attention_features: int,
                 resnet_groups: int, use_modulation: bool,
                 modulation_features: int, embedding_features: int):
        super().__init__()
        self.num_levels = len(channels)
        self.use_modulation = use_modulation
        self.context_channels = list(context_channels)

        def stack(i: int) -> TItemStack:
            return TItemStack(
                channels[i], items[i], attentions[i], cross_attentions[i],
                context_channels[i], use_modulation, resnet_groups,
                attention_heads, attention_features, modulation_features,
                embedding_features)

        prev_c = in_channels
        for i in range(self.num_levels):
            # Patch resampling: kernel == stride == factor (the JAX
            # Downsample/Upsample are the matmul form of exactly this conv).
            self.add_module(f"down_{i}", nn.Conv1d(
                prev_c, channels[i], factors[i], stride=factors[i]))
            self.add_module(f"items_down_{i}", stack(i))
            prev_c = channels[i]
        for i in range(self.num_levels):
            out_c = channels[i - 1] if i > 0 else channels[0]
            if i < self.num_levels - 1:
                skip_t = (TSkipModulate(channels[i], modulation_features)
                          if use_modulation else TSkipCat(channels[i]))
                self.add_module(f"skip_{i}", skip_t)
            self.add_module(f"items_up_{i}", stack(i))
            self.add_module(f"up_{i}", nn.ConvTranspose1d(
                channels[i], out_c, factors[i], stride=factors[i]))

        self.out_gn = nn.GroupNorm(resnet_groups, channels[0], eps=1e-5)
        self.out_conv = nn.Conv1d(channels[0], out_channels, 3, padding=1)

    def forward(self, x: Tensor, features: Optional[Tensor] = None,
                embedding: Optional[Tensor] = None,
                channels: Optional[List[Optional[Tensor]]] = None) -> Tensor:
        contexts = list(channels or [])
        contexts += [None] * (self.num_levels - len(contexts))
        h = x
        skips = []
        for i in range(self.num_levels):
            h = getattr(self, f"down_{i}")(h)
            h = getattr(self, f"items_down_{i}")(
                h, features, embedding, contexts[i])
            if i < self.num_levels - 1:
                skips.append(h)
        for i in reversed(range(self.num_levels)):
            if i < self.num_levels - 1:
                h = getattr(self, f"skip_{i}")(h, skips.pop(), features)
            h = getattr(self, f"items_up_{i}")(
                h, features, embedding, contexts[i])
            h = getattr(self, f"up_{i}")(h)
        return self.out_conv(F.silu(self.out_gn(h)))


class TSigmaEmbedding(nn.Module):
    """sigma -> modulation features (mirrors SigmaEmbedding: learned Fourier
    freqs, [sin, cos, sigma] concat, Dense -> GELU -> Dense)."""

    def __init__(self, features: int, fourier_dim: int = 256):
        super().__init__()
        half = fourier_dim // 2
        self.freqs = nn.Parameter(torch.randn(half) * 16.0)
        self.Dense_0 = nn.Linear(fourier_dim + 1, features)
        self.Dense_1 = nn.Linear(features, features)

    def forward(self, sigmas: Tensor) -> Tensor:
        angles = sigmas[:, None] * self.freqs[None, :] * (2.0 * math.pi)
        emb = torch.cat([torch.sin(angles), torch.cos(angles),
                         sigmas[:, None]], dim=-1)
        return self.Dense_1(_gelu(self.Dense_0(emb)))


class TorchUNetV0(nn.Module):
    """Oracle counterpart of UNetV0 (reference components.py:34-105): the
    core TXUNet wrapped with CFG fixed-embedding and time conditioning,
    parameter structure mirroring the flax tree (importer.py walks this)."""

    def __init__(self, in_channels: int, channels: Sequence[int],
                 factors: Sequence[int], items: Sequence[int],
                 attentions: Optional[Sequence[int]] = None,
                 cross_attentions: Optional[Sequence[int]] = None,
                 context_channels: Optional[Sequence[int]] = None,
                 attention_heads: int = 8, attention_features: int = 64,
                 resnet_groups: int = 8, use_modulation: bool = True,
                 modulation_features: int = 1024,
                 use_time_conditioning: bool = True,
                 use_embedding_cfg: bool = False,
                 embedding_max_length: Optional[int] = None,
                 embedding_features: Optional[int] = None,
                 out_channels: Optional[int] = None):
        super().__init__()
        n = len(channels)
        attentions = list(attentions or [0] * n)
        cross_attentions = list(cross_attentions or [0] * n)
        context_channels = list(context_channels or [0] * n)
        out_channels = out_channels if out_channels is not None else in_channels
        self.use_time_conditioning = use_time_conditioning
        self.use_embedding_cfg = use_embedding_cfg

        self.unet = TXUNet(
            in_channels, out_channels, channels, factors, items, attentions,
            cross_attentions, context_channels, attention_heads,
            attention_features, resnet_groups, use_modulation,
            modulation_features, embedding_features or 64)
        if use_embedding_cfg:
            assert embedding_max_length and embedding_features
            self.fixed_embedding = nn.Parameter(
                torch.randn(embedding_max_length, embedding_features) * 0.02)
        if use_time_conditioning:
            self.sigma_embedding = TSigmaEmbedding(modulation_features)

    def forward(self, x: Tensor, sigmas: Optional[Tensor] = None,
                features: Optional[Tensor] = None,
                embedding: Optional[Tensor] = None,
                embedding_scale: float = 1.0,
                channels: Optional[List[Optional[Tensor]]] = None) -> Tensor:
        if self.use_time_conditioning:
            assert sigmas is not None
            if sigmas.ndim == 0:
                sigmas = sigmas.expand(x.shape[0])
            t_feat = self.sigma_embedding(sigmas)
            features = t_feat if features is None else t_feat + features

        if self.use_embedding_cfg:
            b = x.shape[0]
            fixed = self.fixed_embedding[None].expand(b, -1, -1)
            if embedding is None:
                embedding = fixed
            elif embedding_scale != 1.0:
                out = self.unet(x, features, embedding, channels)
                out_masked = self.unet(x, features, fixed, channels)
                return out_masked + embedding_scale * (out - out_masked)

        return self.unet(x, features, embedding, channels)


# ------------------------------------------------------------------ loops
@torch.no_grad()
def v_sample_torch(net: TorchUNetV0, x_noisy: Tensor, num_steps: int,
                   **kwargs) -> Tensor:
    """Reference VSampler loop (diffusion.py:158-190) on the oracle net."""
    b = x_noisy.shape[0]
    sigmas = torch.linspace(1.0, 0.0, num_steps + 1)
    for i in range(num_steps):
        angle = sigmas * math.pi / 2
        a, bb = torch.cos(angle), torch.sin(angle)
        v = net(x_noisy, sigmas[i].expand(b), **kwargs)
        x_pred = a[i] * x_noisy - bb[i] * v
        noise_pred = bb[i] * x_noisy + a[i] * v
        x_noisy = a[i + 1] * x_pred + bb[i + 1] * noise_pred
    return x_noisy


def v_loss_torch(net: TorchUNetV0, x: Tensor, sigmas: Tensor, noise: Tensor,
                 **kwargs) -> Tensor:
    """Reference VDiffusion loss (diffusion.py:82-95) with host-injected
    noise/sigmas (RNG streams can't be matched across frameworks)."""
    angle = sigmas * math.pi / 2
    a, b = torch.cos(angle), torch.sin(angle)
    a, b = a[:, None, None], b[:, None, None]
    x_noisy = a * x + b * noise
    v_target = a * noise - b * x
    v_pred = net(x_noisy, sigmas, **kwargs)
    return F.mse_loss(v_pred, v_target)
