"""2-D U-Net (images / spectrograms): the `dim=2` path of UNetV0.

The reference supports arbitrary dimensionality through a-unet
(reference README.md:3 "generic to any dimension"; components.py:34 `dim`
arg). This module provides the dim=2 build with the same level structure,
item sequence, and conditioning contract as the 1-D XUNet (ops/unet.py);
the diffusion methods/samplers are already shape-polymorphic.

Layout: channels-last [B, H, W, C] internally; public boundary [B, C, H, W]
(torch layout). Down/upsampling is 2-D patch reshape + Dense (MXU matmuls);
attention flattens the spatial axes. Spatial sizes at attention depths are
small, so no lane folding is needed here (images have C >= 64 at realistic
levels; folding generalizes later if a workload demands it).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..utils import default
from .attention import AttentionItem, CrossAttentionItem

__all__ = ["XUNet2d"]

Dtype = Any


class Conv2d(nn.Module):
    features: int
    kernel_size: int = 3
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.features,
                       kernel_size=(self.kernel_size, self.kernel_size),
                       padding="SAME", dtype=self.dtype,
                       param_dtype=self.param_dtype)(x)


class ResnetItem2d(nn.Module):
    channels: int
    groups: int = 8
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.silu(h)
        h = Conv2d(self.channels, dtype=self.dtype,
                   param_dtype=self.param_dtype)(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = nn.silu(h)
        h = Conv2d(self.channels, dtype=self.dtype,
                   param_dtype=self.param_dtype)(h)
        return x + h


class ModulationItem2d(nn.Module):
    channels: int
    groups: int = 8
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, features: Array) -> Array:
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype)(x)
        mod = nn.Dense(2 * self.channels, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype)(
            nn.silu(features.astype(h.dtype)))
        scale, shift = jnp.split(mod[:, None, None, :], 2, axis=-1)
        return x + h * (1.0 + scale) + shift


class Downsample2d(nn.Module):
    features: int
    factor: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        f = self.factor
        if f > 1:
            assert h % f == 0 and w % f == 0
            x = x.reshape(b, h // f, f, w // f, f, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // f, w // f, f * f * c)
        return nn.Dense(self.features, dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)


class Upsample2d(nn.Module):
    features: int
    factor: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, _ = x.shape
        f = self.factor
        x = nn.Dense(f * f * self.features, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        if f > 1:
            x = x.reshape(b, h, w, f, f, self.features)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h * f, w * f, self.features)
        return x


class ItemStack2d(nn.Module):
    channels: int
    items: int
    attentions: int
    cross_attentions: int
    has_context: bool
    use_modulation: bool
    resnet_groups: int
    attention_heads: int
    attention_features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, features: Optional[Array],
                 embedding: Optional[Array],
                 context: Optional[Array]) -> Array:
        b, h, w, c = x.shape
        for _ in range(self.items):
            x = ResnetItem2d(channels=self.channels,
                             groups=self.resnet_groups, dtype=self.dtype,
                             param_dtype=self.param_dtype)(x)
            if self.use_modulation:
                assert features is not None
                x = ModulationItem2d(channels=self.channels,
                                     groups=self.resnet_groups,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype)(
                    x, features)
            if self.has_context:
                assert context is not None, (
                    "context_channels > 0 at this depth; pass channels=")
                ctx = jnp.moveaxis(context, 1, -1).astype(x.dtype)
                assert ctx.shape[1:3] == (h, w), (
                    f"context spatial {ctx.shape[1:3]} != {(h, w)}")
                cat = jnp.concatenate([x, ctx], axis=-1)
                x = x + nn.Dense(self.channels, dtype=self.dtype,
                                 param_dtype=self.param_dtype)(cat)
            if self.attentions or self.cross_attentions:
                flat = x.reshape(b, h * w, c)
                for _ in range(self.attentions):
                    flat = AttentionItem(
                        heads=self.attention_heads,
                        head_features=self.attention_features,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype)(flat)
                for _ in range(self.cross_attentions):
                    assert embedding is not None
                    flat = CrossAttentionItem(
                        heads=self.attention_heads,
                        head_features=self.attention_features,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype)(flat, embedding)
                x = flat.reshape(b, h, w, c)
        return x


class XUNet2d(nn.Module):
    """2-D analog of XUNet (same level structure and conditioning contract).

    I/O: [B, C, H, W]; `channels` context tensors [B, ctx, H_d, W_d].
    """

    in_channels: int
    out_channels: int
    channels: Tuple[int, ...]
    factors: Tuple[int, ...]
    items: Tuple[int, ...]
    attentions: Tuple[int, ...]
    cross_attentions: Tuple[int, ...]
    context_channels: Tuple[int, ...]
    attention_heads: int = 8
    attention_features: int = 64
    resnet_groups: int = 8
    use_modulation: bool = True
    # Gradient checkpointing of item stacks (same semantics as the 1-D
    # XUNet: remat_policy names a jax.checkpoint_policies entry; None =
    # full remat). Only used when use_remat=True.
    use_remat: bool = False
    remat_policy: Optional[str] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        sigmas: Optional[Array] = None,
        *,
        features: Optional[Array] = None,
        embedding: Optional[Array] = None,
        channels: Optional[Sequence[Optional[Array]]] = None,
        hidden: Optional[Tuple] = None,
        return_hidden: bool = False,
        **unused_kwargs,
    ) -> Array:
        """``hidden`` / ``return_hidden`` expose the down path for cross-step
        encoder reuse with the same contract as the 1-D XUNet
        (ops/unet.py:620-629): ``return_hidden=True`` additionally returns
        the opaque encoder state; ``hidden=state`` skips the down path and
        decodes from it with the CURRENT ``features``. Samplers drive this
        via ``encoder_reuse=k``."""
        from .unet import _check_unused_kwargs

        _check_unused_kwargs(unused_kwargs)
        num_levels = len(self.channels)
        total_factor = 1
        for f_ in self.factors:
            total_factor *= f_
        assert (x.shape[-2] % total_factor == 0
                and x.shape[-1] % total_factor == 0), (
            f"input spatial dims {x.shape[-2:]} must be divisible by the "
            f"product of the downsampling factors ({total_factor})")
        contexts = list(default(channels, [None] * num_levels))
        contexts += [None] * (num_levels - len(contexts))
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        if self.use_remat:
            policy = (getattr(jax.checkpoint_policies, self.remat_policy)
                      if self.remat_policy else None)
            stack_cls = nn.remat(ItemStack2d, policy=policy)
        else:
            stack_cls = ItemStack2d

        def stack(i: int, name: str):
            return stack_cls(
                channels=self.channels[i],
                items=self.items[i],
                attentions=self.attentions[i],
                cross_attentions=self.cross_attentions[i],
                has_context=self.context_channels[i] > 0,
                use_modulation=self.use_modulation,
                resnet_groups=self.resnet_groups,
                attention_heads=self.attention_heads,
                attention_features=self.attention_features,
                name=name, **common)

        if hidden is not None:
            # Decoder-only pass: reuse a cached encoder state; the down-path
            # modules are simply not visited (flax resolves up-path modules
            # by name, so the SAME params tree serves both modes).
            h, skips_t = hidden
            skips = list(skips_t)
        else:
            h = jnp.moveaxis(x, 1, -1)  # [B, H, W, C]
            if self.dtype is not None:
                h = h.astype(self.dtype)

            skips = []
            for i in range(num_levels):
                h = Downsample2d(self.channels[i], self.factors[i],
                                 name=f"down_{i}", **common)(h)
                h = stack(i, f"items_down_{i}")(h, features, embedding,
                                                contexts[i])
                if i < num_levels - 1:
                    skips.append(h)

        enc = (h, tuple(skips))  # captured BEFORE the up loop pops skips

        for i in reversed(range(num_levels)):
            if i < num_levels - 1:
                skip = skips.pop()
                if self.use_modulation:
                    gate = nn.Dense(self.channels[i],
                                    kernel_init=nn.initializers.zeros,
                                    name=f"skip_{i}", **common)(
                        nn.silu(features.astype(h.dtype)))
                    h = h + skip * (1.0 + gate[:, None, None, :])
                else:
                    h = nn.Dense(self.channels[i], name=f"skip_{i}",
                                 **common)(
                        jnp.concatenate([h, skip], axis=-1))
            h = stack(i, f"items_up_{i}")(h, features, embedding, contexts[i])
            out_c = self.channels[i - 1] if i > 0 else self.channels[0]
            h = Upsample2d(out_c, self.factors[i], name=f"up_{i}",
                           **common)(h)

        h = nn.GroupNorm(num_groups=self.resnet_groups, epsilon=1e-5,
                         **common)(h)
        h = nn.silu(h)
        h = Conv2d(self.out_channels, name="proj_out", **common)(h)
        out = jnp.moveaxis(h, -1, 1).astype(x.dtype)
        return (out, enc) if return_hidden else out
