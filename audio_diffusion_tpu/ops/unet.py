"""The U-Net compute core, TPU-first.

This is the native equivalent of the external `a-unet` package the reference
delegates to (reference components.py:34-105 builds an a-unet XUNet; SURVEY.md
§2.9 documents the behavioral contract). It is NOT a translation: layout and
op choices are made for the MXU/XLA:

- Activations are channels-last [B, L, C] internally (C maps to TPU lanes);
  the public call boundary stays [B, C, T] for reference API parity.
- Down/upsampling by factor f is a non-overlapping patch reshape + Dense
  ([B,L,C] -> [B,L/f,f·C] -> Dense), i.e. a pure MXU matmul, instead of a
  cuDNN strided conv. Geometry invariant preserved: the feature length at
  depth d is full_length / prod(factors[:d+1]) (verified by the reference's
  DiffusionAE inject_depth=6 / MelE1d factor-512 pairing, README.md:137-163).
- Per-level item sequence matches reference components.py:83-98:
  ([Resnet] [+Modulation] [+Inject if ctx] [+Attention]·a [+CrossAttention]·c)
  × items, run on the way down AND mirrored (fresh params) on the way up.
- Skip type: SkipModulate when modulation is on, else SkipCat
  (reference components.py:99).
- Conditioning wrappers compose like the reference's plugins
  (components.py:66-76): XUNet -> ClassifierFreeGuidance -> TimeConditioning.
  Text conditioning is handled host-side at the model layer (encode ONCE per
  call, outside the sampling scan — SURVEY.md §3.3), not per net call.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..utils import default
from .attention import AttentionItem, CrossAttentionItem
from .conv import Conv1d

__all__ = [
    "ResnetItem",
    "ModulationItem",
    "InjectChannelsItem",
    "Downsample",
    "Upsample",
    "SkipCat",
    "SkipModulate",
    "XUNet",
    "TimeConditioningWrapper",
    "ClassifierFreeGuidanceWrapper",
    "AppendChannelsWrapper",
]

Dtype = Any


class ResnetItem(nn.Module):
    """Pre-activation residual block: (GN -> SiLU -> Conv k=3) × 2 + identity.

    Channel width is constant inside an item stack (width changes happen in
    Downsample/Upsample), so the shortcut is always identity.
    Contract: SURVEY.md §2.9 [reconstructed] a-unet ResnetItem.
    """

    groups: int = 8
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        h = nn.silu(h)
        h = Conv1d(c, kernel_size=3, padding=1, dtype=self.dtype,
                   param_dtype=self.param_dtype)(h)
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype,
                         param_dtype=self.param_dtype)(h)
        h = nn.silu(h)
        h = Conv1d(c, kernel_size=3, padding=1, dtype=self.dtype,
                   param_dtype=self.param_dtype)(h)
        return x + h


class ModulationItem(nn.Module):
    """AdaGN-style FiLM from the modulation feature vector.

    x -> GN(x)·(1+scale) + shift, with (scale, shift) = Dense(SiLU(features)).
    The Dense is zero-initialized so the item starts as plain GroupNorm.
    Contract: SURVEY.md §2.9 [reconstructed] a-unet ModulationItem.
    """

    groups: int = 8
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, features: Array) -> Array:
        c = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        mod = nn.Dense(2 * c, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype)(
            nn.silu(features.astype(h.dtype)))
        scale, shift = jnp.split(mod[:, None, :], 2, axis=-1)
        return x + h * (1.0 + scale) + shift


class InjectChannelsItem(nn.Module):
    """Concatenate depth-matched context channels, 1×1-conv back to width.

    `context` arrives [B, ctx_ch, len_d] (reference layout, models.py:103);
    its length must equal the feature length at this depth.
    Contract: SURVEY.md §2.9 [reconstructed] a-unet InjectChannelsItem.
    """

    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        c = x.shape[-1]
        ctx = jnp.swapaxes(context, 1, 2).astype(x.dtype)  # [B, len_d, ctx_ch]
        assert ctx.shape[1] == x.shape[1], (
            f"context length {ctx.shape[1]} != feature length {x.shape[1]} "
            "at this depth")
        h = jnp.concatenate([x, ctx], axis=-1)
        return x + nn.Dense(c, dtype=self.dtype,
                            param_dtype=self.param_dtype)(h)


class Downsample(nn.Module):
    """Patch downsample: [B, L, Cin] -> [B, L/f, f·Cin] -> Dense(features).

    A pure MXU matmul; equivalent receptive geometry to a stride-f kernel-f
    conv (the reference's strided-conv downsample), chosen for TPU tiling.
    """

    features: int
    factor: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, l, c = x.shape
        f = self.factor
        assert l % f == 0, f"length {l} not divisible by factor {f}"
        if f > 1:
            x = x.reshape(b, l // f, f * c)
        return nn.Dense(self.features, dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)


class Upsample(nn.Module):
    """Patch upsample: Dense(f·features) -> [B, L·f, features]."""

    features: int
    factor: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, l, _ = x.shape
        f = self.factor
        x = nn.Dense(f * self.features, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        if f > 1:
            x = x.reshape(b, l * f, self.features)
        return x


class SkipCat(nn.Module):
    """Skip merge by channel concat + Dense back to width
    (reference components.py:99 SkipCat, [reconstructed])."""

    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array,
                 features: Optional[Array] = None) -> Array:
        c = x.shape[-1]
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype)(
            jnp.concatenate([x, skip], axis=-1))


class SkipModulate(nn.Module):
    """Skip merge gated by the modulation features:
    x + skip·(1 + gate(features)), gate zero-initialized
    (reference components.py:99 SkipModulate, [reconstructed])."""

    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array, features: Array) -> Array:
        c = x.shape[-1]
        gate = nn.Dense(c, kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, param_dtype=self.param_dtype)(
            nn.silu(features.astype(x.dtype)))
        return x + skip * (1.0 + gate[:, None, :])


class ItemStack(nn.Module):
    """One level's repeated item sequence (reference components.py:83-98):
    ([Resnet][+Mod][+Inject if ctx][+Attn]·a[+CrossAttn]·c) × items."""

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
        for _ in range(self.items):
            x = ResnetItem(groups=self.resnet_groups, dtype=self.dtype,
                           param_dtype=self.param_dtype)(x)
            if self.use_modulation:
                assert features is not None, (
                    "modulation requires features (enable time conditioning "
                    "or pass features=)")
                x = ModulationItem(groups=self.resnet_groups, dtype=self.dtype,
                                   param_dtype=self.param_dtype)(x, features)
            if self.has_context:
                assert context is not None, (
                    "this depth was built with context_channels > 0; pass "
                    "channels=[...] with a tensor at this depth")
                x = InjectChannelsItem(dtype=self.dtype,
                                       param_dtype=self.param_dtype)(x, context)
            for _ in range(self.attentions):
                x = AttentionItem(
                    heads=self.attention_heads,
                    head_features=self.attention_features,
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
            for _ in range(self.cross_attentions):
                assert embedding is not None, (
                    "cross attention requires embedding= (or text= at the "
                    "model layer)")
                x = CrossAttentionItem(
                    heads=self.attention_heads,
                    head_features=self.attention_features,
                    dtype=self.dtype, param_dtype=self.param_dtype)(
                        x, embedding)
        return x


class XUNet(nn.Module):
    """The recursive U-Net, written iteratively.

    Per level i (matching a-unet XBlock structure, SURVEY.md §2.9):
      down:  Downsample(factor_i, -> channels_i) ; down-items
      inner: next level (innermost level has no skip)
      up:    SkipMerge(inner, skip, features) ; up-items ; Upsample(factor_i)

    I/O is [B, C, T] (reference layout); internally channels-last.
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
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        sigmas: Optional[Array] = None,  # unused; σ arrives via features
        *,
        features: Optional[Array] = None,
        embedding: Optional[Array] = None,
        channels: Optional[Sequence[Optional[Array]]] = None,
        **unused_kwargs,
    ) -> Array:
        num_levels = len(self.channels)
        contexts: Sequence[Optional[Array]] = default(
            channels, [None] * num_levels)
        # Pad the context list like the reference accepts
        # channels=[None]*inject_depth+[latent] (models.py:103).
        contexts = list(contexts) + [None] * (num_levels - len(contexts))

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def stack(i: int, name: str) -> ItemStack:
            return ItemStack(
                items=self.items[i],
                attentions=self.attentions[i],
                cross_attentions=self.cross_attentions[i],
                has_context=self.context_channels[i] > 0,
                use_modulation=self.use_modulation,
                resnet_groups=self.resnet_groups,
                attention_heads=self.attention_heads,
                attention_features=self.attention_features,
                name=name, **common)

        h = jnp.swapaxes(x, 1, 2)  # [B, T, C] channels-last
        if self.dtype is not None:
            h = h.astype(self.dtype)

        skips = []
        for i in range(num_levels):
            h = Downsample(self.channels[i], self.factors[i],
                           name=f"down_{i}", **common)(h)
            h = stack(i, f"items_down_{i}")(h, features, embedding, contexts[i])
            if i < num_levels - 1:
                skips.append(h)

        for i in reversed(range(num_levels)):
            if i < num_levels - 1:
                skip = skips.pop()
                if self.use_modulation:
                    h = SkipModulate(name=f"skip_{i}", **common)(
                        h, skip, features)
                else:
                    h = SkipCat(name=f"skip_{i}", **common)(h, skip)
            h = stack(i, f"items_up_{i}")(h, features, embedding, contexts[i])
            out_ch = self.channels[i - 1] if i > 0 else self.channels[0]
            h = Upsample(out_ch, self.factors[i], name=f"up_{i}", **common)(h)

        # Final projection to out_channels.
        h = nn.GroupNorm(num_groups=self.resnet_groups, **common)(h)
        h = nn.silu(h)
        h = Conv1d(self.out_channels, kernel_size=3, padding=1,
                   name="proj_out", **common)(h)
        return jnp.swapaxes(h, 1, 2).astype(x.dtype)  # back to [B, C, T]


class SigmaEmbedding(nn.Module):
    """σ -> modulation feature vector: learned Fourier features + MLP.

    Equivalent role to a-unet's TimeConditioningPlugin positional embedding
    + MLP (SURVEY.md §2.9 [reconstructed]).
    """

    features: int
    fourier_dim: int = 256
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sigmas: Array) -> Array:
        half = self.fourier_dim // 2
        freqs = self.param(
            "freqs", nn.initializers.normal(stddev=16.0), (half,),
            self.param_dtype)
        angles = sigmas[:, None].astype(jnp.float32) * freqs[None, :] * (
            2.0 * jnp.pi)
        emb = jnp.concatenate(
            [jnp.sin(angles), jnp.cos(angles), sigmas[:, None]], axis=-1)
        if self.dtype is not None:
            emb = emb.astype(self.dtype)
        h = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=self.param_dtype)(emb)
        h = nn.gelu(h)
        return nn.Dense(self.features, dtype=self.dtype,
                        param_dtype=self.param_dtype)(h)


class TimeConditioningWrapper(nn.Module):
    """σ -> features, composing additively with user-passed features.

    Reference plugin: components.py:74-76 (TimeConditioningPlugin, outermost).
    """

    inner: nn.Module
    modulation_features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, sigmas: Optional[Array] = None, *,
                 features: Optional[Array] = None, **kwargs) -> Array:
        assert sigmas is not None, "time conditioning requires sigmas"
        if sigmas.ndim == 0:
            sigmas = jnp.broadcast_to(sigmas, (x.shape[0],))
        time_features = SigmaEmbedding(
            self.modulation_features, dtype=self.dtype,
            param_dtype=self.param_dtype, name="sigma_embedding")(sigmas)
        if features is not None:
            time_features = time_features + features.astype(time_features.dtype)
        return self.inner(x, None, features=time_features, **kwargs)


class ClassifierFreeGuidanceWrapper(nn.Module):
    """CFG: learned fixed (null) embedding; train-time embedding dropout;
    sample-time guided two-pass, batched as one doubled pass.

    Reference plugin: components.py:66-69 + README.md:65, 74. The two net
    evaluations (conditioned / fixed) run as ONE batch-doubled evaluation so
    the sampling scan stays a single fused computation (SURVEY.md §2.9).

    `embedding_mask_proba` and `embedding_scale` are STATIC Python floats
    (they select program structure).
    """

    inner: nn.Module
    embedding_max_length: int
    embedding_features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, sigmas: Optional[Array] = None, *,
                 embedding: Optional[Array] = None,
                 embedding_mask_proba: float = 0.0,
                 embedding_scale: float = 1.0,
                 **kwargs) -> Array:
        b = x.shape[0]
        fixed = self.param(
            "fixed_embedding", nn.initializers.normal(stddev=0.02),
            (self.embedding_max_length, self.embedding_features),
            self.param_dtype)
        fixed_b = jnp.broadcast_to(
            fixed[None], (b,) + fixed.shape).astype(
                embedding.dtype if embedding is not None else fixed.dtype)

        if embedding is None:
            return self.inner(x, sigmas, embedding=fixed_b, **kwargs)

        if embedding_mask_proba > 0.0:
            key = self.make_rng("cfg")
            mask = jax.random.bernoulli(key, embedding_mask_proba, (b, 1, 1))
            embedding = jnp.where(mask, fixed_b, embedding)

        if embedding_scale == 1.0:
            return self.inner(x, sigmas, embedding=embedding, **kwargs)

        # Guided sampling: one batch-doubled pass [conditioned; fixed].
        def double(t):
            return jnp.concatenate([t, t], axis=0) if t is not None else None

        x2 = double(x)
        sigmas2 = double(sigmas) if (
            sigmas is not None and sigmas.ndim > 0) else sigmas
        emb2 = jnp.concatenate([embedding, fixed_b], axis=0)
        kwargs2 = jax.tree_util.tree_map(double, kwargs)
        out2 = self.inner(x2, sigmas2, embedding=emb2, **kwargs2)
        out, out_masked = out2[:b], out2[b:]
        return out_masked + embedding_scale * (out - out_masked)


class AppendChannelsWrapper(nn.Module):
    """Concat conditioning channels to the input before the net
    (reference components.py:162-180; used by Upsampler and Vocoder)."""

    inner: nn.Module

    @nn.compact
    def __call__(self, x: Array, sigmas: Optional[Array] = None, *,
                 append_channels: Array, **kwargs) -> Array:
        h = jnp.concatenate(
            [x, append_channels.astype(x.dtype)], axis=1)  # [B, C, T] layout
        return self.inner(h, sigmas, **kwargs)
