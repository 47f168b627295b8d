"""The U-Net compute core, TPU-first.

This is the native equivalent of the external `a-unet` package the reference
delegates to (reference components.py:34-105 builds an a-unet XUNet; SURVEY.md
§2.9 documents the behavioral contract). It is NOT a translation: layout and
op choices are made for the MXU/XLA:

- Activations are channels-last [B, L, C] internally (C maps to TPU lanes);
  the public call boundary stays [B, C, T] for reference API parity.
- Narrow-channel levels (C < 128) run LANE-FOLDED: F = 128/C consecutive
  samples fold into the channel dim so every op works on full 128-lane
  tiles (see ops/folding.py — profiling showed the shallow levels of the
  flagship config costing ~40% of the forward for ~2% of the FLOPs in the
  naive layout). fold=1 (wide levels) is the ordinary layout; the math is
  identical either way and parameters are layout-independent.
- Down/upsampling by factor f is a block-diagonal matmul over folded frames
  (a pure MXU matmul), i.e. non-overlapping patch resampling, instead of a
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

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..utils import default
from .attention import AttentionItem, CrossAttentionItem
from .conv import conv1d
from .folding import (
    conv3_as_matmuls,
    fold,
    fold_conv3_kernel,
    fold_dense_kernel,
    fold_factor,
    refold,
    unfold,
)

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


def _tile(v: Array, f: int) -> Array:
    """Per-channel vector [C] -> folded [f·C] (pattern repeats per frame pos)."""
    return jnp.tile(v, f) if f > 1 else v


def group_norm(x: Array, f: int, groups: int, scale: Array, bias: Array,
               eps: float = 1e-5) -> Array:
    """GroupNorm on a (possibly folded) [B, Lf, f·C] tensor: statistics per
    (batch, group) over (length, fold positions, group channels); f32 stats.

    E[x²]−E[x]² form: both moments reduce in ONE fused pass over x and the
    normalize is a second pass — the mean-centered form materializes an f32
    `centered` array (2× the activation) and reads it twice, which is pure
    HBM traffic at the long shallow levels (measured +6% full-forward cost).
    """
    b, lf, fc = x.shape
    c = fc // f
    xg = x.reshape(b, lf, f, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
    meansq = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 2, 4),
                      keepdims=True)
    # Clamp at 0: catastrophic cancellation (|mean| >> std) can push the
    # moment difference slightly negative, and rsqrt(negative) is NaN.
    rstd = jax.lax.rsqrt(jnp.maximum(meansq - mean * mean, 0.0) + eps)
    xn = ((xg.astype(jnp.float32) - mean) * rstd).reshape(b, lf, fc)
    y = xn.astype(x.dtype) * _tile(scale, f) + _tile(bias, f)
    return y


def _check_unused_kwargs(unused: dict) -> None:
    """Unknown conditioning kwargs reaching the bare XUNet are usually a
    misconfiguration. CFG knobs are a HARD error (the user asked for
    guidance but the net has no CFG wrapper to honor it — silently
    returning unguided samples is the worst outcome); anything else warns
    (kept lenient so experimental pass-through kwargs don't break)."""
    cfg_keys = {"embedding_scale", "embedding_mask_proba"}
    bad = cfg_keys & unused.keys()
    if bad:
        raise TypeError(
            f"{sorted(bad)} requires a net built with "
            "use_embedding_cfg=True (reference components.py:66-69); this "
            "net has no CFG plugin, so guidance would be silently skipped")
    reuse = {"hidden", "return_hidden"} & unused.keys()
    if reuse:
        # Hard error: a sampler asking for encoder reuse against a net that
        # would silently ignore it must not mis-unpack the output as
        # (v, enc). All in-tree XUNets (dim 1/2/3) implement reuse; this
        # guards custom nets that don't.
        raise TypeError(
            f"{sorted(reuse)}: this net does not implement encoder reuse; "
            "drop encoder_reuse from the sampler call")
    unknown = set(unused) - {"key"}
    if unknown:
        import warnings

        warnings.warn(
            f"conditioning kwargs {sorted(unknown)} are not consumed by "
            "this net (typo, or a plugin that would consume them is not "
            "enabled)", stacklevel=2)


def _declare_resnet_params(module: nn.Module, channels: int, param_dtype,
                           in_channels: Optional[int] = None):
    """Declare the 8 resnet-item parameters (shared by ResnetItem and
    ResnetModItem so their trees/math stay in lockstep by construction).
    With ``in_channels != channels`` (the geometry-register alternative:
    channel change inside the level's first resnet, PARITY.md), the first
    GN/conv run at the input width."""
    c = channels
    ci = in_channels if in_channels is not None else c
    p = lambda name, shape, init: module.param(  # noqa: E731
        name, init, shape, param_dtype)
    return (
        p("gn1_scale", (ci,), nn.initializers.ones),
        p("gn1_bias", (ci,), nn.initializers.zeros),
        p("conv1_kernel", (3, ci, c), nn.initializers.lecun_normal()),
        p("conv1_bias", (c,), nn.initializers.zeros),
        p("gn2_scale", (c,), nn.initializers.ones),
        p("gn2_bias", (c,), nn.initializers.zeros),
        p("conv2_kernel", (3, c, c), nn.initializers.lecun_normal()),
        p("conv2_bias", (c,), nn.initializers.zeros),
    )


def _resnet_math(x: Array, params, fold: int, groups: int, dtype,
                 shortcut=None) -> Array:
    """Pure resnet math: (GN -> SiLU -> conv3) × 2 + identity.

    ``shortcut=(kernel, bias)`` switches the identity to a 1×1 conv — used
    only by the channel-changing parity-mode variant (PARITY.md geometry
    register: channel change inside the first resnet)."""
    gn1_s, gn1_b, k1, b1, gn2_s, gn2_b, k2, b2 = params
    f = fold
    cast = (lambda a: a.astype(dtype)) if dtype else (lambda a: a)
    h = group_norm(x, f, groups, cast(gn1_s), cast(gn1_b))
    h = nn.silu(h)
    h = conv3_as_matmuls(h, cast(fold_conv3_kernel(k1, f)),
                         _tile(cast(b1), f))
    h = group_norm(h, f, groups, cast(gn2_s), cast(gn2_b))
    h = nn.silu(h)
    h = conv3_as_matmuls(h, cast(fold_conv3_kernel(k2, f)),
                         _tile(cast(b2), f))
    res = x if shortcut is None else x @ cast(shortcut[0]) + cast(shortcut[1])
    return res + h


class ResnetItem(nn.Module):
    """Pre-activation residual block: (GN -> SiLU -> Conv k=3) × 2 + identity.

    Channel width is constant inside an item stack (width changes happen in
    Downsample/Upsample), so the shortcut is always identity. Runs fold-aware:
    the k=3 convs become banded 3-tap frame convs when fold > 1.
    Contract: SURVEY.md §2.9 [reconstructed] a-unet ResnetItem.
    """

    channels: int
    fold: int = 1
    groups: int = 8
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        params = _declare_resnet_params(self, self.channels, self.param_dtype)
        return _resnet_math(x, params, self.fold, self.groups, self.dtype)


class ModulationItem(nn.Module):
    """AdaGN-style FiLM from the modulation feature vector.

    x -> x + GN(x)·(1+scale) + shift, with (scale, shift) =
    Dense(SiLU(features)) zero-initialized (identity at init).
    Contract: SURVEY.md §2.9 [reconstructed] a-unet ModulationItem.
    """

    channels: int
    fold: int = 1
    groups: int = 8
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, features: Array) -> Array:
        c, f = self.channels, self.fold
        gn_s = self.param("gn_scale", nn.initializers.ones, (c,),
                          self.param_dtype)
        gn_b = self.param("gn_bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        cast = (lambda a: a.astype(self.dtype)) if self.dtype else (lambda a: a)
        h = group_norm(x, f, self.groups, cast(gn_s), cast(gn_b))
        mod = nn.Dense(2 * c, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype)(
            nn.silu(features.astype(h.dtype)))
        scale, shift = jnp.split(mod, 2, axis=-1)  # [B, C] each
        scale = _tile_batched(scale, f)[:, None, :]
        shift = _tile_batched(shift, f)[:, None, :]
        return x + h * (1.0 + scale) + shift


def _tile_batched(v: Array, f: int) -> Array:
    """[B, C] -> [B, f·C]."""
    return jnp.tile(v, (1, f)) if f > 1 else v


class ResnetModItem(nn.Module):
    """Resnet item + optional ModulationItem epilogue as ONE unit, with an
    optional fused Pallas path (`use_pallas`) that evaluates the whole item
    in a single kernel (ops/kernels/resnet.py). Parameter tree is identical
    in both modes; the lax path is the definition of the math.
    """

    channels: int
    fold: int = 1
    groups: int = 8
    use_modulation: bool = True
    use_pallas: bool = False
    # Parity-mode alternative geometry (PARITY.md register): when set and
    # != channels, the item changes width (first GN/conv at in_channels,
    # 1×1-conv shortcut). Unfolded levels only.
    in_channels: Optional[int] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, features: Optional[Array] = None) -> Array:
        c, f = self.channels, self.fold
        ci = self.in_channels if self.in_channels is not None else c
        (gn1_s, gn1_b, k1, b1, gn2_s, gn2_b, k2, b2) = _declare_resnet_params(
            self, c, self.param_dtype, in_channels=ci)
        p = lambda name, shape, init: self.param(  # noqa: E731
            name, init, shape, self.param_dtype)
        cast = (lambda a: a.astype(self.dtype)) if self.dtype else (lambda a: a)
        shortcut = None
        if ci != c:
            assert f == 1, (
                "channel-changing resnet items run unfolded (parity mode)")
            shortcut = (
                p("shortcut_kernel", (ci, c), nn.initializers.lecun_normal()),
                p("shortcut_bias", (c,), nn.initializers.zeros))

        mods = modb = mg_s = mg_b = None
        if self.use_modulation:
            assert features is not None
            mg_s = p("mod_gn_scale", (c,), nn.initializers.ones)
            mg_b = p("mod_gn_bias", (c,), nn.initializers.zeros)
            mod = nn.Dense(2 * c, kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="mod_dense")(
                nn.silu(features.astype(x.dtype)))
            scale, shift = jnp.split(mod, 2, axis=-1)
            mods = _tile_batched(scale, f)
            modb = _tile_batched(shift, f)

        # The fused kernel keeps the whole [Lf, W] activation plus both conv
        # weight banks VMEM-resident; guard statically on the estimated
        # footprint and fall back to the lax path when it won't fit.
        # Estimate: 3 activation-sized buffers in the compute dtype
        # (x block, h, padded h) + one f32 conv accumulator + both folded
        # conv kernels.
        use_pallas = self.use_pallas and shortcut is None
        if use_pallas:
            lf, w_ = x.shape[1], x.shape[2]
            esize = 2 if self.dtype == jnp.bfloat16 else 4
            vmem_est = lf * w_ * (3 * esize + 4) + 6 * w_ * w_ * esize
            # Wide levels are excluded even when they fit: their conv weight
            # banks (6·W² elements) load synchronously at kernel start
            # (grid=1, nothing to pipeline against), while the lax path
            # overlaps those loads with neighboring compute — measured
            # slower e2e for W >= 512.
            use_pallas = vmem_est < 14 * 1024 * 1024 and w_ <= 256

        if use_pallas:
            from .kernels.resnet import fused_resnet_item, group_map
            w = f * c
            m = jnp.asarray(group_map(f, c, self.groups), jnp.float32)
            b = x.shape[0]
            zeros = jnp.zeros((b, w), x.dtype)
            return fused_resnet_item(
                x,
                _tile(cast(gn1_s), f)[None], _tile(cast(gn1_b), f)[None],
                cast(fold_conv3_kernel(k1, f)), _tile(cast(b1), f)[None],
                _tile(cast(gn2_s), f)[None], _tile(cast(gn2_b), f)[None],
                cast(fold_conv3_kernel(k2, f)), _tile(cast(b2), f)[None],
                m, m.T,
                mods if mods is not None else zeros,
                modb if modb is not None else zeros,
                _tile(cast(mg_s), f)[None] if mg_s is not None else zeros[:1],
                _tile(cast(mg_b), f)[None] if mg_b is not None else zeros[:1],
                1e-5, self.use_modulation, False)

        # lax path — the shared resnet math.
        y = _resnet_math(x, (gn1_s, gn1_b, k1, b1, gn2_s, gn2_b, k2, b2),
                         f, self.groups, self.dtype, shortcut=shortcut)
        if self.use_modulation:
            hm = group_norm(y, f, self.groups, cast(mg_s), cast(mg_b))
            y = y + hm * (1.0 + mods[:, None, :]) + modb[:, None, :]
        return y


class InjectChannelsItem(nn.Module):
    """Concatenate depth-matched context channels, project back to width.

    `context` arrives [B, ctx_ch, len_d] (reference layout, models.py:103);
    its length must equal the feature length at this depth. Only supported
    at unfolded (wide) levels — README configs inject at depth 6 (C=512).
    Contract: SURVEY.md §2.9 [reconstructed] a-unet InjectChannelsItem.
    """

    channels: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        ctx = jnp.swapaxes(context, 1, 2).astype(x.dtype)  # [B, len_d, ctx]
        assert ctx.shape[1] == x.shape[1], (
            f"context length {ctx.shape[1]} != feature length {x.shape[1]} "
            "at this depth")
        h = jnp.concatenate([x, ctx], axis=-1)
        return x + nn.Dense(self.channels, dtype=self.dtype,
                            param_dtype=self.param_dtype)(h)


class Downsample(nn.Module):
    """Patch downsample on a folded stream: regroup the contiguous (t, c)
    stream into frames of `factor` positions (pure reshape), apply one
    block-diagonal Dense, refold for the output width. Pure MXU matmul;
    equivalent receptive geometry to a stride-f kernel-f conv.
    """

    in_channels: int
    features: int
    factor: int
    in_fold: int = 1
    out_fold: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c, d = self.in_channels, self.factor
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (d * c, self.features), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        if self.dtype is not None:
            x, w, b = x.astype(self.dtype), w.astype(self.dtype), b.astype(
                self.dtype)
        bsz = x.shape[0]
        # Regroup stream to frames of lcm(in_fold, d) positions so the
        # block-diagonal dense consumes whole d-groups.
        f_tmp = math.lcm(self.in_fold, d)
        x = x.reshape(bsz, -1, f_tmp * c)
        blocks = f_tmp // d
        y = x @ fold_dense_kernel(w, blocks) + _tile(b, blocks)
        # y: [B, L/d / blocks, blocks·features] -> refold for output.
        y = refold(y, blocks, self.features, self.out_fold)
        return y


class Upsample(nn.Module):
    """Patch upsample: block-diagonal Dense(C -> factor·features) over the
    folded stream, then refold (pure reshape)."""

    in_channels: int
    features: int
    factor: int
    in_fold: int = 1
    out_fold: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c, d = self.in_channels, self.factor
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (c, d * self.features), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (d * self.features,),
                       self.param_dtype)
        if self.dtype is not None:
            x, w, b = x.astype(self.dtype), w.astype(self.dtype), b.astype(
                self.dtype)
        y = x @ fold_dense_kernel(w, self.in_fold) + _tile(b, self.in_fold)
        # y is folded with in_fold·d positions of `features` channels.
        return refold(y, self.in_fold * d, self.features, self.out_fold)


class SkipCat(nn.Module):
    """Skip merge by channel concat + Dense back to width
    (reference components.py:99 SkipCat, [reconstructed]). Fold-aware: the
    concat is per-position, so the folded weight stacks two block-diagonal
    halves."""

    channels: int
    fold: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array,
                 features: Optional[Array] = None) -> Array:
        c, f = self.channels, self.fold
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (2 * c, c), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if self.dtype is not None:
            x, skip = x.astype(self.dtype), skip.astype(self.dtype)
            w, b = w.astype(self.dtype), b.astype(self.dtype)
        w_x = fold_dense_kernel(w[:c], f)
        w_s = fold_dense_kernel(w[c:], f)
        wf = jnp.concatenate([w_x, w_s], axis=0)  # [2·f·C, f·C]
        h = jnp.concatenate([x, skip], axis=-1)
        return h @ wf + _tile(b, f)


class SkipModulate(nn.Module):
    """Skip merge gated by the modulation features:
    x + skip·(1 + gate(features)), gate zero-initialized
    (reference components.py:99 SkipModulate, [reconstructed])."""

    channels: int
    fold: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array, features: Array) -> Array:
        gate = nn.Dense(self.channels, kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, param_dtype=self.param_dtype)(
            nn.silu(features.astype(x.dtype)))
        gate = _tile_batched(gate, self.fold)[:, None, :]
        return x + skip.astype(x.dtype) * (1.0 + gate)


class ItemStack(nn.Module):
    """One level's repeated item sequence (reference components.py:83-98):
    ([Resnet][+Mod][+Inject if ctx][+Attn]·a[+CrossAttn]·c) × items."""

    channels: int
    items: int
    attentions: int
    cross_attentions: int
    has_context: bool
    use_modulation: bool
    resnet_groups: int
    attention_heads: int
    attention_features: int
    fold: int = 1
    use_pallas: bool = False
    # Parity-mode (PARITY.md register): the stack's FIRST resnet changes
    # width from in_channels to channels via a 1×1-conv shortcut.
    in_channels: Optional[int] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, features: Optional[Array],
                 embedding: Optional[Array],
                 context: Optional[Array]) -> Array:
        if self.fold > 1:
            assert self.attentions == 0 and self.cross_attentions == 0, (
                "attention requires channels >= 128 (unfolded level); put "
                "attention at deeper levels as the reference configs do")
            assert not self.has_context, (
                "context injection at narrow (folded) levels is unsupported; "
                "inject at a level with >= 128 channels")
        if self.use_modulation:
            assert features is not None, (
                "modulation requires features (enable time conditioning "
                "or pass features=)")
        if self.in_channels is not None and self.in_channels != self.channels:
            assert self.items >= 1, (
                "channel change in the first item requires items >= 1")
        for it in range(self.items):
            x = ResnetModItem(channels=self.channels, fold=self.fold,
                              groups=self.resnet_groups,
                              use_modulation=self.use_modulation,
                              use_pallas=self.use_pallas,
                              in_channels=(self.in_channels if it == 0
                                           else None),
                              dtype=self.dtype,
                              param_dtype=self.param_dtype)(x, features)
            if self.has_context:
                assert context is not None, (
                    "this depth was built with context_channels > 0; pass "
                    "channels=[...] with a tensor at this depth")
                x = InjectChannelsItem(channels=self.channels,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype)(
                    x, context)
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

    I/O is [B, C, T] (reference layout); internally channels-last with
    lane folding at narrow levels (`lane_fold=False` disables folding —
    same math, used for correctness A/B tests).
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
    lane_fold: bool = True
    use_pallas: bool = False
    # Geometry-register switch (PARITY.md): where the down-path channel
    # change happens. "resample" (default): inside Downsample's strided
    # projection — the reading the torch oracle verifies. "first_item":
    # Downsample keeps the source width and the level's FIRST resnet
    # changes width via a 1×1-conv shortcut — the plausible alternative
    # a-unet reading, supported so a pinned a-unet state_dict can be
    # imported under either. Parity mode only (requires lane_fold=False).
    channel_change: str = "resample"
    # Rematerialize item stacks in the backward pass (gradient checkpointing)
    # — trades FLOPs for activation memory so 2^18-sample training fits
    # larger batches per chip.
    use_remat: bool = False
    # Selective checkpoint policy (name of a jax.checkpoint_policies entry,
    # e.g. "dots_with_no_batch_dims_saveable"): keeps matmul outputs and
    # recomputes only the cheap elementwise/GN chains — less backward-pass
    # recompute than full remat for most of the memory savings. None = save
    # nothing (full remat). Only used when use_remat=True.
    remat_policy: Optional[str] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def _folds(self, length: int) -> Tuple[int, ...]:
        """Fold per level: limited by channel width AND by the largest
        power of two dividing the feature length at that level."""
        if not self.lane_fold:
            return tuple(1 for _ in self.channels)

        def pow2_div(n: int) -> int:
            return n & -n if n > 0 else 1

        folds = []
        level_len = length
        for i, c in enumerate(self.channels):
            level_len //= self.factors[i]
            f = min(fold_factor(c), pow2_div(level_len))
            # A level with context injection or attention must be unfolded.
            if (self.context_channels[i] > 0 or self.attentions[i] > 0
                    or self.cross_attentions[i] > 0):
                f = 1
            folds.append(f)
        return tuple(folds)

    @nn.compact
    def __call__(
        self,
        x: Array,
        sigmas: Optional[Array] = None,  # unused; σ arrives via features
        *,
        features: Optional[Array] = None,
        embedding: Optional[Array] = None,
        channels: Optional[Sequence[Optional[Array]]] = None,
        hidden: Optional[Tuple] = None,
        return_hidden: bool = False,
        **unused_kwargs,
    ) -> Array:
        """``hidden`` / ``return_hidden`` expose the down path (encoder) for
        cross-step reuse ("Faster Diffusion", Li et al., arXiv:2312.09608 —
        PAPERS.md): ``return_hidden=True`` additionally returns the opaque
        encoder state (bottleneck + skips, internal folded layout);
        ``hidden=state`` SKIPS the down path and decodes from that state
        with the CURRENT ``features`` (σ embedding) — the up path still
        re-runs in full. Adjacent denoising steps have nearly identical
        encoder features, so a sampler can run the encoder every k-th step
        (see VSampler ``encoder_reuse``); ~45% of the per-step FLOPs skip
        on reuse steps. Exact when ``hidden`` came from the same ``x``."""
        _check_unused_kwargs(unused_kwargs)
        num_levels = len(self.channels)
        contexts: Sequence[Optional[Array]] = default(
            channels, [None] * num_levels)
        # Pad the context list like the reference accepts
        # channels=[None]*inject_depth+[latent] (models.py:103).
        contexts = list(contexts) + [None] * (num_levels - len(contexts))

        length = x.shape[-1]
        total_factor = 1
        for f_ in self.factors:
            total_factor *= f_
        assert length % total_factor == 0, (
            f"input length {length} must be divisible by the product of the "
            f"downsampling factors ({total_factor})")
        folds = self._folds(length)
        in_fold = min(fold_factor(self.in_channels),
                      length & -length) if self.lane_fold else 1
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        if self.use_remat:
            policy = (getattr(jax.checkpoint_policies, self.remat_policy)
                      if self.remat_policy else None)
            stack_cls = nn.remat(ItemStack, policy=policy)
        else:
            stack_cls = ItemStack

        assert self.channel_change in ("resample", "first_item")
        first_item_cc = self.channel_change == "first_item"
        if first_item_cc:
            assert not self.lane_fold, (
                "channel_change='first_item' is a parity-mode geometry "
                "(PARITY.md register); build with lane_fold=False")

        def stack(i: int, name: str, in_c: Optional[int] = None):
            return stack_cls(
                channels=self.channels[i],
                in_channels=in_c,
                items=self.items[i],
                attentions=self.attentions[i],
                cross_attentions=self.cross_attentions[i],
                has_context=self.context_channels[i] > 0,
                use_modulation=self.use_modulation,
                resnet_groups=self.resnet_groups,
                attention_heads=self.attention_heads,
                attention_features=self.attention_features,
                fold=folds[i],
                use_pallas=self.use_pallas,
                name=name, **common)

        if hidden is not None:
            # Decoder-only pass: reuse a cached encoder state. The down-path
            # modules are simply not visited; flax resolves the up-path
            # modules by their explicit names, so the SAME params tree
            # serves both modes.
            h, skips_t = hidden
            skips = list(skips_t)
        else:
            h = jnp.swapaxes(x, 1, 2)  # [B, T, C] channels-last
            if self.dtype is not None:
                h = h.astype(self.dtype)
            h = fold(h, in_fold)

            skips = []
            prev_c, prev_f = self.in_channels, in_fold
            for i in range(num_levels):
                with jax.named_scope(f"unet_down_{i}"):
                    # Level 0 always changes width in the projection: the
                    # raw in_channels (e.g. stereo = 2) can't be group-
                    # normed, so the a-unet reading has an initial conv
                    # there regardless.
                    level_cc = first_item_cc and i > 0
                    down_features = prev_c if level_cc else self.channels[i]
                    h = Downsample(in_channels=prev_c,
                                   features=down_features,
                                   factor=self.factors[i],
                                   in_fold=prev_f, out_fold=folds[i],
                                   name=f"down_{i}", **common)(h)
                    h = stack(i, f"items_down_{i}",
                              in_c=prev_c if level_cc else None)(
                        h, features, embedding, contexts[i])
                prev_c, prev_f = self.channels[i], folds[i]
                if i < num_levels - 1:
                    skips.append(h)

        enc = (h, tuple(skips))  # captured BEFORE the up loop pops skips

        for i in reversed(range(num_levels)):
            with jax.named_scope(f"unet_up_{i}"):
                if i < num_levels - 1:
                    skip = skips.pop()
                    if self.use_modulation:
                        h = SkipModulate(channels=self.channels[i],
                                         fold=folds[i],
                                         name=f"skip_{i}", **common)(
                            h, skip, features)
                    else:
                        h = SkipCat(channels=self.channels[i], fold=folds[i],
                                    name=f"skip_{i}", **common)(h, skip)
                h = stack(i, f"items_up_{i}")(
                    h, features, embedding, contexts[i])
                out_c = self.channels[i - 1] if i > 0 else self.channels[0]
                out_f = folds[i - 1] if i > 0 else folds[0]
                h = Upsample(in_channels=self.channels[i], features=out_c,
                             factor=self.factors[i],
                             in_fold=folds[i], out_fold=out_f,
                             name=f"up_{i}", **common)(h)

        # Final projection to out_channels (folded conv3, then unfold).
        with jax.named_scope("unet_out"):
            c0, f0 = self.channels[0], folds[0]
            gn_s = self.param("out_gn_scale", nn.initializers.ones, (c0,),
                              self.param_dtype)
            gn_b = self.param("out_gn_bias", nn.initializers.zeros, (c0,),
                              self.param_dtype)
            k = self.param("out_kernel", nn.initializers.lecun_normal(),
                           (3, c0, self.out_channels), self.param_dtype)
            b = self.param("out_bias", nn.initializers.zeros,
                           (self.out_channels,), self.param_dtype)
            cast = (lambda a: a.astype(self.dtype)) if self.dtype else (
                lambda a: a)
            h = group_norm(h, f0, self.resnet_groups, cast(gn_s), cast(gn_b))
            h = nn.silu(h)
            h = conv3_as_matmuls(h, cast(fold_conv3_kernel(k, f0)),
                                 _tile(cast(b), f0))
            h = unfold(h, f0, self.out_channels)
        out = jnp.swapaxes(h, 1, 2).astype(x.dtype)  # back to [B, C, T]
        return (out, enc) if return_hidden else out


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
            # Only batch-leading arrays are doubled; non-array kwarg leaves
            # (bools, floats routed through conditioning) pass through.
            if getattr(t, "ndim", 0) >= 1 and t.shape[0] == b:
                return jnp.concatenate([t, t], axis=0)
            return t

        x2 = jnp.concatenate([x, x], axis=0)
        sigmas2 = double(sigmas) if sigmas is not None else sigmas
        emb2 = jnp.concatenate([embedding, fixed_b], axis=0)
        kwargs2 = jax.tree_util.tree_map(double, kwargs)
        res2 = self.inner(x2, sigmas2, embedding=emb2, **kwargs2)
        if kwargs.get("return_hidden", False):
            # Encoder-reuse composes with guidance: the cached state is the
            # DOUBLED pass's (its leaves carry batch 2b, so double() above
            # passes a fed-back `hidden` through untouched on reuse steps).
            out2, enc = res2
            out, out_masked = out2[:b], out2[b:]
            return out_masked + embedding_scale * (out - out_masked), enc
        out, out_masked = res2[:b], res2[b:]
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
