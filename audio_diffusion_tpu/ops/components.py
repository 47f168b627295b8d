"""Network factories: UNetV0, LTPlugin, AppendChannelsPlugin.

API parity with reference components.py:34-180: same factory signatures, same
flat-kwargs conventions, same plugin wrapping order (XUNet -> CFG -> [text] ->
time conditioning, reference components.py:64-76). Factories return a
:class:`~audio_diffusion_tpu.ops.net.Net` (linen module + call adapter)
instead of an nn.Module.

Text conditioning note: the reference's TextConditioningPlugin runs a frozen
T5 encoder inside every net call (SURVEY.md §3.3 flags this as a per-step
host-sync inefficiency). Here text is encoded ONCE per model call, host-side,
by attaching a `text_encoder` to the Net; the model layer converts `text=` to
`embedding=` before entering jit. Output parity is unaffected (the encoder is
frozen and deterministic).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..utils import default, exists
from .conv import Conv1d, ConvTranspose1d
from .net import Net
from .unet import (
    AppendChannelsWrapper,
    ClassifierFreeGuidanceWrapper,
    TimeConditioningWrapper,
    XUNet,
)

__all__ = ["UNetV0", "LTPlugin", "AppendChannelsPlugin", "XUNet"]


def UNetV0(
    dim: int,
    in_channels: int,
    channels: Sequence[int],
    factors: Sequence[int],
    items: Sequence[int],
    attentions: Optional[Sequence[int]] = None,
    cross_attentions: Optional[Sequence[int]] = None,
    context_channels: Optional[Sequence[int]] = None,
    attention_features: Optional[int] = None,
    attention_heads: Optional[int] = None,
    embedding_features: Optional[int] = None,
    resnet_groups: int = 8,
    use_modulation: bool = True,
    modulation_features: int = 1024,
    embedding_max_length: Optional[int] = None,
    use_time_conditioning: bool = True,
    use_embedding_cfg: bool = False,
    use_text_conditioning: bool = False,
    out_channels: Optional[int] = None,
    text_encoder: Optional[Any] = None,
    lane_fold: bool = True,
    use_pallas: bool = False,
    use_remat: bool = False,
    remat_policy: Optional[str] = None,
    channel_change: str = "resample",
    dtype: Optional[Any] = None,
    param_dtype: Any = jnp.float32,
) -> Net:
    """Declarative U-Net builder (reference components.py:34-105).

    Returns a Net; same per-layer list conventions as the reference
    (`channels, factors, items, attentions, cross_attentions,
    context_channels` must be equal length).
    """
    assert dim in (1, 2, 3), (
        f"UNetV0 supports dim 1 (audio), 2 (images), or 3 (volumes), "
        f"got {dim}")

    num_layers = len(channels)
    attentions = default(attentions, [0] * num_layers)
    cross_attentions = default(cross_attentions, [0] * num_layers)
    context_channels = default(context_channels, [0] * num_layers)
    xs = (channels, factors, items, attentions, cross_attentions,
          context_channels)
    assert all(len(x) == num_layers for x in xs), (
        "channels/factors/items/attentions/cross_attentions/context_channels "
        "must all have the same length")

    out_channels = default(out_channels, in_channels)

    unet_kwargs = dict(
        in_channels=in_channels,
        out_channels=out_channels,
        channels=tuple(channels),
        factors=tuple(factors),
        items=tuple(items),
        attentions=tuple(attentions),
        cross_attentions=tuple(cross_attentions),
        context_channels=tuple(context_channels),
        attention_heads=default(attention_heads, 8),
        attention_features=default(attention_features, 64),
        resnet_groups=resnet_groups,
        use_modulation=use_modulation,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    if dim == 1:
        module: nn.Module = XUNet(
            lane_fold=lane_fold, use_pallas=use_pallas, use_remat=use_remat,
            remat_policy=remat_policy, channel_change=channel_change,
            **unet_kwargs)
    elif dim == 2:
        assert channel_change == "resample", (
            "channel_change is a dim=1 parity-mode switch")
        from .unet2d import XUNet2d
        assert not use_pallas, "use_pallas is implemented for dim=1 only"
        module = XUNet2d(use_remat=use_remat, remat_policy=remat_policy,
                         **unet_kwargs)
    else:
        from .unet3d import XUNet3d
        assert not use_pallas, "use_pallas is implemented for dim=1 only"
        module = XUNet3d(use_remat=use_remat, remat_policy=remat_policy,
                         **unet_kwargs)

    if use_embedding_cfg:
        assert exists(embedding_max_length), (
            "use_embedding_cfg requires embedding_max_length")
        assert exists(embedding_features), (
            "use_embedding_cfg requires embedding_features")
        module = ClassifierFreeGuidanceWrapper(
            inner=module,
            embedding_max_length=embedding_max_length,
            embedding_features=embedding_features,
            dtype=dtype, param_dtype=param_dtype,
        )

    if use_time_conditioning:
        assert use_modulation, (
            "use_time_conditioning requires use_modulation=True")
        module = TimeConditioningWrapper(
            inner=module,
            modulation_features=modulation_features,
            dtype=dtype, param_dtype=param_dtype,
        )

    net = Net(module, in_channels=in_channels, out_channels=out_channels,
              uses_sigma=use_time_conditioning, compute_dtype=dtype)

    if use_text_conditioning:
        if text_encoder is None:
            from .text import T5TextEncoder
            text_encoder = T5TextEncoder(
                max_length=default(embedding_max_length, 64))
        net.text_encoder = text_encoder
    return net


class _LTModule(nn.Module):
    """Learned-transform sandwich: frame conv -> inner net -> transposed conv.

    Geometry matches reference components.py:126-143: reflect-padded
    Conv(k=window, stride, p=win/2−stride/2, no bias) expanding channels
    ×num_filters, and the mirrored ConvTranspose back.
    """

    inner: nn.Module
    in_channel_transform: int
    out_channels: int
    window_length: int
    stride: int
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, sigmas: Optional[Array] = None,
                 **kwargs) -> Array:
        padding = self.window_length // 2 - self.stride // 2
        h = jnp.swapaxes(x, 1, 2)  # [B, T, C]
        h = Conv1d(self.in_channel_transform, kernel_size=self.window_length,
                   stride=self.stride, padding=padding,
                   padding_mode="reflect", use_bias=False, name="encode",
                   dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = jnp.swapaxes(h, 1, 2)  # back to [B, C, T] for the inner net
        h = self.inner(h, sigmas, **kwargs)
        enc = None
        if kwargs.get("return_hidden", False):
            # Encoder-reuse passthrough: the cached state is the inner
            # net's (its input is this plugin's learned framing of x, which
            # changes per step like x itself does).
            h, enc = h
        h = jnp.swapaxes(h, 1, 2)
        h = ConvTranspose1d(self.out_channels, kernel_size=self.window_length,
                            stride=self.stride, padding=padding,
                            use_bias=False, name="decode",
                            dtype=self.dtype, param_dtype=self.param_dtype)(h)
        out = jnp.swapaxes(h, 1, 2)
        return (out, enc) if enc is not None else out


def LTPlugin(net_t: Callable, num_filters: int, window_length: int,
             stride: int) -> Callable[..., Net]:
    """Learned Transform Plugin (reference components.py:113-159)."""

    def _factory(dim: int = 1, in_channels: int = 1,
                 out_channels: Optional[int] = None, **kwargs) -> Net:
        out_channels = default(out_channels, in_channels)
        in_channel_transform = in_channels * num_filters
        out_channel_transform = out_channels * num_filters
        inner_net = net_t(
            dim=dim,
            in_channels=in_channel_transform,
            out_channels=out_channel_transform,
            **kwargs,
        )
        module = _LTModule(
            inner=inner_net.module,
            in_channel_transform=in_channel_transform,
            out_channels=out_channels,
            window_length=window_length,
            stride=stride,
            # Follow the inner net's compute dtype: cast_inference_params
            # casts ALL kernels (incl. encode/decode here) to it, so the
            # framing convs must compute in it too.
            dtype=inner_net.compute_dtype,
        )
        net = Net(module, in_channels=in_channels, out_channels=out_channels,
                  uses_sigma=inner_net.uses_sigma,
                  compute_dtype=inner_net.compute_dtype)
        if getattr(inner_net, "text_encoder", None) is not None:
            net.text_encoder = inner_net.text_encoder
        return net

    return _factory


def AppendChannelsPlugin(net_t: Callable, channels: int) -> Callable[..., Net]:
    """Concat `append_channels` to the net input (reference
    components.py:162-180; used by DiffusionUpsampler/DiffusionVocoder)."""

    def _factory(in_channels: int, out_channels: Optional[int] = None,
                 **kwargs) -> Net:
        out_channels = default(out_channels, in_channels)
        inner_net = net_t(
            in_channels=in_channels + channels,
            out_channels=out_channels,
            **kwargs,
        )
        module = AppendChannelsWrapper(inner=inner_net.module)
        net = Net(module, in_channels=in_channels, out_channels=out_channels,
                  uses_sigma=inner_net.uses_sigma,
                  compute_dtype=inner_net.compute_dtype)
        if getattr(inner_net, "text_encoder", None) is not None:
            net.text_encoder = inner_net.text_encoder
        return net

    return _factory
