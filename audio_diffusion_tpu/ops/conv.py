"""1-D convolution primitives, channels-last, with torch-matching geometry.

TPU-first layout: activations are [B, L, C] so the channel axis maps to TPU
lanes (128-wide) and XLA tiles the contraction onto the MXU. The reference's
conv geometry (torch Conv1d / ConvTranspose1d semantics — output lengths,
padding conventions) is preserved exactly so that configurations and
checkpoints translate 1:1:

- conv1d:            out_len = (L + 2p − d·(k−1) − 1)//s + 1
- conv_transpose1d:  out_len = (L−1)·s − 2p + k

Reference call sites: a-unet resnet/down/up blocks (SURVEY.md §2.9), LTPlugin
(components.py:126-143), vocoder `to_flat` (models.py:194-201), sinc resample
(utils.py:107).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import Array, lax

__all__ = ["conv1d", "conv_transpose1d", "Conv1d", "ConvTranspose1d"]


def conv1d(
    x: Array,
    kernel: Array,
    stride: int = 1,
    padding: Union[int, Sequence[int]] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> Array:
    """Channels-last conv1d. x: [B, L, Cin], kernel: [K, Cin/groups, Cout]."""
    if isinstance(padding, int):
        padding = (padding, padding)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=(tuple(padding),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


def conv_transpose1d(
    x: Array,
    kernel: Array,
    stride: int = 1,
    padding: int = 0,
) -> Array:
    """Channels-last transposed conv with torch ConvTranspose1d semantics.

    x: [B, L, Cin], kernel: [K, Cin, Cout] (note: already in conv layout; a
    torch checkpoint's [Cin, Cout, K] weight maps via transpose(2, 0, 1)).
    out_len = (L−1)·stride − 2·padding + K.

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel — the XLA-native formulation (maps to the same MXU matmuls as
    forward conv; no scatter).
    """
    k = kernel.shape[0]
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding
    return lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=((pad_lo, pad_hi),),
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


class Conv1d(nn.Module):
    """Linen conv1d on [B, L, C] with torch-style int padding and modes.

    ``padding_mode='reflect'`` reflect-pads before a VALID conv (used by
    LTPlugin, reference components.py:126-135).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_features // self.groups, self.features),
            self.param_dtype,
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        if self.padding_mode == "reflect" and self.padding > 0:
            x = jnp.pad(
                x, ((0, 0), (self.padding, self.padding), (0, 0)),
                mode="reflect")
            pad = 0
        else:
            pad = self.padding
        y = conv1d(x, kernel, self.stride, pad, self.dilation, self.groups)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype)
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


class ConvTranspose1d(nn.Module):
    """Linen transposed conv on [B, L, C] with torch semantics."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features),
            self.param_dtype,
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = conv_transpose1d(x, kernel, self.stride, self.padding)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype)
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y
