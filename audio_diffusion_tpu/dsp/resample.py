"""Windowed-sinc resampling, XLA-native.

Behavioral parity with reference utils.py:82-117 (itself adapted from
torchaudio): a bank of `factor_out` polyphase sinc kernels applied as ONE
strided convolution — which XLA maps straight onto the MXU (the kernel bank
is a [K, 1, factor_out] matmul per frame). Kernel construction is pure
numpy-on-trace (static factors), so everything fuses under jit.
"""
from __future__ import annotations

from math import ceil, pi

import jax.numpy as jnp
from jax import Array

from ..ops.conv import conv1d

__all__ = ["resample", "downsample", "upsample"]


def _sinc_kernels(factor_in: int, factor_out: int, rolloff: float,
                  lowpass_filter_width: int, dtype) -> Array:
    """Polyphase kernel bank [K, 1, factor_out] (channels-last conv layout)."""
    base_factor = min(factor_in, factor_out) * rolloff
    width = ceil(lowpass_filter_width * factor_in / base_factor)
    # Kernel taps in input-sample units, one row per output phase.
    idx = jnp.arange(-width, width + factor_in, dtype=jnp.float32) / factor_in
    phase = jnp.arange(0, -factor_out, -1, dtype=jnp.float32) / factor_out
    t = phase[:, None] + idx[None, :]  # [factor_out, K]
    t = jnp.clip(t * base_factor, -lowpass_filter_width,
                 lowpass_filter_width) * pi
    window = jnp.cos(t / lowpass_filter_width / 2) ** 2
    scale = base_factor / factor_in
    kernels = jnp.where(t == 0, 1.0, jnp.sin(t) / jnp.where(t == 0, 1.0, t))
    kernels = kernels * window * scale
    # [factor_out, K] -> conv kernel [K, in=1, out=factor_out]
    return kernels.T[:, None, :].astype(dtype)


def resample(waveforms: Array, factor_in: int, factor_out: int,
             rolloff: float = 0.99, lowpass_filter_width: int = 6) -> Array:
    """Sinc-interpolation resample of [b, c, t] by factor_out/factor_in.

    Matches reference utils.py:82-109 numerically (same kernel formula,
    padding, and polyphase interleave).
    """
    b, c, length = waveforms.shape
    length_target = int(factor_out * length / factor_in)
    base_factor = min(factor_in, factor_out) * rolloff
    width = ceil(lowpass_filter_width * factor_in / base_factor)

    kernels = _sinc_kernels(factor_in, factor_out, rolloff,
                            lowpass_filter_width, waveforms.dtype)
    x = waveforms.reshape(b * c, length, 1)  # channels-last mono conv
    x = jnp.pad(x, ((0, 0), (width, width + factor_in), (0, 0)))
    y = conv1d(x, kernels, stride=factor_in)  # [(bc), L, factor_out]
    # Polyphase interleave: output sample l·factor_out + k comes from
    # frame l, phase k (reference's "(b c) k l -> b c (l k)").
    y = y.reshape(b, c, -1)
    return y[..., :length_target]


def downsample(waveforms: Array, factor: int, **kwargs) -> Array:
    return resample(waveforms, factor_in=factor, factor_out=1, **kwargs)


def upsample(waveforms: Array, factor: int, **kwargs) -> Array:
    return resample(waveforms, factor_in=1, factor_out=factor, **kwargs)
