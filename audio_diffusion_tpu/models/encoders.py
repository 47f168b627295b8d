"""Native encoders for DiffusionAE.

The reference relies on the external `audio-encoders-pytorch` package
(MelE1d + TanhBottleneck, reference README.md:137-151,
tests/testcustomloss.py:4-19). This module provides a TPU-native equivalent
honoring the EncoderBase contract (`out_channels`, `downsample_factor`,
encode returning (latent, info)).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..dsp import MelSpectrogram
from ..ops.conv import Conv1d
from ..ops.unet import Downsample, ResnetItem
from ..utils import prod
from .model import EncoderBase

__all__ = ["MelEncoder1d", "TanhBottleneck"]


def TanhBottleneck(x: Array) -> Array:
    """Squash latents to (-1, 1) — the reference's TanhBottleneck."""
    return jnp.tanh(x)


class _MelEncoderModule(nn.Module):
    channels: int
    out_channels: int
    factors: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    resnet_groups: int = 8
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        """mel: [b, c·f, l] (channel-folded mel) -> latent [b, out, l/prod(f)]."""
        h = jnp.swapaxes(mel, 1, 2)  # [b, l, c·f]
        h = Conv1d(self.channels, kernel_size=3, padding=1,
                   dtype=self.dtype, param_dtype=self.param_dtype)(h)
        for factor, blocks in zip(self.factors, self.num_blocks):
            for _ in range(blocks):
                h = ResnetItem(channels=self.channels,
                               groups=self.resnet_groups, dtype=self.dtype,
                               param_dtype=self.param_dtype)(h)
            h = Downsample(in_channels=self.channels, features=self.channels,
                           factor=factor, dtype=self.dtype,
                           param_dtype=self.param_dtype)(h)
        h = nn.GroupNorm(num_groups=self.resnet_groups, dtype=self.dtype,
                         param_dtype=self.param_dtype)(h)
        h = nn.silu(h)
        h = Conv1d(self.out_channels, kernel_size=3, padding=1,
                   dtype=self.dtype, param_dtype=self.param_dtype)(h)
        return jnp.swapaxes(h, 1, 2)  # [b, out, l']


class MelEncoder1d(EncoderBase):
    """Waveform -> mel -> conv-resnet stack -> bottleneck latent.

    `downsample_factor = mel_hop_length · prod(factors)` so the latent length
    relates to the waveform length exactly as DiffusionAE expects
    (reference models.py:95, 118).
    """

    def __init__(
        self,
        in_channels: int,
        channels: int = 512,
        out_channels: int = 32,
        factors: Sequence[int] = (2,),
        num_blocks: Sequence[int] = (2,),
        mel_channels: int = 80,
        mel_n_fft: int = 1024,
        mel_hop_length: Optional[int] = None,
        mel_sample_rate: int = 48000,
        mel_normalize_log: bool = True,
        bottleneck: Optional[Callable[[Array], Array]] = TanhBottleneck,
        dtype: Optional[Any] = None,
    ):
        assert len(factors) == len(num_blocks)
        mel_hop_length = mel_hop_length or mel_n_fft // 4
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.downsample_factor = mel_hop_length * prod(list(factors))
        self.bottleneck = bottleneck
        self.to_mel = MelSpectrogram(
            n_fft=mel_n_fft,
            hop_length=mel_hop_length,
            win_length=mel_n_fft,
            sample_rate=mel_sample_rate,
            n_mel_channels=mel_channels,
            normalize_log=mel_normalize_log,
        )
        self.module = _MelEncoderModule(
            channels=channels,
            out_channels=out_channels,
            factors=tuple(factors),
            num_blocks=tuple(num_blocks),
            dtype=dtype,
        )

    def _mel_folded(self, x: Array) -> Array:
        mel = self.to_mel(x)  # [b, c, f, l]
        b, c, f, l = mel.shape
        return mel.reshape(b, c * f, l)

    def init(self, key: Array, x: Array) -> Dict:
        return self.module.init(key, self._mel_folded(x))

    def apply(self, params: Dict, x: Array, with_info: bool = False):
        latent = self.module.apply(params, self._mel_folded(x))
        if self.bottleneck is not None:
            latent = self.bottleneck(latent)
        return (latent, {}) if with_info else latent

    def __call__(self, params: Dict, x: Array, with_info: bool = False):
        return self.apply(params, x, with_info)
