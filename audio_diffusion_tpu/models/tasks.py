"""Task models: DiffusionAE, DiffusionUpsampler, DiffusionVocoder, DiffusionAR.

Behavioral parity with reference models.py:70-250; each model owns any extra
trainable pieces in its params pytree (e.g. the vocoder's `to_flat` learned
transposed conv — reference models.py:194-201, which must be checkpointed,
SURVEY.md §3.4).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import Array

from ..diffusion import ARVDiffusion, ARVSampler
from ..dsp import MelSpectrogram, downsample, upsample
from ..ops.components import AppendChannelsPlugin
from ..ops.conv import ConvTranspose1d
from ..utils import (closest_power_2, default, dequant_pcm16, exists,
                     groupby)
from .model import AdapterBase, DiffusionModel, EncoderBase

__all__ = [
    "DiffusionAE",
    "DiffusionUpsampler",
    "DiffusionVocoder",
    "DiffusionAR",
]


class DiffusionAE(DiffusionModel):
    """Diffusion autoencoder: the encoder latent is injected as context
    channels at `inject_depth` (reference models.py:70-131)."""

    def __init__(
        self,
        in_channels: int,
        channels: Sequence[int],
        encoder: EncoderBase,
        inject_depth: int,
        latent_factor: Optional[int] = None,
        adapter: Optional[AdapterBase] = None,
        **kwargs,
    ):
        assert 0 <= inject_depth < len(channels), (
            f"inject_depth={inject_depth} out of range for a "
            f"{len(channels)}-level net (0..{len(channels) - 1})")
        context_channels = [0] * len(channels)
        context_channels[inject_depth] = encoder.out_channels
        super().__init__(
            in_channels=in_channels,
            channels=channels,
            context_channels=context_channels,
            **kwargs,
        )
        self.in_channels = in_channels
        self.encoder = encoder
        self.inject_depth = inject_depth
        self.latent_factor = default(latent_factor,
                                     getattr(encoder, "downsample_factor"))
        self.adapter = adapter

    # -------------------------------------------------------------- params
    def init_params(self, key: Array, x: Array, **kwargs) -> Dict:
        key_enc, key_net = jax.random.split(key)
        encoder_params = self.encoder.init(key_enc, x)
        latent, _ = self.encoder.apply(encoder_params, x, with_info=True)
        channels = [None] * self.inject_depth + [latent]
        x_in = self.adapter.encode(x) if exists(self.adapter) else x
        kwargs.pop("channels", None)
        net_params = self.diffusion.init_net_params(
            key_net, x_in, channels=channels, **kwargs)
        return {"net": net_params, "encoder": encoder_params}

    # ---------------------------------------------------------------- loss
    def loss(self, params: Dict, key: Array, x: Array,
             with_info: bool = False, **kwargs):
        assert "channels" not in kwargs, (
            "DiffusionAE owns the channels= conditioning (it injects its "
            "encoder latent at inject_depth, reference models.py:103); "
            "pass other context through the encoder or a different kwarg")
        x = dequant_pcm16(x)
        latent, info = self.encoder.apply(params["encoder"], x, with_info=True)
        channels = [None] * self.inject_depth + [latent]
        x_in = self.adapter.encode(x) if exists(self.adapter) else x
        loss = self.diffusion.loss(
            params["net"], key, x_in, channels=channels, **kwargs)
        return (loss, info) if with_info else loss

    # ------------------------------------------------------- encode/decode
    def encode(self, x, with_info: bool = False):
        assert self.params is not None, "initialize the model first"
        return self._jitted(
            "encode", self.encoder.apply,
            params=self.params["encoder"], x=jnp.asarray(x),
            with_info=with_info)

    def decode(self, latent, key: Optional[Array] = None,
               params: Optional[Dict] = None, **kwargs) -> Array:
        params = default(params, self.params)
        assert params is not None, "initialize the model first"
        assert "channels" not in kwargs, (
            "DiffusionAE.decode conditions on the given latent itself; "
            "channels= cannot be overridden")
        latent = jnp.asarray(latent)
        key = key if key is not None else self.next_key()

        def run_decode(params, latent, key, **kw):
            # Shapes derive from the TRACED latent (static at trace time) —
            # never from call-site closure state: the jit cache reuses this
            # function across calls with different latent shapes.
            b = latent.shape[0]
            noise_length = closest_power_2(
                latent.shape[2] * self.latent_factor)
            noise = jax.random.normal(
                key, (b, self.in_channels, noise_length), latent.dtype)
            channels = [None] * self.inject_depth + [latent]
            out = self.sampler.sample(
                params["net"], noise, channels=channels, **kw)
            return self.adapter.decode(out) if exists(self.adapter) else out

        return self._jitted("decode", run_decode,
                            params=params, latent=latent, key=key,
                            **kwargs)


class DiffusionUpsampler(DiffusionModel):
    """Bandwidth extension via diffusion: trains on a lossy
    downsample→upsample round-trip appended as conditioning channels
    (reference models.py:134-165)."""

    def __init__(self, in_channels: int, upsample_factor: int,
                 net_t: Callable, **kwargs):
        self.upsample_factor = upsample_factor
        super().__init__(
            net_t=AppendChannelsPlugin(net_t, channels=in_channels),
            in_channels=in_channels,
            **kwargs,
        )
        self.in_channels = in_channels

    def reupsample(self, x: Array) -> Array:
        return upsample(downsample(x, factor=self.upsample_factor),
                        factor=self.upsample_factor)

    def init_params(self, key: Array, x: Array, **kwargs) -> Dict:
        return {"net": self.diffusion.init_net_params(
            key, x, append_channels=self.reupsample(x), **kwargs)}

    def loss(self, params: Dict, key: Array, x: Array, **kwargs) -> Array:
        x = dequant_pcm16(x)
        reupsampled = self.reupsample(x)
        return self.diffusion.loss(
            params["net"], key, x, append_channels=reupsampled, **kwargs)

    def sample(self, downsampled, key: Optional[Array] = None,
               params: Optional[Dict] = None, **kwargs) -> Array:
        params = default(params, self.params)
        assert params is not None, "initialize the model first"
        key = key if key is not None else self.next_key()

        def run_sample(params, downsampled, key, **kw):
            reupsampled = upsample(downsampled, factor=self.upsample_factor)
            noise = jax.random.normal(
                key, reupsampled.shape, reupsampled.dtype)
            return self.sampler.sample(
                params["net"], noise, append_channels=reupsampled, **kw)

        return self._jitted("sample", run_sample,
                            params=params,
                            downsampled=jnp.asarray(downsampled), key=key,
                            **self._process_cond(kwargs))


class DiffusionVocoder(DiffusionModel):
    """Mel-spectrogram -> waveform diffusion vocoder
    (reference models.py:168-224). Channels fold into the batch; the mel is
    stretched to waveform length by a LEARNED bias-free transposed conv
    (`to_flat`) and appended as one conditioning channel."""

    def __init__(
        self,
        net_t: Callable,
        mel_channels: int,
        mel_n_fft: int,
        mel_hop_length: Optional[int] = None,
        mel_win_length: Optional[int] = None,
        in_channels: int = 1,  # Ignored: channels are automatically batched.
        **kwargs,
    ):
        mel_hop_length = default(mel_hop_length, mel_n_fft // 4)
        mel_win_length = default(mel_win_length, mel_n_fft)
        mel_kwargs, kwargs = groupby("mel_", kwargs)
        super().__init__(
            net_t=AppendChannelsPlugin(net_t, channels=1),
            in_channels=1,
            **kwargs,
        )
        self.to_spectrogram = MelSpectrogram(
            n_fft=mel_n_fft,
            hop_length=mel_hop_length,
            win_length=mel_win_length,
            n_mel_channels=mel_channels,
            **mel_kwargs,
        )
        self.to_flat = ConvTranspose1d(
            features=1,
            kernel_size=mel_win_length,
            stride=mel_hop_length,
            padding=(mel_win_length - mel_hop_length) // 2,
            use_bias=False,
        )

    def _flatten(self, to_flat_params: Dict, spec: Array) -> Array:
        """[N, f, l] mel -> [N, 1, T] flat conditioning channel."""
        h = jnp.swapaxes(spec, 1, 2)  # [N, l, f]
        h = self.to_flat.apply(to_flat_params, h)  # [N, T, 1]
        return jnp.swapaxes(h, 1, 2)

    def init_params(self, key: Array, x: Array, **kwargs) -> Dict:
        key_flat, key_net = jax.random.split(key)
        spec = self.to_spectrogram(x)
        b, c = spec.shape[0], spec.shape[1]
        spec = spec.reshape((b * c,) + spec.shape[2:])
        to_flat_params = self.to_flat.init(
            key_flat, jnp.swapaxes(spec, 1, 2))
        flat = self._flatten(to_flat_params, spec)
        x_folded = x.reshape(b * c, 1, x.shape[-1])
        net_params = self.diffusion.init_net_params(
            key_net, x_folded, append_channels=flat, **kwargs)
        return {"net": net_params, "to_flat": to_flat_params}

    def loss(self, params: Dict, key: Array, x: Array, **kwargs) -> Array:
        x = dequant_pcm16(x)
        spec = self.to_spectrogram(x)  # [b, c, f, l]
        b, c = spec.shape[0], spec.shape[1]
        spec = spec.reshape((b * c,) + spec.shape[2:])
        flat = self._flatten(params["to_flat"], spec)
        x_folded = x.reshape(b * c, 1, x.shape[-1])
        return self.diffusion.loss(
            params["net"], key, x_folded, append_channels=flat, **kwargs)

    def sample(self, spectrogram, key: Optional[Array] = None,
               params: Optional[Dict] = None, **kwargs) -> Array:
        params = default(params, self.params)
        assert params is not None, "initialize the model first"
        spectrogram = jnp.asarray(spectrogram)
        key = key if key is not None else self.next_key()

        def run_sample(params, spectrogram, key, **kw):
            lead = spectrogram.shape[:-2]  # pack "* f l"
            spec = spectrogram.reshape((-1,) + spectrogram.shape[-2:])
            flat = self._flatten(params["to_flat"], spec)
            noise = jax.random.normal(key, flat.shape, flat.dtype)
            waveform = self.sampler.sample(
                params["net"], noise, append_channels=flat, **kw)
            return waveform.reshape(lead + (waveform.shape[-1],))

        return self._jitted("sample", run_sample,
                            params=params, spectrogram=spectrogram,
                            key=key, **self._process_cond(kwargs))


class DiffusionAR(DiffusionModel):
    """Autoregressive diffusion model (reference models.py:227-250):
    +1 σ input channel, no time conditioning / modulation."""

    def __init__(
        self,
        in_channels: int,
        length: int,
        num_splits: int,
        diffusion_t: Callable = ARVDiffusion,
        sampler_t: Callable = ARVSampler,
        **kwargs,
    ):
        super().__init__(
            in_channels=in_channels + 1,
            out_channels=in_channels,
            diffusion_t=diffusion_t,
            diffusion_length=length,
            diffusion_num_splits=num_splits,
            sampler_t=sampler_t,
            sampler_in_channels=in_channels,
            sampler_length=length,
            sampler_num_splits=num_splits,
            use_time_conditioning=False,
            use_modulation=False,
            **kwargs,
        )
