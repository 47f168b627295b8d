"""Preset configs mirror the reference README snippets and construct cleanly."""
import jax
import jax.numpy as jnp

from audio_diffusion_tpu import (DiffusionAE, DiffusionModel,
                                 DiffusionUpsampler, DiffusionVocoder,
                                 MelEncoder1d, UNetV0, presets)


def test_presets_construct():
    m = DiffusionModel(net_t=UNetV0, **presets.UNCONDITIONAL_48K)
    assert m.net.in_channels == 2
    m = DiffusionModel(net_t=UNetV0, **presets.TEXT_CONDITIONAL_48K)
    assert m.net.text_encoder is not None
    up = DiffusionUpsampler(net_t=UNetV0, upsample_factor=16,
                            **presets.UPSAMPLER_16X)
    assert up.upsample_factor == 16
    voc = DiffusionVocoder(net_t=UNetV0, **presets.VOCODER_48K)
    # Channels fold into the batch: the net sees 1 audio channel (the mel
    # conditioning channel is appended inside the plugin).
    assert voc.net.in_channels == 1
    enc = MelEncoder1d(in_channels=2, channels=32, out_channels=8)
    ae = DiffusionAE(encoder=enc, inject_depth=6, net_t=UNetV0,
                     **presets.AUTOENCODER_48K)
    assert ae.inject_depth == 6


def test_preset_geometry_runs_tiny_length():
    """The full 9-level preset geometry executes on a minimal-length input
    (4096 = the total downsampling factor)."""
    m = DiffusionModel(net_t=UNetV0, **presets.UNCONDITIONAL_48K)
    x = jax.random.normal(jax.random.key(0), (1, 2, 4096))
    loss = m(x)
    assert jnp.isfinite(loss)
