"""Ready-made model configurations from the reference README.

The reference documents its model configs as inline README snippets
(reference README.md:21-163); these presets reproduce them as plain kwargs
dicts so a user can do::

    from audio_diffusion_tpu import DiffusionModel, UNetV0, presets

    model = DiffusionModel(net_t=UNetV0, **presets.UNCONDITIONAL_48K)
    model = DiffusionModel(net_t=UNetV0, **{**presets.TEXT_CONDITIONAL_48K,
                                            "channels": [...custom...]})

All values match the reference snippets; README.md:3 marks them
"indicative and untested" (real configs live in the Moûsai paper), so treat
them as starting points.
"""
from __future__ import annotations

# The 9-level U-Net geometry shared by every reference README config:
# ×4096 total downsampling of 2^18-sample (≈5.5 s at 48 kHz) audio.
_NET_9LEVEL = dict(
    channels=[8, 32, 64, 128, 256, 512, 512, 1024, 1024],
    factors=[1, 4, 4, 4, 2, 2, 2, 2, 2],
    items=[1, 2, 2, 2, 2, 2, 2, 4, 4],
)

# Unconditional audio generation (reference README.md:21-35): self-attention
# at the 4 coarse levels.
UNCONDITIONAL_48K = dict(
    in_channels=2,
    **_NET_9LEVEL,
    attentions=[0, 0, 0, 0, 0, 1, 1, 1, 1],
    attention_heads=8,
    attention_features=64,
)

# Text-conditional generation with T5 embeddings + classifier-free guidance
# (reference README.md:47-76). Train with
# ``model(audio, text=[...], embedding_mask_proba=0.1)``; sample with
# ``model.sample(noise, text=[...], embedding_scale=5.0)``.
TEXT_CONDITIONAL_48K = dict(
    **UNCONDITIONAL_48K,
    cross_attentions=[0, 0, 0, 1, 1, 1, 1, 1, 1],
    use_text_conditioning=True,
    use_embedding_cfg=True,
    embedding_max_length=64,
    embedding_features=768,
)

# ×16 upsampler, e.g. 3 kHz -> 48 kHz (reference README.md:85-95 — no
# attention levels in the reference snippet). Use with
# DiffusionUpsampler(net_t=UNetV0, upsample_factor=16, **this).
UPSAMPLER_16X = dict(in_channels=2, **_NET_9LEVEL)

# Mel-spectrogram vocoder (reference README.md:112-124 — in_channels is
# forced to 1 internally; no attention levels in the reference snippet).
# Use with DiffusionVocoder(net_t=UNetV0, **this).
VOCODER_48K = dict(
    mel_n_fft=1024,
    mel_channels=80,
    mel_sample_rate=48000,
    mel_normalize_log=True,
    **_NET_9LEVEL,
)

# Diffusion autoencoder with latent injection at depth 6
# (reference README.md:139-160). Use with
# DiffusionAE(encoder=MelEncoder1d(...), inject_depth=6, net_t=UNetV0,
# **this).
AUTOENCODER_48K = dict(in_channels=2, **_NET_9LEVEL)

__all__ = [
    "UNCONDITIONAL_48K",
    "TEXT_CONDITIONAL_48K",
    "UPSAMPLER_16X",
    "VOCODER_48K",
    "AUTOENCODER_48K",
]
