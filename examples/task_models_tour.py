"""Tour of the task-model families: upsampler, vocoder, autoencoder,
inpainter — every reference README workflow in one runnable script
(reference README.md:85-224), writing results with the native WAV writer.

Tiny configs so it runs on CPU in a few minutes:

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo:/root/.axon_site \
        python examples/task_models_tour.py

All models are untrained — the outputs are not audio you'd want to hear;
the point is the complete wiring of each workflow (shapes in the comments).
Swap in trained checkpoints (model.load / Trainer) for real use.
"""
from __future__ import annotations

import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp

from audio_diffusion_tpu import (DiffusionAE, DiffusionUpsampler,
                                 DiffusionVocoder, MelEncoder1d, MelSpectrogram,
                                 UNetV0, VInpainter)
from audio_diffusion_tpu.data import wav_write

SR = 16000
LENGTH = 2**14
out_dir = Path(tempfile.mkdtemp(prefix="tour_"))
key = jax.random.key(0)
NET = dict(net_t=UNetV0, channels=[8, 32, 64], factors=[1, 4, 4],
           items=[1, 2, 2], modulation_features=64)

t = jnp.linspace(0, LENGTH / SR, LENGTH)
audio = 0.5 * jnp.sin(2 * jnp.pi * 440 * t)[None, None, :]  # [1, 1, 16384]

# --- Upsampler: low-rate audio -> full-rate (reference README.md:85-102)
up = DiffusionUpsampler(in_channels=1, upsample_factor=4, **NET)
loss = up(audio)                                   # trains on full-rate
low = audio[..., ::4]                              # [1, 1, 4096]
full = up.sample(low, num_steps=10)                # [1, 1, 16384]
wav_write(out_dir / "upsampled.wav", jax.device_get(full)[0], SR)
print(f"upsampler: {low.shape} -> {full.shape}, train loss {loss:.3f}")

# --- Vocoder: mel spectrogram -> waveform (reference README.md:105-130)
voc = DiffusionVocoder(mel_n_fft=512, mel_channels=40, mel_sample_rate=SR,
                       mel_normalize_log=True, **NET)
loss = voc(audio)
mel = MelSpectrogram(n_fft=512, hop_length=128, win_length=512,
                     n_mel_channels=40, sample_rate=SR,
                     normalize_log=True)(audio)    # [1, 1, 40, 128]
wave = voc.sample(mel, num_steps=10)               # [1, 1, 16384]
wav_write(out_dir / "vocoded.wav", jax.device_get(wave)[0], SR)
print(f"vocoder: mel {mel.shape} -> wave {wave.shape}, loss {loss:.3f}")

# --- Autoencoder: audio -> latent -> audio (reference README.md:133-163)
# Encoder factor must equal the U-Net's cumulative factor at inject_depth:
# depth 2 is 1*4*4 = 16× downsampled; mel hop 8 × conv factor 2 = 16. ✓
ae = DiffusionAE(encoder=MelEncoder1d(in_channels=1, channels=16,
                                      out_channels=8, mel_channels=8,
                                      mel_n_fft=32, mel_sample_rate=SR,
                                      factors=[2], num_blocks=[1]),
                 inject_depth=2, in_channels=1, **NET)
loss = ae(audio)
latent = ae.encode(audio)                          # [1, 8, LENGTH/encoder_factor]
recon = ae.decode(latent, num_steps=10)            # [1, 1, 16384]
wav_write(out_dir / "ae_recon.wav", jax.device_get(recon)[0], SR)
print(f"autoencoder: latent {latent.shape} -> recon {recon.shape}, "
      f"loss {loss:.3f}")

# --- Inpainting: regenerate a masked region (reference README.md:182-204)
from audio_diffusion_tpu import DiffusionModel

model = DiffusionModel(in_channels=1, **NET)
model.initialize(audio)
mask = jnp.ones_like(audio, bool).at[..., LENGTH // 4: LENGTH // 2].set(
    False)                                         # False = regenerate
filled = VInpainter(net=model.net).sample(
    model.params["net"], key, source=audio, mask=mask,
    num_steps=10, num_resamples=2)                 # [1, 1, 16384]
wav_write(out_dir / "inpainted.wav", jax.device_get(filled)[0], SR)
print(f"inpainter: filled {filled.shape} -> {out_dir}")
