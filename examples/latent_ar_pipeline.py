"""Latent autoregressive pipeline: unbounded audio via AE + AR-on-latents.

Composes two framework pieces the way the Moûsai system does (the paper
the reference defers its real configs to, arXiv:2301.11757): a diffusion
autoencoder compresses audio into a latent sequence, a DiffusionAR model
generates arbitrarily long LATENT sequences chunk by chunk, and the AE
decodes them back to audio. The reference documents the two models
separately (reference README.md:133-181); this shows the composition
end-to-end on the native stack.

Tiny config, CPU-runnable in a few minutes (the wiring is the point —
swap in trained checkpoints and real sizes for actual audio):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo:/root/.axon_site \
        python examples/latent_ar_pipeline.py
"""
from __future__ import annotations

import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import (DiffusionAE, DiffusionAR, MelEncoder1d,
                                 UNetV0)
from audio_diffusion_tpu.data import wav_write

SR = 16000
AUDIO_LEN = 2**14          # per training window
LATENT_CH = 8

# --- 1. Diffusion autoencoder: audio [1, 16384] <-> latent [8, 1024]
ae = DiffusionAE(
    encoder=MelEncoder1d(in_channels=1, channels=16, out_channels=LATENT_CH,
                         mel_channels=8, mel_n_fft=32, mel_sample_rate=SR,
                         factors=[2], num_blocks=[1]),
    inject_depth=2, net_t=UNetV0, in_channels=1,
    channels=[8, 32, 64], factors=[1, 4, 4], items=[1, 2, 2],
    modulation_features=64)

t = jnp.linspace(0, AUDIO_LEN / SR, AUDIO_LEN)
audio = 0.4 * jnp.sin(2 * jnp.pi * 330 * t)[None, None, :]
ae_loss = ae(audio)                       # one training step's loss
latent = ae.encode(audio)                 # [1, 8, 1024]
lat_len = latent.shape[-1]
print(f"AE: audio {audio.shape} -> latent {latent.shape}, "
      f"loss {ae_loss:.3f}")

# --- 2. Autoregressive model over the LATENT sequence (sigma as an input
# channel, no time conditioning — reference models.py:227-250)
ar = DiffusionAR(
    net_t=UNetV0, in_channels=LATENT_CH, length=lat_len, num_splits=4,
    channels=[16, 32], factors=[1, 4], items=[1, 1])
ar_loss = ar(latent)                      # train AR on encoded latents
print(f"AR-on-latents: loss {ar_loss:.3f}")

# --- 3. Generate a latent sequence LONGER than any training window
# (output length = num_chunks * length/num_splits, reference
# diffusion.py:296), then decode through the AE.
num_chunks = 8                            # 2x the training window length
long_latent = ar.sample(num_items=1, num_chunks=num_chunks, num_steps=8)
print(f"AR generated latent {long_latent.shape}")

audio_out = ae.decode(long_latent, num_steps=8)
out = Path(tempfile.mkdtemp(prefix="latent_ar_")) / "long.wav"
wav_write(out, np.asarray(jax.device_get(audio_out))[0], SR)
print(f"decoded to audio {audio_out.shape} -> {out}")
