"""Serve a model with the microbatching GenerationService.

Demonstrates the production serving path: concurrent requests coalesce into
fixed-size device batches (batch 8 measures ~1.4x the samples/min of
batch-1 sampling on the flagship config — PERFORMANCE.md), results return
as futures, and generated audio is written with the native WAV writer.

Run (CPU quick demo):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo:/root/.axon_site python examples/serve_batched.py
"""
import tempfile
import time
from pathlib import Path

import jax.numpy as jnp

from audio_diffusion_tpu import DiffusionModel, GenerationService, UNetV0
from audio_diffusion_tpu.data import wav_write

LENGTH = 2**14
SAMPLE_RATE = 16000

model = DiffusionModel(
    net_t=UNetV0, in_channels=2, channels=[8, 32, 64], factors=[1, 4, 4],
    items=[1, 2, 2], attentions=[0, 0, 1], attention_heads=4,
    attention_features=32)
model.initialize(jnp.zeros((1, 2, LENGTH)))

out_dir = Path(tempfile.mkdtemp(prefix="served_"))
t0 = time.perf_counter()
with GenerationService(model, num_steps=10, batch_size=4,
                       max_wait_ms=50.0) as service:
    # Eight concurrent requests; the service runs them as two device
    # batches of four. submit_seed draws the noise ON DEVICE (an 8-byte
    # request instead of a [2, LENGTH] upload — measured 1.6x the remote
    # serving throughput, PERFORMANCE.md §8a2).
    futures = {seed: service.submit_seed(seed, length=LENGTH)
               for seed in range(8)}
    for seed, fut in futures.items():
        audio = fut.result()
        wav_write(out_dir / f"sample_{seed}.wav", audio, SAMPLE_RATE)
    stats = service.stats

dt = time.perf_counter() - t0
print(f"served {stats['requests']} requests in {dt:.1f}s "
      f"({stats['batches']} batches, occupancy "
      f"{stats['mean_occupancy']:.0%}) -> {out_dir}")
