"""Learning demonstration on synthetic data.

Trains a small model on band-limited synthetic audio (random mixtures of
low-frequency sines) and verifies the sampled audio acquires the same
spectral signature — an end-to-end "does the framework actually learn"
check that runs in a few minutes on one chip.

    python examples/train_demo_synthetic.py [--steps 2000]

Pass/fail criterion printed at the end: fraction of sample energy below the
training cutoff frequency (untrained ≈ cutoff/nyquist; trained -> ~1).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.train import Trainer, TrainerConfig

LENGTH = 2**14
CUTOFF_BIN = 64  # training signals live strictly below this rfft bin


def make_batch(rng: np.random.Generator, batch: int) -> jnp.ndarray:
    t = np.arange(LENGTH) / LENGTH
    out = np.zeros((batch, 1, LENGTH), np.float32)
    for i in range(batch):
        for _ in range(4):
            f = rng.uniform(4, CUTOFF_BIN * 0.8)
            amp = rng.uniform(0.1, 0.4)
            phase = rng.uniform(0, 2 * np.pi)
            out[i, 0] += amp * np.sin(2 * np.pi * f * t + phase)
    return jnp.asarray(out * 0.5)


def low_band_energy_fraction(x: np.ndarray) -> float:
    spec = np.abs(np.fft.rfft(x, axis=-1)) ** 2
    return float(spec[..., :CUTOFF_BIN].sum() / spec.sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    model = DiffusionModel(
        net_t=UNetV0,
        in_channels=1,
        channels=[8, 32, 64, 128],
        factors=[1, 4, 4, 4],
        items=[1, 2, 2, 2],
        attentions=[0, 0, 0, 1],
        attention_heads=4,
        attention_features=32,
        modulation_features=256,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    model.initialize(make_batch(rng, args.batch))
    trainer = Trainer(
        model, TrainerConfig(learning_rate=2e-4, max_grad_norm=1.0,
                             ema_decay=0.999, log_every=200))

    def batches():
        while True:
            yield make_batch(rng, args.batch)

    t0 = time.time()
    trainer.fit(batches(), num_steps=args.steps)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    noise = jax.random.normal(jax.random.key(123), (4, 1, LENGTH))
    model.params = trainer.ema_params
    audio = np.asarray(model.sample(noise, num_steps=50))
    frac = low_band_energy_fraction(audio)
    rms = float(np.sqrt(np.mean(audio**2)))
    base = low_band_energy_fraction(np.asarray(noise))
    print(f"sampled rms={rms:.3f}; low-band energy fraction={frac:.3f} "
          f"(pure noise baseline={base:.3f}, training data=1.000)")
    if frac > 0.8:
        print("LEARNING DEMONSTRATED: samples are band-limited like the data")
    else:
        print("WARNING: samples not clearly band-limited "
              "(more steps may be needed)")


if __name__ == "__main__":
    main()
