"""Progressive-distillation demo: train on synthetic audio, halve the
sampling steps three times (64 -> 8), and measure few-step fidelity.

    python examples/distill_demo.py            # TPU, ~20 min total
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python examples/distill_demo.py --train-steps 300 \
        --distill-steps 150 --stages 1         # CPU smoke (~5 min)

Measured on one v5e chip (train 2000, 3 stages x 600): the distilled
8-step student reaches RMS distance 0.0177 to the converged 256-step
solution — matching the undistilled model at ~16-20 steps, i.e. ~2x fewer
net evaluations (PERFORMANCE.md §8c).
"""
from __future__ import annotations

import argparse
import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from train_demo_synthetic import LENGTH, make_batch

from audio_diffusion_tpu import DiffusionModel, ProgressiveDistiller, UNetV0
from audio_diffusion_tpu.train import Trainer, TrainerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=2000)
    ap.add_argument("--distill-steps", type=int, default=600,
                    help="optimizer steps per halving stage")
    ap.add_argument("--stages", type=int, default=3)
    ap.add_argument("--base-steps", type=int, default=64)
    args = ap.parse_args()

    model = DiffusionModel(
        net_t=UNetV0, in_channels=1, channels=[8, 32, 64, 128],
        factors=[1, 4, 4, 4], items=[1, 2, 2, 2], attentions=[0, 0, 0, 1],
        attention_heads=4, attention_features=32, modulation_features=256,
        dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    batches = (make_batch(rng, 16) for _ in itertools.count())
    model.initialize(next(batches))
    t0 = time.perf_counter()
    Trainer(model, TrainerConfig(learning_rate=1e-4, log_every=500)).fit(
        batches, num_steps=args.train_steps)
    print(f"teacher trained in {time.perf_counter() - t0:.0f}s")

    noise = jax.random.normal(jax.random.key(7), (4, 1, LENGTH))
    ref = np.asarray(model.sample(noise, num_steps=256))

    def dist(a):
        return float(np.sqrt(np.mean((np.asarray(a) - ref) ** 2)))

    budgets = (4, 8, 16)
    base = {n: dist(model.sample(noise, num_steps=n)) for n in budgets}

    distiller = ProgressiveDistiller(model, base_steps=args.base_steps,
                                     learning_rate=3e-5)
    for _ in range(args.stages):
        t0 = time.perf_counter()
        distiller.stage((make_batch(rng, 16) for _ in itertools.count()),
                        num_train_steps=args.distill_steps,
                        log_fn=lambda s: None)
        print(f"distilled to {distiller.steps} steps "
              f"({time.perf_counter() - t0:.0f}s)")

    student = {n: dist(model.sample(noise, num_steps=n)) for n in budgets}
    print("steps  undistilled  distilled")
    for n in budgets:
        print(f"{n:5d}  {base[n]:11.4f}  {student[n]:.4f}")


if __name__ == "__main__":
    main()
