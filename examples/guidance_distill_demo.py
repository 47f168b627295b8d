"""Guidance-distillation demo: train a small embedding-conditional CFG
model on synthetic audio, bake guidance scale w into a single conditional
pass, and verify the single-pass student reproduces the two-pass guided
teacher (Meng et al., CVPR 2023, w-fixed variant).

    python examples/guidance_distill_demo.py                 # TPU
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python examples/guidance_distill_demo.py \
        --train-steps 200 --distill-steps 150                # CPU smoke

The teacher pays TWO batch-doubled net evaluations per guided sampling
step (classifier-free guidance, reference README.md:74); the student pays
one. Serving cost per step halves, and progressive step distillation
(examples/distill_demo.py) stacks on top.
"""
from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionModel, ProgressiveDistiller, UNetV0
from audio_diffusion_tpu.train import Trainer, TrainerConfig

LENGTH = 2 ** 13
EMB_LEN, EMB_FEAT = 8, 32


def make_batch(key, batch, emb_table):
    """Two synthetic 'classes' selected by the embedding: a low tone and a
    bright tone — so guidance has something real to amplify."""
    k_cls, k_phase, k_noise = jax.random.split(key, 3)
    cls = jax.random.randint(k_cls, (batch,), 0, 2)
    t = jnp.arange(LENGTH) / 48000.0
    freq = jnp.where(cls == 0, 220.0, 2200.0)[:, None]
    phase = jax.random.uniform(k_phase, (batch, 1)) * 2 * jnp.pi
    wave = jnp.sin(2 * jnp.pi * freq * t[None, :] + phase)
    wave = wave + 0.05 * jax.random.normal(k_noise, wave.shape)
    return wave[:, None, :].astype(jnp.float32), emb_table[cls]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=1500)
    ap.add_argument("--distill-steps", type=int, default=600)
    ap.add_argument("--scale", type=float, default=4.0)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    emb_table = jax.random.normal(jax.random.key(99),
                                  (2, EMB_LEN, EMB_FEAT))
    model = DiffusionModel(
        net_t=UNetV0, in_channels=1, channels=[8, 32, 64],
        factors=[1, 4, 4], items=[1, 1, 1], cross_attentions=[0, 0, 1],
        attention_heads=4, attention_features=16, modulation_features=64,
        embedding_features=EMB_FEAT, use_embedding_cfg=True,
        embedding_max_length=EMB_LEN)

    def batches():
        key = jax.random.key(0)
        for i in itertools.count():
            x, emb = make_batch(jax.random.fold_in(key, i), args.batch,
                                emb_table)
            yield x, {"embedding": emb}

    x0, emb0 = make_batch(jax.random.key(1), args.batch, emb_table)
    model.initialize(x0, embedding=emb0)
    trainer = Trainer(model, TrainerConfig(learning_rate=1e-3,
                                           log_every=200))
    trainer.fit(batches(), num_steps=args.train_steps,
                embedding_mask_proba=0.2)

    # Probe: guided two-pass teacher vs single-pass student, matched noise.
    teacher = jax.tree.map(lambda a: jnp.array(a, copy=True), model.params)
    noise = jax.random.normal(jax.random.key(7), (2, 1, LENGTH))
    emb = emb_table  # one sample per class
    guided = np.asarray(model.sample(noise, embedding=emb,
                                     embedding_scale=args.scale,
                                     num_steps=32, params=teacher))

    before = np.asarray(model.sample(noise, embedding=emb, num_steps=32,
                                     params=teacher))
    distiller = ProgressiveDistiller(model, base_steps=32,
                                     learning_rate=3e-4)
    distiller.guidance_stage(batches(), embedding_scale=args.scale,
                             num_train_steps=args.distill_steps,
                             log_every=200)
    after = np.asarray(model.sample(noise, embedding=emb, num_steps=32))

    rms = lambda a, b: float(np.sqrt(np.mean((a - b) ** 2)))  # noqa: E731
    print(f"single-pass distance to guided teacher: "
          f"before distillation {rms(before, guided):.4f}, "
          f"after {rms(after, guided):.4f} "
          f"(guided-vs-unguided gap was {rms(before, guided):.4f})")
    assert rms(after, guided) < rms(before, guided)
    print("GD DONE")


if __name__ == "__main__":
    main()
