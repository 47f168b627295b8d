"""End-to-end unconditional training example.

Trains the README flagship config on a directory of WAV files using the
native data pipeline, data-parallel over every available device, with
checkpointing — then samples.

Usage:
    python examples/train_unconditional.py --data /path/to/wavs \
        --steps 10000 --batch 4 --length 262144 --ckpt ckpts/uncond
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.data import AudioDataset
from audio_diffusion_tpu.parallel import create_mesh, shard_batch
from audio_diffusion_tpu.train import Trainer, TrainerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--length", type=int, default=2**18)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True, help="bf16 compute (--no-bf16 for f32)")
    args = ap.parse_args()

    model = DiffusionModel(
        net_t=UNetV0,
        in_channels=2,
        channels=[8, 32, 64, 128, 256, 512, 512, 1024, 1024],
        factors=[1, 4, 4, 4, 2, 2, 2, 2, 2],
        items=[1, 2, 2, 2, 2, 2, 2, 4, 4],
        attentions=[0, 0, 0, 0, 0, 1, 1, 1, 1],
        attention_heads=8,
        attention_features=64,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )

    dataset = AudioDataset(args.data, crop_frames=args.length,
                           batch_size=args.batch)
    mesh = create_mesh()
    print(f"devices: {mesh.shape}, dataset: {len(dataset.files)} files @ "
          f"{dataset.sample_rate} Hz")

    batches = (shard_batch(jnp.asarray(b), mesh) for b in dataset)
    model.initialize(next(iter(dataset)))

    trainer = Trainer(
        model,
        TrainerConfig(learning_rate=args.lr, checkpoint_dir=args.ckpt,
                      max_grad_norm=1.0, log_every=50),
        mesh=mesh,
    )
    if args.ckpt:
        restored = trainer.restore_latest()
        if restored:
            print(f"resumed from step {restored}")
    trainer.fit(batches, num_steps=args.steps)

    # Sample.
    noise = jax.random.normal(jax.random.key(0), (1, 2, args.length))
    audio = model.sample(noise, num_steps=50)
    print("sampled:", audio.shape, "rms:", float(jnp.sqrt(jnp.mean(audio**2))))


if __name__ == "__main__":
    main()
