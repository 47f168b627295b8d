"""Generate audio and save it as WAV — the full inference path.

Builds a model (optionally restoring a checkpoint saved by
model.save / Trainer), samples with the fast second-order DPMSampler, and
writes the result with the native WAV writer (no external audio deps).

    python examples/generate_to_wav.py --out /tmp/samples --num 2 --steps 25
    python examples/generate_to_wav.py --ckpt ckpts/model --steps 25 ...

With no checkpoint this runs untrained weights (noise out) — the point of
the example is the wiring; swap in your trained config + checkpoint.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from audio_diffusion_tpu import DiffusionModel, DPMSampler, UNetV0
from audio_diffusion_tpu.data import wav_write


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/samples")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir saved via model.save()")
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--steps", type=int, default=25,
                    help="DPMSampler needs ~half of VSampler's steps")
    ap.add_argument("--length", type=int, default=2**17)
    ap.add_argument("--sample-rate", type=int, default=48000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    model = DiffusionModel(
        net_t=UNetV0,
        sampler_t=DPMSampler,
        in_channels=2,
        channels=[8, 32, 64, 128, 256, 512],
        factors=[1, 4, 4, 4, 2, 2],
        items=[1, 2, 2, 2, 2, 2],
        attentions=[0, 0, 0, 0, 1, 1],
        attention_heads=8,
        attention_features=64,
        dtype=jnp.bfloat16,
    )
    noise = jax.random.normal(jax.random.key(args.seed),
                              (args.num, 2, args.length))
    model.initialize(noise)
    if args.ckpt:
        model.load(args.ckpt)

    audio = model.sample(noise, num_steps=args.steps)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    peak = float(jnp.max(jnp.abs(audio))) or 1.0
    for i in range(args.num):
        path = out_dir / f"sample_{i:03d}.wav"
        wav_write(path, jnp.asarray(audio[i]) / peak,
                  sample_rate=args.sample_rate)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
