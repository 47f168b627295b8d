"""Text-conditional generation example (T5 + classifier-free guidance).

Requires T5 weights in the local HuggingFace cache; otherwise pass
--stub to exercise the pipeline with the deterministic stub encoder.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from audio_diffusion_tpu import DiffusionModel, UNetV0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="rain on a tin roof")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=5.0)
    ap.add_argument("--length", type=int, default=2**18)
    ap.add_argument("--stub", action="store_true",
                    help="use the offline stub text encoder")
    args = ap.parse_args()

    extra = {}
    if args.stub:
        from audio_diffusion_tpu.ops.text import StubTextEncoder
        extra["text_encoder"] = StubTextEncoder()

    model = DiffusionModel(
        net_t=UNetV0,
        in_channels=2,
        channels=[8, 32, 64, 128, 256, 512, 512, 1024, 1024],
        factors=[1, 4, 4, 4, 2, 2, 2, 2, 2],
        items=[1, 2, 2, 2, 2, 2, 2, 4, 4],
        attentions=[0, 0, 0, 0, 0, 1, 1, 1, 1],
        cross_attentions=[0, 0, 0, 1, 1, 1, 1, 1, 1],
        attention_heads=8,
        attention_features=64,
        use_text_conditioning=True,
        use_embedding_cfg=True,
        embedding_max_length=64,
        embedding_features=768,
        dtype=jnp.bfloat16,
        **extra,
    )

    # (training: loss = model(audio, text=[...], embedding_mask_proba=0.1))
    example = jnp.zeros((1, 2, args.length))
    model.initialize(example, text=[args.text])

    noise = jax.random.normal(jax.random.key(0), (1, 2, args.length))
    audio = model.sample(noise, text=[args.text],
                         embedding_scale=args.scale, num_steps=args.steps)
    print("sampled:", audio.shape, "rms:", float(jnp.sqrt(jnp.mean(audio**2))))


if __name__ == "__main__":
    main()
