"""Text-conditional generation example (T5 + classifier-free guidance).

Three ways to supply the conditioning (reference README.md:47-76):

1. Real T5 (`--text "..."`): requires `t5-base` in the local HuggingFace
   cache. Recipe on an online machine::

       python -c "from transformers import AutoTokenizer, FlaxT5EncoderModel;
                  AutoTokenizer.from_pretrained('t5-base');
                  FlaxT5EncoderModel.from_pretrained('t5-base')"
       # then copy ~/.cache/huggingface to this machine

2. Precomputed embeddings (`--embedding file.npy`): encode the prompt on
   any machine that has T5 and ship the [b, 64, 768] array::

       from transformers import AutoTokenizer, FlaxT5EncoderModel
       import numpy as np
       tok = AutoTokenizer.from_pretrained("t5-base")
       enc = FlaxT5EncoderModel.from_pretrained("t5-base")
       t = tok(["rain on a tin roof"], return_tensors="np",
               padding="max_length", max_length=64, truncation=True)
       emb = np.asarray(enc(**t).last_hidden_state)
       emb *= t["attention_mask"][..., None]      # zero the padding
       np.save("prompt.npy", emb)

   This matches ops/text.py T5TextEncoder exactly, so a model trained with
   the live encoder conditions identically on shipped embeddings.

3. Stub encoder (`--stub`): deterministic hash-based pseudo-embeddings —
   NOT semantically meaningful; exercises the full CFG/cross-attention
   pipeline offline.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from audio_diffusion_tpu import DiffusionModel, UNetV0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="rain on a tin roof")
    ap.add_argument("--embedding", default=None,
                    help="path to a precomputed [b, 64, 768] .npy embedding "
                         "(bypasses the text encoder entirely)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=5.0)
    ap.add_argument("--length", type=int, default=2**18)
    ap.add_argument("--stub", action="store_true",
                    help="use the offline stub text encoder (pseudo-"
                         "embeddings, for pipeline testing only)")
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

    if args.embedding is not None:
        import numpy as np
        cond = {"embedding": jnp.asarray(np.load(args.embedding))}
        label = f"embedding file {args.embedding}"
    else:
        cond = {"text": [args.text]}
        label = ("STUB encoder (pseudo-embeddings)" if args.stub
                 else f"T5('{args.text}')")

    # (training: loss = model(audio, text=[...], embedding_mask_proba=0.1))
    example = jnp.zeros((1, 2, args.length))
    model.initialize(example, **cond)

    noise = jax.random.normal(jax.random.key(0), (1, 2, args.length))
    audio = model.sample(noise, embedding_scale=args.scale,
                         num_steps=args.steps, **cond)
    print(f"conditioning: {label}")
    print("sampled:", audio.shape, "rms:", float(jnp.sqrt(jnp.mean(audio**2))))


if __name__ == "__main__":
    main()
