"""Long-form generation: outpaint past the training window.

The reference trains on fixed crops (2^18 samples ≈ 5.5 s at 48 kHz,
reference README.md:21-44) and offers no way to generate longer audio
with an unconditional model — users are pointed at inpainting
(README.md:182-204) and left to chain it by hand. ``generate_long`` does
that chaining: the first window samples normally; every following window
is RePaint-outpainted (diffusion/inpainter.py) from the previous
window's tail, so content stays continuous across seams. All windows
share ONE compiled program per stage (fixed shapes), and the stitch loop
is host-side bookkeeping over device arrays.

    audio = generate_long(model, length=10 * 2**18, window=2**18,
                          overlap=2**16, num_steps=50,
                          key=jax.random.key(0))     # [b, c, length]

Autoregressive models (``DiffusionAR`` + ``ARVSampler``) remain the
first-class long-context story (they are *trained* for it); this helper
serves ordinary unconditional/conditional models where retraining isn't
an option.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .diffusion import VInpainter

__all__ = ["generate_long", "make_inpainter"]


def make_inpainter(model) -> VInpainter:
    """An inpainter sharing the model's σ-schedule, so inpainted windows
    denoise on the same trajectory family as ordinary samples. The single
    construction point for every inpainting surface (long-form chaining
    here, the CLI's --inpaint)."""
    return VInpainter(net=model.net,
                      schedule=getattr(model.sampler, "schedule", None))


def generate_long(
    model,
    *,
    length: int,
    window: int,
    overlap: int,
    num_steps: int = 50,
    num_resamples: int = 2,
    key: Optional[jax.Array] = None,
    batch_size: int = 1,
    params=None,
    **cond,
):
    """Generate ``[batch_size, channels, length]`` audio by chaining
    overlap-outpainted windows.

    ``window`` is the model's comfortable generation length (the training
    crop); ``overlap`` is how much context each new window keeps from the
    previous one (more = smoother seams, slower; 1/4 window is a good
    start). ``num_resamples`` is RePaint's harmonization knob — 2+
    noticeably improves seam coherence. ``params=`` overrides the live
    parameters (EMA snapshots, int8 trees), like ``model.sample``.
    Conditioning kwargs are passed to the net for every window.
    """
    assert 0 < overlap < window, (overlap, window)
    assert length >= window, (
        f"length {length} shorter than window {window}: call model.sample")
    key = key if key is not None else model.next_key()
    p = params if params is not None else model.params
    c = model.net.in_channels if hasattr(model.net, "in_channels") else 2

    stride = window - overlap
    k0, key = jax.random.split(key)
    first = model.sample(
        jax.random.normal(k0, (batch_size, c, window), jnp.float32),
        num_steps=num_steps, params=p, **cond)
    chunks = [first]
    produced = window

    inpainter = make_inpainter(model)
    # Known region: the leading `overlap` samples (the previous tail).
    mask = jnp.zeros((batch_size, c, window), bool).at[..., :overlap].set(
        True)
    net_params = p["net"] if isinstance(p, dict) and "net" in p else p
    # One compiled program for every continuation window (fixed shapes;
    # num_steps/num_resamples are Python constants of the partial).
    # Scalar conditioning (e.g. CFG embedding_scale) must be STATIC too —
    # the CFG wrapper branches on it in Python, so tracing it would crash;
    # only arrays (embeddings, context channels) are traced arguments.
    static = {k: v for k, v in cond.items()
              if not (hasattr(v, "shape") and getattr(v, "ndim", 0) > 0)}
    arrays = {k: v for k, v in cond.items() if k not in static}
    inpaint = jax.jit(partial(inpainter.sample, num_steps=num_steps,
                              num_resamples=num_resamples, **static))

    while produced < length:
        tail = chunks[-1][..., -overlap:]
        source = jnp.concatenate(
            [tail, jnp.zeros((batch_size, c, stride), tail.dtype)], -1)
        key, kw = jax.random.split(key)
        out = inpaint(net_params, kw, source=source, mask=mask, **arrays)
        chunks.append(out[..., overlap:])  # keep only the new content
        produced += stride

    audio = jnp.concatenate(chunks, axis=-1)
    return audio[..., :length]
