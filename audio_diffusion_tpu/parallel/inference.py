"""Sharded inference: sequence-parallel (length-sharded) sampling.

Scales BATCH-1 sampling latency across chips — something the single-device
reference cannot express. The waveform's length axis is sharded over a mesh
axis; XLA's SPMD partitioner inserts the halo exchanges for the k=3 frame
convs and the gathers for the (short, coarse-level) attention sequences.
Verified bit-equal to unsharded sampling in tests/test_parallel.py.

Works with the lane-folded layout: folds group CONSECUTIVE samples into
lanes, so the frame axis keeps the length-sharding and only k=3 halos cross
shard boundaries.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["sample_length_sharded"]


def sample_length_sharded(model, noise: Array, num_steps: int,
                          mesh: Mesh, axis: str = "data",
                          key: Optional[Array] = None, **kwargs) -> Array:
    """Run `model`'s sampler with the waveform length sharded over `axis`.

    noise: [B, C, T] with T divisible by the axis size (and by the product
    of the model's downsampling factors per shard).
    """
    assert model.params is not None, "initialize the model first"
    if getattr(model.sampler, "needs_key", False):
        # Keyed samplers (ARVSampler) have no per-request noise input to
        # shard — their signature doesn't fit the length-sharded path.
        raise NotImplementedError(
            f"{type(model.sampler).__name__} consumes RNG and takes no "
            "noise input; length-sharded sampling supports deterministic "
            "samplers (VSampler, DPMSampler)")
    assert key is None, (
        "deterministic samplers take no key; the noise IS the randomness")
    kwargs = model._process_cond(kwargs)
    spec = NamedSharding(mesh, P(None, None, axis))
    noise = jax.device_put(noise, spec)

    def run_sharded(params, x, **kw):
        x = jax.lax.with_sharding_constraint(x, spec)
        return model.sample_fn(params, x, **kw)

    # Route through the model's jit cache (static/dynamic kwarg split) so
    # repeated calls reuse the compiled program instead of re-jitting a
    # fresh closure each time. One cache entry per (mesh layout, axis);
    # keyed on the mesh's content, not id() (ids are recycled after GC and
    # could silently resurrect a stale compiled sharding).
    mesh_key = (tuple(mesh.shape.items()),
                tuple(d.id for d in mesh.devices.flat))
    tag = f"sample_sharded:{mesh_key}:{axis}"
    return model._jitted(tag, run_sharded, params=model.params, x=noise,
                         num_steps=num_steps, **kwargs)
