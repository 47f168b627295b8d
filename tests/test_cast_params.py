"""Inference-time parameter casting (ops/net.py cast_inference_params).

Samplers pre-cast f32 master params to the net's compute dtype ONCE outside
the scan (the per-op casts inside would re-read f32 weights from HBM every
step — PERFORMANCE.md). These tests pin the contract: the pre-cast is
bit-identical to the in-scan casts, f32 nets are untouched, and the
SigmaEmbedding fourier `freqs` stay f32.
"""
import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.ops.net import cast_inference_params


def tiny_model(dtype):
    return DiffusionModel(
        net_t=UNetV0,
        in_channels=2,
        channels=[8, 32],
        factors=[2, 2],
        items=[1, 1],
        attentions=[0, 1],
        attention_heads=2,
        attention_features=8,
        modulation_features=16,
        dtype=dtype,
    )


def test_cast_keeps_freqs_f32_and_casts_weights():
    model = tiny_model(jnp.bfloat16)
    model.initialize(jnp.zeros((1, 2, 64), jnp.float32))
    cast = cast_inference_params(model.params, jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves_with_path(cast)
    seen_freqs = seen_weight = False
    for path, leaf in leaves:
        name = path[-1].key
        if name == "freqs":
            assert leaf.dtype == jnp.float32
            seen_freqs = True
        else:
            assert leaf.dtype == jnp.bfloat16, (path, leaf.dtype)
            seen_weight = True
    assert seen_freqs and seen_weight


def test_cast_noop_for_f32_net():
    model = tiny_model(None)
    model.initialize(jnp.zeros((1, 2, 64), jnp.float32))
    cast = cast_inference_params(model.params, None)
    assert cast is model.params


def test_precast_sampling_is_bit_identical():
    """Sampling with pre-cast bf16 params == sampling with f32 params
    (the per-op casts make the math bf16 either way)."""
    model = tiny_model(jnp.bfloat16)
    noise = jax.random.normal(jax.random.key(1), (2, 2, 64), jnp.float32)
    model.initialize(noise)

    out_f32_params = model.sampler.sample(
        model.params["net"], noise, num_steps=5)
    pre = cast_inference_params(model.params, jnp.bfloat16)
    out_precast = model.sampler.sample(pre["net"], noise, num_steps=5)
    np.testing.assert_array_equal(np.asarray(out_f32_params),
                                  np.asarray(out_precast))
    assert np.isfinite(np.asarray(out_precast)).all()
