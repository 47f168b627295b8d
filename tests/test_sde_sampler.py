"""SDESampler: eta=0 is bit-identical to VSampler; eta>0 is keyed,
deterministic per key, and still denoises toward the data manifold."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import (DiffusionModel, SDESampler, UNetV0,
                                 VSampler)

TINY = dict(net_t=UNetV0, in_channels=1, channels=[8, 16], factors=[1, 2],
            items=[1, 1], modulation_features=32)
LENGTH = 256


def _pair(eta):
    mv = DiffusionModel(sampler_t=VSampler, **TINY)
    noise = jax.random.normal(jax.random.key(0), (2, 1, LENGTH))
    mv.initialize(noise, key=jax.random.key(1))
    ms = DiffusionModel(sampler_t=SDESampler, sampler_eta=eta, **TINY)
    ms.params = mv.params
    return mv, ms, noise


def test_eta_zero_equals_vsampler():
    mv, ms, noise = _pair(eta=0.0)
    a = mv.sample(noise, num_steps=8)
    b = ms.sample(noise, num_steps=8, key=jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eta_one_keyed_and_deterministic():
    _, ms, noise = _pair(eta=1.0)
    a = ms.sample(noise, num_steps=8, key=jax.random.key(5))
    b = ms.sample(noise, num_steps=8, key=jax.random.key(5))
    c = ms.sample(noise, num_steps=8, key=jax.random.key(6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0
    assert np.isfinite(np.asarray(a)).all()


def test_eta_validation():
    with pytest.raises(AssertionError, match="eta"):
        DiffusionModel(sampler_t=SDESampler, sampler_eta=1.5, **TINY)
