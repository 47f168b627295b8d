"""Sigma distributions for training-time noise-level sampling.

Reference: diffusion.py:16-30. JAX-native: callables take an explicit PRNG key
instead of consuming global RNG state (torch.rand at reference diffusion.py:30).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["Distribution", "UniformDistribution"]


class Distribution:
    """Interface: ``dist(key, num_samples) -> [num_samples] array of σ``."""

    def __call__(self, key: Array, num_samples: int) -> Array:
        raise NotImplementedError()


class UniformDistribution(Distribution):
    """σ ~ U[vmin, vmax). Reference: diffusion.py:23-30."""

    def __init__(self, vmin: float = 0.0, vmax: float = 1.0):
        self.vmin, self.vmax = vmin, vmax

    def __call__(self, key: Array, num_samples: int) -> Array:
        return jax.random.uniform(
            key, (num_samples,), minval=self.vmin, maxval=self.vmax,
            dtype=jnp.float32,
        )
