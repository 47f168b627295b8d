"""Sampling-time σ schedules.

Reference: diffusion.py:135-148. ``num_steps`` is a static Python int (the
sampler's scan length), so schedules return concrete [num_steps] arrays.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = ["Schedule", "LinearSchedule"]


class Schedule:
    """Interface: ``schedule(num_steps) -> [num_steps] σ array``."""

    def __call__(self, num_steps: int) -> Array:
        raise NotImplementedError()


class LinearSchedule(Schedule):
    """linspace(start, end, num_steps); default 1→0. Reference: diffusion.py:142-148."""

    def __init__(self, start: float = 1.0, end: float = 0.0):
        self.start, self.end = start, end

    def __call__(self, num_steps: int) -> Array:
        return jnp.linspace(self.start, self.end, num_steps, dtype=jnp.float32)
