"""Sampling-time σ schedules.

Reference: diffusion.py:135-148. ``num_steps`` is a static Python int (the
sampler's scan length), so schedules return concrete [num_steps] arrays.
"""
from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp
from jax import Array

__all__ = ["Schedule", "LinearSchedule", "UniformLambdaSchedule"]


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


class UniformLambdaSchedule(Schedule):
    """σ grid uniform in log-SNR λ = log(α/β) = log(cot(σπ/2)), endpoints
    pinned to σ=1 (pure noise in) and σ=0 (clean signal out).

    BEYOND-REFERENCE: the natural spacing for exponential-integrator solvers
    (DPMSampler) — their per-step error scales with the log-SNR step h, and
    uniform-σ spacing makes h explode at the endpoints. ``margin`` (in units
    of one step) sets how far off the exact endpoints the uniform-λ interior
    starts; 0.1 measured best over 8–50 step budgets
    (tests/test_dpm_sampler.py sweeps live in the session log).
    """

    def __init__(self, margin: float = 0.1):
        self.margin = margin

    def __call__(self, num_steps: int) -> Array:
        n = num_steps - 1  # σ array has num_steps entries = n intervals + 1
        if n < 2:
            return jnp.linspace(1.0, 0.0, num_steps, dtype=jnp.float32)

        def lam(s):
            th = s * math.pi / 2
            return np.log(np.cos(th) / np.sin(th))

        m = self.margin / n
        if n == 2:
            # np.linspace(a, b, 1) returns [a]; the single interior point
            # must be the λ-midpoint, not a near-endpoint duplicate.
            lams = np.array([(lam(1.0 - m) + lam(m)) / 2.0])
        else:
            lams = np.linspace(lam(1.0 - m), lam(m), n - 1)
        interior = (2.0 / math.pi) * np.arctan(np.exp(-lams))
        sig = np.concatenate([[1.0], interior, [0.0]]).astype(np.float32)
        return jnp.asarray(sig)
