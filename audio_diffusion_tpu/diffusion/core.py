"""Pure diffusion math shared by every method/sampler/inpainter.

The reference duplicates `get_alpha_beta` five times (diffusion.py:77-80,
108-111, 167-170, 207-211, 315-318); here it is ONE pure function. All helpers
are shape-polymorphic jnp functions usable inside `jit`/`scan`/`grad`.
"""
from __future__ import annotations

from math import pi
from typing import Tuple

import jax.numpy as jnp
from jax import Array

__all__ = ["alpha_beta", "extend_dim", "pad_dims", "clip"]


def alpha_beta(sigmas: Array) -> Tuple[Array, Array]:
    """Trigonometric noise schedule: α=cos(σπ/2), β=sin(σπ/2).

    σ∈[0,1]; σ=0 ⇒ clean signal (α=1), σ=1 ⇒ pure noise (β=1).
    Reference: diffusion.py:77-80 (v-objective, Salimans & Ho 2022).
    """
    angle = sigmas * (pi / 2)
    return jnp.cos(angle), jnp.sin(angle)


def extend_dim(x: Array, dim: int) -> Array:
    """Append trailing singleton axes until ``x.ndim == dim``.

    e.g. dim=3: [b] -> [b,1,1]. Reference: diffusion.py:57-59.
    """
    return x.reshape(x.shape + (1,) * (dim - x.ndim))


def pad_dims(x: Array, ndim: int) -> Array:
    """Append ``ndim`` trailing singleton axes. Reference: diffusion.py:36-38."""
    return x.reshape(x.shape + (1,) * ndim)


def clip(x: Array, dynamic_threshold: float = 0.0) -> Array:
    """Static clamp to [-1,1], or Imagen-style dynamic thresholding.

    Reference: diffusion.py:41-54 (defined there but never called in-repo;
    kept for API parity). ``dynamic_threshold`` is a static quantile in (0,1).
    """
    if dynamic_threshold == 0.0:
        return jnp.clip(x, -1.0, 1.0)
    x_flat = x.reshape(x.shape[0], -1)
    scale = jnp.quantile(jnp.abs(x_flat), dynamic_threshold, axis=-1)
    scale = jnp.maximum(scale, 1.0)
    scale = extend_dim(scale, dim=x.ndim)
    return jnp.clip(x, -scale, scale) / scale
