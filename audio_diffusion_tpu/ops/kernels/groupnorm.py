"""Fused GroupNorm + SiLU Pallas kernel.

The resnet item's prologue (GN → SiLU, SURVEY.md §2.9) is HBM-bandwidth
bound: a naive implementation reads the activation twice (once for the
moment reduction, once for normalization). This kernel computes group
moments and applies normalize+scale+shift+SiLU in one VMEM-resident pass per
(batch, length-tile) block.

Layout: channels-last [B, L, C]; groups divide C. Each grid step owns one
(batch row, L-tile) block with all channels resident, so group moments for
that block's rows are exact (GroupNorm reduces over (L, C/g) — note the
reduction spans the FULL length axis, so we tile only over batch and keep L
whole per block; for the U-Net's deeper levels L·C comfortably fits VMEM,
and the wide-L shallow levels have tiny C).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_groupnorm_silu", "groupnorm_silu_reference"]


def groupnorm_silu_reference(x: Array, scale: Array, bias: Array,
                             num_groups: int, eps: float = 1e-5) -> Array:
    """Reference: GroupNorm over (L, C/g) per batch row, then SiLU."""
    b, l, c = x.shape
    xg = x.reshape(b, l, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, l, c)
    y = xn * scale + bias
    return y * jax.nn.sigmoid(y)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, out_ref, *, num_groups: int,
                    eps: float):
    x = x_ref[0].astype(jnp.float32)  # [L, C]
    l, c = x.shape
    cg = c // num_groups
    xg = x.reshape(l, num_groups, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    centered = xg - mean
    var = jnp.mean(centered * centered, axis=(0, 2), keepdims=True)
    xn = (centered * jax.lax.rsqrt(var + eps)).reshape(l, c)
    y = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    out_ref[0] = (y * jax.nn.sigmoid(y)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def fused_groupnorm_silu(x: Array, scale: Array, bias: Array,
                         num_groups: int, eps: float = 1e-5,
                         interpret: bool = False) -> Array:
    """x: [B, L, C]; scale/bias: [C]. One batch row per grid step."""
    b, l, c = x.shape
    assert c % num_groups == 0
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        interpret=interpret,
    )(x, scale, bias)
