"""Attention blocks for the U-Net: pre-norm self/cross attention + feed-forward.

Behavioral contract (SURVEY.md §2.9 [reconstructed] a-unet AttentionItem /
CrossAttentionItem): pre-LayerNorm multi-head attention over the length axis
with `heads = attention_heads`, `head_dim = attention_features`, residual add,
followed by a feed-forward. Cross-attention keys/values come from `embedding`
[b, n, embedding_features].

TPU notes: attention only runs at coarse U-Net levels (seq ≤ ~1024 for the
README configs — SURVEY.md §5.7), so the exposed matmul+softmax formulation
already maps onto the MXU at measured 97–182 effective TFLOP/s per item
(49–92% of v5e bf16 peak, PERFORMANCE.md round-2 anatomy) — within ~1.25× of
the item's pure-matmul roofline. A Pallas flash kernel is deliberately NOT
used: at these sequence lengths the S×S score tile fits VMEM whole (no
tiling needed, which is all flash attention buys), and fused Mosaic
megakernels measured slower than XLA's own fusion twice on this backend
(PERFORMANCE.md "megakernels" findings).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["Attention", "FeedForward", "AttentionItem", "CrossAttentionItem"]


def _dot_product_attention(q: Array, k: Array, v: Array) -> Array:
    """q,k,v: [B, S, H, D] / [B, T, H, D] -> [B, S, H, D] (BTNH layout —
    no head transposes needed; jax.nn's fused path, f32 softmax)."""
    return jax.nn.dot_product_attention(q, k, v)


class Attention(nn.Module):
    """Multi-head attention over the length axis, channels-last [B, L, C]."""

    heads: int
    head_features: int
    out_features: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        inner = self.heads * self.head_features
        dense = lambda feats, name: nn.DenseGeneral(  # noqa: E731
            feats, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        if context is None:
            # Self-attention: one fused QKV projection (fewer dispatches).
            qkv = dense(3 * inner, "to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(inner, "to_q")(x)
            k = dense(inner, "to_k")(context)
            v = dense(inner, "to_v")(context)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, self.head_features)

        out = _dot_product_attention(split(q), split(k), split(v))
        b, s, h, d = out.shape
        out = out.reshape(b, s, h * d)
        return dense(self.out_features, "to_out")(out)


class FeedForward(nn.Module):
    """GEGLU-free simple MLP: Dense -> GELU -> Dense, ratio 4."""

    features: int
    multiplier: int = 4
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.features * self.multiplier, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        h = nn.gelu(h)
        return nn.Dense(self.features, dtype=self.dtype,
                        param_dtype=self.param_dtype)(h)


class AttentionItem(nn.Module):
    """Pre-LN self-attention + pre-LN feed-forward, both residual."""

    heads: int
    head_features: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = x + Attention(
            heads=self.heads, head_features=self.head_features,
            out_features=c, dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = x + FeedForward(
            features=c, dtype=self.dtype, param_dtype=self.param_dtype)(h)
        return x


class CrossAttentionItem(nn.Module):
    """Pre-LN cross-attention to `embedding` + feed-forward, both residual."""

    heads: int
    head_features: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, embedding: Array) -> Array:
        c = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = x + Attention(
            heads=self.heads, head_features=self.head_features,
            out_features=c, dtype=self.dtype, param_dtype=self.param_dtype)(
                h, context=embedding.astype(h.dtype))
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = x + FeedForward(
            features=c, dtype=self.dtype, param_dtype=self.param_dtype)(h)
        return x
