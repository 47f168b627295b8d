"""Fused resnet-item Pallas kernel (folded layout).

One kernel evaluates an entire resnet item — GN → SiLU → conv3 → GN → SiLU →
conv3 → +residual — and optionally the following ModulationItem epilogue
(GN → ·(1+scale)+shift → +residual), with the whole activation VMEM-resident.
Profiling the flagship forward showed it latency-bound at batch 1 (~2 ms of
fixed dispatch overhead per U-Net pass); this collapses ~8-13 XLA kernels per
item into one `pallas_call`.

Layout: folded channels-last [B, Lf, W] with W = fold·C (128-aligned by
construction, see ops/folding.py). The k=3 time conv in folded form is three
shifted [Lf, W]×[W, W] MXU matmuls with the banded kernels from
fold_conv3_kernel. GroupNorm statistics use the lane→group 0/1 matrix M
[W, G] (and its transpose, passed separately — no in-kernel transposes) so
group reductions are matmuls, never lane-dim reshapes.

Training: `fused_resnet_item` carries a custom VJP whose backward re-derives
gradients through the pure-lax reference (`resnet_item_reference`) — the
Pallas kernel only needs to be correct forward; backward costs one extra lax
forward (inference, the hot path, never pays it).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_resnet_item", "resnet_item_reference", "group_map"]


def group_map(fold: int, channels: int, groups: int) -> np.ndarray:
    """Static 0/1 lane→group matrix [fold·C, G]: lane p·C+c belongs to group
    c // (C/groups) — fold position does not affect the group."""
    w = fold * channels
    m = np.zeros((w, groups), np.float32)
    per = channels // groups
    for lane in range(w):
        c = lane % channels
        m[lane, c // per] = 1.0
    return m


def _gn_stats(x, m, mt, rows_per_group, eps):
    """Per-lane (mean, rstd) [1, W] from [Lf, W] input of any float dtype.
    Reductions accumulate in f32 (jnp.sum upcasts), so the statistics are
    identical whether x is stored bf16 or f32 — storage precision only
    affects the VALUES, exactly like the lax path's astype-then-reduce."""
    xf = x.astype(jnp.float32)
    sums = jnp.sum(xf, axis=0, keepdims=True)       # [1, W]
    sqs = jnp.sum(xf * xf, axis=0, keepdims=True)   # [1, W]
    mean_g = jnp.dot(sums, m, preferred_element_type=jnp.float32) / (
        rows_per_group)                              # [1, G]
    var_g = jnp.dot(sqs, m, preferred_element_type=jnp.float32) / (
        rows_per_group) - mean_g * mean_g
    mean_l = jnp.dot(mean_g, mt, preferred_element_type=jnp.float32)
    rstd_l = jnp.dot(jax.lax.rsqrt(var_g + eps), mt,
                     preferred_element_type=jnp.float32)
    return mean_l, rstd_l


def _gn_silu(x, mean_l, rstd_l, scale, bias, dtype):
    """Normalize + scale/shift + SiLU, emitted in `dtype` (the conv input
    precision — matches the lax path's conv1d(h.astype(x.dtype)))."""
    h = (x.astype(jnp.float32) - mean_l) * rstd_l * scale + bias
    return (h * jax.nn.sigmoid(h)).astype(dtype)


def _conv3_padded(h, k3, bias):
    """Folded k=3 conv as three matmuls over one zero-padded buffer
    [Lf+2, W] — operands are overlapping slices, not concat copies.
    h: [Lf, W] in compute dtype; k3 [3, W, W']; returns f32 [Lf, W']."""
    lf, w = h.shape
    zeros = jnp.zeros((1, w), h.dtype)
    hp = jnp.concatenate([zeros, h, zeros], axis=0)  # [Lf+2, W]
    out = (jnp.dot(hp[0:lf], k3[0], preferred_element_type=jnp.float32)
           + jnp.dot(hp[1:lf + 1], k3[1], preferred_element_type=jnp.float32)
           + jnp.dot(hp[2:lf + 2], k3[2], preferred_element_type=jnp.float32))
    return out + bias


def _item_kernel(x_ref, gn1s_ref, gn1b_ref, k1_ref, c1b_ref,
                 gn2s_ref, gn2b_ref, k2_ref, c2b_ref, m_ref, mt_ref,
                 mods_ref, modb_ref, mgs_ref, mgb_ref,
                 out_ref, *, eps: float, use_modulation: bool, dtype):
    """Whole item VMEM-resident in the INPUT dtype: the only full-size f32
    values are transient elementwise tiles; materialized buffers (matmul
    operands/outputs) stay in x.dtype, so the shallow long-length levels
    (Lf·W up to 2M elements) fit comfortably in VMEM as bf16."""
    x = x_ref[0]                                     # [Lf, W], input dtype
    m = m_ref[:].astype(jnp.float32)                 # [W, G]
    mt = mt_ref[:].astype(jnp.float32)               # [G, W]
    rows = x.shape[0] * (m.shape[0] // m.shape[1])   # Lf · lanes-per-group

    f32 = lambda r: r[:].astype(jnp.float32)  # noqa: E731
    mean, rstd = _gn_stats(x, m, mt, rows, eps)
    h = _gn_silu(x, mean, rstd, f32(gn1s_ref), f32(gn1b_ref), dtype)
    h = (_conv3_padded(h, k1_ref[:], f32(c1b_ref))).astype(dtype)
    mean, rstd = _gn_stats(h, m, mt, rows, eps)
    h = _gn_silu(h, mean, rstd, f32(gn2s_ref), f32(gn2b_ref), dtype)
    h = _conv3_padded(h, k2_ref[:], f32(c2b_ref))
    y = (x.astype(jnp.float32) + h).astype(dtype)

    if use_modulation:
        mean, rstd = _gn_stats(y, m, mt, rows, eps)
        hm = (y.astype(jnp.float32) - mean) * rstd * f32(mgs_ref) + f32(
            mgb_ref)
        y = (y.astype(jnp.float32)
             + hm * (1.0 + mods_ref[0].astype(jnp.float32))
             + modb_ref[0].astype(jnp.float32)).astype(dtype)

    out_ref[0] = y.astype(out_ref.dtype)


def resnet_item_reference(x, gn1s, gn1b, k1, c1b, gn2s, gn2b, k2, c2b, m,
                          mods, modb, mgs, mgb, *, eps=1e-5,
                          use_modulation=True):
    """Pure-lax oracle with IDENTICAL math (also the VJP recompute path).
    x: [B, Lf, W]; k: folded [3, W, W]; vectors [1, W]; mods/modb [B, W]."""
    from ..conv import conv1d

    xf = x.astype(jnp.float32)
    mf = m.astype(jnp.float32)
    rows = x.shape[1] * (m.shape[0] // m.shape[1])

    def gn(h, s, b):
        sums = jnp.sum(h, axis=1)                    # [B, W]
        sqs = jnp.sum(h * h, axis=1)
        gsum = sums @ mf / rows                      # [B, G]
        gsq = sqs @ mf / rows
        var = gsq - gsum * gsum
        mean_l = (gsum @ mf.T)[:, None, :]
        rstd_l = (jax.lax.rsqrt(var + eps) @ mf.T)[:, None, :]
        return (h - mean_l) * rstd_l * s.astype(jnp.float32) + b.astype(
            jnp.float32)

    h = gn(xf, gn1s, gn1b)
    h = h * jax.nn.sigmoid(h)
    h = conv1d(h.astype(x.dtype), k1, padding=1).astype(
        jnp.float32) + c1b.astype(jnp.float32)
    h = gn(h, gn2s, gn2b)
    h = h * jax.nn.sigmoid(h)
    h = conv1d(h.astype(x.dtype), k2, padding=1).astype(
        jnp.float32) + c2b.astype(jnp.float32)
    y = xf + h
    if use_modulation:
        hm = gn(y, mgs, mgb)
        y = y + hm * (1.0 + mods.astype(jnp.float32)[:, None, :]) + \
            modb.astype(jnp.float32)[:, None, :]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def fused_resnet_item(x, gn1s, gn1b, k1, c1b, gn2s, gn2b, k2, c2b, m, mt,
                      mods, modb, mgs, mgb,
                      eps=1e-5, use_modulation=True, interpret=False):
    """Fused resnet(+modulation) item.

    x [B, Lf, W]; GN scale/bias and conv biases [1, W] (folded-tiled);
    k1/k2 folded [3, W, W]; m [W, G]; mt [G, W]; mods/modb [B, W].
    """
    b, lf, w = x.shape
    g = m.shape[1]
    vec = pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((3, w, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    bvec = pl.BlockSpec((1, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_item_kernel, eps=eps,
                          use_modulation=use_modulation, dtype=x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, lf, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, kspec, vec,
            vec, vec, kspec, vec,
            pl.BlockSpec((w, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            bvec, bvec, vec, vec,
        ],
        out_specs=pl.BlockSpec((1, lf, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lf, w), x.dtype),
        interpret=interpret,
    )(x, gn1s, gn1b, k1, c1b, gn2s, gn2b, k2, c2b, m, mt, mods, modb,
      mgs, mgb)


def _fwd(x, gn1s, gn1b, k1, c1b, gn2s, gn2b, k2, c2b, m, mt, mods, modb,
         mgs, mgb, eps, use_modulation, interpret):
    out = fused_resnet_item(x, gn1s, gn1b, k1, c1b, gn2s, gn2b, k2, c2b, m,
                            mt, mods, modb, mgs, mgb, eps, use_modulation,
                            interpret)
    return out, (x, gn1s, gn1b, k1, c1b, gn2s, gn2b, k2, c2b, m, mt, mods,
                 modb, mgs, mgb)


def _bwd(eps, use_modulation, interpret, res, g_out):
    (x, gn1s, gn1b, k1, c1b, gn2s, gn2b, k2, c2b, m, mt, mods, modb, mgs,
     mgb) = res
    _, vjp = jax.vjp(
        lambda *a: resnet_item_reference(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], m,
            a[9], a[10], a[11], a[12],
            eps=eps, use_modulation=use_modulation),
        x, gn1s, gn1b, k1, c1b, gn2s, gn2b, k2, c2b, mods, modb, mgs, mgb)
    (dx, dgn1s, dgn1b, dk1, dc1b, dgn2s, dgn2b, dk2, dc2b, dmods, dmodb,
     dmgs, dmgb) = vjp(g_out)
    zero_m = jnp.zeros_like(m)
    zero_mt = jnp.zeros_like(mt)
    return (dx, dgn1s, dgn1b, dk1, dc1b, dgn2s, dgn2b, dk2, dc2b, zero_m,
            zero_mt, dmods, dmodb, dmgs, dmgb)


fused_resnet_item.defvjp(_fwd, _bwd)
