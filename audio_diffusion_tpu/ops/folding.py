"""Lane folding: space-to-depth layout for narrow-channel U-Net levels.

TPU arrays tile the last dim onto 128 lanes. The shallow U-Net levels have
8-64 channels at very long lengths, so a channels-last [B, L, C] layout pads
C up to 128 — wasting up to 16× memory bandwidth and VPU lanes; profiling
the flagship config showed these levels eating ~40% of the forward pass for
~2% of its FLOPs.

The fix: fold F = 128/C consecutive time steps into the channel dim,
[B, L, C] -> [B, L/F, F·C], with within-frame order (time-major, channel-
minor) so every re-fold is a pure reshape of the contiguous (t, c) stream.
Ops translate as:

- Dense / 1×1 conv:      kron(I_F, W)           (full-lane matmul)
- conv k=3 (pad 1):      3-tap conv over FRAMES with a banded kernel built
                         from the ordinary [3, C, C'] weights — output
                         position p in a frame reads input positions p-1..p+1,
                         which live in the same frame or its neighbors
- GroupNorm:             stats via reshape [B, Lf, F, G, C/G]
- per-channel scale/bias: jnp.tile(vec, F)

The banded kernels are loop-invariant in the sampling scan, so XLA hoists
their construction out of the loop. Everything stays standard lax — no
custom kernels needed for this one.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp
from jax import Array

__all__ = ["fold", "unfold", "refold", "fold_conv3_kernel",
           "fold_dense_kernel", "fold_factor", "conv3_as_matmuls", "LANES"]

LANES = 128


def fold_factor(channels: int, lanes: int = LANES) -> int:
    """Largest power-of-two fold F with F·C <= lanes (1 if C >= lanes)."""
    f = 1
    while f * 2 * channels <= lanes:
        f *= 2
    return f


def fold(x: Array, f: int) -> Array:
    """[B, L, C] -> [B, L/f, f·C] (pure reshape)."""
    if f == 1:
        return x
    b, l, c = x.shape
    assert l % f == 0, f"length {l} not divisible by fold {f}"
    return x.reshape(b, l // f, f * c)


def unfold(x: Array, f: int, channels: int) -> Array:
    """[B, Lf, f·C] -> [B, Lf·f, C] (pure reshape)."""
    if f == 1:
        return x
    b, lf, fc = x.shape
    assert fc == f * channels
    return x.reshape(b, lf * f, channels)


def refold(x: Array, f_in: int, channels: int, f_out: int) -> Array:
    """Change fold factor (pure reshape through the contiguous stream)."""
    if f_in == f_out:
        return x
    return fold(unfold(x, f_in, channels), f_out)


def _band_mask(f: int) -> np.ndarray:
    """Static selector M[q, pp, p, d] = 1 iff input (frame q-1, pos pp)
    is the d-1 neighbor of output pos p: (q-1)·f + pp - p == d - 1."""
    q = np.arange(3)[:, None, None, None]
    pp = np.arange(f)[None, :, None, None]
    p = np.arange(f)[None, None, :, None]
    d = np.arange(3)[None, None, None, :]
    return ((q - 1) * f + pp - p == d - 1).astype(np.float32)


def fold_conv3_kernel(w: Array, f: int) -> Array:
    """[3, C, Co] k=3 conv weights -> banded [3, f·C, f·Co] frame-conv
    weights. folded_conv = conv1d(x_folded, result, padding=1)."""
    if f == 1:
        return w
    _, c, co = w.shape
    m = jnp.asarray(_band_mask(f), w.dtype)  # [3, f, f, 3]
    k = jnp.einsum("qapd,dio->qaipo", m, w)  # [3, f, C, f, Co]
    return k.reshape(3, f * c, f * co)


def fold_dense_kernel(w: Array, f: int) -> Array:
    """[C, Co] -> block-diagonal [f·C, f·Co] = kron(I_f, W)."""
    if f == 1:
        return w
    return jnp.kron(jnp.eye(f, dtype=w.dtype), w)


def conv3_as_matmuls(x: Array, k: Array, bias: Optional[Array] = None) -> Array:
    """k=3 / padding=1 conv application point.

    NOTE on the name: an explicit shifted-3-GEMM formulation was measured 2×
    faster than XLA's conv lowering in ISOLATION (see PERFORMANCE.md), but
    end-to-end it LOST both globally (258 → 222 steps/s) and when restricted
    to wide/short deep levels (258 → 230): inside the real program XLA fuses
    the conv with its GN/SiLU neighbors better than the concat+GEMM chain.
    Lesson recorded; this simply applies XLA's conv.
    """
    from jax import lax

    out = lax.conv_general_dilated(
        x, k, (1,), ((1, 1),), dimension_numbers=("NHC", "HIO", "NHC"))
    if bias is not None:
        out = out + bias
    return out
