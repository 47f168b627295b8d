"""Int8 weight-only quantization for inference: attack the HBM weight
stream.

Why: flagship sampling is bound by streaming 733 MB of bf16 weights from
HBM every step (0.90 ms/step floor at ~819 GB/s; PERFORMANCE.md
speed-of-light table). Weight-ONLY int8 halves those bytes: weights are
stored int8 + per-output-channel scales in HBM and dequantized to the
compute dtype in-graph, right at their consumers, so the MXU math is
unchanged (bf16) and activations are untouched. Master f32 params are
never modified — quantization produces a SEPARATE inference tree that
rides the explicit ``params=`` override of ``model.sample``.

The reference has no quantization story (it streams full-precision CUDA
weights each step, reference diffusion.py:158-190); this is a
beyond-reference capability targeting the one floor the round-2 analysis
left standing.

Use::

    qparams = quantize_params(model.params)        # once, outside the loop
    audio = model.sample(noise, num_steps=50, params=qparams)
    service = GenerationService(model, params=qparams)

Mechanics that matter on TPU/XLA:

- :class:`QTensor` is a pytree node ``(q: int8, qscale: f32)``; the tree
  structure (not values) tells the samplers a params tree is quantized, so
  unquantized models trace the EXACT same graph as before (no-op fast
  path).
- Dequantization must happen INSIDE the sampling scan's body, or XLA's
  loop-invariant code motion hoists it and materializes full-width weights
  before the loop — precisely the 733 MB/step stream we are removing (the
  same LICM behavior measured in PERFORMANCE.md round-2 #5).
  :func:`dequantize_step_params` therefore mixes a zero DERIVED FROM THE
  LOOP CARRY into each scale: numerically nothing, but it makes the
  dequant data-dependent on the evolving state, which LICM cannot hoist.
- Scales are per-output-channel (last axis), symmetric, int8 in [-127,127]
  — the standard weight-quant recipe; zero-initialized leaves (modulation
  Dense kernels) quantize to exact zeros.
- ``bits=4`` packs two signed nibbles (values in [-7,7]) per int8 byte —
  4× weight capacity vs bf16 (flagship: 733 → ~186 MB). Pairs are packed
  along the flattened *input* axes so per-output-channel scales are
  untouched. **Measured round 4 (PERFORMANCE.md): int4 is an AT-REST
  format only.** The nibble unpack's relayout does NOT fuse — XLA
  materializes the unpacked int8 intermediate every scan step, so
  streaming packed nibbles measured MORE bytes (761 vs 697 MB/step) and
  2× the wall clock of bf16, at 7.9% rel-RMS error on the trained
  flagship (int8: 444 MB, wall-clock neutral, 0.74%). Store int4 for
  capacity; call :func:`unpack_int4_leaves` ONCE at load to serve from
  the int8 streaming format.
"""
from __future__ import annotations

from math import prod
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import Array

__all__ = [
    "QTensor",
    "quantize_params",
    "dequantize_params",
    "has_qtensors",
    "dequantize_step_params",
    "unpack_int4_leaves",
]


@jax.tree_util.register_pytree_with_keys_class
class QTensor:
    """A quantized weight: int8 values + per-output-channel f32 scales.

    ``orig_dtype`` (aux data, static) records the dtype the dequantized
    leaf should restore to when no compute dtype is given. ``bits`` is 8
    (one value per byte) or 4 (two signed nibbles per byte, packed along
    the flattened input axes); for 4-bit leaves ``orig_shape`` records the
    pre-packing weight shape the dequantizer must restore.
    """

    __slots__ = ("q", "qscale", "orig_dtype", "bits", "orig_shape")

    def __init__(self, q: Array, qscale: Array, orig_dtype: str = "float32",
                 bits: int = 8, orig_shape=None):
        if bits == 4 and orig_shape is None:
            raise ValueError(
                "QTensor(bits=4) requires orig_shape: int4 storage is packed "
                "(two rows per byte) and the pre-packing shape cannot be "
                "recovered from the packed array alone")
        self.q = q
        self.qscale = qscale
        self.orig_dtype = orig_dtype
        self.bits = bits
        self.orig_shape = tuple(orig_shape) if orig_shape is not None else None

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("q"), self.q),
            (jax.tree_util.GetAttrKey("qscale"), self.qscale),
        ), (self.orig_dtype, self.bits, self.orig_shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if isinstance(aux, str):  # pre-int4 aux format (round-3 artifacts)
            aux = (aux, 8, None)
        return cls(children[0], children[1], *aux)

    @property
    def shape(self):
        """LOGICAL (pre-packing) weight shape — what the dequantized array
        will have. For int4 leaves this is ~2x the PHYSICAL storage shape
        (two rows per byte); compute storage bytes from :attr:`packed_shape`
        (= ``self.q.shape``), never from this property."""
        return self.orig_shape if self.orig_shape is not None else self.q.shape

    @property
    def packed_shape(self):
        """PHYSICAL storage shape of the int8 backing array (use for byte
        accounting; equals :attr:`shape` for int8 leaves)."""
        return self.q.shape

    def __repr__(self):
        return (f"QTensor(shape={tuple(self.shape)}, int{self.bits}, "
                f"{self.orig_dtype})")


def _is_q(x: Any) -> bool:
    return isinstance(x, QTensor)


def quantize_leaf(w: Array, bits: int = 8) -> QTensor:
    """Symmetric per-output-channel (last axis) int8/int4 quantization.

    ``bits=4`` packs value pairs along the flattened leading (input) axes:
    byte ``b`` holds row ``2i`` in its low nibble and row ``2i+1`` in its
    high nibble (both signed, range [-7, 7]); an odd row count is padded
    with a zero row that dequantization drops.
    """
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    qmax = 127 if bits == 8 else 7
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)),
                   axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                 -qmax, qmax).astype(jnp.int8)
    if bits == 8:
        return QTensor(q, scale, str(w.dtype))
    n = w.shape[-1]
    m = int(prod(w.shape[:-1]))
    q2 = q.reshape(m, n)
    if m % 2:
        q2 = jnp.concatenate([q2, jnp.zeros((1, n), jnp.int8)], axis=0)
    low, high = q2[0::2], q2[1::2]
    packed = jnp.bitwise_or(jnp.left_shift(high, 4),
                            jnp.bitwise_and(low, 0x0F)).astype(jnp.int8)
    return QTensor(packed, scale, str(w.dtype), bits=4, orig_shape=w.shape)


def _unpack_int4(qt: QTensor) -> Array:
    """Packed (ceil(M/2), N) int8 → (orig_shape) int8 nibble values."""
    p = qt.q
    low = jnp.right_shift(jnp.left_shift(p, 4), 4)  # arithmetic: sign-extend
    high = jnp.right_shift(p, 4)
    n = p.shape[-1]
    rows = jnp.stack([low, high], axis=1).reshape(-1, n)
    m = int(prod(qt.orig_shape[:-1]))
    return rows[:m].reshape(qt.orig_shape)


def dequantize_leaf(qt: QTensor, dtype=None, wiggle: Optional[Array] = None
                    ) -> Array:
    """Rebuild the (approximate) weight in ``dtype`` (default: the original
    dtype). ``wiggle`` — a traced zero — is added to the scales to pin the
    dequant inside a loop body (see module docstring)."""
    dt = jnp.dtype(dtype) if dtype is not None else jnp.dtype(qt.orig_dtype)
    s = qt.qscale if wiggle is None else qt.qscale + wiggle
    q = qt.q if qt.bits == 8 else _unpack_int4(qt)
    # Keep everything at the compute width: a f32 intermediate would double
    # the bytes XLA has to move if the dequant fails to fuse.
    return q.astype(dt) * s.astype(dt)


def quantize_params(params: Dict, min_size: int = 65536,
                    bits: int = 8) -> Dict:
    """Return a NEW tree where every float leaf with ndim >= 2 and at least
    ``min_size`` elements is replaced by a :class:`QTensor`. On the
    flagship this covers 99.7% of the weight bytes (conv kernels, attention
    QKV/out/FF, modulation and skip gates, resampling projections); biases,
    norm scales, and embeddings stay exact. ``bits=4`` stores two values
    per byte (4× capacity; coarser — measure quality per model)."""

    def f(w):
        if (hasattr(w, "ndim") and w.ndim >= 2 and w.size >= min_size
                and jnp.issubdtype(w.dtype, jnp.floating)):
            return quantize_leaf(w, bits=bits)
        return w

    return jax.tree.map(f, params)


def dequantize_params(params: Dict, dtype=None,
                      wiggle: Optional[Array] = None) -> Dict:
    """Inverse of :func:`quantize_params` (lossy): QTensor leaves become
    arrays again; everything else passes through."""
    return jax.tree.map(
        lambda x: dequantize_leaf(x, dtype, wiggle) if _is_q(x) else x,
        params, is_leaf=_is_q)


def unpack_int4_leaves(params: Dict) -> Dict:
    """Convert every int4 QTensor leaf to the int8 streaming format (same
    values, same scales — lossless unpack, done ONCE at load time).

    This is the measured-correct way to SERVE weights stored int4: packed
    nibbles double sampling wall clock when streamed through the scan (the
    unpack relayout doesn't fuse — PERFORMANCE.md round 4), while the int8
    form streams at −36% bytes and neutral wall clock. Int4 remains the
    at-rest/transport format (4× capacity)."""

    def f(leaf):
        if _is_q(leaf) and leaf.bits == 4:
            return QTensor(_unpack_int4(leaf), leaf.qscale, leaf.orig_dtype)
        return leaf

    return jax.tree.map(f, params, is_leaf=_is_q)


def has_qtensors(params: Dict) -> bool:
    """Static (structure-only) check — safe to branch on inside jit."""
    found = False
    for leaf in jax.tree.leaves(params, is_leaf=_is_q):
        if _is_q(leaf):
            found = True
            break
    return found


def dequantize_step_params(params: Dict, dtype, anchor: Array) -> Dict:
    """Per-step dequantization for scan bodies.

    ``anchor`` must be an array that changes across loop iterations (the
    denoising carry): a zero derived from it is mixed into every scale so
    XLA cannot hoist the dequant out of the loop and materialize full-width
    weights. No-op (returns ``params`` unchanged, tracing byte-identical
    graphs) when the tree has no QTensor leaves.
    """
    if not has_qtensors(params):
        return params
    wiggle = (anchor.ravel()[0] * 0).astype(jnp.float32)
    return dequantize_params(params, dtype, wiggle)
