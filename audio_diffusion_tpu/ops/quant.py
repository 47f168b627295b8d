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
"""
from __future__ import annotations

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
]


@jax.tree_util.register_pytree_with_keys_class
class QTensor:
    """A quantized weight: int8 values + per-output-channel f32 scales.

    ``orig_dtype`` (aux data, static) records the dtype the dequantized
    leaf should restore to when no compute dtype is given.
    """

    __slots__ = ("q", "qscale", "orig_dtype")

    def __init__(self, q: Array, qscale: Array, orig_dtype: str = "float32"):
        self.q = q
        self.qscale = qscale
        self.orig_dtype = orig_dtype

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("q"), self.q),
            (jax.tree_util.GetAttrKey("qscale"), self.qscale),
        ), self.orig_dtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @property
    def shape(self):
        return self.q.shape

    def __repr__(self):
        return f"QTensor(shape={tuple(self.q.shape)}, {self.orig_dtype})"


def _is_q(x: Any) -> bool:
    return isinstance(x, QTensor)


def quantize_leaf(w: Array) -> QTensor:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)),
                   axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return QTensor(q.astype(jnp.int8), scale, str(w.dtype))


def dequantize_leaf(qt: QTensor, dtype=None, wiggle: Optional[Array] = None
                    ) -> Array:
    """Rebuild the (approximate) weight in ``dtype`` (default: the original
    dtype). ``wiggle`` — a traced zero — is added to the scales to pin the
    dequant inside a loop body (see module docstring)."""
    dt = jnp.dtype(dtype) if dtype is not None else jnp.dtype(qt.orig_dtype)
    s = qt.qscale if wiggle is None else qt.qscale + wiggle
    # Keep everything at the compute width: a f32 intermediate would double
    # the bytes XLA has to move if the dequant fails to fuse.
    return qt.q.astype(dt) * s.astype(dt)


def quantize_params(params: Dict, min_size: int = 65536) -> Dict:
    """Return a NEW tree where every float leaf with ndim >= 2 and at least
    ``min_size`` elements is replaced by a :class:`QTensor`. On the
    flagship this covers 99.7% of the weight bytes (conv kernels, attention
    QKV/out/FF, modulation and skip gates, resampling projections); biases,
    norm scales, and embeddings stay exact."""

    def f(w):
        if (hasattr(w, "ndim") and w.ndim >= 2 and w.size >= min_size
                and jnp.issubdtype(w.dtype, jnp.floating)):
            return quantize_leaf(w)
        return w

    return jax.tree.map(f, params)


def dequantize_params(params: Dict, dtype=None,
                      wiggle: Optional[Array] = None) -> Dict:
    """Inverse of :func:`quantize_params` (lossy): QTensor leaves become
    arrays again; everything else passes through."""
    return jax.tree.map(
        lambda x: dequantize_leaf(x, dtype, wiggle) if _is_q(x) else x,
        params, is_leaf=_is_q)


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
