"""The Net bundle: the single contract between diffusion engine and network.

In the reference, diffusion methods and samplers hold ``self.net`` and call
``self.net(x_noisy, sigmas, **kwargs)`` (reference diffusion.py:94, 184) — the
only contract the network must satisfy (SURVEY.md §1 L3→L1). Here, with a
functional core, that contract becomes::

    net.apply(params, x, sigmas=None, *, key=None, **cond) -> Array

where ``params`` is a pytree, ``key`` an optional PRNG key (consumed by
stochastic conditioning such as CFG embedding dropout), and ``cond`` carries
the conditioning kwargs (``embedding``, ``channels``, ``append_channels``,
``features``, ``embedding_mask_proba``, ``embedding_scale``, ...).

``Net`` wraps a flax.linen module and adapts this signature onto
``module.apply``. Network factories (``UNetV0`` and plugin wrappers) return
``Net`` instances so the whole diffusion stack stays framework-agnostic.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

# Canonical home is utils (shared with split_static_kwargs); re-exported
# here for the historical import path.
from ..utils import contains_array  # noqa: F401

__all__ = ["Net", "contains_array", "cast_inference_params"]

# Param leaves that must stay float32 even under a bf16 compute dtype:
# SigmaEmbedding's fourier `freqs` are consumed in f32 (large angles feed
# sin/cos; bf16 mantissa would visibly perturb the time embedding).
_KEEP_F32 = ("freqs",)


def cast_inference_params(params: Dict, dtype) -> Dict:
    """Cast float32 parameter leaves to the compute dtype ONCE, outside the
    sampling scan.

    Every parameter use in the net already casts per-op to the compute
    dtype, so pre-casting is bit-identical (verified by
    tests/test_cast_params.py and a TPU A/B). Measured perf-NEUTRAL on the
    flagship bench — XLA's loop-invariant code motion already hoists the
    converts out of the scan — so this exists to make that invariant
    explicit and guaranteed at every XLA version, not as a speedup
    (PERFORMANCE.md round-2 notes). No-op when dtype is None.
    """
    if dtype is None or dtype == jnp.float32:
        return params

    from .quant import QTensor

    def cast(path, leaf):
        if isinstance(leaf, QTensor):
            # Quantized leaves stay (int8, f32-scale) — they are
            # dequantized to the compute dtype inside the scan body
            # (ops/quant.py); casting the scale here would stack bf16
            # rounding on top of the int8 error.
            return leaf
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf.dtype == jnp.float32 and name not in _KEEP_F32:
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(
        cast, params, is_leaf=lambda x: isinstance(x, QTensor))


class Net:
    """A linen module + standardized (x, sigmas, **cond) call adapter."""

    def __init__(
        self,
        module: Any,
        in_channels: int,
        out_channels: int,
        uses_sigma: bool = True,
        compute_dtype: Any = None,
    ):
        self.module = module
        self.in_channels = in_channels
        self.out_channels = out_channels
        # The net's compute dtype (dtype= passed to the factory); samplers
        # use it to pre-cast f32 master params before their scans.
        self.compute_dtype = compute_dtype
        # Optional host-side text encoder; set by UNetV0 when
        # use_text_conditioning=True. The model layer uses it to turn
        # `text=[...]` into an `embedding=` array before entering jit.
        self.text_encoder = None
        # False for AR nets: σ rides as an input channel instead of an
        # embedding (reference models.py:247-248, diffusion.py:127-129).
        self.uses_sigma = uses_sigma

    # -- functional API ----------------------------------------------------
    def init(self, key: Array, x: Array, sigmas: Optional[Array] = None,
             **cond) -> Dict:
        """Initialize parameters from example inputs; returns the params
        pytree. The init runs under ONE jit (linen's bare module.init
        dispatches the forward op-by-op — pathological over a remote-device
        transport and slow everywhere)."""
        arrays = {k: v for k, v in cond.items() if contains_array(v)}
        static = {k: v for k, v in cond.items() if k not in arrays}

        def do_init(key_params, key_call, x, sigmas, arrays):
            return self.module.init(
                {"params": key_params, "cfg": key_call},
                x, sigmas, **arrays, **static,
            )

        key_params, key_call = jax.random.split(key)
        variables = jax.jit(do_init)(key_params, key_call, x, sigmas, arrays)
        return variables["params"]

    def apply(self, params: Dict, x: Array, sigmas: Optional[Array] = None,
              *, key: Optional[Array] = None, **cond) -> Array:
        rngs = {"cfg": key} if key is not None else None
        return self.module.apply({"params": params}, x, sigmas, rngs=rngs, **cond)

    def __call__(self, params: Dict, x: Array, sigmas: Optional[Array] = None,
                 **kwargs) -> Array:
        return self.apply(params, x, sigmas, **kwargs)
