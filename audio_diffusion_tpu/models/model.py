"""DiffusionModel: the composition root (net + diffusion + sampler).

API parity with reference models.py:22-45: flat kwargs routed by prefix
(`diffusion_*` -> diffusion_t, `sampler_*` -> sampler_t, rest -> net_t), then
``loss = model(audio)`` / ``model.sample(noise, num_steps=...)``.

JAX-native mechanics underneath:

- The model owns ``params`` (a pytree: ``{"net": ..., [task extras]}``) and a
  PRNG key; parameters auto-initialize from the first batch (or explicitly
  via :meth:`initialize`).
- ``model.loss(params, key, x, **cond)`` is the PURE loss for custom train
  loops — ``jax.grad`` it directly (reference users call loss.backward();
  here they get a pure function instead, SURVEY.md §3.1).
- Convenience calls (``model(x)``, ``model.sample(...)``) run through a jit
  cache: array-valued arguments are traced, Python scalars (num_steps,
  embedding_scale, ...) are static, so each distinct configuration compiles
  once and the sampling loop is a single fused XLA computation.
- ``text=[...]`` is encoded host-side ONCE per call into ``embedding=``
  before entering jit (see ops/components.py docstring).
"""
from __future__ import annotations

import inspect
from abc import ABC, abstractmethod
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..diffusion import VDiffusion, VSampler, mse_loss
from ..utils import (default, dequant_pcm16 as _dequant_audio, groupby,
                     split_static_kwargs)

__all__ = ["DiffusionModel", "EncoderBase", "AdapterBase"]


from ..ops.net import contains_array as _contains_array


class DiffusionModel:
    def __init__(
        self,
        net_t: Callable,
        diffusion_t: Callable = VDiffusion,
        sampler_t: Callable = VSampler,
        loss_fn: Callable = mse_loss,
        dim: int = 1,
        seed: int = 0,
        **kwargs,
    ):
        diffusion_kwargs, kwargs = groupby("diffusion_", kwargs)
        sampler_kwargs, kwargs = groupby("sampler_", kwargs)

        self.net = net_t(dim=dim, **kwargs)
        self.diffusion = diffusion_t(
            net=self.net, loss_fn=loss_fn, **diffusion_kwargs)
        self.sampler = sampler_t(net=self.net, **sampler_kwargs)

        self.params: Optional[Dict] = None
        self._rng = jax.random.key(seed)
        self._jit_cache: Dict[str, Callable] = {}

    # ------------------------------------------------------------------ rng
    def next_key(self) -> Array:
        self._rng, key = jax.random.split(self._rng)
        return key

    # ----------------------------------------------------- text conditioning
    def _process_cond(self, kwargs: Dict) -> Dict:
        if "text" in kwargs:
            text = kwargs.pop("text")
            encoder = getattr(self.net, "text_encoder", None)
            assert encoder is not None, (
                "text= requires a net built with use_text_conditioning=True "
                "(or pass embedding= directly)")
            assert "embedding" not in kwargs, (
                "pass either text= or embedding=, not both")
            kwargs["embedding"] = jnp.asarray(encoder(list(text)))
        return kwargs

    # ------------------------------------------------------------- persist
    def save(self, path) -> None:
        """Save the parameter pytree (orbax). The torch analog of
        `state_dict()` persistence — the reference relies on nn.Module
        state_dict (SURVEY.md §5.4)."""
        import orbax.checkpoint as ocp
        from pathlib import Path

        assert self.params is not None, "no params to save"
        ckptr = ocp.StandardCheckpointer()
        # force=True: re-saving to the same path must overwrite, not crash
        # (the CLI resume flow re-exports after continuing training).
        ckptr.save(Path(path).absolute(), self.params, force=True)
        ckptr.wait_until_finished()

    def load(self, path) -> Dict:
        """Restore params saved by :meth:`save`. The model must be
        initialized first (to provide the tree structure/shapes)."""
        import orbax.checkpoint as ocp
        from pathlib import Path

        assert self.params is not None, (
            "initialize the model first (the checkpoint is restored against "
            "the existing tree structure)")
        ckptr = ocp.StandardCheckpointer()
        self.params = ckptr.restore(Path(path).absolute(), target=self.params)
        return self.params

    # ------------------------------------------------------------------ init
    def init_params(self, key: Array, x: Array, **kwargs) -> Dict:
        """Build the full parameter pytree from an example batch."""
        return {"net": self.diffusion.init_net_params(key, x, **kwargs)}

    def initialize(self, x, key: Optional[Array] = None, **kwargs) -> Dict:
        kwargs = self._process_cond(kwargs)
        key = default(key, self.next_key)
        # One jit around the whole init: linen's module.init otherwise
        # dispatches the forward op-by-op (slow; pathological on remote
        # devices).
        self.params = self._jitted("init", self.init_params,
                                   key=key, x=_dequant_audio(jnp.asarray(x)),
                                   **kwargs)
        return self.params

    def _auto_init(self, x, kwargs: Dict):
        if self.params is None:
            init_kwargs = {
                k: v for k, v in kwargs.items()
                if k not in ("with_info",)}
            self.initialize(x, **init_kwargs)

    # ------------------------------------------------------------- pure fns
    def loss(self, params: Dict, key: Array, x: Array, **kwargs) -> Array:
        """PURE training loss — differentiate with jax.grad. Text must be
        pre-encoded to embedding= (use model._process_cond or encode_text).

        int16 audio (AudioDataset's PCM16 passthrough batches) is
        dequantized x/32768 in-graph — bit-exact vs the float32 decode."""
        return self.diffusion.loss(params["net"], key, _dequant_audio(x),
                                   **kwargs)

    def sample_fn(self, params: Dict, *args, **kwargs) -> Array:
        """PURE sampling function (jittable)."""
        return self.sampler.sample(params["net"], *args, **kwargs)

    # ------------------------------------------------------- jit dispatcher
    def _jitted(self, tag: str, fn: Callable, /, **all_kwargs):
        """Call fn(**all_kwargs) under jit: array-valued kwargs traced,
        scalars static. One compiled program per (tag, static config,
        array-structure) combination."""
        # Static values are wrapped (not converted): dict/list-valued kwargs
        # hash via a frozen key but reach fn with their original type.
        dynamic, static_items = split_static_kwargs(all_kwargs)

        if tag not in self._jit_cache:
            def run(dyn, stat_items):
                merged = dict(dyn)
                merged.update({k: s.value for k, s in stat_items})
                return fn(**merged)

            self._jit_cache[tag] = jax.jit(run, static_argnums=(1,))
        return self._jit_cache[tag](dynamic, static_items)

    # ------------------------------------------------------------ user API
    def __call__(self, x, *args, key: Optional[Array] = None,
                 **kwargs) -> Array:
        """Training loss on a batch (reference models.py:40-41)."""
        assert not args, "pass conditioning as keyword arguments"
        x = jnp.asarray(x)
        kwargs = self._process_cond(kwargs)
        self._auto_init(x, kwargs)
        key = default(key, self.next_key)
        return self._jitted("loss", self.loss,
                            params=self.params, key=key, x=x, **kwargs)

    def sample(self, *args, key: Optional[Array] = None,
               params: Optional[Dict] = None, **kwargs) -> Array:
        """Draw samples (reference models.py:43-45). Extra leading `key`
        argument is injected for samplers that consume RNG (ARVSampler).

        ``params=`` overrides the model's live parameters for THIS call only
        (no shared-state mutation) — e.g. a serving thread sampling from an
        EMA snapshot while a trainer keeps updating ``model.params``."""
        kwargs = self._process_cond(kwargs)
        if params is None and self.params is None \
                and args and _contains_array(args[0]):
            # Only net-conditioning kwargs participate in initialization;
            # sampler-consumed names (num_steps, show_progress, ...) must
            # not leak into the net's init kwargs.
            sampler_named = set(inspect.signature(
                type(self.sampler).sample).parameters) - {"kwargs"}
            self._auto_init(args[0], {k: v for k, v in kwargs.items()
                                      if k not in sampler_named})
        params = default(params, self.params)
        assert params is not None, (
            "initialize the model first (call model(x) or model.initialize)")
        # Bind positional args to the sampler's parameter names so they can
        # ride through the static/dynamic kwarg split.
        sig = inspect.signature(type(self.sampler).sample)
        if getattr(self.sampler, "needs_key", False):
            key_args = (key if key is not None else self.next_key(),)
        else:
            # Deterministic samplers take no key; a user-passed key= must
            # NOT be bound positionally (it would land on x_noisy).
            assert key is None, (
                f"{type(self.sampler).__name__} is deterministic and takes "
                "no key")
            key_args = ()
        bound = sig.bind(self.sampler, params["net"], *key_args, *args,
                         **kwargs)
        call_kwargs = dict(bound.arguments)
        call_kwargs.pop("self")
        var_kw = call_kwargs.pop("kwargs", {})
        call_kwargs.update(var_kw)
        # Replace net-params with full params so task models can override
        # sample_fn; route through sample_fn for uniformity.
        call_kwargs["params"] = params

        def run_sample(**kw):
            p = kw.pop("params")
            return self.sample_fn(p, **kw)

        return self._jitted("sample", run_sample, **call_kwargs)


class EncoderBase(ABC):
    """Abstract encoder for DiffusionAE (reference models.py:48-55).

    Subclasses expose ``out_channels`` and ``downsample_factor`` plus the
    functional pair ``init(key, x)`` / ``apply(params, x, with_info=False)``.
    """

    out_channels: int
    downsample_factor: int

    @abstractmethod
    def init(self, key: Array, x: Array) -> Dict:
        ...

    @abstractmethod
    def apply(self, params: Dict, x: Array, with_info: bool = False):
        ...


class AdapterBase(ABC):
    """Abstract adapter for DiffusionAE (reference models.py:58-67).

    Stateless (or frozen-parameter) transform pair; applied around the
    diffusion space. The reference freezes adapter params
    (models.py:96 ``requires_grad_(False)``); here adapters are plain
    callables, so frozen by construction.
    """

    @abstractmethod
    def encode(self, x: Array) -> Array:
        ...

    @abstractmethod
    def decode(self, x: Array) -> Array:
        ...
