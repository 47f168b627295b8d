"""v-objective diffusion training losses.

Reference behavior: diffusion.py:68-95 (VDiffusion) and diffusion.py:98-130
(ARVDiffusion). JAX-native: losses are pure functions of
``(params, key, x, **cond)`` — RNG is explicit, so a training step is just
``jax.grad(diffusion.loss)(params, key, batch)`` under one ``jit``.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.net import Net
from .core import alpha_beta, extend_dim
from .distributions import Distribution, UniformDistribution

__all__ = ["Diffusion", "VDiffusion", "ARVDiffusion", "mse_loss"]


def mse_loss(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.square(pred - target))


class Diffusion:
    """Interface used by different diffusion methods (reference diffusion.py:62-65)."""

    net: Net

    def loss(self, params: Dict, key: Array, x: Array, **kwargs) -> Array:
        raise NotImplementedError()

    def init_net_params(self, key: Array, x: Array, **kwargs) -> Dict:
        """Initialize the net's params from an example batch (the net input
        layout depends on the diffusion method — σ embedding vs σ channel)."""
        raise NotImplementedError()

    def __call__(self, params: Dict, key: Array, x: Array, **kwargs) -> Array:
        return self.loss(params, key, x, **kwargs)


class VDiffusion(Diffusion):
    """v-objective loss: predict v = α·noise − β·x at a random σ per element.

    Reference: diffusion.py:68-95. ``loss_fn`` is injectable (structured
    losses like multi-resolution STFT work — reference tests/testcustomloss.py).
    """

    def __init__(
        self,
        net: Net,
        sigma_distribution: Optional[Distribution] = None,
        loss_fn: Callable[[Array, Array], Array] = mse_loss,
    ):
        self.net = net
        self.sigma_distribution = sigma_distribution or UniformDistribution()
        self.loss_fn = loss_fn

    def loss(self, params: Dict, key: Array, x: Array, **kwargs) -> Array:
        batch_size = x.shape[0]
        key_sigma, key_noise, key_net = jax.random.split(key, 3)
        sigmas = self.sigma_distribution(key_sigma, batch_size)
        sigmas_batch = extend_dim(sigmas, dim=x.ndim).astype(x.dtype)
        noise = jax.random.normal(key_noise, x.shape, dtype=x.dtype)
        alphas, betas = alpha_beta(sigmas_batch)
        x_noisy = alphas * x + betas * noise
        v_target = alphas * noise - betas * x
        v_pred = self.net.apply(params, x_noisy, sigmas, key=key_net, **kwargs)
        return self.loss_fn(v_pred, v_target)

    def init_net_params(self, key: Array, x: Array, **kwargs) -> Dict:
        sigmas = jnp.zeros((x.shape[0],), dtype=x.dtype)
        return self.net.init(key, x, sigmas, **kwargs)


class ARVDiffusion(Diffusion):
    """Autoregressive v-objective: independent σ per split, σ fed as an
    extra input channel instead of an embedding.

    Reference: diffusion.py:98-130. The net is built with ``in_channels+1``
    and no time conditioning (reference models.py:238, 247-248).
    """

    def __init__(self, net: Net, length: int, num_splits: int,
                 loss_fn: Callable[[Array, Array], Array] = mse_loss):
        assert length % num_splits == 0, "length must be divisible by num_splits"
        self.net = net
        self.length = length
        self.num_splits = num_splits
        self.split_length = length // num_splits
        self.loss_fn = loss_fn

    def loss(self, params: Dict, key: Array, x: Array, **kwargs) -> Array:
        b, _, t = x.shape
        assert t == self.length, "input length must match length"
        key_sigma, key_noise, key_net = jax.random.split(key, 3)
        # One σ per split, broadcast to per-sample resolution along time.
        sigmas = jax.random.uniform(
            key_sigma, (b, 1, self.num_splits), dtype=x.dtype)
        sigmas = jnp.repeat(sigmas, self.split_length, axis=-1)
        noise = jax.random.normal(key_noise, x.shape, dtype=x.dtype)
        alphas, betas = alpha_beta(sigmas)
        x_noisy = alphas * x + betas * noise
        v_target = alphas * noise - betas * x
        # σ rides as an additional input channel (reference diffusion.py:127).
        channels = jnp.concatenate([x_noisy, sigmas], axis=1)
        v_pred = self.net.apply(params, channels, None, key=key_net, **kwargs)
        return self.loss_fn(v_pred, v_target)

    def init_net_params(self, key: Array, x: Array, **kwargs) -> Dict:
        # The AR net sees x with σ as an extra channel (no σ embedding).
        channels = jnp.concatenate([x, jnp.zeros_like(x[:, :1])], axis=1)
        return self.net.init(key, channels, None, **kwargs)
