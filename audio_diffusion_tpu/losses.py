"""Structured audio losses, usable as DiffusionModel ``loss_fn``.

The reference's only test exercises a custom structured loss —
auraloss.MultiResolutionSTFTLoss — through the ``loss_fn`` injection point
(reference tests/testcustomloss.py:22-29, diffusion.py:70). This module is
the native equivalent: differentiable, jit-friendly, built on the same
on-device STFT as the mel front end.

MultiResolutionSTFTLoss = mean over resolutions of
    (spectral convergence + log-magnitude L1),
the standard Yamamoto et al. 2019 (Parallel WaveGAN) formulation auraloss
implements.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from jax import Array

from .dsp.mel import stft

__all__ = ["stft_magnitude", "multi_resolution_stft_loss",
           "MultiResolutionSTFTLoss"]


def stft_magnitude(x: Array, n_fft: int, hop_length: int,
                   win_length: int) -> Array:
    """|STFT| of [..., t] (flattens leading dims; center=False, Hann)."""
    flat = x.reshape((-1, x.shape[-1]))
    return jnp.abs(stft(flat, n_fft, hop_length, win_length))


def _single_resolution(pred: Array, target: Array, n_fft: int,
                       hop: int, win: int, eps: float) -> Array:
    sp = stft_magnitude(pred, n_fft, hop, win)
    st = stft_magnitude(target, n_fft, hop, win)
    sc = jnp.linalg.norm(st - sp) / (jnp.linalg.norm(st) + eps)
    log_mag = jnp.mean(jnp.abs(jnp.log(st + eps) - jnp.log(sp + eps)))
    return sc + log_mag


def multi_resolution_stft_loss(
    pred: Array,
    target: Array,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
    eps: float = 1e-8,
) -> Array:
    """Mean of (spectral convergence + log-mag L1) over resolutions.

    Defaults match auraloss.MultiResolutionSTFTLoss's defaults.
    """
    losses = [
        _single_resolution(pred, target, n, h, w, eps)
        for n, h, w in zip(fft_sizes, hop_sizes, win_lengths)
    ]
    return jnp.mean(jnp.stack(losses))


class MultiResolutionSTFTLoss:
    """Callable wrapper so it drops into ``DiffusionModel(loss_fn=...)``."""

    def __init__(self, fft_sizes: Sequence[int] = (1024, 2048, 512),
                 hop_sizes: Sequence[int] = (120, 240, 50),
                 win_lengths: Sequence[int] = (600, 1200, 240)):
        self.resolutions: Tuple = tuple(
            zip(fft_sizes, hop_sizes, win_lengths))

    def __call__(self, pred: Array, target: Array) -> Array:
        fft, hop, win = zip(*self.resolutions)
        return multi_resolution_stft_loss(
            pred, target, fft_sizes=fft, hop_sizes=hop, win_lengths=win)
