"""RePaint-style inpainting as a single `lax.scan` over steps.

Reference behavior: diffusion.py:306-354 (VInpainter). Per outer step i, run
`num_resamples` inner iterations of: v-step → renoise (stay at level i unless
last resample, then step to i+1) → overwrite the known region with the source
noised to the same level. Mask semantics: True = keep source
(reference README.md:197).

The inner resample loop has a static trip count, so it is unrolled in Python
inside the scan body; per-(step, resample) noise comes from `fold_in`-derived
keys, keeping the whole sampler one compiled computation.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import Array, lax

from ..ops.net import Net, cast_inference_params
from .core import alpha_beta
from .schedules import LinearSchedule, Schedule
from .vdiffusion import VDiffusion

__all__ = ["Inpainter", "VInpainter"]


class Inpainter:
    """Interface (reference diffusion.py:302-303)."""

    net: Net


class VInpainter(Inpainter):

    diffusion_types = [VDiffusion]

    def __init__(self, net: Net, schedule: Optional[Schedule] = None):
        self.net = net
        self.schedule = schedule or LinearSchedule()

    def sample(
        self,
        params: Dict,
        key: Array,
        source: Array,
        mask: Array,
        num_steps: int,
        num_resamples: int,
        show_progress: bool = False,
        x_noisy: Optional[Array] = None,
        **kwargs,
    ) -> Array:
        params = cast_inference_params(
            params, getattr(self.net, "compute_dtype", None))
        key_init, key_loop = jax.random.split(key)
        if x_noisy is None:
            x_noisy = jax.random.normal(key_init, source.shape, source.dtype)
        b = x_noisy.shape[0]
        assert num_resamples >= 1, (
            "num_resamples must be >= 1 (0 would skip every denoising "
            "step and return the starting noise unchanged)")
        # f32 schedule/coefficients regardless of carry dtype (see VSampler).
        sigmas = self.schedule(num_steps + 1).astype(jnp.float32)  # [s+1]
        alphas, betas = alpha_beta(sigmas)
        mask = mask.astype(bool)

        def step(x, scan_in):
            i, sig_i, a_i, b_i, a_next, b_next = scan_in
            # int8 trees dequantize inside the loop body (ops/quant.py).
            from ..ops.quant import dequantize_step_params
            p = dequantize_step_params(
                params, getattr(self.net, "compute_dtype", None), x)
            for r in range(num_resamples):
                v_pred = self.net.apply(
                    p, x, jnp.full((b,), sig_i, x.dtype), **kwargs)
                x_pred = a_i * x - b_i * v_pred
                noise_pred = b_i * x + a_i * v_pred
                # Stay at level i while resampling; step to i+1 on the last.
                last = r == num_resamples - 1
                a_j = a_next if last else a_i
                b_j = b_next if last else b_i
                x = a_j * x_pred + b_j * noise_pred
                k = jax.random.fold_in(jax.random.fold_in(key_loop, r), i)
                s_noisy = a_j * source + b_j * jax.random.normal(
                    k, source.shape, source.dtype)
                x = jnp.where(mask, s_noisy, x).astype(x_noisy.dtype)
            return x, None

        xs = (jnp.arange(num_steps), sigmas[:-1],
              alphas[:-1], betas[:-1], alphas[1:], betas[1:])
        x, _ = lax.scan(step, x_noisy, xs)
        return x

    def __call__(self, params: Dict, *args, **kwargs) -> Array:
        return self.sample(params, *args, **kwargs)
