"""Samplers: the inference hot loops, compiled as single `lax.scan`s.

Reference behavior: diffusion.py:158-190 (VSampler — angular DDIM) and
diffusion.py:193-296 (ARVSampler — chunked sigma-ladder autoregression).
TPU-first design: the per-step Python loop of the reference (one kernel-launch
batch + a host sync per step for tqdm) becomes ONE compiled scan; network
weights stay HBM-resident across all steps, and the only host interaction is
an optional `jax.debug.print` progress line.

The reference's ARVSampler grows a Python list of chunks
(diffusion.py:279-294); here that is a fixed-shape rolling window carried
through the scan, emitting the chunk that exits the window at each shift
(SURVEY.md §7 "hard parts" #6).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import Array, lax

from ..ops.net import Net, cast_inference_params
from ..ops.quant import dequantize_step_params
from .core import alpha_beta
from .schedules import LinearSchedule, Schedule, UniformLambdaSchedule
from .vdiffusion import VDiffusion

__all__ = ["Sampler", "VSampler", "SDESampler", "DPMSampler", "ARVSampler"]


class Sampler:
    """Interface for samplers (reference diffusion.py:154-155)."""

    net: Net
    # True when sample() consumes RNG (its second positional arg is a key);
    # DiffusionModel.sample injects a key automatically.
    needs_key: bool = False

    def sample(self, params: Dict, *args, **kwargs) -> Array:
        raise NotImplementedError()

    def __call__(self, params: Dict, *args, **kwargs) -> Array:
        return self.sample(params, *args, **kwargs)


class VSampler(Sampler):
    """Deterministic angular-DDIM v-sampler as one `lax.scan`.

    Per step (reference diffusion.py:183-188)::

        v      = net(x, σ_i)
        x_pred = α_i·x − β_i·v        (denoised estimate)
        n_pred = β_i·x + α_i·v        (noise estimate)
        x      = α_{i+1}·x_pred + β_{i+1}·n_pred

    Fully deterministic given the initial noise; no RNG key needed.
    """

    diffusion_types = [VDiffusion]

    def __init__(self, net: Net, schedule: Optional[Schedule] = None):
        self.net = net
        self.schedule = schedule or LinearSchedule()

    def sample(self, params: Dict, x_noisy: Array, num_steps: int,
               show_progress: bool = False, unroll: int = 1,
               encoder_reuse: int = 1, **kwargs) -> Array:
        """``encoder_reuse=k`` (k > 1) runs the U-Net's down path (encoder)
        only every k-th step and decodes the k−1 steps between from the
        cached encoder state with fresh σ features ("Faster Diffusion",
        Li et al., arXiv:2312.09608 — PAPERS.md). Approximate: adjacent
        steps' encoder features are nearly identical, so small k trades a
        measured-per-model quality delta for skipping ~45% of reuse-step
        FLOPs. k=1 (default) is the exact reference sampler. Measured
        guidance (set-level Fréchet band distance, two corpora —
        PERFORMANCE.md r4): k=2 is quality-neutral; k≥5 measurably
        reduces set-level fidelity and sample diversity — measure per
        model before shipping."""
        b = x_noisy.shape[0]
        # Cast f32 master params to the compute dtype once, outside the scan
        # (guarantees the converts never run per step regardless of XLA's
        # loop-invariant code motion; bit-identical, see ops/net.py).
        params = cast_inference_params(
            params, getattr(self.net, "compute_dtype", None))
        # Schedule/coefficient math stays f32 even for bf16 carries: bf16
        # sigma points near 1.0 (ULP ~0.008) collapse adjacent steps and
        # a²+β² drifts from 1 per step. Only the carry is in x dtype.
        sigmas = self.schedule(num_steps + 1).astype(jnp.float32)  # [s+1]
        alphas, betas = alpha_beta(sigmas)

        def net_v(x, sig, **extra):
            # int8 params dequantize HERE (inside the loop, anchored to the
            # carry so the dequant streams int8 bytes per step; no-op for
            # unquantized trees) — see ops/quant.py.
            p = dequantize_step_params(
                params, getattr(self.net, "compute_dtype", None), x)
            return self.net.apply(p, x, jnp.full((b,), sig, x.dtype),
                                  **kwargs, **extra)

        def update(x, v_pred, a0, b0, a1, b1):
            x_pred = a0 * x - b0 * v_pred
            noise_pred = b0 * x + a0 * v_pred
            return (a1 * x_pred + b1 * noise_pred).astype(x.dtype)

        if encoder_reuse <= 1:
            def step(x, scan_in):
                sig, a0, b0, a1, b1 = scan_in
                x_next = update(x, net_v(x, sig), a0, b0, a1, b1)
                if show_progress:
                    jax.debug.print("Sampling (noise={s:.2f})", s=sig)
                return x_next, None

            xs = (sigmas[:-1], alphas[:-1], betas[:-1], alphas[1:],
                  betas[1:])
            # unroll > 1 lets XLA overlap adjacent denoising steps (the per-
            # iteration while-loop overhead is measurable at batch 1).
            x, _ = lax.scan(step, x_noisy, xs, unroll=unroll)
            return x

        k = int(encoder_reuse)
        assert num_steps % k == 0, (
            f"num_steps ({num_steps}) must be divisible by encoder_reuse "
            f"({k}) — the scan runs full-encoder chunks of k steps")

        def chunk(x, scan_in):
            sigs, a0s, b0s, a1s, b1s = scan_in  # each [k]
            v, enc = net_v(x, sigs[0], return_hidden=True)
            x = update(x, v, a0s[0], b0s[0], a1s[0], b1s[0])
            for j in range(1, k):  # static unroll inside the chunk
                v = net_v(x, sigs[j], hidden=enc)
                x = update(x, v, a0s[j], b0s[j], a1s[j], b1s[j])
            if show_progress:
                jax.debug.print("Sampling (noise={s:.2f})", s=sigs[0])
            return x, None

        resh = lambda a: a.reshape(num_steps // k, k)  # noqa: E731
        xs = (resh(sigmas[:-1]), resh(alphas[:-1]), resh(betas[:-1]),
              resh(alphas[1:]), resh(betas[1:]))
        x, _ = lax.scan(chunk, x_noisy, xs, unroll=unroll)
        return x


class SDESampler(Sampler):
    """Stochastic (ancestral) variant of the angular v-sampler.

    BEYOND-REFERENCE (the reference ships only the deterministic VSampler,
    diffusion.py:158-190). Interpolates between DDIM and full ancestral
    sampling via ``eta``: at each step the predicted noise is mixed with
    FRESH Gaussian noise,

        n_mix = sqrt(1 - eta²)·n_pred + eta·ε,   ε ~ N(0, I)
        x     = α_{i+1}·x_pred + β_{i+1}·n_mix

    eta=0 reproduces VSampler exactly (bit-for-bit, tested); eta=1 redraws
    the full noise each step (ancestral / maximal churn). Consumes an RNG
    key (needs_key).

    Measured guidance (trained flagship, 50 steps, PERFORMANCE.md r3):
    moderate churn (eta≈0.3) matched or slightly improved corpus spectral
    fidelity at unchanged sample diversity; full churn (eta=1.0) REDUCED
    diversity ~4x and worsened fidelity — each step re-rolls the entire
    noise, so the output is dominated by the final few denoising steps.
    Prefer eta in [0, 0.7]."""

    diffusion_types = [VDiffusion]
    needs_key = True

    def __init__(self, net: Net, schedule: Optional[Schedule] = None,
                 eta: float = 1.0):
        assert 0.0 <= eta <= 1.0, f"eta must be in [0, 1], got {eta}"
        self.net = net
        self.schedule = schedule or LinearSchedule()
        self.eta = eta

    def sample(self, params: Dict, key: Array, x_noisy: Array,
               num_steps: int, show_progress: bool = False,
               unroll: int = 1, **kwargs) -> Array:
        b = x_noisy.shape[0]
        params = cast_inference_params(
            params, getattr(self.net, "compute_dtype", None))
        sigmas = self.schedule(num_steps + 1).astype(jnp.float32)
        alphas, betas = alpha_beta(sigmas)
        mix_fresh = jnp.float32(self.eta)
        mix_pred = jnp.sqrt(jnp.maximum(1.0 - mix_fresh**2, 0.0))

        def step(carry, scan_in):
            x, k = carry
            sig, a0, b0, a1, b1 = scan_in
            k, k_eps = jax.random.split(k)
            p = dequantize_step_params(
                params, getattr(self.net, "compute_dtype", None), x)
            v_pred = self.net.apply(p, x,
                                    jnp.full((b,), sig, x.dtype), **kwargs)
            x_pred = a0 * x - b0 * v_pred
            noise_pred = b0 * x + a0 * v_pred
            # No churn into the final clean state: β_{i+1}=0 kills the
            # noise term on the last step anyway, so this is safe at every
            # step of the standard 1→0 schedule.
            eps = jax.random.normal(k_eps, x.shape, x.dtype)
            n_mix = mix_pred * noise_pred + mix_fresh * eps
            x_next = (a1 * x_pred + b1 * n_mix).astype(x.dtype)
            if show_progress:
                jax.debug.print("Sampling (noise={s:.2f})", s=sig)
            return (x_next, k), None

        xs = (sigmas[:-1], alphas[:-1], betas[:-1], alphas[1:], betas[1:])
        (x, _), _ = lax.scan(step, (x_noisy, key), xs, unroll=unroll)
        return x


class DPMSampler(Sampler):
    """DPM-Solver++(2M) for the trigonometric v-parameterization — a
    second-order multistep ODE solver (Lu et al. 2022, arXiv:2211.01095,
    data-prediction form).

    BEYOND-REFERENCE capability (the reference ships only the first-order
    angular-DDIM VSampler, diffusion.py:158-190): same single net evaluation
    per step, one extra carried tensor, but second-order accuracy in the
    log-SNR step — it reaches a given sample quality in roughly half the
    steps of VSampler. Drop-in: ``DiffusionModel(..., sampler_t=DPMSampler)``
    trains nothing new (pure inference-time change) and solves the SAME
    probability-flow ODE, so outputs converge to VSampler's as steps grow
    (tests/test_dpm_sampler.py pins both properties).

    Update (data prediction; α=cos, β=sin of the shared trig schedule,
    λ = log(α/β), h_i = λ_{i+1} − λ_i, r = h_{i-1}/h_i)::

        x0_i   = α_i·x − β_i·v(x, σ_i)
        D_i    = x0_i + (x0_i − x0_{i-1}) / (2 r)        (D_0 = x0_0)
        x_{i+1} = (β_{i+1}/β_i)·x + α_{i+1}·(1 − e^{−h_i})·D_i

    Compiled as one `lax.scan` like VSampler; deterministic, no RNG.

    Default schedule: UniformLambdaSchedule — exponential integrators step
    uniformly in log-SNR; uniform-σ spacing (LinearSchedule) makes the
    endpoint steps' h explode and measured WORSE than VSampler at every
    step count, while uniform-λ measures 3-4× more accurate than VSampler
    at 16-50 steps (tests/test_dpm_sampler.py).
    """

    diffusion_types = [VDiffusion]

    # λ = log(α/β) is clamped via this floor on α and β so the σ∈{0,1}
    # endpoints (where λ = ±∞) stay finite inside the scan; e^{−h} then
    # underflows to exactly the right limit (0) instead of producing NaNs.
    _EPS = 1e-7

    def __init__(self, net: Net, schedule: Optional[Schedule] = None):
        self.net = net
        self.schedule = schedule or UniformLambdaSchedule()

    def sample(self, params: Dict, x_noisy: Array, num_steps: int,
               show_progress: bool = False, unroll: int = 1,
               encoder_reuse: int = 1, **kwargs) -> Array:
        """``encoder_reuse=k`` works exactly as in :class:`VSampler` (the
        U-Net down path runs every k-th step; decode-only between) — the
        multistep x0 history is carried through reuse steps unchanged.
        k=1 (default) is the exact solver."""
        b = x_noisy.shape[0]
        params = cast_inference_params(
            params, getattr(self.net, "compute_dtype", None))
        sigmas = self.schedule(num_steps + 1).astype(jnp.float32)  # [s+1]
        alphas, betas = alpha_beta(sigmas)
        lam = jnp.log(jnp.maximum(alphas, self._EPS)
                      / jnp.maximum(betas, self._EPS))
        hs = lam[1:] - lam[:-1]  # [s]
        h_prev = jnp.concatenate([jnp.ones_like(hs[:1]), hs[:-1]])

        def net_v(x, sig, **extra):
            p = dequantize_step_params(
                params, getattr(self.net, "compute_dtype", None), x)
            return self.net.apply(p, x, jnp.full((b,), sig, x.dtype),
                                  **kwargs, **extra)

        def update(x, v, x0_prev, is_first, coefs):
            a0, b0, a1, b1, h, hp = coefs
            x0 = a0 * x - b0 * v
            # Second-order correction from the previous x0 estimate;
            # first step falls back to first order (DDIM-equivalent).
            r = hp / h
            d = x0 + jnp.where(is_first, 0.0, 1.0 / (2.0 * r)) * (
                x0 - x0_prev)
            ratio = b1 / jnp.maximum(b0, self._EPS)
            x_next = ratio * x + a1 * (1.0 - jnp.exp(-h)) * d
            # Coefficient math runs f32; the carry stays in the caller's
            # dtype (bf16-safe: f32 carry would break the scan dtype
            # invariant against the bf16 init).
            return x_next.astype(x.dtype), x0.astype(x.dtype)

        k = int(encoder_reuse)
        if k > 1:
            assert num_steps % k == 0, (
                f"num_steps ({num_steps}) must be divisible by "
                f"encoder_reuse ({k})")

        def step(carry, scan_in):
            x, x0_prev, is_first = carry
            if k <= 1:
                sig, *coefs = scan_in
                v = net_v(x, sig)
                x, x0_prev = update(x, v, x0_prev, is_first, coefs)
                if show_progress:
                    jax.debug.print("Sampling (noise={s:.2f})", s=sig)
                return (x, x0_prev, jnp.zeros_like(is_first)), None
            sigs, *coefs_k = scan_in  # each [k]
            v, enc = net_v(x, sigs[0], return_hidden=True)
            x, x0_prev = update(x, v, x0_prev, is_first,
                                [c[0] for c in coefs_k])
            is_first = jnp.zeros_like(is_first)
            for j in range(1, k):  # static unroll inside the chunk
                v = net_v(x, sigs[j], hidden=enc)
                x, x0_prev = update(x, v, x0_prev, is_first,
                                    [c[j] for c in coefs_k])
            if show_progress:
                jax.debug.print("Sampling (noise={s:.2f})", s=sigs[0])
            return (x, x0_prev, is_first), None

        xs = (sigmas[:-1], alphas[:-1], betas[:-1], alphas[1:], betas[1:],
              hs, h_prev)
        if k > 1:
            xs = tuple(a.reshape(num_steps // k, k) for a in xs)
        carry = (x_noisy, jnp.zeros_like(x_noisy),
                 jnp.ones((), jnp.bool_))
        (x, _, _), _ = lax.scan(step, carry, xs, unroll=unroll)
        return x


class ARVSampler(Sampler):
    """Autoregressive chunked sampler with a σ-ladder over the window tail.

    Reference: diffusion.py:193-296. σ is concatenated as an input channel at
    every step (reference diffusion.py:231); the net takes no σ embedding.
    """

    needs_key = True

    def __init__(self, net: Net, in_channels: int, length: int, num_splits: int):
        assert length % num_splits == 0, "length must be divisible by num_splits"
        assert num_splits % 2 == 0, (
            "num_splits must be even: the sigma ladder keeps the first "
            "half of the splits as clean context (reference "
            "diffusion.py:215 n_half = n // 2)")
        self.net = net
        self.in_channels = in_channels
        self.length = length
        self.num_splits = num_splits
        self.split_length = length // num_splits

    def get_sigmas_ladder(self, num_items: int, num_steps_per_split: int) -> Array:
        """Staircase σ pattern over the LAST half of the splits; the first
        half is zeros (clean context). Reference: diffusion.py:213-221.

        Returns [i+1, b, 1, length] where i = num_steps_per_split · n_half.
        """
        b, n, l = num_items, self.num_splits, self.split_length
        i = num_steps_per_split
        n_half = n // 2
        sigmas = jnp.linspace(1.0, 0.0, i * n_half, dtype=jnp.float32)
        # Flat [(n_half · i)] read as n_half groups of i:
        #   out[step, b, 1, split·l + t] = sigmas[split·i + step]
        sigmas = sigmas.reshape(n_half, i)          # [n_half, i]
        sigmas = sigmas.T                            # [i, n_half]
        sigmas = jnp.repeat(sigmas, l, axis=-1)      # [i, n_half·l]
        sigmas = jnp.broadcast_to(sigmas[:, None, None, :], (i, b, 1, n_half * l))
        sigmas = jnp.flip(sigmas, axis=-1)           # lowest noise first
        # Row i+1 loops the ladder back, shifted by one split.
        extra = jnp.zeros_like(sigmas[:1])
        sigmas = jnp.concatenate([sigmas, extra], axis=0)  # [i+1, ...]
        looped = jnp.concatenate(
            [jnp.zeros_like(sigmas[0, :, :, :l]), sigmas[0, :, :, :-l]], axis=-1)
        sigmas = sigmas.at[-1].set(looped)
        # Context half (first n_half splits) stays at σ=0.
        return jnp.concatenate([jnp.zeros_like(sigmas), sigmas], axis=-1)

    def sample_loop(self, params: Dict, current: Array, sigmas: Array,
                    show_progress: bool = False, unroll: int = 1,
                    **kwargs) -> Array:
        """Denoise `current` along a per-sample σ trajectory [steps+1,b,1,t].

        Reference: diffusion.py:223-238 (σ as an input channel per step).
        """
        # Idempotent (already-cast leaves pass through): safe both when
        # called directly and from sample()'s outer scan.
        params = cast_inference_params(
            params, getattr(self.net, "compute_dtype", None))
        alphas, betas = alpha_beta(sigmas)

        def step(x, scan_in):
            sig, a0, b0, a1, b1 = scan_in
            channels = jnp.concatenate([x, sig.astype(x.dtype)], axis=1)
            p = dequantize_step_params(
                params, getattr(self.net, "compute_dtype", None), x)
            v_pred = self.net.apply(p, channels, None, **kwargs)
            x_pred = a0 * x - b0 * v_pred
            noise_pred = b0 * x + a0 * v_pred
            if show_progress:
                # Reference diffusion.py:236 reports the first split's σ.
                jax.debug.print("Sampling (noise={s:.2f})",
                                s=sig[0, 0, -1])
            return a1 * x_pred + b1 * noise_pred, None

        xs = (sigmas[:-1], alphas[:-1], betas[:-1], alphas[1:], betas[1:])
        x, _ = lax.scan(step, current, xs, unroll=unroll)
        return x

    def sample_start(self, params: Dict, key: Array, num_items: int,
                     num_steps: int, **kwargs) -> Array:
        """Denoise the full initial window with a shared linspace schedule.

        Reference: diffusion.py:240-247.
        """
        b, c, t = num_items, self.in_channels, self.length
        sigmas = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
        sigmas = jnp.broadcast_to(sigmas[:, None, None, None], (num_steps + 1, b, 1, t))
        noise = jax.random.normal(key, (b, c, t), dtype=jnp.float32) * sigmas[0]
        return self.sample_loop(params, noise, sigmas, **kwargs)

    def sample(self, params: Dict, key: Array, num_items: int, num_chunks: int,
               num_steps: int, start: Optional[Array] = None,
               show_progress: bool = False, **kwargs) -> Array:
        """Generate `num_chunks` splits autoregressively.

        NOTE: like the reference (diffusion.py:263 unconditionally overwrites
        the `start` argument), a passed `start` is ignored; the parameter is
        kept for API parity.
        """
        n, l, b = self.num_splits, self.split_length, num_items
        assert num_chunks >= n, f"required at least {n} chunks"
        params = cast_inference_params(
            params, getattr(self.net, "compute_dtype", None))
        key_start, key_ladder, key_fresh = jax.random.split(key, 3)

        start_window = self.sample_start(
            params, key_start, num_items=b, num_steps=num_steps,
            show_progress=show_progress, **kwargs)
        if num_chunks == n:
            return start_window

        assert num_steps >= n, "num_steps must be greater than num_splits"
        sigmas = self.get_sigmas_ladder(
            num_items=b, num_steps_per_split=num_steps // n)
        alphas, betas = alpha_beta(sigmas)

        # Noise the start window up to the ladder's entry noise level.
        start_noise = alphas[0] * start_window + betas[0] * jax.random.normal(
            key_ladder, start_window.shape, start_window.dtype)

        # Rolling window: each shift denoises the window along the ladder,
        # emits the split that exits (its final value), then slides one split
        # in a fresh noise chunk. Emitted splits == reference chunks[:num_chunks].
        def shift(window, scan_in):
            j = scan_in
            updated = self.sample_loop(params, window, sigmas,
                                       show_progress=show_progress, **kwargs)
            out_chunk = updated[..., :l]
            fresh = jax.random.normal(
                jax.random.fold_in(key_fresh, j),
                (b, self.in_channels, l), updated.dtype)
            window = jnp.concatenate([updated[..., l:], fresh], axis=-1)
            return window, out_chunk

        _, chunks = lax.scan(shift, start_noise, jnp.arange(num_chunks))
        # chunks: [num_chunks, b, c, l] -> [b, c, num_chunks·l]
        chunks = jnp.moveaxis(chunks, 0, 2)
        return chunks.reshape(b, self.in_channels, num_chunks * l)
