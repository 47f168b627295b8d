"""Unit tests for the pure diffusion math, with a stub net.

Closed-form checks at σ∈{0, ½, 1} (SURVEY.md §4); sampler/inpainter behavior
validated against hand-derived identities that hold for ANY net:

- With a net that returns zeros, the VSampler update reduces to a pure
  rotation: x_{i+1} = (α_{i+1}·α_i + β_{i+1}·β_i)·x_i = cos(Δangle)·x_i.
- VDiffusion loss with a perfect net (returns v_target) is exactly 0.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu.diffusion import (
    ARVDiffusion,
    ARVSampler,
    LinearSchedule,
    UniformDistribution,
    VDiffusion,
    VInpainter,
    VSampler,
    alpha_beta,
    clip,
    extend_dim,
)


class StubNet:
    """Net-protocol stub: applies a fixed function, ignores params."""

    def __init__(self, fn, in_channels=2, out_channels=2, uses_sigma=True):
        self.fn = fn
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.uses_sigma = uses_sigma

    def init(self, key, x, sigmas=None, **kw):
        return {}

    def apply(self, params, x, sigmas=None, *, key=None, **kw):
        return self.fn(x, sigmas)


def test_alpha_beta_endpoints():
    a, b = alpha_beta(jnp.array([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(a, [1.0, math.cos(math.pi / 4), 0.0], atol=1e-6)
    np.testing.assert_allclose(b, [0.0, math.sin(math.pi / 4), 1.0], atol=1e-6)
    # α² + β² = 1 everywhere
    s = jnp.linspace(0, 1, 17)
    a, b = alpha_beta(s)
    np.testing.assert_allclose(a**2 + b**2, np.ones(17), atol=1e-6)


def test_extend_dim():
    x = jnp.ones((4,))
    assert extend_dim(x, 3).shape == (4, 1, 1)
    assert extend_dim(jnp.ones((2, 3)), 4).shape == (2, 3, 1, 1)


def test_clip_static_and_dynamic():
    x = jnp.array([[-3.0, 0.5, 2.0]])
    np.testing.assert_allclose(clip(x), [[-1.0, 0.5, 1.0]], atol=1e-6)
    # Dynamic threshold: quantile-scaled clamp, output within [-1, 1].
    y = clip(jnp.array([[-10.0, 1.0, 5.0, 0.1]]), dynamic_threshold=0.75)
    assert jnp.all(jnp.abs(y) <= 1.0 + 1e-6)


def test_uniform_distribution_range():
    d = UniformDistribution(vmin=0.2, vmax=0.8)
    s = d(jax.random.key(0), 1000)
    assert s.shape == (1000,)
    assert float(s.min()) >= 0.2 and float(s.max()) < 0.8


def test_linear_schedule():
    s = LinearSchedule()(11)
    np.testing.assert_allclose(s, np.linspace(1.0, 0.0, 11), atol=1e-7)
    s2 = LinearSchedule(start=0.9, end=0.1)(5)
    np.testing.assert_allclose(s2, np.linspace(0.9, 0.1, 5), atol=1e-7)


def test_vdiffusion_perfect_net_zero_loss():
    # A net that reconstructs v_target exactly ⇒ loss 0. Since
    # v_target = α·noise − β·x and x_noisy = α·x + β·noise, and the stub sees
    # only (x_noisy, σ), we use x=0 input: then x_noisy = β·noise and
    # v_target = α·noise = (α/β)·x_noisy.
    def fn(x_noisy, sigmas):
        a, b = alpha_beta(extend_dim(sigmas, x_noisy.ndim))
        return (a / b) * x_noisy

    diffusion = VDiffusion(
        net=StubNet(fn), sigma_distribution=UniformDistribution(0.1, 0.9))
    x = jnp.zeros((3, 2, 64))
    loss = diffusion.loss({}, jax.random.key(1), x)
    assert float(loss) < 1e-10


def test_vdiffusion_zero_net_loss_value():
    # Net ≡ 0 ⇒ loss = E[v_target²] = E[(α·n − β·x)²]. With x = 0:
    # loss = E[α²]·E[n²] ≈ E[α²] for unit-variance noise.
    diffusion = VDiffusion(
        net=StubNet(lambda x, s: jnp.zeros_like(x)),
        sigma_distribution=UniformDistribution(0.0, 1.0),
    )
    x = jnp.zeros((64, 2, 256))
    loss = float(diffusion.loss({}, jax.random.key(2), x))
    # E[cos²(σπ/2)] over σ~U[0,1] = 1/2
    assert abs(loss - 0.5) < 0.05


def test_vsampler_zero_net_rotation_identity():
    # Zero net ⇒ x_{i+1} = cos(Δ)·x_i where Δ = (σ_i − σ_{i+1})·π/2,
    # so the final x = prod cos(Δ_i)·x_0.
    num_steps = 10
    sampler = VSampler(net=StubNet(lambda x, s: jnp.zeros_like(x)))
    x0 = jnp.ones((2, 2, 32))
    out = sampler.sample({}, x0, num_steps=num_steps)
    sig = np.linspace(1.0, 0.0, num_steps + 1)
    factor = np.prod(np.cos((sig[:-1] - sig[1:]) * math.pi / 2))
    np.testing.assert_allclose(out, factor * np.ones((2, 2, 32)), rtol=1e-5)


def test_vsampler_perfect_net_recovers_signal():
    # If the net predicts the true v for a known clean signal x*, the sampler
    # starting from pure noise... needs the true noise; instead check the
    # one-step consistency: for num_steps=1, starting at σ=1 (x_noisy=noise),
    # v = α·noise − β·x* = 1·noise (σ=1 ⇒ α=0? no: at σ=1, α=0,β=1 ⇒
    # v = −x*). Net returning −x* constantly gives x_pred = α·x − β·v = x*·β...
    # Simplest exact identity: net(x,σ) = −x* (true v at σ=1 for x_noisy=noise):
    # step i=0: x_pred = 0·noise − 1·(−x*) = x*; noise_pred = 1·noise + 0 = noise;
    # x_1 = α_1·x* + β_1·noise. With num_steps=1, σ_1=0 ⇒ x_1 = x*.
    x_star = jnp.sin(jnp.linspace(0, 7, 64)).reshape(1, 1, 64)
    sampler = VSampler(net=StubNet(lambda x, s: -jnp.broadcast_to(x_star, x.shape)))
    noise = jax.random.normal(jax.random.key(0), (1, 1, 64))
    out = sampler.sample({}, noise, num_steps=1)
    np.testing.assert_allclose(out, x_star, atol=1e-5)


def test_vinpainter_mask_semantics():
    # With a zero net and σ schedule ending at 0, the masked (known) region
    # must equal the source exactly at the end (last renoise has β=0).
    source = jnp.ones((1, 1, 32))
    mask = jnp.zeros((1, 1, 32)).at[..., :16].set(1).astype(bool)
    inpainter = VInpainter(net=StubNet(lambda x, s: jnp.zeros_like(x)))
    out = inpainter.sample(
        {}, jax.random.key(0), source, mask, num_steps=4, num_resamples=2)
    np.testing.assert_allclose(out[..., :16], source[..., :16], atol=1e-5)
    # Unknown region: zero-net rotation shrinks it; just check it's not source.
    assert not np.allclose(out[..., 16:], source[..., 16:])


def test_arvdiffusion_shapes_and_perfect_loss():
    length, num_splits = 64, 4

    def fn(channels, sigmas):
        # channels = [x_noisy ; σ] with σ as last channel; reconstruct v for
        # x=0 input: v_target = α·noise = (α/β)·x_noisy.
        x_noisy, sig = channels[:, :-1], channels[:, -1:]
        a, b = alpha_beta(sig)
        return (a / jnp.maximum(b, 1e-6)) * x_noisy

    diffusion = ARVDiffusion(
        net=StubNet(fn, uses_sigma=False), length=length, num_splits=num_splits)
    x = jnp.zeros((2, 2, length))
    loss = float(diffusion.loss({}, jax.random.key(3), x))
    assert loss < 1e-6


def test_arvsampler_ladder_shape_and_structure():
    sampler = ARVSampler(
        net=StubNet(lambda x, s: jnp.zeros_like(x[:, :-1]), uses_sigma=False),
        in_channels=2, length=64, num_splits=4)
    ladder = sampler.get_sigmas_ladder(num_items=3, num_steps_per_split=5)
    # [i+1, b, 1, length] with i = num_steps_per_split (reference
    # diffusion.py:216-219: linspace of i·n_half values laid out as n_half
    # splits × i steps, so each shift runs i denoising steps).
    assert ladder.shape == (6, 3, 1, 64)
    # First half (context) is all zeros.
    np.testing.assert_allclose(ladder[..., :32], 0.0)
    # Row 0 ends at the highest noise (close to 1 at the last split).
    assert float(ladder[0, 0, 0, -1]) == pytest.approx(1.0)
    # Lowest noise first within the tail: non-decreasing along time.
    tail = np.asarray(ladder[0, 0, 0, 32:])
    assert np.all(np.diff(tail) >= -1e-6)
    # Row -1 is row 0 shifted right by one split.
    np.testing.assert_allclose(
        ladder[-1, :, :, 16 + 32:], ladder[0, :, :, 32:-16], atol=1e-6)


def test_arvsampler_runs_and_shape():
    c, length, n = 2, 64, 4
    net = StubNet(
        lambda x, s: jnp.zeros_like(x[:, :c]), in_channels=c + 1,
        out_channels=c, uses_sigma=False)
    sampler = ARVSampler(net=net, in_channels=c, length=length, num_splits=n)
    out = sampler.sample(
        {}, jax.random.key(0), num_items=2, num_chunks=6, num_steps=8)
    assert out.shape == (2, c, 6 * (length // n))
    # num_chunks == num_splits returns the start window directly.
    out2 = sampler.sample(
        {}, jax.random.key(0), num_items=1, num_chunks=n, num_steps=8)
    assert out2.shape == (1, c, length)


def test_arvsampler_show_progress(capfd):
    """show_progress must reach the AR sample_loop (reference
    diffusion.py:228/236 progress parity) and not change the result."""
    c, length, n = 2, 64, 4
    net = StubNet(
        lambda x, s: jnp.zeros_like(x[:, :c]), in_channels=c + 1,
        out_channels=c, uses_sigma=False)
    sampler = ARVSampler(net=net, in_channels=c, length=length, num_splits=n)
    quiet = sampler.sample(
        {}, jax.random.key(0), num_items=1, num_chunks=6, num_steps=8)
    loud = sampler.sample(
        {}, jax.random.key(0), num_items=1, num_chunks=6, num_steps=8,
        show_progress=True)
    jax.block_until_ready(loud)
    np.testing.assert_allclose(np.asarray(quiet), np.asarray(loud))
    out = capfd.readouterr()
    assert "Sampling" in out.out + out.err
