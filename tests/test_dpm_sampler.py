"""DPMSampler (DPM-Solver++(2M)) — beyond-reference second-order sampler.

Both VSampler and DPMSampler are deterministic solvers of the SAME
probability-flow ODE, so (a) their outputs must converge to each other as
steps grow, and (b) at a low step count the second-order solver must sit
closer to the converged solution than the first-order one.
"""
import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionModel, DPMSampler, UNetV0, VSampler

TINY = dict(
    net_t=UNetV0,
    in_channels=2,
    channels=[8, 16],
    factors=[1, 2],
    items=[1, 1],
    modulation_features=32,
)
LENGTH = 64


def _models():
    mv = DiffusionModel(sampler_t=VSampler, **TINY)
    noise = jax.random.normal(jax.random.key(0), (1, 2, LENGTH))
    mv.initialize(noise, key=jax.random.key(1))
    md = DiffusionModel(sampler_t=DPMSampler, **TINY)
    md.params = mv.params  # identical weights
    return mv, md, noise


def test_dpm_deterministic_and_finite():
    _, md, noise = _models()
    o1 = md.sample(noise, num_steps=10)
    o2 = md.sample(noise, num_steps=10)
    assert o1.shape == noise.shape
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert np.isfinite(np.asarray(o1)).all()


def test_dpm_converges_to_vsampler_ode_solution():
    mv, md, noise = _models()
    ref = np.asarray(mv.sample(noise, num_steps=400))
    scale = np.abs(ref).mean()

    def err(x):
        return float(np.abs(np.asarray(x) - ref).mean()) / scale

    e_dpm_hi = err(md.sample(noise, num_steps=100))
    assert e_dpm_hi < 0.02, e_dpm_hi  # same ODE, same limit

    # Second-order accuracy + uniform-λ spacing: at a practical low step
    # count DPM must clearly beat first-order DDIM (measured ~3x at n=16).
    e_v_lo = err(mv.sample(noise, num_steps=16))
    e_dpm_lo = err(md.sample(noise, num_steps=16))
    assert e_dpm_lo < 0.6 * e_v_lo, (e_dpm_lo, e_v_lo)


def test_dpm_order_of_convergence():
    """Error should shrink faster than first order in the step count."""
    mv, md, noise = _models()
    ref = np.asarray(mv.sample(noise, num_steps=400))

    def err(m, n):
        return float(np.abs(np.asarray(m.sample(noise, num_steps=n))
                            - ref).mean())

    # Halving the step size should cut DPM's error by clearly more than 2x
    # (second order ⇒ ~4x) over the asymptotic range.
    e16, e32 = err(md, 16), err(md, 32)
    assert e32 < e16 / 2.2, (e16, e32)


def test_dpm_with_cfg_guided_sampling():
    """DPM + classifier-free guidance (batch-doubled pass inside the scan)."""
    model = DiffusionModel(
        net_t=UNetV0, sampler_t=DPMSampler, in_channels=1,
        channels=[8, 16], factors=[1, 2], items=[1, 1],
        cross_attentions=[0, 1], attention_heads=2, attention_features=8,
        modulation_features=32, embedding_features=16,
        use_embedding_cfg=True, embedding_max_length=4)
    x = jax.random.normal(jax.random.key(0), (2, 1, 64))
    emb = jax.random.normal(jax.random.key(1), (2, 4, 16))
    _ = model(x, embedding=emb, embedding_mask_proba=0.5)
    noise = jax.random.normal(jax.random.key(2), (2, 1, 64))
    guided = model.sample(noise, embedding=emb, embedding_scale=4.0,
                          num_steps=4)
    unguided = model.sample(noise, embedding=emb, num_steps=4)
    assert guided.shape == (2, 1, 64)
    assert np.isfinite(np.asarray(guided)).all()
    assert float(jnp.max(jnp.abs(guided - unguided))) > 1e-6


def test_dpm_in_task_model():
    """sampler_t=DPMSampler rides through the task models' flat kwargs."""
    from audio_diffusion_tpu import DiffusionUpsampler

    up = DiffusionUpsampler(
        net_t=UNetV0, sampler_t=DPMSampler, in_channels=1,
        upsample_factor=2, channels=[8, 16], factors=[1, 2], items=[1, 1],
        modulation_features=32)
    x = jax.random.normal(jax.random.key(0), (1, 1, 64))
    _ = up(x)
    small = jax.random.normal(jax.random.key(1), (1, 1, 32))
    out = up.sample(small, num_steps=3)
    assert out.shape == (1, 1, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_dpm_bf16_input():
    """Regression: bf16 noise used to crash the scan (f32-promoted carry vs
    bf16 init); the carry must stay in the caller's dtype."""
    md = DiffusionModel(sampler_t=DPMSampler, dtype=jnp.bfloat16, **TINY)
    noise = jax.random.normal(jax.random.key(0), (1, 2, LENGTH),
                              jnp.bfloat16)
    md.initialize(noise)
    out = md.sample(noise, num_steps=4)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_uniform_lambda_schedule_two_steps():
    """Regression: num_steps=2 used to place the single interior sigma at
    0.95 (np.linspace(a, b, 1) == [a]) instead of the log-SNR midpoint."""
    from audio_diffusion_tpu.diffusion.schedules import UniformLambdaSchedule

    sig = np.asarray(UniformLambdaSchedule()(3))
    assert sig[0] == 1.0 and sig[-1] == 0.0
    assert 0.2 < sig[1] < 0.8, sig  # the lambda midpoint is sigma=0.5
    # And the general grid stays strictly decreasing.
    for n in (3, 9, 17, 51):
        s = np.asarray(UniformLambdaSchedule()(n))
        assert np.all(np.diff(s) < 0)
