"""Native MultiResolutionSTFTLoss and the reference's full custom-loss
scenario (reference tests/testcustomloss.py: DiffusionAE + MRSTFT loss +
train + encode/decode)."""
import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionAE, MelEncoder1d, UNetV0
from audio_diffusion_tpu.losses import (
    MultiResolutionSTFTLoss,
    multi_resolution_stft_loss,
)

SMALL = dict(fft_sizes=(64, 128), hop_sizes=(16, 32), win_lengths=(64, 128))


def test_mrstft_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 1, 512)).astype(np.float32))
    loss = multi_resolution_stft_loss(x, x, **SMALL)
    assert float(loss) < 1e-5


def test_mrstft_orders_similarity():
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.standard_normal((1, 1, 512)).astype(np.float32))
    near = target + 0.01 * jnp.asarray(
        rng.standard_normal((1, 1, 512)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((1, 1, 512)).astype(np.float32))
    l_near = float(multi_resolution_stft_loss(near, target, **SMALL))
    l_far = float(multi_resolution_stft_loss(far, target, **SMALL))
    assert l_near < l_far


def test_mrstft_differentiable():
    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.standard_normal((1, 1, 512)).astype(np.float32))
    pred = jnp.asarray(rng.standard_normal((1, 1, 512)).astype(np.float32))
    g = jax.grad(lambda p: multi_resolution_stft_loss(p, target, **SMALL))(
        pred)
    assert bool(jnp.all(jnp.isfinite(g))) and bool(jnp.any(g != 0))


def test_reference_customloss_scenario():
    """The reference's only test, natively: DiffusionAE with a structured
    MRSTFT loss_fn — forward (loss+grads) then encode + decode."""
    encoder = MelEncoder1d(
        in_channels=2, channels=16, out_channels=4, factors=[2],
        num_blocks=[1], mel_channels=8, mel_n_fft=64, mel_sample_rate=16000)
    ae = DiffusionAE(
        net_t=UNetV0,
        in_channels=2,
        encoder=encoder,
        inject_depth=1,
        loss_fn=MultiResolutionSTFTLoss(fft_sizes=(64, 128),
                                        hop_sizes=(16, 32),
                                        win_lengths=(64, 128)),
        channels=[8, 16], factors=[1, 32], items=[1, 1],
        modulation_features=32)
    audio = jax.random.normal(jax.random.key(0), (1, 2, 1024))
    loss = ae(audio)
    assert jnp.isfinite(loss)
    grads = jax.grad(ae.loss)(ae.params, jax.random.key(1), audio)
    assert all(bool(jnp.all(jnp.isfinite(g)))
               for g in jax.tree_util.tree_leaves(grads))
    latent = ae.encode(audio)
    out = ae.decode(latent, num_steps=10)
    assert out.shape == (1, 2, 1024)
