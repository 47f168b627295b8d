"""Task-model tests: Upsampler, Vocoder, AE, AR, and VInpainter with a real
(tiny) net — shape/contract coverage for every README config pattern
(SURVEY.md §4 rebuild test plan).
"""
import jax
import jax.numpy as jnp
import pytest

from audio_diffusion_tpu import (
    DiffusionAE,
    DiffusionAR,
    DiffusionUpsampler,
    DiffusionVocoder,
    MelEncoder1d,
    UNetV0,
    VInpainter,
)

TINY_NET = dict(
    channels=[8, 32, 64],
    factors=[1, 4, 2],
    items=[1, 1, 1],
    modulation_features=64,
)


def test_upsampler_train_and_sample():
    up = DiffusionUpsampler(
        net_t=UNetV0, in_channels=2, upsample_factor=4, **TINY_NET)
    audio = jax.random.normal(jax.random.key(0), (1, 2, 1024))
    loss = up(audio)
    assert jnp.isfinite(loss)
    low = jax.random.normal(jax.random.key(1), (1, 2, 256))
    out = up.sample(low, num_steps=2)
    assert out.shape == (1, 2, 1024)  # ×4 (README contract: 2^14 -> 2^18 @16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vocoder_train_and_sample():
    voc = DiffusionVocoder(
        net_t=UNetV0,
        mel_channels=16,
        mel_n_fft=128,
        mel_sample_rate=16000,
        mel_normalize_log=True,
        **TINY_NET,
    )
    # Stereo input: channels fold into batch (reference models.py:208).
    audio = jax.random.normal(jax.random.key(0), (1, 2, 2048))
    loss = voc(audio)
    assert jnp.isfinite(loss)
    # Sample from a mel of the same geometry the train path produces:
    # frames = 1 + (t + 2·pad − n_fft)/hop with pad=(n_fft−hop)/2 ⇒ t/hop.
    n_frames = 2048 // (128 // 4)
    mel = jax.random.normal(jax.random.key(1), (1, 2, 16, n_frames))
    out = voc.sample(mel, num_steps=2)
    assert out.shape == (1, 2, 2048)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_diffusion_ae_roundtrip():
    encoder = MelEncoder1d(
        in_channels=2,
        channels=32,
        out_channels=4,
        factors=[2],
        num_blocks=[1],
        mel_channels=16,
        mel_n_fft=64,
        mel_sample_rate=16000,
    )
    # hop = 16, factor 2 ⇒ downsample_factor 32
    assert encoder.downsample_factor == 32
    ae = DiffusionAE(
        net_t=UNetV0,
        in_channels=2,
        encoder=encoder,
        inject_depth=2,
        channels=[8, 16, 32],
        factors=[1, 4, 8],  # prod(factors[:3]) = 32 = encoder factor
        items=[1, 1, 1],
        modulation_features=32,
    )
    audio = jax.random.normal(jax.random.key(0), (1, 2, 1024))
    loss = ae(audio)
    assert jnp.isfinite(loss)
    loss2, info = ae._jitted(
        "loss_info", ae.loss, params=ae.params, key=jax.random.key(9),
        x=audio, with_info=True)
    assert jnp.isfinite(loss2) and isinstance(info, dict)
    latent = ae.encode(audio)
    assert latent.shape == (1, 4, 1024 // 32)
    assert bool(jnp.all(jnp.abs(latent) <= 1.0))  # tanh bottleneck
    out = ae.decode(latent, num_steps=2)
    assert out.shape == (1, 2, 1024)


def test_diffusion_ar():
    ar = DiffusionAR(
        net_t=UNetV0,
        in_channels=1,
        length=128,
        num_splits=4,
        channels=[8, 16],
        factors=[1, 2],
        items=[1, 1],
    )
    audio = jax.random.normal(jax.random.key(0), (2, 1, 128))
    loss = ar(audio)
    assert jnp.isfinite(loss)
    out = ar.sample(num_items=2, num_chunks=6, num_steps=8)
    assert out.shape == (2, 1, 6 * 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_inpainter_with_real_net():
    from audio_diffusion_tpu import DiffusionModel

    model = DiffusionModel(net_t=UNetV0, in_channels=2, **TINY_NET)
    source = jax.random.normal(jax.random.key(0), (1, 2, 256))
    _ = model(source)
    inpainter = VInpainter(net=model.net)
    mask = jnp.zeros((1, 2, 256), bool).at[..., :128].set(True)
    out = inpainter.sample(
        model.params["net"], jax.random.key(1), source, mask,
        num_steps=3, num_resamples=2)
    assert out.shape == (1, 2, 256)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_lt_plugin():
    from audio_diffusion_tpu import DiffusionModel, LTPlugin

    net_t = LTPlugin(UNetV0, num_filters=4, window_length=8, stride=4)
    model = DiffusionModel(
        net_t=net_t, in_channels=2,
        channels=[16, 32], factors=[1, 2], items=[1, 1],
        modulation_features=32)
    audio = jax.random.normal(jax.random.key(0), (1, 2, 256))
    loss = model(audio)
    assert jnp.isfinite(loss)
    out = model.sample(jax.random.normal(jax.random.key(1), (1, 2, 256)),
                       num_steps=2)
    assert out.shape == (1, 2, 256)


def test_task_model_save_load_roundtrip(tmp_path):
    """Task models persist their EXTRA param trees (vocoder's learned
    to_flat, AE's encoder) — reloaded models must sample bit-identically."""
    import numpy as np

    voc = DiffusionVocoder(net_t=UNetV0, mel_n_fft=128, mel_channels=16,
                           mel_sample_rate=16000, **TINY_NET)
    audio = jax.random.normal(jax.random.key(0), (1, 1, 1024))
    _ = voc(audio)
    assert "to_flat" in voc.params  # the learned vocoder head is persisted
    voc.save(tmp_path / "voc")

    voc2 = DiffusionVocoder(net_t=UNetV0, mel_n_fft=128, mel_channels=16,
                            mel_sample_rate=16000, **TINY_NET)
    _ = voc2(audio)  # init with different random params
    voc2.load(tmp_path / "voc")
    mel = jax.random.normal(jax.random.key(1), (1, 1, 16, 8))
    np.testing.assert_array_equal(
        np.asarray(voc.sample(mel, num_steps=2)),
        np.asarray(voc2.sample(mel, num_steps=2)))

    enc = MelEncoder1d(in_channels=1, channels=16, out_channels=4,
                       factors=[2], num_blocks=[1], mel_channels=8,
                       mel_n_fft=32, mel_sample_rate=16000)
    ae = DiffusionAE(net_t=UNetV0, in_channels=1, encoder=enc,
                     inject_depth=1, channels=[8, 16], factors=[1, 16],
                     items=[1, 1], modulation_features=32)
    _ = ae(audio)
    assert "encoder" in ae.params
    ae.save(tmp_path / "ae")
    ae2 = DiffusionAE(net_t=UNetV0, in_channels=1, encoder=enc,
                      inject_depth=1, channels=[8, 16], factors=[1, 16],
                      items=[1, 1], modulation_features=32)
    _ = ae2(audio)
    ae2.load(tmp_path / "ae")
    np.testing.assert_array_equal(np.asarray(ae.encode(audio)),
                                  np.asarray(ae2.encode(audio)))
