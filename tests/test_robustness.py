"""Edge and combination coverage: adapter path, bf16 end-to-end, vocoder
leading-dim handling, explicit-key determinism, wider TP mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import (
    AdapterBase,
    DiffusionAE,
    DiffusionUpsampler,
    DiffusionVocoder,
    MelEncoder1d,
    DiffusionModel,
    UNetV0,
)

TINY_NET = dict(
    channels=[8, 32],
    factors=[1, 4],
    items=[1, 1],
    modulation_features=32,
)


class ScaleAdapter(AdapterBase):
    """Trivial invertible adapter: diffusion space is 2× the audio space."""

    def encode(self, x):
        return x * 2.0

    def decode(self, x):
        return x / 2.0


def test_diffusion_ae_with_adapter():
    encoder = MelEncoder1d(
        in_channels=2, channels=16, out_channels=4, factors=[2],
        num_blocks=[1], mel_channels=8, mel_n_fft=64, mel_sample_rate=16000)
    ae = DiffusionAE(
        net_t=UNetV0, in_channels=2, encoder=encoder, inject_depth=1,
        adapter=ScaleAdapter(),
        channels=[8, 16], factors=[1, 32], items=[1, 1],
        modulation_features=32)
    audio = jax.random.normal(jax.random.key(0), (1, 2, 1024))
    loss = ae(audio)
    assert jnp.isfinite(loss)
    latent = ae.encode(audio)
    out = ae.decode(latent, num_steps=2)
    assert out.shape == (1, 2, 1024)


def test_bf16_end_to_end():
    model = DiffusionModel(net_t=UNetV0, in_channels=2,
                           dtype=jnp.bfloat16, **TINY_NET)
    audio = jax.random.normal(jax.random.key(1), (2, 2, 256))
    loss = model(audio)
    assert jnp.isfinite(loss)
    out = model.sample(jax.random.normal(jax.random.key(2), (1, 2, 256)),
                       num_steps=2)
    # Output dtype follows the input (f32 boundary).
    assert out.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vocoder_mel_without_channel_dim():
    voc = DiffusionVocoder(
        net_t=UNetV0, mel_channels=8, mel_n_fft=64, mel_sample_rate=16000,
        mel_normalize_log=True, **TINY_NET)
    audio = jax.random.normal(jax.random.key(0), (1, 1, 512))
    _ = voc(audio)
    # Reference packs "* f l": a [b, f, l] mel (no channel dim) is valid.
    mel = jax.random.normal(jax.random.key(1), (1, 8, 512 // 16))
    out = voc.sample(mel, num_steps=2)
    assert out.shape == (1, 512)


def test_explicit_key_determinism():
    up = DiffusionUpsampler(net_t=UNetV0, in_channels=1, upsample_factor=4,
                            **TINY_NET)
    audio = jax.random.normal(jax.random.key(0), (1, 1, 512))
    _ = up(audio)
    low = jax.random.normal(jax.random.key(1), (1, 1, 128))
    k = jax.random.key(42)
    out1 = up.sample(low, key=k, num_steps=2)
    out2 = up.sample(low, key=k, num_steps=2)
    np.testing.assert_allclose(out1, out2, atol=0)
    out3 = up.sample(low, key=jax.random.key(43), num_steps=2)
    assert not np.allclose(out1, out3)


def test_tp4_mesh():
    import optax

    from audio_diffusion_tpu.parallel import (
        create_mesh, make_train_step, shard_batch)

    mesh = create_mesh(model=4)  # 2 data × 4 model on 8 devices
    model = DiffusionModel(net_t=UNetV0, in_channels=2,
                           channels=[8, 256], factors=[1, 4], items=[1, 1],
                           modulation_features=256)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2, 256)).astype(np.float32))
    model.initialize(audio)
    init_state, train_step = make_train_step(
        model.loss, optax.adam(1e-4), mesh=mesh)
    state = init_state(model.params, jax.random.key(0))
    state, metrics = train_step(state, shard_batch(audio, mesh))
    assert jnp.isfinite(metrics["loss"])


def test_mono_audio():
    model = DiffusionModel(net_t=UNetV0, in_channels=1, **TINY_NET)
    audio = jax.random.normal(jax.random.key(3), (3, 1, 256))
    assert jnp.isfinite(model(audio))


def test_show_progress_compiles():
    model = DiffusionModel(net_t=UNetV0, in_channels=1, **TINY_NET)
    audio = jax.random.normal(jax.random.key(4), (1, 1, 256))
    _ = model(audio)
    out = model.sample(jax.random.normal(jax.random.key(5), (1, 1, 256)),
                       num_steps=2, show_progress=True)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ae_decode_different_shapes():
    """Regression: decode must not bake the first call's latent shape into
    the jit cache (noise shape derives from the traced latent)."""
    encoder = MelEncoder1d(
        in_channels=2, channels=16, out_channels=4, factors=[2],
        num_blocks=[1], mel_channels=8, mel_n_fft=64, mel_sample_rate=16000)
    ae = DiffusionAE(
        net_t=UNetV0, in_channels=2, encoder=encoder, inject_depth=1,
        channels=[8, 16], factors=[1, 32], items=[1, 1],
        modulation_features=32)
    _ = ae(jax.random.normal(jax.random.key(0), (1, 2, 1024)))
    lat_a = ae.encode(jax.random.normal(jax.random.key(1), (2, 2, 1024)))
    out_a = ae.decode(lat_a, num_steps=2)
    assert out_a.shape == (2, 2, 1024)
    lat_b = ae.encode(jax.random.normal(jax.random.key(2), (4, 2, 2048)))
    out_b = ae.decode(lat_b, num_steps=2)
    assert out_b.shape == (4, 2, 2048)


def test_sample_key_on_deterministic_sampler_rejected():
    """Regression: key= on a deterministic VSampler must raise a clear
    error, not silently misbind as x_noisy."""
    model = DiffusionModel(net_t=UNetV0, in_channels=1, **TINY_NET)
    x = jax.random.normal(jax.random.key(0), (1, 1, 256))
    _ = model(x)
    import pytest as _pytest
    with _pytest.raises(AssertionError, match="deterministic"):
        model.sample(x, num_steps=2, key=jax.random.key(1))


def test_lt_plugin_bf16_sampling():
    """Regression: LTPlugin dropped the inner net's compute dtype, so bf16
    sampling crashed (f32 activations met bf16-cast framing kernels)."""
    from audio_diffusion_tpu import LTPlugin

    model = DiffusionModel(
        net_t=LTPlugin(UNetV0, num_filters=4, window_length=8, stride=4),
        in_channels=1, dtype=jnp.bfloat16, **TINY_NET)
    x = jax.random.normal(jax.random.key(0), (1, 1, 256))
    _ = model(x)
    out = model.sample(x, num_steps=2)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_guidance_without_cfg_raises():
    """Regression: embedding_scale on a CFG-less net used to be silently
    dropped (unguided samples with no warning)."""
    model = DiffusionModel(net_t=UNetV0, in_channels=1, **TINY_NET)
    x = jax.random.normal(jax.random.key(0), (1, 1, 256))
    _ = model(x)
    with pytest.raises(TypeError, match="use_embedding_cfg"):
        model.sample(x, num_steps=2, embedding_scale=5.0)


def test_ae_channels_kwarg_rejected():
    """Regression: a user-passed channels= crashed deep inside with
    'multiple values for keyword argument'."""
    enc = MelEncoder1d(in_channels=2, channels=32, out_channels=4,
                       factors=[2], num_blocks=[1], mel_channels=16,
                       mel_n_fft=64, mel_sample_rate=16000)
    ae = DiffusionAE(net_t=UNetV0, in_channels=2, encoder=enc,
                     inject_depth=1, channels=[8, 16], factors=[1, 32],
                     items=[1, 1], modulation_features=32)
    x = jax.random.normal(jax.random.key(0), (1, 2, 1024))
    with pytest.raises(AssertionError, match="owns the channels"):
        ae(x, channels=[None, jnp.zeros((1, 4, 32))])


def test_dim2_remat():
    """dim=2 honors use_remat (was silently dropped once): the rematted
    model computes the same loss and its gradient is finite."""
    import numpy as np

    x = jax.random.normal(jax.random.key(0), (1, 1, 16, 16))
    key = jax.random.key(1)
    cfg = dict(net_t=UNetV0, dim=2, in_channels=1, channels=[8, 16],
               factors=[1, 2], items=[1, 1], modulation_features=32)
    plain = DiffusionModel(**cfg)
    plain.initialize(x, key=jax.random.key(2))
    remat = DiffusionModel(use_remat=True,
                           remat_policy="dots_with_no_batch_dims_saveable",
                           **cfg)
    remat.initialize(x, key=jax.random.key(2))  # same init key -> same params
    lp = plain.loss(plain.params, key, x)
    lr = remat.loss(remat.params, key, x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lr), rtol=1e-5)
    g = jax.grad(lambda p: remat.loss(p, key, x))(remat.params)
    assert all(bool(jnp.all(jnp.isfinite(le)))
               for le in jax.tree_util.tree_leaves(g))
    # use_pallas stays dim=1-only, loudly.
    with pytest.raises(AssertionError, match="dim=1"):
        DiffusionModel(net_t=UNetV0, dim=2, in_channels=1, use_pallas=True,
                       **TINY_NET)
