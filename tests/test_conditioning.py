"""Text/CFG conditioning path: cross-attention, embedding masking, guided
sampling (batch-doubled CFG), channels injection, append channels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.ops.text import StubTextEncoder

LENGTH = 256
EMB_FEATURES = 32
EMB_LENGTH = 8

COND = dict(
    net_t=UNetV0,
    in_channels=2,
    channels=[8, 32, 64],
    factors=[1, 4, 2],
    items=[1, 1, 1],
    attentions=[0, 0, 1],
    cross_attentions=[0, 1, 1],
    attention_heads=4,
    attention_features=8,
    modulation_features=64,
    use_text_conditioning=True,
    use_embedding_cfg=True,
    embedding_max_length=EMB_LENGTH,
    embedding_features=EMB_FEATURES,
)


@pytest.fixture(scope="module")
def model():
    return DiffusionModel(
        text_encoder=StubTextEncoder(
            max_length=EMB_LENGTH, features=EMB_FEATURES),
        **COND,
    )


def test_text_conditional_train(model):
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    loss = model(audio, text=["a dog barking", "rain on a roof"],
                 embedding_mask_proba=0.1)
    assert jnp.isfinite(loss)


def test_guided_sampling_cfg(model):
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    _ = model(audio, text=["a", "b"])  # init
    noise = jax.random.normal(jax.random.key(1), (2, 2, LENGTH))
    out = model.sample(noise, text=["a dog barking", "rain"],
                       embedding_scale=5.0, num_steps=3)
    assert out.shape == (2, 2, LENGTH)
    assert bool(jnp.all(jnp.isfinite(out)))
    # Guidance scale must change the output vs unguided.
    out_unguided = model.sample(noise, text=["a dog barking", "rain"],
                                num_steps=3)
    assert not np.allclose(out, out_unguided)


def test_embedding_direct(model):
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    emb = jax.random.normal(jax.random.key(2), (2, EMB_LENGTH, EMB_FEATURES))
    loss = model(audio, embedding=emb)
    assert jnp.isfinite(loss)


def test_cfg_unconditional_uses_fixed_embedding(model):
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    _ = model(audio, text=["a", "b"])
    noise = jax.random.normal(jax.random.key(3), (1, 2, LENGTH))
    out = model.sample(noise, num_steps=2)  # no embedding: null embedding
    assert out.shape == (1, 2, LENGTH)


def test_channels_injection():
    model = DiffusionModel(
        net_t=UNetV0,
        in_channels=2,
        channels=[8, 32],
        factors=[1, 4],
        items=[1, 1],
        context_channels=[0, 5],
        modulation_features=64,
    )
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    ctx = jax.random.normal(jax.random.key(1), (2, 5, LENGTH // 4))
    loss = model(audio, channels=[None, ctx])
    assert jnp.isfinite(loss)
    noise = jax.random.normal(jax.random.key(2), (2, 2, LENGTH))
    out = model.sample(noise, channels=[None, ctx], num_steps=2)
    assert out.shape == (2, 2, LENGTH)


def test_context_length_mismatch_raises():
    model = DiffusionModel(
        net_t=UNetV0,
        in_channels=2,
        channels=[8, 32],
        factors=[1, 4],
        items=[1, 1],
        context_channels=[0, 5],
        modulation_features=64,
    )
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    bad_ctx = jax.random.normal(jax.random.key(1), (2, 5, LENGTH // 2))
    with pytest.raises(AssertionError, match="context length"):
        model(audio, channels=[None, bad_ctx])


def test_guided_sampling_with_nonarray_kwarg(model):
    """Non-array kwargs must pass through the CFG batch-doubling untouched
    (regression: tree_map used to call jnp.concatenate on bool leaves)."""
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    _ = model(audio, text=["a", "b"])  # init
    noise = jax.random.normal(jax.random.key(1), (2, 2, LENGTH))
    out = model.sample(noise, text=["a dog barking", "rain"],
                       embedding_scale=5.0, num_steps=2, some_flag=True)
    assert out.shape == (2, 2, LENGTH)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dict_valued_static_kwarg(model):
    """Dict-valued static kwargs must hash through the jit cache and arrive
    as dicts (regression: unhashable-dict crash at the jit boundary)."""
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    loss1 = model(audio, text=["a", "b"], some_cfg={"mode": "x", "n": 3})
    loss2 = model(audio, text=["a", "b"], some_cfg={"n": 3, "mode": "x"})
    assert jnp.isfinite(loss1) and jnp.isfinite(loss2)


def test_real_t5_architecture_text_path():
    """The REAL FlaxT5 encoder stack (random weights, offline) drives the
    full text-conditional train + guided-sample path — proves the text
    wiring against the true architecture, not just the hash stub."""
    from audio_diffusion_tpu.ops.text import RandomT5TextEncoder

    enc = RandomT5TextEncoder(max_length=EMB_LENGTH, features=EMB_FEATURES,
                              num_layers=1, num_heads=4, seed=0)
    emb = enc(["a dog barking", "rain"])
    assert emb.shape == (2, EMB_LENGTH, EMB_FEATURES)
    assert np.abs(emb).max() > 0
    # Deterministic, and padding rows are zeroed.
    np.testing.assert_array_equal(emb, enc(["a dog barking", "rain"]))
    assert np.all(emb[0, len("a dog barking"):] == 0)

    m = DiffusionModel(text_encoder=enc, **COND)
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    loss = m(audio, text=["a dog barking", "rain"], embedding_mask_proba=0.1)
    assert jnp.isfinite(loss)
    noise = jax.random.normal(jax.random.key(1), (2, 2, LENGTH))
    out = m.sample(noise, text=["a dog barking", "rain"],
                   embedding_scale=3.0, num_steps=2)
    assert out.shape == (2, 2, LENGTH) and bool(jnp.all(jnp.isfinite(out)))
