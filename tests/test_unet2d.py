"""dim=2 UNetV0 path: image diffusion end-to-end (the reference is
"generic to any dimension", README.md:3)."""
import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionModel, UNetV0

CFG2D = dict(
    net_t=UNetV0,
    dim=2,
    in_channels=3,
    channels=[8, 16, 32],
    factors=[1, 2, 2],
    items=[1, 1, 1],
    attentions=[0, 0, 1],
    attention_heads=4,
    attention_features=8,
    modulation_features=32,
)


def test_2d_train_and_sample():
    model = DiffusionModel(**CFG2D)
    images = jax.random.normal(jax.random.key(0), (2, 3, 16, 16))
    loss = model(images)
    assert jnp.isfinite(loss)
    noise = jax.random.normal(jax.random.key(1), (2, 3, 16, 16))
    out1 = model.sample(noise, num_steps=3)
    out2 = model.sample(noise, num_steps=3)
    assert out1.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(out1, out2, atol=0)
    assert bool(jnp.all(jnp.isfinite(out1)))


def test_2d_gradients_flow():
    model = DiffusionModel(**CFG2D)
    images = jax.random.normal(jax.random.key(2), (1, 3, 16, 16))
    _ = model(images)
    grads = jax.grad(model.loss)(model.params, jax.random.key(3), images)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    nonzero = sum(bool(jnp.any(g != 0)) for g in flat)
    assert nonzero / len(flat) > 0.7


def test_2d_context_injection():
    model = DiffusionModel(
        net_t=UNetV0, dim=2, in_channels=1,
        channels=[8, 16], factors=[1, 2], items=[1, 1],
        context_channels=[0, 4], modulation_features=32)
    images = jax.random.normal(jax.random.key(0), (1, 1, 8, 8))
    ctx = jax.random.normal(jax.random.key(1), (1, 4, 4, 4))
    loss = model(images, channels=[None, ctx])
    assert jnp.isfinite(loss)


def test_2d_cfg_guided_sampling():
    model = DiffusionModel(
        net_t=UNetV0, dim=2, in_channels=1,
        channels=[8, 16], factors=[1, 2], items=[1, 1],
        attentions=[0, 1], cross_attentions=[0, 1],
        attention_heads=2, attention_features=8,
        modulation_features=32,
        use_embedding_cfg=True, embedding_max_length=4,
        embedding_features=16)
    images = jax.random.normal(jax.random.key(0), (2, 1, 8, 8))
    emb = jax.random.normal(jax.random.key(1), (2, 4, 16))
    loss = model(images, embedding=emb, embedding_mask_proba=0.5)
    assert jnp.isfinite(loss)
    noise = jax.random.normal(jax.random.key(2), (2, 1, 8, 8))
    guided = model.sample(noise, embedding=emb, embedding_scale=4.0,
                          num_steps=2)
    unguided = model.sample(noise, embedding=emb, num_steps=2)
    assert guided.shape == unguided.shape == (2, 1, 8, 8)
    assert bool(jnp.all(jnp.isfinite(guided)))
    assert float(jnp.max(jnp.abs(guided - unguided))) > 1e-6


def test_2d_modulation_gates_are_identity_at_init():
    """Modulation/skip gates are zero-initialized, so at init the output
    must not depend on the features vector (same contract as 1-D)."""
    model = DiffusionModel(**CFG2D)
    images = jax.random.normal(jax.random.key(0), (1, 3, 16, 16))
    model.initialize(images)
    sig = jnp.full((1,), 0.4)
    f1 = jnp.zeros((1, 32))
    f2 = 100.0 * jnp.ones((1, 32))
    # features compose additively with the sigma embedding inside the
    # TimeConditioningWrapper; zero-init gates make both runs identical.
    out1 = model.net.apply(model.params["net"], images, sig, features=f1)
    out2 = model.net.apply(model.params["net"], images, sig, features=f2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-5)


def test_2d_cross_attention_embedding_changes_output():
    model = DiffusionModel(
        net_t=UNetV0, dim=2, in_channels=1,
        channels=[8, 16], factors=[1, 2], items=[1, 1],
        cross_attentions=[0, 1], attention_heads=2, attention_features=8,
        modulation_features=32, embedding_features=16)
    images = jax.random.normal(jax.random.key(0), (1, 1, 8, 8))
    e1 = jax.random.normal(jax.random.key(1), (1, 4, 16))
    e2 = jax.random.normal(jax.random.key(2), (1, 4, 16))
    model.initialize(images, embedding=e1)
    sig = jnp.full((1,), 0.4)
    out1 = model.net.apply(model.params["net"], images, sig, embedding=e1)
    out2 = model.net.apply(model.params["net"], images, sig, embedding=e2)
    assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-6


def test_2d_no_modulation_skipcat_path():
    model = DiffusionModel(
        net_t=UNetV0, dim=2, in_channels=1,
        channels=[8, 16], factors=[1, 2], items=[1, 1],
        use_modulation=False, use_time_conditioning=False)
    images = jax.random.normal(jax.random.key(0), (1, 1, 8, 8))
    # AR-style: sigma rides as an input channel at the model layer; here we
    # just exercise the un-modulated net contract directly.
    model.initialize(images)
    out = model.net.apply(model.params["net"], images, None)
    assert out.shape == images.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_2d_non_divisible_spatial_raises():
    import pytest
    model = DiffusionModel(**CFG2D)
    with pytest.raises(AssertionError, match="divisible"):
        model(jax.random.normal(jax.random.key(0), (1, 3, 15, 16)))
