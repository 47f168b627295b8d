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
