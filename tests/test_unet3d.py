"""dim=3 UNetV0 path: volumetric diffusion end-to-end (the reference is
"generic to any dimension", README.md:3)."""
import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionModel, UNetV0

CFG3D = dict(
    net_t=UNetV0,
    dim=3,
    in_channels=2,
    channels=[8, 16],
    factors=[1, 2],
    items=[1, 1],
    attentions=[0, 1],
    attention_heads=2,
    attention_features=8,
    modulation_features=32,
)


def test_3d_train_and_sample():
    model = DiffusionModel(**CFG3D)
    vol = jax.random.normal(jax.random.key(0), (2, 2, 8, 8, 8))
    loss = model(vol)
    assert jnp.isfinite(loss)
    noise = jax.random.normal(jax.random.key(1), (2, 2, 8, 8, 8))
    out1 = model.sample(noise, num_steps=3)
    out2 = model.sample(noise, num_steps=3)
    assert out1.shape == (2, 2, 8, 8, 8)
    np.testing.assert_allclose(out1, out2, atol=0)
    assert bool(jnp.all(jnp.isfinite(out1)))


def test_3d_gradients_flow():
    model = DiffusionModel(**CFG3D)
    vol = jax.random.normal(jax.random.key(2), (1, 2, 8, 8, 8))
    _ = model(vol)
    grads = jax.grad(model.loss)(model.params, jax.random.key(3), vol)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    nonzero = sum(bool(jnp.any(g != 0)) for g in flat)
    assert nonzero / len(flat) > 0.7


def test_3d_context_injection_and_cross_attention():
    model = DiffusionModel(
        net_t=UNetV0, dim=3, in_channels=1,
        channels=[8, 16], factors=[1, 2], items=[1, 1],
        context_channels=[0, 4], cross_attentions=[0, 1],
        attention_heads=2, attention_features=8,
        modulation_features=32, embedding_features=16)
    vol = jax.random.normal(jax.random.key(0), (1, 1, 4, 4, 4))
    ctx = jax.random.normal(jax.random.key(1), (1, 4, 2, 2, 2))
    emb = jax.random.normal(jax.random.key(2), (1, 4, 16))
    loss = model(vol, channels=[None, ctx], embedding=emb)
    assert jnp.isfinite(loss)
    # Embedding must actually reach the cross-attention items.
    sig = jnp.full((1,), 0.4)
    e2 = jax.random.normal(jax.random.key(3), (1, 4, 16))
    out1 = model.net.apply(model.params["net"], vol, sig,
                           channels=[None, ctx], embedding=emb)
    out2 = model.net.apply(model.params["net"], vol, sig,
                           channels=[None, ctx], embedding=e2)
    assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-6


def test_3d_downsample_upsample_roundtrip_geometry():
    """Spatial dims shrink by factor^1 per axis on the way down and are
    restored exactly on the way up (checked via the full forward shape)."""
    model = DiffusionModel(
        net_t=UNetV0, dim=3, in_channels=1,
        channels=[8, 16, 32], factors=[1, 2, 2], items=[1, 1, 1],
        modulation_features=32)
    vol = jax.random.normal(jax.random.key(0), (1, 1, 8, 8, 8))
    model.initialize(vol)
    out = model.net.apply(model.params["net"], vol, jnp.full((1,), 0.3))
    assert out.shape == vol.shape


def test_3d_non_divisible_spatial_raises():
    import pytest
    model = DiffusionModel(**CFG3D)
    with pytest.raises(AssertionError, match="divisible"):
        model(jax.random.normal(jax.random.key(0), (1, 2, 8, 7, 8)))
