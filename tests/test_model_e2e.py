"""End-to-end tests on the tiny BASELINE.json config #1 (CPU-runnable):
tiny UNetV0, VDiffusion loss + short VSampler sampling, plus gradient flow.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import DiffusionModel, UNetV0, VDiffusion, VSampler

TINY = dict(
    net_t=UNetV0,
    in_channels=2,
    channels=[8, 32, 64],
    factors=[1, 4, 2],
    items=[1, 2, 2],
    attentions=[0, 0, 1],
    attention_heads=4,
    attention_features=8,
    modulation_features=64,
    diffusion_t=VDiffusion,
    sampler_t=VSampler,
)
LENGTH = 256


@pytest.fixture(scope="module")
def model():
    return DiffusionModel(**TINY)


def test_loss_scalar_and_finite(model):
    audio = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    loss = model(audio)
    assert loss.shape == ()
    assert jnp.isfinite(loss)
    # v-objective loss on random data starts near E[v²] ≈ 1.
    assert 0.05 < float(loss) < 5.0


def test_sample_shape_and_determinism(model):
    audio = jax.random.normal(jax.random.key(0), (1, 2, LENGTH))
    _ = model(audio)  # ensure initialized
    noise = jax.random.normal(jax.random.key(1), (1, 2, LENGTH))
    out1 = model.sample(noise, num_steps=4)
    out2 = model.sample(noise, num_steps=4)
    assert out1.shape == (1, 2, LENGTH)
    # VSampler is deterministic given the initial noise.
    np.testing.assert_allclose(out1, out2, atol=0)
    assert bool(jnp.all(jnp.isfinite(out1)))


def test_gradients_flow_everywhere(model):
    audio = jax.random.normal(jax.random.key(2), (1, 2, LENGTH))
    _ = model(audio)
    grads = jax.grad(model.loss)(model.params, jax.random.key(3), audio)
    flat = jax.tree_util.tree_leaves(grads)
    assert len(flat) > 10
    # Every parameter receives a finite gradient; at least most are nonzero.
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    nonzero = sum(bool(jnp.any(g != 0)) for g in flat)
    assert nonzero / len(flat) > 0.7


def test_custom_loss_fn():
    # Structured custom loss (reference tests/testcustomloss.py analog).
    def l1_loss(pred, target):
        return jnp.mean(jnp.abs(pred - target))

    model = DiffusionModel(loss_fn=l1_loss, **TINY)
    audio = jax.random.normal(jax.random.key(4), (1, 2, LENGTH))
    loss = model(audio)
    assert jnp.isfinite(loss)


def test_features_kwarg_composes():
    model = DiffusionModel(**TINY)
    audio = jax.random.normal(jax.random.key(5), (2, 2, LENGTH))
    features = jax.random.normal(jax.random.key(6), (2, 64))
    loss = model(audio, features=features)
    assert jnp.isfinite(loss)


def test_remat_matches_no_remat():
    """use_remat changes memory, not math: same params -> same loss/grads."""
    cfg = dict(TINY)
    model = DiffusionModel(**cfg)
    model_r = DiffusionModel(use_remat=True, **cfg)
    audio = jax.random.normal(jax.random.key(7), (1, 2, LENGTH))
    key = jax.random.key(8)
    model.initialize(audio, key=jax.random.key(9))
    model_r.params = model.params  # same tree structure
    l1 = float(model.loss(model.params, key, audio))
    l2 = float(model_r.loss(model_r.params, key, audio))
    assert abs(l1 - l2) < 1e-6
    g1 = jax.grad(model.loss)(model.params, key, audio)
    g2 = jax.grad(model_r.loss)(model_r.params, key, audio)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4),
        g1, g2)
    # Selective checkpointing (keep matmul outputs, recompute elementwise)
    # is also an identity on the math.
    model_p = DiffusionModel(
        use_remat=True, remat_policy="dots_with_no_batch_dims_saveable",
        **cfg)
    model_p.params = model.params
    l3 = float(model_p.loss(model_p.params, key, audio))
    assert abs(l1 - l3) < 1e-6
    g3 = jax.grad(model_p.loss)(model_p.params, key, audio)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4),
        g1, g3)


def test_model_save_load(tmp_path):
    model = DiffusionModel(**TINY)
    audio = jax.random.normal(jax.random.key(10), (1, 2, LENGTH))
    _ = model(audio)
    saved = jax.tree_util.tree_map(np.array, model.params)
    model.save(tmp_path / "ckpt")

    model2 = DiffusionModel(**TINY)
    _ = model2(audio)  # different init
    model2.load(tmp_path / "ckpt")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.array(b)),
        saved, model2.params)
    # Same noise -> identical samples from both models now.
    noise = jax.random.normal(jax.random.key(11), (1, 2, LENGTH))
    np.testing.assert_allclose(model.sample(noise, num_steps=2),
                               model2.sample(noise, num_steps=2), atol=0)


def test_channel_change_first_item_geometry():
    """Geometry-register switch (PARITY.md): channel_change='first_item'
    moves the down-path width change into each level's first resnet
    (1×1-conv shortcut). Trains and samples; the default mode's parameter
    tree is unchanged (no shortcut params)."""
    import jax

    common = dict(net_t=UNetV0, in_channels=2, channels=[8, 16, 32],
                  factors=[1, 2, 2], items=[1, 2, 1],
                  modulation_features=32, lane_fold=False)
    m = DiffusionModel(**common, channel_change="first_item")
    loss = m(jnp.zeros((1, 2, 128)))
    assert jnp.isfinite(loss)
    names = {"/".join(str(k) for k in p) for p, _ in
             jax.tree_util.tree_flatten_with_path(m.params)[0]}
    assert sum("shortcut_kernel" in n for n in names) == 2  # levels 1, 2
    out = m.sample(jax.random.normal(jax.random.key(0), (1, 2, 128)),
                   num_steps=3)
    assert out.shape == (1, 2, 128) and bool(jnp.isfinite(out).all())
    # Gradients flow through the shortcut path.
    g = jax.grad(lambda p: m.loss(p, jax.random.key(1),
                                  jnp.ones((1, 2, 128))))(m.params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert jnp.isfinite(gnorm) and gnorm > 0

    m_default = DiffusionModel(**common)
    m_default.initialize(jnp.zeros((1, 2, 128)))
    names_default = {"/".join(str(k) for k in p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(
                         m_default.params)[0]}
    assert not any("shortcut" in n for n in names_default)
