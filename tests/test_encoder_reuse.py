"""Encoder reuse across denoising steps ("Faster Diffusion", Li et al.,
arXiv:2312.09608 — PAPERS.md): the U-Net down path runs every k-th step;
between, the up path decodes from the cached encoder state with fresh σ
features. Beyond-reference acceleration; k=1 must stay bit-exact."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import DiffusionModel, UNetV0

TINY = dict(net_t=UNetV0, in_channels=2, channels=[8, 16, 32],
            factors=[1, 2, 2], items=[1, 1, 1], modulation_features=32)
LENGTH = 256


def _model(**over):
    cfg = {**TINY, **over}
    init_kwargs = cfg.pop("_init_kwargs", {})
    model = DiffusionModel(**cfg)
    model.initialize(jnp.zeros((2, cfg["in_channels"], LENGTH)),
                     **init_kwargs)
    return model


def test_hidden_roundtrip_is_exact():
    """Decoding from hidden captured at the SAME (x, σ) reproduces the full
    forward exactly — the reuse path changes nothing but the down-pass
    skipping."""
    model = _model()
    net, params = model.net, model.params["net"]
    x = jax.random.normal(jax.random.key(0), (2, 2, LENGTH))
    sig = jnp.full((2,), 0.4)
    full, enc = net.apply(params, x, sig, return_hidden=True)
    again = net.apply(params, x, sig, hidden=enc)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(again))


def test_hidden_uses_current_sigma_features():
    """A reuse step still re-modulates with the CURRENT σ: decoding the
    same hidden at a different σ must give a different output. (Modulation
    projections are zero-initialized — identity at init — so perturb every
    leaf the way training would before probing σ sensitivity.)"""
    model = _model()
    net = model.net
    leaves, treedef = jax.tree_util.tree_flatten(model.params["net"])
    keys = jax.random.split(jax.random.key(8), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
        for leaf, k in zip(leaves, keys)])
    x = jax.random.normal(jax.random.key(1), (2, 2, LENGTH))
    _, enc = net.apply(params, x, jnp.full((2,), 0.9), return_hidden=True)
    a = net.apply(params, x, jnp.full((2,), 0.9), hidden=enc)
    b = net.apply(params, x, jnp.full((2,), 0.1), hidden=enc)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-6


def test_encoder_reuse_1_bit_exact():
    model = _model()
    noise = jax.random.normal(jax.random.key(2), (1, 2, LENGTH))
    exact = model.sample(noise, num_steps=8)
    reuse1 = model.sample(noise, num_steps=8, encoder_reuse=1)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(reuse1))


def test_encoder_reuse_sampling_close_to_exact():
    model = _model()
    noise = jax.random.normal(jax.random.key(3), (1, 2, LENGTH))
    exact = np.asarray(model.sample(noise, num_steps=16))
    fast = np.asarray(model.sample(noise, num_steps=16, encoder_reuse=2))
    assert np.isfinite(fast).all()
    assert fast.shape == exact.shape
    # Approximate but strongly correlated with the exact trajectory (random
    # init — trained models measure much closer; see PERFORMANCE.md r4).
    denom = float(np.sqrt((exact ** 2).mean()))
    rel = float(np.sqrt(((fast - exact) ** 2).mean())) / max(denom, 1e-9)
    assert rel < 0.5, rel
    # And it is genuinely a different (approximated) trajectory.
    assert float(np.abs(fast - exact).max()) > 0


def test_encoder_reuse_requires_divisible_steps():
    model = _model()
    noise = jax.random.normal(jax.random.key(4), (1, 2, LENGTH))
    with pytest.raises(AssertionError, match="divisible by encoder_reuse"):
        model.sample(noise, num_steps=7, encoder_reuse=2)


def test_encoder_reuse_with_cfg_guidance():
    """Reuse composes with the batch-doubled CFG pass (the cached state
    carries batch 2b through the doubling untouched)."""
    emb2 = jax.random.normal(jax.random.key(5), (2, 4, 16))
    emb = emb2[:1]
    model = _model(channels=[8, 16], factors=[1, 2], items=[1, 1],
                   cross_attentions=[0, 1], attention_heads=2,
                   attention_features=8, embedding_features=16,
                   use_embedding_cfg=True, embedding_max_length=4,
                   _init_kwargs={"embedding": emb2})
    noise = jax.random.normal(jax.random.key(6), (1, 2, LENGTH))
    guided_exact = model.sample(noise, num_steps=8, embedding=emb,
                                embedding_scale=4.0)
    guided_fast = model.sample(noise, num_steps=8, embedding=emb,
                               embedding_scale=4.0, encoder_reuse=2)
    assert guided_fast.shape == guided_exact.shape
    assert np.isfinite(np.asarray(guided_fast)).all()


@pytest.mark.parametrize("dim,shape", [(2, (2, 1, 16, 16)),
                                       (3, (2, 1, 8, 8, 8))])
def test_hidden_roundtrip_exact_2d_3d(dim, shape):
    """dim=2/3 XUNets implement the same reuse contract as the 1-D net:
    decoding from hidden captured at the SAME (x, σ) is bit-exact."""
    model = DiffusionModel(net_t=UNetV0, dim=dim, in_channels=1,
                           channels=[8, 16], factors=[1, 2], items=[1, 1],
                           modulation_features=32)
    model.initialize(jnp.zeros(shape))
    net, params = model.net, model.params["net"]
    x = jax.random.normal(jax.random.key(0), shape)
    sig = jnp.full((shape[0],), 0.4)
    full, enc = net.apply(params, x, sig, return_hidden=True)
    again = net.apply(params, x, sig, hidden=enc)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(again))


@pytest.mark.parametrize("dim,shape", [(2, (1, 1, 16, 16)),
                                       (3, (1, 1, 8, 8, 8))])
def test_encoder_reuse_sampling_2d_3d(dim, shape):
    model = DiffusionModel(net_t=UNetV0, dim=dim, in_channels=1,
                           channels=[8, 16], factors=[1, 2], items=[1, 1],
                           modulation_features=32)
    model.initialize(jnp.zeros(shape))
    noise = jax.random.normal(jax.random.key(7), shape)
    exact = np.asarray(model.sample(noise, num_steps=8))
    same = np.asarray(model.sample(noise, num_steps=8, encoder_reuse=1))
    np.testing.assert_array_equal(exact, same)
    fast = np.asarray(model.sample(noise, num_steps=8, encoder_reuse=2))
    assert fast.shape == exact.shape
    assert np.isfinite(fast).all()
    denom = float(np.sqrt((exact ** 2).mean()))
    rel = float(np.sqrt(((fast - exact) ** 2).mean())) / max(denom, 1e-9)
    assert rel < 0.5, rel
    assert float(np.abs(fast - exact).max()) > 0


def test_encoder_reuse_rejected_on_nets_without_hooks():
    """Custom nets without the reuse hooks must error loudly, not
    mis-unpack the (v, enc) tuple."""
    import flax.linen as nn

    from audio_diffusion_tpu.ops.net import Net
    from audio_diffusion_tpu.ops.unet import _check_unused_kwargs

    class NoReuse(nn.Module):
        @nn.compact
        def __call__(self, x, sigmas=None, **kw):
            _check_unused_kwargs(kw)
            return x * self.param("g", lambda k: jnp.ones(()))

    def net_t(dim=1, in_channels=2, **kwargs):
        return Net(NoReuse(), in_channels=in_channels,
                   out_channels=in_channels, uses_sigma=True,
                   compute_dtype=None)

    model = DiffusionModel(net_t=net_t, in_channels=2, channels=[8],
                           factors=[1], items=[1])
    model.initialize(jnp.zeros((1, 2, 16)))
    noise = jax.random.normal(jax.random.key(7), (1, 2, 16))
    assert np.isfinite(np.asarray(model.sample(noise, num_steps=4))).all()
    with pytest.raises(TypeError, match="encoder reuse"):
        model.sample(noise, num_steps=4, encoder_reuse=2)


def test_dpm_encoder_reuse():
    """DPMSampler supports encoder_reuse with the same contract: k=1
    bit-exact, k=2 finite and strongly correlated."""
    from audio_diffusion_tpu.diffusion import DPMSampler

    model = DiffusionModel(sampler_t=DPMSampler, **TINY)
    model.initialize(jnp.zeros((1, 2, LENGTH)))
    noise = jax.random.normal(jax.random.key(9), (1, 2, LENGTH))
    exact = np.asarray(model.sample(noise, num_steps=16))
    same = np.asarray(model.sample(noise, num_steps=16, encoder_reuse=1))
    np.testing.assert_array_equal(exact, same)
    fast = np.asarray(model.sample(noise, num_steps=16, encoder_reuse=2))
    assert np.isfinite(fast).all()
    denom = float(np.sqrt((exact ** 2).mean()))
    rel = float(np.sqrt(((fast - exact) ** 2).mean())) / max(denom, 1e-9)
    assert rel < 0.5, rel
