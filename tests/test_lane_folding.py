"""Lane folding is a pure layout change: folded and unfolded U-Nets with
IDENTICAL parameters must produce identical outputs (float tolerance).
Also unit-checks the folded primitives against their unfolded math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import UNetV0
from audio_diffusion_tpu.ops.conv import conv1d
from audio_diffusion_tpu.ops.folding import (
    fold,
    fold_conv3_kernel,
    fold_dense_kernel,
    fold_factor,
    unfold,
)


def test_fold_factor():
    assert fold_factor(2) == 64
    assert fold_factor(8) == 16
    assert fold_factor(32) == 4
    assert fold_factor(64) == 2
    assert fold_factor(128) == 1
    assert fold_factor(1024) == 1
    assert fold_factor(24) == 4  # 4·24=96 <= 128 < 8·24


def test_fold_unfold_roundtrip():
    x = jnp.arange(2 * 32 * 8, dtype=jnp.float32).reshape(2, 32, 8)
    f = fold(x, 4)
    assert f.shape == (2, 8, 32)
    np.testing.assert_array_equal(unfold(f, 4, 8), x)
    # Stream order: frame 0 holds positions 0..3 in time-major order.
    np.testing.assert_array_equal(f[0, 0], x[0, :4].reshape(-1))


def test_folded_conv3_matches_unfolded():
    rng = np.random.default_rng(0)
    c, co, f, l = 8, 8, 16, 128
    x = jnp.asarray(rng.standard_normal((2, l, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, c, co)).astype(np.float32)) * 0.2
    ref = conv1d(x, w, padding=1)
    folded = conv1d(fold(x, f), fold_conv3_kernel(w, f), padding=1)
    out = unfold(folded, f, co)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_folded_dense_matches_unfolded():
    rng = np.random.default_rng(1)
    c, co, f, l = 8, 24, 16, 64
    x = jnp.asarray(rng.standard_normal((2, l, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((c, co)).astype(np.float32))
    ref = x @ w
    out = unfold(fold(x, f) @ fold_dense_kernel(w, f), f, co)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


NET = dict(
    in_channels=2,
    channels=[8, 32, 64, 128],
    factors=[1, 4, 2, 2],
    items=[1, 2, 1, 1],
    attentions=[0, 0, 0, 1],
    attention_heads=4,
    attention_features=16,
    modulation_features=64,
)
LENGTH = 1024


@pytest.mark.parametrize("use_modulation", [True, False])
def test_folded_unet_matches_unfolded(use_modulation):
    extra = {} if use_modulation else dict(
        use_modulation=False, use_time_conditioning=False)
    net_folded = UNetV0(dim=1, lane_fold=True, **NET, **extra)
    net_plain = UNetV0(dim=1, lane_fold=False, **NET, **extra)

    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (2, 2, LENGTH))
    sig = jnp.array([0.3, 0.7]) if use_modulation else None

    params = net_folded.init(key, x, sig)
    # Same tree structure — directly reusable.
    out_folded = net_folded.apply(params, x, sig)
    out_plain = net_plain.apply(params, x, sig)
    assert out_folded.shape == (2, 2, LENGTH)
    np.testing.assert_allclose(np.asarray(out_folded), np.asarray(out_plain),
                               atol=2e-4, rtol=2e-4)


def test_folded_unet_odd_length():
    # Length whose level lengths aren't divisible by the full channel fold:
    # 192 = 64·3 — folds clamp to the pow2 part of each level length.
    net = UNetV0(dim=1, lane_fold=True, in_channels=2,
                 channels=[8, 32], factors=[1, 4], items=[1, 1],
                 modulation_features=32)
    x = jax.random.normal(jax.random.key(0), (1, 2, 192))
    sig = jnp.array([0.5])
    params = net.init(jax.random.key(1), x, sig)
    out = net.apply(params, x, sig)
    assert out.shape == (1, 2, 192)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_group_norm_large_offset_no_nan():
    """Regression: the one-pass E[x^2]-E[x]^2 GroupNorm NaN'd when
    |mean| >> std (moment cancellation drove the variance negative)."""
    import numpy as np

    from audio_diffusion_tpu.ops.unet import group_norm

    x = 300.0 + 1e-3 * jax.random.normal(jax.random.key(0), (1, 1024, 32))
    y = group_norm(x, f=1, groups=8, scale=jnp.ones(32), bias=jnp.zeros(32))
    assert bool(jnp.all(jnp.isfinite(y)))
    # Still normalizes: per-group output mean ~0.
    assert float(jnp.abs(jnp.mean(y))) < 0.1
