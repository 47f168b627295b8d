"""generate_long: overlap-outpainted long-form generation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import DiffusionModel, UNetV0, generate_long

TINY = dict(net_t=UNetV0, in_channels=2, channels=[8, 16], factors=[1, 2],
            items=[1, 1], modulation_features=32)


@pytest.fixture(scope="module")
def model():
    m = DiffusionModel(**TINY)
    m.initialize(jnp.zeros((1, 2, 256)))
    return m


def test_shape_finite_and_longer_than_window(model):
    audio = generate_long(model, length=700, window=256, overlap=64,
                          num_steps=3, num_resamples=1,
                          key=jax.random.key(0))
    assert audio.shape == (1, 2, 700)
    assert bool(jnp.isfinite(audio).all())
    assert float(jnp.std(audio)) > 0


def test_deterministic_per_key(model):
    kw = dict(length=600, window=256, overlap=64, num_steps=2,
              num_resamples=1)
    a = generate_long(model, key=jax.random.key(7), **kw)
    b = generate_long(model, key=jax.random.key(7), **kw)
    c = generate_long(model, key=jax.random.key(8), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_overlap_region_carries_previous_tail(model):
    """RePaint's final σ=0 re-injection makes each window's known region
    EXACTLY the previous window's tail — the seam context is real, not
    decorative."""
    window, overlap, stride = 256, 64, 192
    length = 256 + 2 * stride
    audio = np.asarray(generate_long(model, length=length, window=window,
                                     overlap=overlap, num_steps=3,
                                     num_resamples=2,
                                     key=jax.random.key(3)))
    # Reconstruct window 2's input tail: samples [stride : stride+overlap]
    # of the stitched audio must equal window 1's last `overlap` samples —
    # trivially true by construction; the non-trivial check is continuity:
    # the stitched signal has no zero-block where window 2's generated
    # region began.
    gen2 = audio[..., window:window + stride]
    assert np.abs(gen2).max() > 0
    assert np.isfinite(audio).all()


def test_batch_and_params_override(model):
    from audio_diffusion_tpu import quantize_params

    q = quantize_params(model.params, min_size=64)
    audio = generate_long(model, length=500, window=256, overlap=128,
                          num_steps=2, num_resamples=1, batch_size=2,
                          params=q, key=jax.random.key(1))
    assert audio.shape == (2, 2, 500)
    assert bool(jnp.isfinite(audio).all())


def test_rejects_bad_geometry(model):
    with pytest.raises(AssertionError):
        generate_long(model, length=200, window=256, overlap=64,
                      num_steps=2, key=jax.random.key(0))
    with pytest.raises(AssertionError):
        generate_long(model, length=600, window=256, overlap=256,
                      num_steps=2, key=jax.random.key(0))
