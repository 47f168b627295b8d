from audio_diffusion_tpu.utils import (
    closest_power_2,
    default,
    exists,
    groupby,
    prefix_dict,
    prod,
    to_list,
)


def test_exists_default():
    assert exists(0) and exists("") and not exists(None)
    assert default(None, 3) == 3
    assert default(5, 3) == 5
    assert default(None, lambda: 7) == 7


def test_to_list_prod():
    assert to_list((1, 2)) == [1, 2]
    assert to_list([1]) == [1]
    assert to_list(3) == [3]
    assert prod([2, 3, 4]) == 24


def test_closest_power_2():
    # Nearest power of two, may round DOWN (reference utils.py:45-49).
    assert closest_power_2(1024) == 1024
    assert closest_power_2(1500) == 1024  # 1500-1024=476 < 2048-1500=548
    assert closest_power_2(1600) == 2048


def test_closest_power_2_tie_matches_reference():
    # Reference uses min((floor, ceil), key=distance): tie -> floor.
    assert closest_power_2(3) == 2
    assert closest_power_2(6) == 4


def test_groupby():
    kwargs = {"diffusion_a": 1, "diffusion_b": 2, "sampler_x": 3, "other": 4}
    diffusion_kwargs, rest = groupby("diffusion_", kwargs)
    assert diffusion_kwargs == {"a": 1, "b": 2}
    assert rest == {"sampler_x": 3, "other": 4}
    sampler_kwargs, rest = groupby("sampler_", rest)
    assert sampler_kwargs == {"x": 3}
    assert rest == {"other": 4}
    kept, _ = groupby("diffusion_", kwargs, keep_prefix=True)
    assert kept == {"diffusion_a": 1, "diffusion_b": 2}


def test_prefix_dict():
    assert prefix_dict("mel_", {"n_fft": 1024}) == {"mel_n_fft": 1024}


def test_dequant_pcm16():
    import jax.numpy as jnp
    import numpy as np

    from audio_diffusion_tpu.utils import dequant_pcm16

    xi = jnp.array([[-32768, -1, 0, 1, 32767]], jnp.int16)
    out = dequant_pcm16(xi)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out), np.array([[-1.0, -1 / 32768, 0.0, 1 / 32768,
                                    32767 / 32768]], np.float32))
    # Non-int16 inputs pass through untouched (same object).
    xf = jnp.ones((2, 3), jnp.bfloat16)
    assert dequant_pcm16(xf) is xf
