"""Property-based tests (hypothesis) for the layout/DSP invariants that the
whole TPU design rests on.
"""
import hypothesis.strategies as st
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings

from audio_diffusion_tpu.dsp.resample import resample
from audio_diffusion_tpu.ops.conv import conv1d
from audio_diffusion_tpu.ops.folding import (
    fold,
    fold_conv3_kernel,
    fold_dense_kernel,
    fold_factor,
    refold,
    unfold,
)

pow2 = st.sampled_from([1, 2, 4, 8, 16, 32, 64])


@given(c=st.sampled_from([2, 4, 8, 16, 32]), f=pow2,
       lf=st.sampled_from([2, 4, 8]))
@settings(max_examples=20, deadline=None)
def test_fold_roundtrip_property(c, f, lf):
    n = 2 * lf * f * c
    x = jnp.arange(n, dtype=jnp.float32).reshape(2, lf * f, c)
    assert np.array_equal(unfold(fold(x, f), f, c), x)


@given(c=st.sampled_from([2, 4, 8]), f1=st.sampled_from([1, 2, 4]),
       f2=st.sampled_from([1, 2, 4, 8]))
@settings(max_examples=20, deadline=None)
def test_refold_property(c, f1, f2):
    l = 16
    x = jnp.arange(2 * l * c, dtype=jnp.float32).reshape(2, l, c)
    a = fold(x, f1)
    b = refold(a, f1, c, f2)
    assert np.array_equal(unfold(b, f2, c), x)


@given(c=st.sampled_from([2, 4, 8]), co=st.sampled_from([3, 8]),
       f=st.sampled_from([2, 4, 8]), seed=st.integers(0, 100))
@settings(max_examples=15, deadline=None)
def test_folded_conv_equivalence_property(c, co, f, seed):
    rng = np.random.default_rng(seed)
    l = 4 * f
    x = jnp.asarray(rng.standard_normal((1, l, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, c, co)).astype(np.float32))
    ref = conv1d(x, w, padding=1)
    out = unfold(conv1d(fold(x, f), fold_conv3_kernel(w, f), padding=1),
                 f, co)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@given(c=st.sampled_from([2, 8]), co=st.sampled_from([5, 8]),
       f=st.sampled_from([2, 8]), seed=st.integers(0, 100))
@settings(max_examples=15, deadline=None)
def test_folded_dense_equivalence_property(c, co, f, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, 2 * f, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((c, co)).astype(np.float32))
    ref = x @ w
    out = unfold(fold(x, f) @ fold_dense_kernel(w, f), f, co)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@given(fi=st.sampled_from([1, 2, 3, 4]), fo=st.sampled_from([1, 2, 3, 4]),
       seed=st.integers(0, 50))
@settings(max_examples=15, deadline=None)
def test_resample_length_property(fi, fo, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, 1, 120)).astype(np.float32))
    out = resample(x, fi, fo)
    assert out.shape[-1] == int(fo * 120 / fi)


@given(c=st.sampled_from([4, 8, 16, 24, 128, 1024]))
@settings(max_examples=10, deadline=None)
def test_fold_factor_bounds(c):
    f = fold_factor(c)
    assert f >= 1 and f * c <= 128 or f == 1
    assert (f & (f - 1)) == 0  # power of two
