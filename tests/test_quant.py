"""Int8 weight-only inference quantization (ops/quant.py).

Covers: leaf round-trip error bounds, tree selection rules, sampler
equivalence (quantized vs exact within int8 tolerance), the no-op fast
path (bit-identical graphs for unquantized trees), and serving with a
quantized snapshot.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import (DiffusionModel, GenerationService, QTensor,
                                 UNetV0, quantize_params)
from audio_diffusion_tpu.ops.quant import (dequantize_params,
                                           dequantize_step_params,
                                           has_qtensors, quantize_leaf)

TINY = dict(net_t=UNetV0, in_channels=2, channels=[8, 16], factors=[1, 2],
            items=[1, 1], modulation_features=32)


def test_leaf_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32)) * 0.3
    qt = quantize_leaf(w)
    assert qt.q.dtype == jnp.int8 and qt.qscale.shape == (1, 128)
    back = np.asarray(qt.q.astype(jnp.float32) * qt.qscale)
    # Symmetric int8: per-channel max error is scale/2 = amax/254.
    amax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    assert (np.abs(back - np.asarray(w)) <= amax / 254 + 1e-7).all()


def test_zero_leaf_quantizes_to_zero():
    qt = quantize_leaf(jnp.zeros((16, 256)))
    assert np.asarray(qt.q).max() == 0
    assert np.asarray(dequantize_params({"w": qt})["w"]).max() == 0


def test_tree_selection_rules():
    tree = {
        "big": jnp.ones((512, 256)),          # quantized
        "small": jnp.ones((8, 8)),            # too small
        "bias": jnp.ones((1024 * 1024,)),     # ndim 1
        "ints": jnp.ones((512, 256), jnp.int32),  # not float
    }
    q = quantize_params(tree, min_size=65536)
    assert isinstance(q["big"], QTensor)
    assert not isinstance(q["small"], QTensor)
    assert not isinstance(q["bias"], QTensor)
    assert not isinstance(q["ints"], QTensor)
    assert has_qtensors(q) and not has_qtensors(tree)


def test_noop_fast_path_is_bit_identical():
    """An unquantized tree must trace the exact same graph (no wiggle, no
    converts): dequantize_step_params returns the tree object itself."""
    tree = {"w": jnp.ones((4, 4))}
    assert dequantize_step_params(tree, jnp.float32,
                                  jnp.zeros((2,))) is tree


def test_sampler_quantized_close_to_exact():
    """Flagship-path equivalence at tiny scale: sample with int8 weights
    stays close to the exact sample (weight-only quantization error only),
    and is deterministic."""
    m = DiffusionModel(**TINY)
    m.initialize(jnp.zeros((1, 2, 256)))
    noise = jax.random.normal(jax.random.key(0), (2, 2, 256))
    exact = np.asarray(m.sample(noise, num_steps=10))
    qparams = quantize_params(m.params, min_size=16)  # quantize ~everything
    q = np.asarray(m.sample(noise, num_steps=10, params=qparams))
    q2 = np.asarray(m.sample(noise, num_steps=10, params=qparams))
    np.testing.assert_array_equal(q, q2)
    # Outputs are O(1); int8 weight error compounds across 10 net calls but
    # must stay a small perturbation, far from re-rolled noise.
    rms = float(np.sqrt(np.mean((q - exact) ** 2)))
    assert rms < 0.05, rms
    assert np.isfinite(q).all()


def test_quantized_serving():
    m = DiffusionModel(**TINY)
    m.initialize(jnp.zeros((1, 2, 256)))
    qparams = quantize_params(m.params, min_size=16)
    noise = np.asarray(jax.random.normal(jax.random.key(1), (2, 256)))
    direct = np.asarray(m.sample(jnp.asarray(noise)[None], num_steps=4,
                                 params=qparams))[0]
    with GenerationService(m, num_steps=4, batch_size=2, params=qparams,
                           max_wait_ms=10.0) as svc:
        served = svc.submit(noise).result(timeout=120)
    np.testing.assert_allclose(served, direct, atol=1e-4)


def test_quantized_other_samplers():
    """DPM / SDE / inpainter all accept quantized trees."""
    from audio_diffusion_tpu import DPMSampler, SDESampler, VInpainter

    m = DiffusionModel(**TINY, sampler_t=DPMSampler)
    m.initialize(jnp.zeros((1, 2, 256)))
    qparams = quantize_params(m.params, min_size=16)
    noise = jax.random.normal(jax.random.key(2), (1, 2, 256))
    out = m.sample(noise, num_steps=6, params=qparams)
    assert np.isfinite(np.asarray(out)).all()

    sde = SDESampler(net=m.net, eta=0.5)
    out = sde.sample(qparams["net"], jax.random.key(3), noise, num_steps=6)
    assert np.isfinite(np.asarray(out)).all()

    inp = VInpainter(net=m.net)
    src = jnp.zeros((1, 2, 256))
    mask = jnp.ones((1, 2, 256), bool)
    out = inp.sample(qparams["net"], jax.random.key(4), src, mask,
                     num_steps=3, num_resamples=2)
    assert np.isfinite(np.asarray(out)).all()


def test_quantize_preserves_master_params():
    m = DiffusionModel(**TINY)
    m.initialize(jnp.zeros((1, 2, 256)))
    before = jax.tree.map(np.asarray, m.params)
    quantize_params(m.params, min_size=16)
    after = jax.tree.map(np.asarray, m.params)
    jax.tree.map(np.testing.assert_array_equal, before, after)
