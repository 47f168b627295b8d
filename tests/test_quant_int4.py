"""Int4 packed weight-only quantization (ops/quant.py, bits=4).

Covers: nibble pack/unpack exactness against an unpacked int4 reference,
roundtrip error bounds (scale/2 = amax/14), odd leading-dim padding, tree
selection, scan-body dequant via a sampler run, capacity accounting (4x),
and aux-format back-compat with round-3 (int8-only) QTensor trees.
"""
import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import (DiffusionModel, QTensor, UNetV0,
                                 quantize_params)
from audio_diffusion_tpu.ops.quant import (dequantize_leaf,
                                           dequantize_params,
                                           dequantize_step_params,
                                           has_qtensors, quantize_leaf)

TINY = dict(net_t=UNetV0, in_channels=2, channels=[8, 16], factors=[1, 2],
            items=[1, 1], modulation_features=32)


def _ref_int4(w):
    """Straight per-output-channel symmetric int4 values (no packing)."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = np.maximum(amax, 1e-12) / 7.0
    q = np.clip(np.round(w / scale), -7, 7)
    return q * scale


def test_pack_unpack_is_exact():
    """Dequantized packed int4 == the unpacked int4 reference, elementwise
    (packing is pure layout; the only loss is the 4-bit rounding)."""
    rng = np.random.default_rng(0)
    for shape in [(64, 128), (3, 64, 96), (3, 5, 33), (7, 16)]:
        w = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
        qt = quantize_leaf(w, bits=4)
        assert qt.bits == 4 and qt.orig_shape == shape
        back = np.asarray(dequantize_leaf(qt))
        np.testing.assert_allclose(back, _ref_int4(w), rtol=0, atol=1e-6)


def test_int4_error_bound():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32)) * 0.3
    qt = quantize_leaf(w, bits=4)
    back = np.asarray(dequantize_leaf(qt))
    amax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    # Symmetric int4: per-channel max error is scale/2 = amax/14.
    assert (np.abs(back - np.asarray(w)) <= amax / 14 + 1e-6).all()


def test_packed_capacity_is_4x():
    w = jnp.ones((512, 256))
    qt = quantize_leaf(w, bits=4)
    assert qt.q.dtype == jnp.int8
    assert qt.q.shape == (256, 256)  # two rows per byte
    # 4x fewer weight bytes than f32 would be 16x; vs bf16 it is 4x.
    assert qt.q.size * 1 == w.size // 2


def test_odd_rows_pad_and_restore():
    w = jnp.asarray(np.random.default_rng(2).standard_normal((5, 3, 8)),
                    jnp.float32)
    qt = quantize_leaf(w, bits=4)
    assert qt.q.shape == (8, 8)  # ceil(15/2) rows
    assert dequantize_leaf(qt).shape == (5, 3, 8)


def test_tree_bits_selection():
    tree = {"big": jnp.ones((512, 256)), "small": jnp.ones((4, 4))}
    q = quantize_params(tree, min_size=1024, bits=4)
    assert isinstance(q["big"], QTensor) and q["big"].bits == 4
    assert not isinstance(q["small"], QTensor)
    assert has_qtensors(q)
    back = dequantize_params(q)
    assert back["big"].shape == (512, 256)


def test_sampler_runs_with_int4_params():
    """model.sample(params=int4 tree) traces the in-scan dequant and stays
    close to the exact model (int4 is coarse: loose tolerance, but the
    output must be finite and correlated)."""
    model = DiffusionModel(**TINY)
    noise = jax.random.normal(jax.random.key(0), (1, 2, 64), jnp.float32)
    exact = np.asarray(model.sample(noise, num_steps=6))
    q4 = quantize_params(model.params, min_size=256, bits=4)
    out = np.asarray(model.sample(noise, num_steps=6, params=q4))
    assert np.isfinite(out).all()
    # Correlated with the exact output well beyond chance.
    c = np.corrcoef(out.ravel(), exact.ravel())[0, 1]
    assert c > 0.9, c


def test_step_dequant_mixed_bits():
    """int8 and int4 leaves coexist in one tree through the scan-body
    dequant path."""
    t = {"a": quantize_leaf(jnp.ones((32, 16)) * 0.5, bits=8),
         "b": quantize_leaf(jnp.ones((32, 16)) * 0.5, bits=4),
         "c": jnp.ones((4,))}
    out = dequantize_step_params(t, jnp.float32, jnp.arange(3.0))
    np.testing.assert_allclose(np.asarray(out["a"]), 0.5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.5, atol=0.05)
    assert out["c"] is t["c"]


def test_aux_backcompat_str_unflattens_as_int8():
    """Round-3 artifacts flattened QTensor with aux=str(orig_dtype); the
    tuple-aux class must still unflatten them (bits=8, no orig_shape)."""
    qt = QTensor.tree_unflatten("float32",
                                (jnp.ones((8, 8), jnp.int8),
                                 jnp.ones((1, 8))))
    assert qt.bits == 8 and qt.orig_shape is None
    assert qt.shape == (8, 8)


def test_int4_roundtrips_through_flatten():
    qt = quantize_leaf(jnp.ones((64, 32)), bits=4)
    leaves, treedef = jax.tree.flatten({"w": qt})
    back = jax.tree.unflatten(treedef, leaves)["w"]
    assert back.bits == 4 and back.orig_shape == (64, 32)


def test_unsupported_bits_raises():
    """bits outside {8, 4} must fail loudly (a ValueError, not an assert
    that -O strips into silent wrong-qmax packing)."""
    import pytest
    for bad in (3, 5, 16, 2):
        with pytest.raises(ValueError, match="bits"):
            quantize_leaf(jnp.ones((8, 8)), bits=bad)


def test_int4_without_orig_shape_rejected_at_construction():
    """A hand-built bits=4 QTensor with no orig_shape cannot be unpacked;
    construction (not a later opaque unpack TypeError) must reject it."""
    import pytest
    with pytest.raises(ValueError, match="orig_shape"):
        QTensor(jnp.ones((4, 4), jnp.int8), jnp.ones((1, 4)), bits=4)


def test_packed_shape_vs_logical_shape():
    """.shape is the logical pre-packed shape; .packed_shape is the physical
    int8 storage shape — byte accounting must use the latter."""
    qt4 = quantize_leaf(jnp.ones((64, 32)), bits=4)
    assert qt4.shape == (64, 32) and qt4.packed_shape == (32, 32)
    qt8 = quantize_leaf(jnp.ones((64, 32)), bits=8)
    assert qt8.shape == qt8.packed_shape == (64, 32)


def test_unpack_int4_leaves_lossless_int8_form():
    """Load-time int4 -> int8 conversion (the measured-correct serving
    path, PERFORMANCE.md r4): same dequantized values, bits=8 leaves,
    non-QTensor and int8 leaves untouched."""
    import numpy as np

    from audio_diffusion_tpu.ops.quant import (dequantize_params,
                                               quantize_leaf,
                                               unpack_int4_leaves)

    w = jax.random.normal(jax.random.key(0), (33, 16))  # odd rows: padding
    tree = {"a": quantize_leaf(w, bits=4),
            "b": quantize_leaf(w, bits=8),
            "c": jnp.ones((3,))}
    out = unpack_int4_leaves(tree)
    assert out["a"].bits == 8 and out["a"].shape == (33, 16)
    assert out["a"].packed_shape == (33, 16)  # genuinely unpacked
    assert out["b"] is tree["b"] and out["c"] is tree["c"]
    np.testing.assert_array_equal(
        np.asarray(dequantize_params(tree)["a"]),
        np.asarray(dequantize_params(out)["a"]))
