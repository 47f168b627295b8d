"""GenerationService: microbatching, padding, determinism, conditioning."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_diffusion_tpu import (DiffusionModel, DiffusionUpsampler,
                                 GenerationService, UNetV0)

TINY = dict(net_t=UNetV0, in_channels=2, channels=[8, 16], factors=[1, 2],
            items=[1, 1], modulation_features=32)


@pytest.fixture(scope="module")
def model():
    m = DiffusionModel(**TINY)
    m.initialize(jnp.zeros((1, 2, 256)))
    return m


def test_batches_and_padding(model):
    with GenerationService(model, num_steps=4, batch_size=4,
                           max_wait_ms=200.0) as svc:
        noise = [np.random.default_rng(i).standard_normal(
            (2, 256)).astype(np.float32) for i in range(6)]
        outs = [f.result(timeout=120) for f in
                [svc.submit(n) for n in noise]]
    assert all(o.shape == (2, 256) and np.isfinite(o).all() for o in outs)
    s = svc.stats
    # 6 requests at batch 4: two batches, the second padded by 2.
    assert s["requests"] == 6 and s["batches"] == 2
    assert s["padded_slots"] == 2
    assert s["mean_occupancy"] == pytest.approx(6 / 8)


def test_matches_direct_sampling_and_padding_is_inert(model):
    """A padded service batch returns the same audio as a direct
    model.sample of the same noise (batch elements are independent)."""
    noise = np.random.default_rng(0).standard_normal(
        (2, 256)).astype(np.float32)
    direct = np.asarray(model.sample(noise[None], num_steps=4))[0]
    with GenerationService(model, num_steps=4, batch_size=4,
                           max_wait_ms=10.0) as svc:
        served = svc.submit(noise).result(timeout=120)
    np.testing.assert_allclose(served, direct, atol=1e-4)


def test_generate_seed_deterministic(model):
    with GenerationService(model, num_steps=2, batch_size=2,
                           max_wait_ms=10.0) as svc:
        a = svc.generate(length=256, seed=7)
        b = svc.generate(length=256, seed=7)
        c = svc.generate(length=256, seed=8)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_mixed_signatures(model):
    """Different lengths and step counts route to separate batches."""
    with GenerationService(model, num_steps=2, batch_size=4,
                           max_wait_ms=50.0) as svc:
        f1 = svc.submit(np.zeros((2, 256), np.float32))
        f2 = svc.submit(np.zeros((2, 512), np.float32))
        f3 = svc.submit(np.zeros((2, 256), np.float32), num_steps=3)
        outs = [f.result(timeout=120) for f in (f1, f2, f3)]
    assert outs[0].shape == (2, 256)
    assert outs[1].shape == (2, 512)
    assert svc.stats["batches"] == 3


def test_error_propagates(model):
    with GenerationService(model, num_steps=2, batch_size=1) as svc:
        # Length not divisible by the downsampling product -> the batch
        # fails; the future must carry the exception, not hang.
        f = svc.submit(np.zeros((2, 255), np.float32))
        with pytest.raises(Exception):
            f.result(timeout=120)


def test_params_snapshot(model):
    """A service pinned to a params snapshot ignores later live-params
    changes and restores model.params after each batch."""
    snapshot = jax.tree.map(lambda p: p, model.params)
    noise = np.random.default_rng(1).standard_normal(
        (2, 256)).astype(np.float32)
    with GenerationService(model, num_steps=2, batch_size=1,
                           params=snapshot) as svc:
        before = svc.submit(noise).result(timeout=120)
        live = model.params
        model.params = jax.tree.map(lambda p: p * 0.5, live)
        after = svc.submit(noise).result(timeout=120)
        assert model.params is not snapshot
        model.params = live
    np.testing.assert_array_equal(before, after)


def test_serves_task_model():
    up = DiffusionUpsampler(net_t=UNetV0, in_channels=2, upsample_factor=2,
                            channels=[8, 16], factors=[1, 2], items=[1, 1],
                            modulation_features=32)
    up.initialize(jnp.zeros((1, 2, 256)))
    with GenerationService(up, num_steps=2, batch_size=2,
                           max_wait_ms=10.0) as svc:
        out = svc.submit(np.zeros((2, 128), np.float32)).result(timeout=120)
    assert out.shape == (2, 256)


def test_text_conditional_serving():
    """Regression: text= requests crashed (first request's 1-element list
    met a batch-N primary). Different prompts must share one batch."""
    from audio_diffusion_tpu.ops.text import StubTextEncoder

    m = DiffusionModel(
        net_t=UNetV0, in_channels=2, channels=[8, 16], factors=[1, 2],
        items=[1, 1], attentions=[0, 1], cross_attentions=[0, 1],
        attention_heads=2, attention_features=8, modulation_features=32,
        use_text_conditioning=True, use_embedding_cfg=True,
        embedding_max_length=8, embedding_features=16,
        text_encoder=StubTextEncoder(max_length=8, features=16))
    m.initialize(jnp.zeros((1, 2, 256)), text=["warmup"])
    with GenerationService(m, num_steps=2, batch_size=2,
                           max_wait_ms=200.0) as svc:
        noise = np.random.default_rng(0).standard_normal(
            (2, 256)).astype(np.float32)
        f1 = svc.submit(noise, text="a dog barking", embedding_scale=3.0)
        f2 = svc.submit(noise, text=["rain"], embedding_scale=3.0)
        o1, o2 = f1.result(timeout=300), f2.result(timeout=300)
    assert o1.shape == o2.shape == (2, 256)
    assert np.isfinite(o1).all() and np.isfinite(o2).all()
    # Same noise, different prompts -> different audio, one shared batch.
    assert np.abs(o1 - o2).max() > 0
    assert svc.stats["batches"] == 1


def test_serve_rejects_structured_cond():
    m = DiffusionModel(net_t=UNetV0, in_channels=2, channels=[8, 16],
                       factors=[1, 2], items=[1, 1], modulation_features=32)
    with GenerationService(m, num_steps=2, batch_size=1) as svc:
        with pytest.raises(TypeError, match="structured conditioning"):
            svc.submit(np.zeros((2, 256), np.float32),
                       channels=[None, np.zeros((4, 64))])
        with pytest.raises(ValueError, match="exactly one string"):
            svc.submit(np.zeros((2, 256), np.float32), text=["a", "b"])


def test_submit_seed_device_noise(model):
    """Seed requests draw noise on device: deterministic per seed and
    independent of batch composition (alone-and-padded vs sharing a
    batch), with no host noise upload."""
    with GenerationService(model, num_steps=2, batch_size=2,
                           max_wait_ms=100.0) as svc:
        f7 = svc.submit_seed(7, length=256)
        f8 = svc.submit_seed(8, length=256)
        o7_shared, o8 = f7.result(timeout=120), f8.result(timeout=120)
        o7_alone = svc.submit_seed(7, length=256).result(timeout=120)
    assert o7_shared.shape == (2, 256)
    np.testing.assert_allclose(o7_alone, o7_shared, atol=1e-5)
    assert np.abs(o7_shared - o8).max() > 0
    assert np.isfinite(o7_shared).all()
    # generate(seed=...) routes through the same path.
    with GenerationService(model, num_steps=2, batch_size=2,
                           max_wait_ms=10.0) as svc:
        g = svc.generate(length=256, seed=7)
    np.testing.assert_allclose(g, o7_alone, atol=1e-5)


def test_params_snapshot_never_mutates_model(model):
    """Regression (round-3): the snapshot rides through the explicit
    `params=` call override — model.params is NEVER swapped, so a direct
    model.sample from another thread during a batch window always sees the
    live tree."""
    live = model.params
    snapshot = jax.tree.map(lambda p: p * 0.0, model.params)
    noise = np.random.default_rng(2).standard_normal(
        (2, 256)).astype(np.float32)
    with GenerationService(model, num_steps=4, batch_size=1,
                           params=snapshot) as svc:
        fut = svc.submit(noise)
        # Poll the shared state while the worker runs the batch: any
        # transient swap (the old implementation) is observable here.
        while not fut.done():
            assert model.params is live
        served = fut.result(timeout=120)
    assert model.params is live
    # The batch really used the snapshot (all-zero params -> differs from
    # the live-params output).
    direct = np.asarray(model.sample(noise[None], num_steps=4))[0]
    assert np.abs(served - direct).max() > 0


def test_malformed_request_fails_alone(model, monkeypatch):
    """A request whose signature computation blows up fails ITS OWN future;
    the service keeps serving everyone else."""
    import audio_diffusion_tpu.serve as serve_mod

    real_signature = serve_mod._signature

    def picky(primary, cond, num_steps):
        if cond.get("poison"):
            raise RuntimeError("signature exploded")
        return real_signature(primary, cond, num_steps)

    with GenerationService(model, num_steps=2, batch_size=1,
                           max_wait_ms=20.0) as svc:
        monkeypatch.setattr(serve_mod, "_signature", picky)
        bad = svc.submit(np.zeros((2, 256), np.float32), poison=True)
        with pytest.raises(RuntimeError, match="signature exploded"):
            bad.result(timeout=30)
        good = svc.submit(np.zeros((2, 256), np.float32))
        assert good.result(timeout=120).shape == (2, 256)


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_worker_crash_fails_pending_futures(model):
    """Regression (ADVICE r2): an unexpected error in the flush logic
    (outside _run_batch's internal guard) must fail every pending future
    and close the service — not silently kill the daemon and hang
    callers."""
    svc = GenerationService(model, num_steps=2, batch_size=4,
                            max_wait_ms=50.0)
    try:
        def boom(reqs):
            raise RuntimeError("flush exploded")

        svc._run_batch = boom
        f1 = svc.submit(np.zeros((2, 256), np.float32))
        f2 = svc.submit(np.zeros((2, 256), np.float32))
        for f in (f1, f2):
            with pytest.raises(RuntimeError, match="worker died"):
                f.result(timeout=30)
        svc._worker.join(timeout=30)
        with pytest.raises(RuntimeError, match="closed"):
            svc.submit(np.zeros((2, 256), np.float32))
    finally:
        svc._closed = True  # worker is dead; close() would block on join


def test_submit_seed_rejects_out_of_range(model):
    with GenerationService(model, num_steps=2, batch_size=1) as svc:
        with pytest.raises(ValueError, match=r"seed must be in"):
            svc.submit_seed(-1, length=256)
        with pytest.raises(ValueError, match=r"seed must be in"):
            svc.submit_seed(2**32, length=256)
        # In-range boundary values pass validation and serve fine.
        out = svc.submit_seed(2**32 - 1, length=256).result(timeout=120)
    assert out.shape == (2, 256)


def test_signature_normalizes_numeric_scalars():
    """Regression (ADVICE r2): 5 vs 5.0 as a scalar conditioning value must
    share one bucket/compiled program."""
    from audio_diffusion_tpu.serve import _signature

    prim = np.zeros((2, 256), np.float32)
    s_int = _signature(prim, {"embedding_scale": 5}, num_steps=2)
    s_float = _signature(prim, {"embedding_scale": 5.0}, num_steps=2)
    assert s_int == s_float
    # bools keep identity semantics (True is not 1.0's bucket-mate by type
    # confusion in jit staticness for flags).
    s_true = _signature(prim, {"flag": True}, num_steps=2)
    s_one = _signature(prim, {"flag": 1}, num_steps=2)
    assert s_true != s_one


def test_pcm16_result_format(model):
    """result_format='pcm16' converts on device: int16 results matching
    the float path's wav_write quantization."""
    noise = np.random.default_rng(5).standard_normal(
        (2, 256)).astype(np.float32)
    with GenerationService(model, num_steps=2, batch_size=1) as svc:
        f32 = svc.submit(noise).result(timeout=120)
    with GenerationService(model, num_steps=2, batch_size=1,
                           result_format="pcm16") as svc:
        pcm = svc.submit(noise).result(timeout=120)
    assert pcm.dtype == np.int16 and pcm.shape == f32.shape
    expect = np.clip(np.round(f32.astype(np.float32) * 32767.0),
                     -32768, 32767).astype(np.int16)
    # round-half ties may differ by 1 LSB between device and numpy.
    assert np.abs(pcm.astype(np.int32) - expect.astype(np.int32)).max() <= 1


def test_conditional_artifact_serving(tmp_path):
    """A guided-distilled-style CONDITIONAL artifact (embedding as traced
    input) serves through GenerationService: per-request embeddings batch
    into the artifact's fixed shape, model-code-free."""
    from audio_diffusion_tpu.export import ArtifactSampler, export_sampler

    emb_b2 = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 4, 16)), jnp.float32)
    m = DiffusionModel(
        net_t=UNetV0, in_channels=2, channels=[8, 16], factors=[1, 2],
        items=[1, 1], cross_attentions=[0, 1], attention_heads=2,
        attention_features=8, modulation_features=32,
        embedding_features=16, use_embedding_cfg=True,
        embedding_max_length=4)
    m.initialize(jnp.zeros((2, 2, 256)), embedding=emb_b2)
    export_sampler(m, tmp_path / "art", length=256, batch_size=2,
                   num_steps=2, embedding=jnp.zeros((2, 4, 16)))

    art = ArtifactSampler(tmp_path / "art", m.params)
    with GenerationService(art, num_steps=2, batch_size=2,
                           max_wait_ms=200.0) as svc:
        noise = np.random.default_rng(0).standard_normal(
            (2, 256)).astype(np.float32)
        f1 = svc.submit(noise, embedding=np.asarray(emb_b2[0]))
        f2 = svc.submit(noise, embedding=np.asarray(emb_b2[1]))
        o1, o2 = f1.result(timeout=300), f2.result(timeout=300)
    assert o1.shape == o2.shape == (2, 256)
    assert np.isfinite(o1).all() and np.isfinite(o2).all()
    assert np.abs(o1 - o2).max() > 0  # embeddings actually conditioned
    assert svc.stats["batches"] == 1
    # Bit-exact vs the live model's single-pass conditional sampling.
    want = np.asarray(m.sample(
        jnp.asarray(np.stack([noise, noise])), num_steps=2,
        embedding=emb_b2))
    np.testing.assert_array_equal(np.stack([o1, o2]), want)
