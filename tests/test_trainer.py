"""Trainer: loss goes down on a learnable toy problem; checkpoint save +
resume restores exact state.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.parallel import create_mesh
from audio_diffusion_tpu.train import Trainer, TrainerConfig

TINY = dict(
    net_t=UNetV0,
    in_channels=1,
    channels=[8, 16],
    factors=[1, 2],
    items=[1, 1],
    modulation_features=32,
)


def _batches(batch_size=8, length=64):
    # A deterministic, learnable dataset: a fixed tone.
    t = np.arange(length) / length
    tone = np.sin(2 * np.pi * 4 * t).astype(np.float32)
    batch = jnp.asarray(np.tile(tone, (batch_size, 1, 1)))
    return itertools.repeat(batch)


def test_loss_decreases():
    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    logs = []
    trainer = Trainer(
        model,
        TrainerConfig(learning_rate=1e-3, log_every=20),
        log_fn=logs.append,
    )
    m0 = trainer.fit(_batches(), num_steps=5)
    first = float(m0["loss"])
    m1 = trainer.fit(_batches(), num_steps=60)
    last = float(m1["loss"])
    assert last < first, f"loss did not decrease: {first} -> {last}"
    assert logs, "expected log lines"


def test_checkpoint_roundtrip(tmp_path):
    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    trainer = Trainer(
        model,
        TrainerConfig(checkpoint_dir=str(tmp_path / "ckpt"),
                      checkpoint_every=5, log_every=100),
        log_fn=lambda s: None,
    )
    trainer.fit(_batches(), num_steps=5)
    saved_params = jax.tree_util.tree_map(np.array, trainer.state.params)
    assert int(trainer.state.step) == 5

    # Fresh trainer restores the exact state.
    model2 = DiffusionModel(**TINY)
    model2.initialize(next(iter(_batches())))
    trainer2 = Trainer(
        model2,
        TrainerConfig(checkpoint_dir=str(tmp_path / "ckpt"),
                      log_every=100),
        log_fn=lambda s: None,
    )
    step = trainer2.restore_latest()
    assert step == 5
    restored = jax.tree_util.tree_map(np.array, trainer2.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        saved_params, restored)


def test_trainer_with_mesh():
    mesh = create_mesh()
    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    trainer = Trainer(model, TrainerConfig(log_every=100), mesh=mesh,
                      log_fn=lambda s: None)
    metrics = trainer.fit(_batches(), num_steps=3)
    assert jnp.isfinite(metrics["loss"])


def test_ema():
    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    trainer = Trainer(model, TrainerConfig(learning_rate=1e-3,
                                           ema_decay=0.9, log_every=100),
                      log_fn=lambda s: None)
    trainer.fit(_batches(), num_steps=10)
    ema = trainer.ema_params
    # EMA lags the live params but moves from init.
    import numpy as np
    live = jax.tree_util.tree_leaves(trainer.state.params)
    emal = jax.tree_util.tree_leaves(ema)
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(live, emal)]
    assert max(diffs) > 0  # not identical to live params
    assert all(jnp.all(jnp.isfinite(e)) for e in emal)


def test_trainer_with_static_cond_kwargs():
    """Structural conditioning kwargs (embedding_mask_proba) must compile:
    the train step splits traced arrays from static scalars."""
    from audio_diffusion_tpu import UNetV0
    from audio_diffusion_tpu.ops.text import StubTextEncoder

    model = DiffusionModel(
        net_t=UNetV0, in_channels=1, channels=[8, 16], factors=[1, 2],
        items=[1, 1], cross_attentions=[0, 1], attention_heads=2,
        attention_features=8, modulation_features=32,
        use_text_conditioning=True, use_embedding_cfg=True,
        embedding_max_length=4, embedding_features=16,
        text_encoder=StubTextEncoder(max_length=4, features=16))
    x = jnp.zeros((2, 1, 64))
    emb = jnp.zeros((2, 4, 16))
    model.initialize(x, embedding=emb)
    trainer = Trainer(model, TrainerConfig(log_every=100),
                      log_fn=lambda s: None)
    metrics = trainer.fit(itertools.repeat(x), num_steps=2, embedding=emb,
                          embedding_mask_proba=0.1)
    assert jnp.isfinite(metrics["loss"])


def test_checkpoint_roundtrip_with_mesh(tmp_path):
    """Sharded state restores with the mesh shardings init_state
    established (regression: restore used to omit restore_args, leaving
    placement to orbax defaults)."""
    mesh = create_mesh()
    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    cfg = TrainerConfig(checkpoint_dir=str(tmp_path / "ckpt"),
                        checkpoint_every=3, log_every=100)
    trainer = Trainer(model, cfg, mesh=mesh, log_fn=lambda s: None)
    trainer.fit(_batches(), num_steps=3)
    trainer.save_checkpoint(wait=True)
    want = jax.tree_util.tree_map(np.array, trainer.state.params)

    model2 = DiffusionModel(**TINY)
    model2.initialize(next(iter(_batches())))
    trainer2 = Trainer(model2, cfg, mesh=mesh, log_fn=lambda s: None)
    assert trainer2.restore_latest() == 3
    got = trainer2.state.params
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(w, np.array(g))
    # Every restored leaf carries the mesh sharding the fresh init uses.
    fresh = trainer2._init_state_fn(model2.params, jax.random.key(0))
    for g, f in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(fresh.params)):
        assert g.sharding == f.sharding, (g.sharding, f.sharding)
    # And training continues from the restored state.
    trainer2.fit(_batches(), num_steps=2)
    assert int(trainer2.state.step) == 5


def test_debug_nans_not_leaked():
    """Regression: fit(debug_nans=True) used to leave jax_debug_nans on
    process-wide after returning."""
    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    trainer = Trainer(model, TrainerConfig(debug_nans=True, log_every=100),
                      log_fn=lambda s: None)
    assert not jax.config.jax_debug_nans
    trainer.fit(_batches(), num_steps=2)
    assert not jax.config.jax_debug_nans


def test_accum_steps_via_trainer_config():
    """Gradient accumulation is reachable through TrainerConfig."""
    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    trainer = Trainer(model, TrainerConfig(accum_steps=2, log_every=100),
                      log_fn=lambda s: None)
    m = trainer.fit(_batches(batch_size=8), num_steps=2)
    assert np.isfinite(float(m["loss"]))


def test_lr_schedules():
    """Warmup/cosine schedules build and train; cosine needs total_steps."""
    import pytest

    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    t = Trainer(model, TrainerConfig(lr_schedule="cosine", warmup_steps=2,
                                     total_steps=10, log_every=100),
                log_fn=lambda s: None)
    m = t.fit(_batches(), num_steps=3)
    assert np.isfinite(float(m["loss"]))

    t2 = Trainer(model, TrainerConfig(warmup_steps=2, log_every=100),
                 log_fn=lambda s: None)
    m2 = t2.fit(_batches(), num_steps=3)
    assert np.isfinite(float(m2["loss"]))

    with pytest.raises(AssertionError, match="total_steps"):
        Trainer(model, TrainerConfig(lr_schedule="cosine"))
    with pytest.raises(AssertionError, match="unknown lr_schedule"):
        Trainer(model, TrainerConfig(lr_schedule="linear"))


def test_steps_per_call_via_trainer(tmp_path):
    """TrainerConfig(steps_per_call=K): chunked dispatch with a
    non-divisible step count (tail runs single steps), checkpoint cadence
    crossing preserved, final step counter exact, loss still learns."""
    model = DiffusionModel(**TINY)
    model.initialize(next(iter(_batches())))
    logs = []
    trainer = Trainer(
        model,
        TrainerConfig(learning_rate=1e-3, log_every=4, steps_per_call=4,
                      checkpoint_dir=str(tmp_path / "ck"),
                      checkpoint_every=8),
        log_fn=logs.append,
    )
    m = trainer.fit(_batches(), num_steps=11)  # 2 chunks of 4 + 3 tail
    assert int(trainer.state.step) == 11
    assert np.isfinite(float(m["loss"]))
    # Checkpoint crossing at step 8 happened despite K=4 strides.
    assert trainer.restore_latest() == 8
    # log_every=4 crossings present.
    assert any("step 4:" in ln or "step 5:" in ln for ln in logs)
