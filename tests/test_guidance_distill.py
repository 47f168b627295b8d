"""Guidance distillation (Meng et al., CVPR 2023, w-fixed variant): a
student learns the teacher's classifier-free-guided v in ONE conditional
pass, halving per-step serving cost for guided sampling. Beyond-reference
(the reference's CFG always pays the two-pass at sample time,
reference README.md:74)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.diffusion.core import alpha_beta, pad_dims
from audio_diffusion_tpu.distill import (ProgressiveDistiller,
                                         make_guidance_targets)

LENGTH = 64
EMB_LEN, EMB_FEAT = 4, 16
CFG_TINY = dict(
    net_t=UNetV0, in_channels=1, channels=[8, 16], factors=[1, 2],
    items=[1, 1], cross_attentions=[0, 1], attention_heads=2,
    attention_features=8, modulation_features=32,
    embedding_features=EMB_FEAT, use_embedding_cfg=True,
    embedding_max_length=EMB_LEN)
SCALE = 3.0


def _model_and_data(seed=0):
    model = DiffusionModel(**CFG_TINY)
    key = jax.random.key(seed)
    x = jax.random.normal(key, (4, 1, LENGTH))
    emb = jax.random.normal(jax.random.fold_in(key, 1),
                            (4, EMB_LEN, EMB_FEAT))
    model.initialize(x, embedding=emb)
    return model, x, emb


def _probe_mse(net, student_params, teacher_params, x, emb, key):
    """MSE between the student's single conditional pass and the teacher's
    guided two-pass on matched noisy probes."""
    k_t, k_eps = jax.random.split(key)
    sig = jax.random.uniform(k_t, (x.shape[0],), jnp.float32)
    a, b = alpha_beta(pad_dims(sig, x.ndim - 1))
    eps = jax.random.normal(k_eps, x.shape, x.dtype)
    x_t = a * x + b * eps
    v_teacher = net.apply(teacher_params, x_t, sig, embedding=emb,
                          embedding_scale=SCALE)
    v_student = net.apply(student_params, x_t, sig, embedding=emb)
    return float(jnp.mean(jnp.square(v_student - v_teacher)))


def test_guidance_targets_match_direct_teacher_call():
    """The jitted target program returns exactly the teacher's guided v
    (split-program regression, like the progressive-distill one)."""
    model, x, emb = _model_and_data()
    net, teacher = model.net, model.params["net"]
    key = jax.random.key(11)

    target_fn = make_guidance_targets(net, SCALE)
    x_t, sig_t, v_tgt = target_fn(teacher, key, x, embedding=emb)

    # Recompute inline with the same key-derived randomness.
    k_t, k_eps = jax.random.split(key)
    sig_ref = jax.random.uniform(k_t, (x.shape[0],), jnp.float32)
    a, b = alpha_beta(pad_dims(sig_ref, x.ndim - 1))
    eps = jax.random.normal(k_eps, x.shape, x.dtype)
    x_ref = a * x + b * eps
    v_ref = net.apply(teacher, x_ref, sig_ref, embedding=emb,
                      embedding_scale=SCALE)
    np.testing.assert_allclose(np.asarray(sig_t), np.asarray(sig_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_tgt), np.asarray(v_ref),
                               atol=1e-5)


def test_guidance_stage_student_approaches_guided_teacher():
    model, x, emb = _model_and_data()
    net = model.net
    teacher = jax.tree.map(lambda a: jnp.array(a, copy=True),
                           model.params["net"])
    probe_key = jax.random.key(99)
    before = _probe_mse(net, model.params["net"], teacher, x, emb,
                        probe_key)
    assert before > 0  # guidance at scale 3 differs from the plain pass

    distiller = ProgressiveDistiller(model, base_steps=8,
                                     learning_rate=1e-3)
    batches = itertools.repeat(x)
    metrics = distiller.guidance_stage(batches, embedding_scale=SCALE,
                                       num_train_steps=120, log_every=60,
                                       embedding=emb)
    assert np.isfinite(metrics["loss"])
    assert distiller.steps == 8  # guidance stage does not halve steps
    after = _probe_mse(net, model.params["net"], teacher, x, emb,
                       probe_key)
    # The student should close most of the gap to the guided teacher.
    assert after < 0.5 * before, (before, after)


def test_guidance_stage_accepts_tuple_batches():
    """(x, {"embedding": ...}) batches — the paired-embedding corpus
    convention of Trainer.fit — carry conditioning per batch."""
    model, x, emb = _model_and_data(seed=3)
    distiller = ProgressiveDistiller(model, base_steps=4,
                                     learning_rate=1e-3)
    batches = itertools.repeat((x, {"embedding": emb}))
    metrics = distiller.guidance_stage(batches, embedding_scale=SCALE,
                                       num_train_steps=4, log_every=4)
    assert np.isfinite(metrics["loss"])


def test_guidance_then_progressive_stacks():
    """guidance_stage -> stage halving composes; the result samples
    single-pass (no embedding_scale) at the distilled step count."""
    model, x, emb = _model_and_data(seed=5)
    distiller = ProgressiveDistiller(model, base_steps=4,
                                     learning_rate=1e-3)
    batches = itertools.repeat(x)
    distiller.guidance_stage(batches, embedding_scale=SCALE,
                             num_train_steps=3, log_every=3,
                             embedding=emb)
    distiller.stage(batches, num_train_steps=3, log_every=3,
                    embedding=emb)
    assert distiller.steps == 2
    noise = jax.random.normal(jax.random.key(0), (2, 1, LENGTH))
    out = model.sample(noise, embedding=emb[:2],
                       num_steps=distiller.steps)
    assert out.shape == (2, 1, LENGTH)
    assert np.isfinite(np.asarray(out)).all()
