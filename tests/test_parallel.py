"""Multi-device tests on the virtual 8-CPU mesh (conftest sets
xla_force_host_platform_device_count=8): DP-only, DP×TP, loss parity between
single-device and sharded execution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.parallel import (
    create_mesh,
    make_train_step,
    param_sharding_rules,
    shard_batch,
)

TINY = dict(
    net_t=UNetV0,
    in_channels=2,
    channels=[8, 32, 256],
    factors=[1, 4, 2],
    items=[1, 1, 1],
    attentions=[0, 0, 1],
    attention_heads=4,
    attention_features=8,
    modulation_features=64,
)
LENGTH = 256


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh(model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_param_sharding_rules_tp():
    mesh = create_mesh(model=2)
    model = DiffusionModel(**TINY)
    audio = jnp.zeros((8, 2, LENGTH))
    model.initialize(audio)
    specs = jax.tree_util.tree_leaves(
        param_sharding_rules(model.params, mesh),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    # At least some wide kernels get model-sharded; the rest replicate.
    sharded = [s for s in specs if len(s) > 0 and s[-1] == "model"]
    assert len(sharded) > 0


@pytest.mark.parametrize("model_axis", [1, 2])
def test_train_step_sharded(model_axis):
    mesh = create_mesh(model=model_axis)
    model = DiffusionModel(**TINY)
    audio = np.random.default_rng(0).standard_normal(
        (8, 2, LENGTH)).astype(np.float32)
    model.initialize(jnp.asarray(audio))

    init_state, train_step = make_train_step(
        model.loss, optax.adam(1e-4), mesh=mesh)
    state = init_state(model.params, jax.random.key(0))
    batch = shard_batch(jnp.asarray(audio), mesh)

    for _ in range(2):
        state, metrics = train_step(state, batch)
    assert jnp.isfinite(metrics["loss"])
    assert jnp.isfinite(metrics["grad_norm"])
    assert int(metrics["step"]) == 2


def test_sharded_loss_matches_single_device():
    """The sharded loss must equal the single-device loss exactly (same
    params, same key, same batch) — DP changes placement, not math."""
    mesh = create_mesh()  # 8-way DP
    model = DiffusionModel(**TINY)
    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        (8, 2, LENGTH)).astype(np.float32))
    model.initialize(audio)
    key = jax.random.key(42)

    loss_single = model.loss(model.params, key, audio)

    sharded_loss = jax.jit(model.loss)
    batch = shard_batch(audio, mesh)
    loss_sharded = sharded_loss(model.params, key, batch)
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=2e-5)


def test_sampling_under_dp_mesh():
    mesh = create_mesh()
    model = DiffusionModel(**TINY)
    audio = jnp.zeros((8, 2, LENGTH))
    model.initialize(audio)
    noise = jnp.asarray(np.random.default_rng(2).standard_normal(
        (8, 2, LENGTH)).astype(np.float32))
    noise_sharded = shard_batch(noise, mesh)
    out = model.sample(noise_sharded, num_steps=2)
    assert out.shape == (8, 2, LENGTH)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_length_sharded_sampling_matches_unsharded():
    """Sequence-parallel sampling (length axis over the mesh) is bit-
    equivalent to single-device sampling — XLA inserts conv halos/attention
    gathers."""
    from audio_diffusion_tpu.parallel import sample_length_sharded

    model = DiffusionModel(**TINY)
    noise = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 2, LENGTH)).astype(np.float32))
    model.initialize(noise)
    ref = model.sample(noise, num_steps=3)
    mesh = create_mesh()  # 8-way
    out = sample_length_sharded(model, noise, num_steps=3, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_gradient_accumulation_identity():
    """With a key-independent loss, accum_steps=2 must produce EXACTLY the
    full-batch gradients (mean-of-means over equal microbatches)."""
    from audio_diffusion_tpu.parallel import make_train_step

    w0 = {"w": jnp.asarray([[1.5, -0.5], [0.25, 2.0]], jnp.float32)}
    x = jax.random.normal(jax.random.key(0), (4, 2))

    def loss_fn(params, key, batch):
        pred = batch @ params["w"]
        return jnp.mean(jnp.square(pred - 1.0))

    opt = optax.sgd(0.1)
    outs = []
    for accum in (1, 2, 4):
        init_state, train_step = make_train_step(
            loss_fn, opt, accum_steps=accum, donate=False)
        state = init_state(w0, jax.random.key(1))
        state, metrics = train_step(state, x)
        outs.append((np.asarray(state.params["w"]),
                     float(metrics["loss"]), float(metrics["grad_norm"])))
    for params, loss, gnorm in outs[1:]:
        np.testing.assert_allclose(params, outs[0][0], atol=1e-6)
        assert abs(loss - outs[0][1]) < 1e-6
        assert abs(gnorm - outs[0][2]) < 1e-5


def test_gradient_accumulation_e2e_diffusion():
    """Accumulated training on the real diffusion loss runs and learns the
    same way (finite loss, params move, conditioning kwargs still work)."""
    from audio_diffusion_tpu.parallel import make_train_step

    model = DiffusionModel(
        net_t=UNetV0, in_channels=1, channels=[8, 16], factors=[1, 2],
        items=[1, 1], modulation_features=32)
    x = jax.random.normal(jax.random.key(0), (4, 1, 64))
    model.initialize(x)
    init_state, train_step = make_train_step(
        model.loss, optax.adam(1e-3), accum_steps=2)
    state = init_state(model.params, jax.random.key(1))
    before = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]).copy()
    for _ in range(3):
        state, metrics = train_step(state, x)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.abs(after - before).max() > 0

    with pytest.raises(AssertionError, match="divisible"):
        bad_init, bad_step = make_train_step(
            model.loss, optax.adam(1e-3), accum_steps=3)
        s = bad_init(model.params, jax.random.key(2))
        bad_step(s, x)


def test_length_sharded_rejects_key():
    """Deterministic samplers take no key; a passed key must be rejected
    loudly instead of silently dropped (regression)."""
    from audio_diffusion_tpu.parallel import sample_length_sharded

    mesh = create_mesh()
    model = DiffusionModel(net_t=UNetV0, in_channels=1, channels=[8, 16],
                           factors=[1, 2], items=[1, 1],
                           modulation_features=32)
    noise = jnp.zeros((1, 1, 256))
    model.initialize(noise)
    with pytest.raises(AssertionError, match="no key"):
        sample_length_sharded(model, noise, num_steps=2, mesh=mesh,
                              key=jax.random.key(0))


def test_zero1_optimizer_sharding():
    """ZeRO-1: adam moments shard over 'data' (1/N per chip), params stay
    replicated, and the math is identical to the unsharded step."""
    import optax
    from audio_diffusion_tpu import DiffusionModel, UNetV0
    from audio_diffusion_tpu.parallel import create_mesh, make_train_step, \
        shard_batch

    model = DiffusionModel(net_t=UNetV0, in_channels=2, channels=[8, 16],
                           factors=[1, 2], items=[1, 1],
                           modulation_features=32, seed=0)
    model.initialize(jnp.zeros((1, 2, 256)))
    mesh = create_mesh()  # 8-way data
    batch = np.random.default_rng(0).standard_normal(
        (8, 2, 256)).astype(np.float32)

    losses = {}
    moments = {}
    for z in (False, True):
        init_state, train_step = make_train_step(
            model.loss, optax.adam(1e-3), mesh=mesh, zero1=z)
        # Copy: train_step donates its state, and device_put aliases
        # already-placed trees — both rounds must start from live params.
        state = init_state(jax.tree.map(jnp.copy, model.params),
                           jax.random.key(1))
        if z:
            # Moment leaves are physically sharded: a [16]-wide bias moment
            # splits 8 ways (2 elements per shard).
            mu = state.opt_state[0].mu
            leaf = jax.tree_util.tree_leaves(mu)[0]
            assert len(leaf.sharding.device_set) == 8
            shard_elems = [s.data.size for s in leaf.addressable_shards]
            assert sum(shard_elems) == leaf.size  # partitioned, not copies
        for _ in range(2):
            state, m = train_step(state, shard_batch(jnp.asarray(batch),
                                                     mesh))
        losses[z] = float(m["loss"])
        moments[z] = np.asarray(
            jax.tree_util.tree_leaves(state.opt_state[0].mu)[0])
    assert losses[True] == pytest.approx(losses[False], rel=1e-5)
    np.testing.assert_allclose(moments[True], moments[False], rtol=1e-5,
                               atol=1e-7)


def test_steps_per_call_identity():
    """steps_per_call=K (one scanned device call over K stacked batches)
    must produce EXACTLY the params/metrics of K sequential single-step
    calls — the remote-dispatch amortizer changes scheduling, not math."""
    from audio_diffusion_tpu.parallel import make_train_step

    w0 = {"w": jnp.asarray([[1.5, -0.5], [0.25, 2.0]], jnp.float32)}
    batches = jax.random.normal(jax.random.key(0), (3, 4, 2))

    def loss_fn(params, key, batch):
        # Key-dependent: the scanned path must fold the SAME rng chain.
        noise = jax.random.normal(key, batch.shape) * 0.01
        pred = (batch + noise) @ params["w"]
        return jnp.mean(jnp.square(pred - 1.0))

    opt = optax.adam(1e-2)
    init_state, step1 = make_train_step(loss_fn, opt, donate=False)
    state = init_state(w0, jax.random.key(1))
    singles = []
    for i in range(3):
        state, m = step1(state, batches[i])
        singles.append(float(m["loss"]))

    init_state, stepK = make_train_step(loss_fn, opt, donate=False,
                                        steps_per_call=3)
    stateK = init_state(w0, jax.random.key(1))
    stateK, mK = stepK(stateK, batches)
    assert mK["loss"].shape == (3,)  # stacked per-step metrics
    np.testing.assert_allclose(np.asarray(mK["loss"]),
                               np.asarray(singles, np.float32), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stateK.params["w"]),
                               np.asarray(state.params["w"]), atol=1e-6)
    assert int(stateK.step) == 3


def test_steps_per_call_sharded():
    """K-step dispatch under a DP mesh: constraint applies per scanned
    batch; result equals the unsharded K-step run."""
    from audio_diffusion_tpu.parallel import make_train_step

    mesh8 = create_mesh()  # 8-way DP

    w0 = {"w": jnp.asarray([[1.0, 0.5], [-0.25, 2.0]], jnp.float32)}
    batches = jax.random.normal(jax.random.key(2), (2, 8, 2))

    def loss_fn(params, key, batch):
        return jnp.mean(jnp.square(batch @ params["w"] - 1.0))

    opt = optax.sgd(0.1)
    init_state, stepK = make_train_step(loss_fn, opt, donate=False,
                                        steps_per_call=2)
    ref_state = init_state(w0, jax.random.key(3))
    ref_state, _ = stepK(ref_state, batches)

    init_m, stepK_m = make_train_step(loss_fn, opt, donate=False,
                                      steps_per_call=2, mesh=mesh8)
    state_m = init_m(w0, jax.random.key(3))
    state_m, mm = stepK_m(state_m, batches)
    np.testing.assert_allclose(np.asarray(state_m.params["w"]),
                               np.asarray(ref_state.params["w"]),
                               atol=1e-6)
