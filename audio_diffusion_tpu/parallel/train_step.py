"""Sharded training step: grad + optax update as ONE jitted computation.

The whole reference train loop is user-owned Python calling loss.backward()
(reference README.md:37-39); here the step is a single donated-buffer XLA
program. Under a ('data','model') mesh the batch is sharded on 'data' and the
gradient allreduce (psum over 'data') is inserted by XLA's SPMD partitioner —
bucketed/overlapped by the compiler over ICI (BASELINE.json north star).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.net import contains_array
from ..utils import dequant_pcm16, split_static_kwargs
from .mesh import param_sharding_rules

__all__ = ["TrainState", "make_train_step"]


class TrainState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any
    rng: Array
    # Exponential moving average of params (standard for diffusion-model
    # sampling quality); None when disabled.
    ema: Any = None


def make_train_step(
    loss_fn: Callable[..., Array],
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    ema_decay: Optional[float] = None,
    accum_steps: int = 1,
    zero1: bool = False,
    steps_per_call: int = 1,
) -> Tuple[Callable, Callable]:
    """Build (init_state, train_step).

    loss_fn(params, key, batch, **cond) -> scalar loss — e.g.
    ``DiffusionModel.loss``.

    accum_steps > 1 enables gradient accumulation: the batch's LEADING axis
    is split into `accum_steps` microbatches scanned sequentially (grads
    averaged, one optimizer step) — the effective batch exceeds what fits
    in HBM at once, at unchanged math (identity-tested). Batch-leading
    conditioning arrays are split alongside the batch; each microbatch gets
    its own fold of the step RNG key (matching how the same samples in
    separate batches would draw σ/noise).

    zero1=True shards the OPTIMIZER momenta over the 'data' axis
    (ZeRO-1 / optimizer-state sharding): params stay replicated (no change
    to forward/backward), but each data shard stores and updates only its
    1/data_size slice of the adam moments — on an N-chip DP mesh this cuts
    per-chip optimizer memory from 2× params to 2/N× params, freeing HBM
    for larger per-chip batches. No-op on meshes with data=1.

    steps_per_call > 1 runs K full optimizer steps per device call: the
    batch argument becomes K STACKED batches [K, batch, ...] and one
    `lax.scan` performs all K steps on-device — one dispatch and one
    host->device transfer per K steps instead of per step. This is the
    remote-execution amortizer (a ~30 ms-RTT tunnel otherwise taxes every
    step, PERFORMANCE.md); on a local host it only trims dispatch
    overhead. Math is identical to K sequential calls (identity-tested).
    Conditioning arrays are loop-invariant (shared by all K steps);
    metrics come back stacked [K] per leaf so no loss-curve granularity
    is lost.

    Returns:
      init_state(params, rng) -> TrainState (sharded if mesh given)
      train_step(state, batch, **cond) -> (state, metrics) — jitted, donated.
    """
    data_size = mesh.shape["data"] if mesh is not None else 1
    # zero1 composes with pure DP; with a model axis the moments should
    # follow the TP param sharding instead (already handled below).
    use_zero1 = (zero1 and data_size > 1
                 and (mesh is None or mesh.shape.get("model", 1) == 1))

    def _zero1_spec(x) -> P:
        """Shard a moment leaf over 'data' on its first divisible axis."""
        shape = getattr(x, "shape", ())
        for ax, n in enumerate(shape):
            if n % data_size == 0 and n >= data_size:
                return P(*([None] * ax), "data")
        return P()

    def _put(x, sharding: NamedSharding):
        """device_put, multi-process-safe: when the mesh spans processes
        (two-process CPU simulation, multi-host pods), device_put cannot
        target non-addressable devices — each process contributes its local
        view instead. Replicated specs require identical values on every
        process (true here: params/rng come from the same seed)."""
        if sharding.is_fully_addressable:
            return jax.device_put(x, sharding)
        import numpy as np

        if jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            # Typed PRNG keys can't round-trip numpy; place the raw key
            # data and rewrap (key impl is static, shared by construction).
            impl = jax.random.key_impl(x)
            data = jax.make_array_from_process_local_data(
                sharding, np.asarray(jax.random.key_data(x)))
            return jax.random.wrap_key_data(data, impl=impl)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    def init_state(params, rng: Array) -> TrainState:
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            rng=rng,
            ema=jax.tree_util.tree_map(jnp.copy, params)
            if ema_decay is not None else None,
        )
        if mesh is not None:
            pspecs = param_sharding_rules(params, mesh)
            params_sharded = jax.tree_util.tree_map(
                lambda x, s: _put(x, NamedSharding(mesh, s)),
                state.params, pspecs)
            # Optimizer state: momenta share the param sharding (same
            # shapes); scalars/counters replicate.
            param_leaves = jax.tree_util.tree_leaves(state.params)
            spec_by_shape = {}
            for p, s in zip(param_leaves, jax.tree_util.tree_leaves(pspecs)):
                spec_by_shape.setdefault(p.shape, s)

            def put_opt(x):
                spec = spec_by_shape.get(getattr(x, "shape", None), P())
                if use_zero1 and spec == P():
                    spec = _zero1_spec(x)
                return _put(x, NamedSharding(mesh, spec))

            opt_sharded = jax.tree_util.tree_map(put_opt, state.opt_state)
            ema_sharded = None
            if state.ema is not None:
                ema_sharded = jax.tree_util.tree_map(
                    lambda x, s: _put(x, NamedSharding(mesh, s)),
                    state.ema, pspecs)
            state = TrainState(
                step=_put(state.step, NamedSharding(mesh, P())),
                params=params_sharded,
                opt_state=opt_sharded,
                rng=_put(state.rng, NamedSharding(mesh, P())),
                ema=ema_sharded,
            )
        return state

    def grad_fn(params, key, batch, **cond):
        """(loss, grads), microbatched when accum_steps > 1."""
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn)(params, key, batch, **cond)

        def split_mb(t):
            b = t.shape[0]
            assert b % accum_steps == 0, (
                f"batch {b} not divisible by accum_steps={accum_steps}")
            return t.reshape((accum_steps, b // accum_steps) + t.shape[1:])

        mb_batch = jax.tree_util.tree_map(split_mb, batch)
        mb_cond = {k: jax.tree_util.tree_map(split_mb, v)
                   if contains_array(v) else v for k, v in cond.items()}
        mb_static = {k: v for k, v in mb_cond.items()
                     if not contains_array(v)}
        mb_arrays = {k: v for k, v in mb_cond.items() if k not in mb_static}

        def micro(acc, scan_in):
            i, mb, arrs = scan_in
            l, g = jax.value_and_grad(loss_fn)(
                params, jax.random.fold_in(key, i), mb,
                **arrs, **mb_static)
            loss_acc, grads_acc = acc
            return (loss_acc + l,
                    jax.tree_util.tree_map(jnp.add, grads_acc, g)), None

        zero = (jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), params))
        (loss_sum, grads_sum), _ = jax.lax.scan(
            micro, zero, (jnp.arange(accum_steps), mb_batch, mb_arrays))
        inv = 1.0 / accum_steps
        return loss_sum * inv, jax.tree_util.tree_map(
            lambda g: g * inv, grads_sum)

    def step_fn(state: TrainState, batch, **cond):
        # int16 batches (AudioDataset dtype="int16"/"auto" on PCM16 corpora)
        # upload 4x smaller; the in-graph x/32768 dequant reproduces the
        # float32 decode bit-exactly (both factors are powers of two).
        batch = jax.tree_util.tree_map(dequant_pcm16, batch)
        rng, key = jax.random.split(state.rng)
        loss, grads = grad_fn(state.params, key, batch, **cond)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        if use_zero1:
            # Keep the moments data-sharded through the step: the adam
            # elementwise update then runs on each chip's 1/N slice only
            # (ZeRO-1), with XLA slicing the (already-allreduced) grads.
            opt_state = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, _zero1_spec(x))), opt_state)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema_decay is not None and ema is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype)
                * (1.0 - ema_decay), ema, params)
        grad_norm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "step": state.step + 1}
        return TrainState(state.step + 1, params, opt_state, rng,
                          ema), metrics

    if mesh is not None:
        # State shardings are inferred from input placement (init_state);
        # constrain the batch and all conditioning arrays (all batch-leading)
        # to the data axis so XLA partitions the forward/backward over it.
        def constrain(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

        def inner_step(state: TrainState, batch, **cond_all):
            batch = jax.tree_util.tree_map(constrain, batch)
            arrays = {k: v for k, v in cond_all.items()
                      if contains_array(v)}
            arrays = jax.tree_util.tree_map(constrain, arrays)
            cond_all = {**cond_all, **arrays}
            return step_fn(state, batch, **cond_all)
    else:
        inner_step = step_fn

    if steps_per_call > 1:
        single_step = inner_step

        def inner_step(state: TrainState, batches, **cond_all):  # noqa: F811
            # batches: K stacked batches on the leading axis; one scan
            # runs all K optimizer steps on-device. Conditioning is
            # loop-invariant (closure), matching K sequential calls with
            # the same cond.
            def body(s, b):
                return single_step(s, b, **cond_all)

            return jax.lax.scan(body, state, batches)

    # Conditioning kwargs split traced-vs-static per call: scalars like
    # embedding_mask_proba select program structure and must be static,
    # arrays (embedding, channels, ...) are traced. One compiled program
    # per static configuration.
    jit_cache = {}

    def train_step(state: TrainState, batch, **cond):
        dyn, static = split_static_kwargs(cond)
        if static not in jit_cache:
            def run(state, batch, dyn, _static=static):
                merged = dict(dyn)
                merged.update({k: s.value for k, s in _static})
                return inner_step(state, batch, **merged)

            jit_cache[static] = jax.jit(
                run, donate_argnums=(0,) if donate else ())
        return jit_cache[static](state, batch, dyn)

    return init_state, train_step
