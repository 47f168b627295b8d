"""Training loop with checkpointing, metrics, and profiler hooks.

The reference ships NO trainer (users write loss.backward() loops,
reference README.md:37-39) and none of: tracing, checkpoint/resume, metrics
(SURVEY.md §5.1-5.5). This module provides those as first-class subsystems:

- orbax checkpoints of the full ``{params, opt_state, step, rng}`` pytree
  (periodic + resume-from-latest, the standard TPU preemption story)
- metrics dict per step (loss, grad_norm) with a host-side logger
- ``jax.profiler`` trace capture over a step window
- optional NaN debugging (``jax_debug_nans``) as the sanitizer story
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh

from ..parallel import make_train_step
from ..parallel.train_step import TrainState

__all__ = ["Trainer", "TrainerConfig"]


@dataclasses.dataclass
class TrainerConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    max_grad_norm: Optional[float] = None
    # LR schedule: "constant" (with optional linear warmup) or "cosine"
    # (warmup + cosine decay to 0 over total_steps — required for cosine).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: Optional[int] = None
    # EMA of params for sampling quality (None disables). The EMA tree is
    # checkpointed with the rest of the state; use `trainer.ema_params`.
    ema_decay: Optional[float] = None
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1000
    max_checkpoints: int = 3
    log_every: int = 50
    profile_dir: Optional[str] = None
    profile_start_step: int = 10
    profile_num_steps: int = 5
    debug_nans: bool = False
    # Gradient accumulation: each optimizer step scans accum_steps
    # microbatches (the batch's leading dim must be divisible by it).
    accum_steps: int = 1
    # Multi-step dispatch: each device call scans steps_per_call full
    # optimizer steps over that many stacked batches — one dispatch and
    # one host->device transfer per K steps. The remote-execution
    # amortizer (see make_train_step); identical math to K single calls.
    steps_per_call: int = 1


class Trainer:
    """Owns the optimizer, train state, checkpointing and logging.

    Usage::

        model = DiffusionModel(...)
        model.initialize(example_batch)
        trainer = Trainer(model, TrainerConfig(checkpoint_dir=...), mesh=mesh)
        trainer.fit(batch_iterator, num_steps=10_000)
    """

    def __init__(self, model, config: Optional[TrainerConfig] = None,
                 mesh: Optional[Mesh] = None,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 log_fn: Callable[[str], None] = print):
        self.model = model
        self.config = config or TrainerConfig()
        self.mesh = mesh
        self.log_fn = log_fn

        if optimizer is None:
            cfg = self.config
            assert cfg.lr_schedule in ("constant", "cosine"), (
                f"unknown lr_schedule {cfg.lr_schedule!r} (constant|cosine)")
            if cfg.lr_schedule == "cosine":
                assert cfg.total_steps, (
                    "lr_schedule='cosine' needs total_steps (the decay "
                    "horizon)")
                lr = optax.warmup_cosine_decay_schedule(
                    0.0, cfg.learning_rate, cfg.warmup_steps,
                    cfg.total_steps)
            elif cfg.warmup_steps:
                lr = optax.linear_schedule(0.0, cfg.learning_rate,
                                           cfg.warmup_steps)
            else:
                lr = cfg.learning_rate
            tx = []
            if cfg.max_grad_norm is not None:
                tx.append(optax.clip_by_global_norm(cfg.max_grad_norm))
            tx.append(optax.adamw(lr, weight_decay=cfg.weight_decay))
            optimizer = optax.chain(*tx)
        self.optimizer = optimizer

        self._init_state_fn, self.train_step = make_train_step(
            model.loss, optimizer, mesh=mesh,
            ema_decay=self.config.ema_decay,
            accum_steps=self.config.accum_steps,
            steps_per_call=self.config.steps_per_call)
        self._tail_step_cached = None  # single-step program for remainders
        self.state: Optional[TrainState] = None

        self._ckpt_mgr = None
        if self.config.checkpoint_dir is not None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                Path(self.config.checkpoint_dir).absolute(),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.config.max_checkpoints,
                    create=True,
                ),
            )

    # ------------------------------------------------------------ lifecycle
    def init_state(self, key: Optional[jax.Array] = None) -> TrainState:
        assert self.model.params is not None, (
            "initialize the model first (model.initialize(example))")
        key = key if key is not None else self.model.next_key()
        self.state = self._init_state_fn(self.model.params, key)
        return self.state

    # ---------------------------------------------------------- checkpoints
    def save_checkpoint(self, step: Optional[int] = None,
                        wait: bool = False):
        """Checkpoint the train state.

        Saves are ASYNC (orbax copies device arrays to host synchronously,
        then writes to disk in a background thread), so training overlaps
        the disk write; `fit` waits once on exit. Pass wait=True to block
        until this save is durable (e.g. right before preemption).
        """
        assert self._ckpt_mgr is not None, "no checkpoint_dir configured"
        assert self.state is not None
        import orbax.checkpoint as ocp

        step = step if step is not None else int(self.state.step)
        self._ckpt_mgr.save(
            step, args=ocp.args.PyTreeSave(self._state_as_pytree()))
        if wait:
            self._ckpt_mgr.wait_until_finished()

    def restore_latest(self) -> Optional[int]:
        """Restore the newest checkpoint; returns its step or None."""
        assert self._ckpt_mgr is not None, "no checkpoint_dir configured"
        self._ckpt_mgr.wait_until_finished()  # flush any in-flight save
        latest = self._ckpt_mgr.latest_step()
        if latest is None:
            return None
        import orbax.checkpoint as ocp

        if self.state is None:
            self.init_state()
        # Carry each leaf's sharding into the restore so a sharded (mesh)
        # state comes back with the layout init_state established, instead
        # of whatever placement orbax defaults to on this topology.
        template = self._state_as_pytree()
        restore_args = jax.tree.map(
            lambda x: ocp.ArrayRestoreArgs(sharding=x.sharding)
            if isinstance(x, jax.Array) else ocp.RestoreArgs(), template)
        restored = self._ckpt_mgr.restore(
            latest,
            args=ocp.args.PyTreeRestore(template,
                                        restore_args=restore_args))
        self.state = TrainState(**restored)
        self.model.params = self.state.params
        return latest

    def _state_as_pytree(self) -> Dict[str, Any]:
        return dict(self.state._asdict())

    @property
    def ema_params(self):
        """EMA parameter tree (falls back to live params if EMA disabled)."""
        assert self.state is not None
        return self.state.ema if self.state.ema is not None else (
            self.state.params)

    # ----------------------------------------------------------------- fit
    def _tail_step(self, state, batch, **cond):
        """Single-step program for the num_steps % steps_per_call tail."""
        if self._tail_step_cached is None:
            _, self._tail_step_cached = make_train_step(
                self.model.loss, self.optimizer, mesh=self.mesh,
                ema_decay=self.config.ema_decay,
                accum_steps=self.config.accum_steps)
        return self._tail_step_cached(state, batch, **cond)

    def fit(self, batches: Iterable, num_steps: int, **cond) -> Dict:
        """Run `num_steps` steps over `batches`; returns the last metrics."""
        prev_debug_nans = jax.config.jax_debug_nans
        if self.config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if self.state is None:
            self.init_state()

        cfg = self.config
        metrics: Dict = {}
        t_last = time.perf_counter()
        it = iter(batches)
        # Host-side step counter: reading the device-resident state.step
        # would force a sync every iteration and defeat async dispatch.
        step = int(self.state.step)
        step_last_log = step
        profiling = False
        k = max(cfg.steps_per_call, 1)
        # Multi-step dispatch: ceil-chunked — a final partial chunk runs
        # as single steps (its own compiled program) so any num_steps
        # works; see make_train_step(steps_per_call=...).
        num_calls = num_steps // k
        tail = num_steps - num_calls * k
        try:
            for i in range(num_calls + tail):
                kk = k if i < num_calls else 1
                if kk == 1 and k > 1:
                    batch = next(it)
                elif k > 1:
                    items = [next(it) for _ in range(kk)]
                    if isinstance(items[0], tuple):
                        raise ValueError(
                            "per-batch conditioning ((x, cond) batches) "
                            "requires steps_per_call=1 — the K-step scan "
                            "passes one cond to every scanned step")
                    if isinstance(items[0], jax.Array):
                        # Device-resident batches (data.DeviceCorpus):
                        # stack ON DEVICE — np.stack would download and
                        # re-upload K batches per call.
                        import jax.numpy as jnp

                        batch = jnp.stack(items)
                    else:
                        batch = np.stack(items)
                else:
                    batch = next(it)

                # Per-batch conditioning: iterators may yield
                # (x, {"embedding": ...}) tuples — e.g. a paired-embedding
                # text-conditional corpus; merged over the fixed **cond.
                step_cond = cond
                if isinstance(batch, tuple):
                    batch, batch_cond = batch
                    step_cond = {**cond, **batch_cond}

                if (cfg.profile_dir is not None
                        and step == cfg.profile_start_step):
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                if kk == 1 and k > 1:
                    self.state, metrics = self._tail_step(
                        self.state, batch, **step_cond)
                else:
                    self.state, metrics = self.train_step(
                        self.state, batch, **step_cond)
                if kk > 1:
                    # Stacked [K] metrics: keep the last step's values
                    # (device-lazy; only fetched at log time).
                    metrics = jax.tree_util.tree_map(
                        lambda m: m[-1], metrics)
                step += kk
                if (profiling and step >= cfg.profile_start_step
                        + cfg.profile_num_steps):
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    profiling = False

                crossed_log = (step % cfg.log_every < kk
                               or i == num_calls + tail - 1)
                if crossed_log:
                    loss = float(metrics["loss"])
                    gnorm = float(metrics["grad_norm"])
                    now = time.perf_counter()
                    sps = (step - step_last_log) / max(now - t_last, 1e-9)
                    t_last, step_last_log = now, step
                    self.log_fn(
                        f"step {step}: loss={loss:.4f} "
                        f"grad_norm={gnorm:.3f} steps/s={sps:.2f}")

                if (self._ckpt_mgr is not None
                        and step % cfg.checkpoint_every < kk):
                    self.save_checkpoint(step)
        finally:
            if self.config.debug_nans:  # don't leak the mode past fit()
                jax.config.update("jax_debug_nans", prev_debug_nans)
            if profiling:  # fit ended inside the profile window
                jax.profiler.stop_trace()
            if self._ckpt_mgr is not None:  # make async saves durable
                self._ckpt_mgr.wait_until_finished()

        self.model.params = self.state.params
        return metrics
