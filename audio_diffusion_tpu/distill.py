"""Progressive distillation for v-diffusion (Salimans & Ho 2022).

The reference trains with the v-objective citing "Progressive Distillation
for Fast Sampling of Diffusion Models" (reference README.md:233-241) but
never implements the distillation procedure that paper is about. This
module does, TPU-native: each stage halves the number of sampling steps by
training a student to reproduce, in ONE deterministic v-step, what the
frozen teacher produces in TWO — so an N-step sampler becomes N/2, then
N/4, ... Production latency then scales down with the distilled step count
(serving: `GenerationService(model, num_steps=4)`).

Math (angular DDIM, same trig schedule as VSampler):
teacher runs two DDIM steps x_t -> z_mid -> z_end along sigma_t ->
sigma_t - 1/N -> sigma_t - 2/N. The student's one-step target is the
(x0, eps) pair consistent with both endpoints::

    x_t   = a_t * x0 + b_t * eps
    z_end = a_e * x0 + b_e * eps
    =>  x0  = (b_t * z_end - b_e * x_t) / sin(theta_t - theta_e)
        eps = (x_t - a_t * x0) / b_t
        v_target = a_t * eps - b_t * x0

(the denominator a_e*b_t - a_t*b_e reduces to sin(theta_t - theta_e) > 0).
Loss = loss_fn(student_v(x_t, sigma_t), v_target) — plain v-space MSE, the
"SNR+1" weighting the v-objective implies.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax.sharding import Mesh

from .diffusion.core import alpha_beta, pad_dims
from .parallel import make_train_step
from .utils import dequant_pcm16, split_static_kwargs

__all__ = ["make_distill_loss", "make_teacher_targets",
           "make_guidance_targets", "ProgressiveDistiller"]


def _two_step_target(net, teacher_params: Dict, x_t: Array, sig_t: Array,
                     num_student_steps: int, **cond):
    """Teacher double-DDIM-step endpoint and the implied (x0, eps, v)."""
    half = 1.0 / (2 * num_student_steps)  # one teacher step, in sigma

    def ddim(z, s_from, s_to):
        v = net.apply(teacher_params, z, s_from, **cond)
        a0, b0 = alpha_beta(pad_dims(s_from, z.ndim - 1))
        a1, b1 = alpha_beta(pad_dims(s_to, z.ndim - 1))
        x0 = a0 * z - b0 * v
        e0 = b0 * z + a0 * v
        return a1 * x0 + b1 * e0

    z_mid = ddim(x_t, sig_t, sig_t - half)
    z_end = ddim(z_mid, sig_t - half, sig_t - 2 * half)
    z_end = jax.lax.stop_gradient(z_end)

    a_t, b_t = alpha_beta(pad_dims(sig_t, x_t.ndim - 1))
    a_e, b_e = alpha_beta(pad_dims(sig_t - 2 * half, x_t.ndim - 1))
    denom = a_e * b_t - a_t * b_e  # = sin(theta_t - theta_e) > 0
    x0 = (b_t * z_end - b_e * x_t) / denom
    eps = (x_t - a_t * x0) / b_t   # b_t >= sin(pi/(2N)) > 0 (t >= 1)
    return a_t * eps - b_t * x0


def make_teacher_targets(net, num_student_steps: int,
                         mesh: Optional[Mesh] = None):
    """Jitted teacher-target program: ``targets(teacher_params, key, x,
    **cond) -> (x_t, sig_t, v_target)``.

    This is the inference half of the distillation objective, compiled
    SEPARATELY from the student's train step. The fused alternative (one
    program containing two teacher forwards + the student forward +
    backward + adam) is ~4 flagship U-Net bodies in a single XLA program
    — measured to crash the remote compile service at flagship scale
    (rounds 3-4), while each half here is no larger than programs that
    compile routinely (2-step sampling; the ordinary train step). The
    split also lets XLA treat the teacher pass as pure inference (no
    saved residuals), and the targets stream device-to-device into the
    student step with no host round-trip.

    Draws the same (t, eps) randomness from ``key`` as
    :func:`make_distill_loss` does, so for identical keys the split
    pipeline's loss equals the fused loss (regression-tested).
    """

    def targets(teacher_params: Dict, key: Array, x: Array, **cond):
        x = dequant_pcm16(x)  # int16 device-corpus batches decode in-graph
        b = x.shape[0]
        k_t, k_eps = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 1, num_student_steps + 1)
        sig_t = t.astype(jnp.float32) / num_student_steps
        a_t, b_t = alpha_beta(pad_dims(sig_t, x.ndim - 1))
        eps = jax.random.normal(k_eps, x.shape, x.dtype)
        x_t = a_t * x + b_t * eps
        v_target = _two_step_target(net, teacher_params, x_t, sig_t,
                                    num_student_steps, **cond)
        return x_t, sig_t, v_target

    return _jit_targets_program(targets, mesh)


def make_guidance_targets(net, embedding_scale: float,
                          mesh: Optional[Mesh] = None):
    """Jitted teacher-target program for GUIDANCE distillation:
    ``targets(teacher_params, key, x, embedding=..., **cond) ->
    (x_t, sig_t, v_target)`` where ``v_target`` is the teacher's
    classifier-free-guided v at ``embedding_scale`` (the batch-doubled
    two-pass of ops/unet.py's CFG wrapper).

    A student trained on these targets answers in ONE conditional pass
    what the teacher needs two for ("On Distillation of Guided Diffusion
    Models", Meng et al., CVPR 2023 — the w-fixed variant: one student per
    guidance scale). Serving cost per step halves; stacks with progressive
    step distillation (run ``guidance_stage`` first, then ``stage``s with
    the embedding passed as conditioning).

    σ is drawn continuously (U(0,1), like VDiffusion training): guidance
    distillation changes WHAT the net predicts, not the step grid.
    """

    def targets(teacher_params: Dict, key: Array, x: Array, *,
                embedding: Array, **cond):
        x = dequant_pcm16(x)
        b = x.shape[0]
        k_t, k_eps = jax.random.split(key)
        sig_t = jax.random.uniform(k_t, (b,), jnp.float32)
        a_t, b_t = alpha_beta(pad_dims(sig_t, x.ndim - 1))
        eps = jax.random.normal(k_eps, x.shape, x.dtype)
        x_t = a_t * x + b_t * eps
        v_target = net.apply(teacher_params, x_t, sig_t,
                             embedding=embedding,
                             embedding_scale=embedding_scale, **cond)
        return x_t, sig_t, jax.lax.stop_gradient(v_target)

    return _jit_targets_program(targets, mesh)


def _jit_targets_program(targets, mesh: Optional[Mesh]):
    """Shared plumbing for teacher-target programs: optional data-axis
    sharding constraints + the traced-vs-static conditioning contract of
    make_train_step (scalar kwargs select program structure, arrays are
    traced)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .ops.net import contains_array

        def constrain(a):
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1)))))

        inner = targets

        def targets(teacher_params, key, x, **cond):  # noqa: F811
            arrays = {k: jax.tree_util.tree_map(constrain, v)
                      for k, v in cond.items() if contains_array(v)}
            return inner(teacher_params, key, constrain(x),
                         **{**cond, **arrays})

    jit_cache = {}

    def call(teacher_params, key, x, **cond):
        dyn, static = split_static_kwargs(cond)
        if static not in jit_cache:
            def run(tp, key, x, dyn, _static=static):
                merged = dict(dyn)
                merged.update({k: s.value for k, s in _static})
                return targets(tp, key, x, **merged)

            jit_cache[static] = jax.jit(run)
        return jit_cache[static](teacher_params, key, x, dyn)

    return call


def make_distill_loss(net, teacher_params: Dict, num_student_steps: int,
                      loss_fn: Optional[Callable] = None):
    """Pure distillation loss with the standard train-step signature:
    ``loss(params, key, x, **cond)`` — drop it into :func:`make_train_step`.

    The frozen teacher tree is captured by closure (NOT passed through the
    conditioning kwargs: the sharded train step constrains cond arrays
    batch-leading over the data axis, which would mis-shard parameters).
    """
    if loss_fn is None:
        loss_fn = lambda a, b: jnp.mean(jnp.square(a - b))  # noqa: E731
    teacher = teacher_params

    def loss(params: Dict, key: Array, x: Array, **cond) -> Array:
        b = x.shape[0]
        k_t, k_eps = jax.random.split(key)
        # Student's discrete grid: t ~ U{1..N}, sigma = t/N in (0, 1].
        t = jax.random.randint(k_t, (b,), 1, num_student_steps + 1)
        sig_t = t.astype(jnp.float32) / num_student_steps
        a_t, b_t = alpha_beta(pad_dims(sig_t, x.ndim - 1))
        eps = jax.random.normal(k_eps, x.shape, x.dtype)
        x_t = a_t * x + b_t * eps
        v_target = _two_step_target(net, teacher, x_t, sig_t,
                                    num_student_steps, **cond)
        v_pred = net.apply(params, x_t, sig_t, **cond)
        return loss_fn(v_pred, v_target)

    return loss


class ProgressiveDistiller:
    """Halve a trained model's sampling steps, stage by stage.

    Usage::

        distiller = ProgressiveDistiller(model, base_steps=64)
        distiller.stage(batches, num_train_steps=10_000)   # 64 -> 32
        distiller.stage(batches, num_train_steps=10_000)   # 32 -> 16
        model.sample(noise, num_steps=distiller.steps)

    Each stage freezes the current params as the teacher, re-initializes
    the optimizer, and trains the student (warm-started from the teacher)
    on the two-step-matching objective. ``model.params`` is updated in
    place after every stage. Works over a mesh like ordinary training.
    """

    def __init__(self, model, base_steps: int,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 learning_rate: float = 1e-4,
                 mesh: Optional[Mesh] = None,
                 loss_fn: Optional[Callable] = None):
        assert base_steps >= 2 and base_steps % 2 == 0, (
            "base_steps must be an even number of sampler steps")
        assert model.params is not None, (
            "train (or at least initialize) the model before distilling")
        self.model = model
        self.steps = base_steps
        self.mesh = mesh
        self.optimizer = optimizer or optax.adam(learning_rate)
        self._loss_fn = loss_fn

    def _placed_teacher(self):
        """The frozen teacher tree, mesh-placed when training is sharded."""
        teacher_params = self.model.params["net"]
        if self.mesh is not None:
            # The teacher tree is an explicit argument of the target
            # program (not state owned by init_state), so it must carry
            # mesh-wide placement itself: follow the same sharding rules
            # as trainable params (replicated on DP, sharded on TP).
            from jax.sharding import NamedSharding

            from .parallel.mesh import param_sharding_rules

            pspecs = param_sharding_rules(teacher_params, self.mesh)
            teacher_params = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(self.mesh, s)),
                teacher_params, pspecs)
        return teacher_params

    def _run_stage(self, target_fn, batches, num_train_steps: int,
                   log_fn: Callable[[str], None], log_every: int,
                   tag: str, **cond) -> Dict:
        """Train a student against a teacher-target program.

        Two separately-compiled programs (see make_teacher_targets for why
        the fused single-program form is not viable at flagship scale):
        teacher targets stream device-to-device into a student step that is
        exactly the ordinary v-training step shape. ``batches`` may yield
        plain arrays or ``(x, {"embedding": ...})`` tuples (the paired-
        embedding corpus convention of Trainer.fit)."""
        net = self.model.net
        teacher_params = self._placed_teacher()
        target_fn = target_fn  # already jitted/mesh-aware
        loss_fn = self._loss_fn or (
            lambda a, b: jnp.mean(jnp.square(a - b)))

        def student_loss(params, key, x_t, sigmas=None, v_target=None,
                         **cond):
            del key  # randomness was consumed by the target program
            v_pred = net.apply(params["net"], x_t, sigmas, **cond)
            return loss_fn(v_pred, v_target)

        init_state, train_step = make_train_step(
            student_loss, self.optimizer, mesh=self.mesh)
        # The train step DONATES the state; seeding it with the live
        # model.params arrays would delete them (the teacher tree reuses
        # the same buffers) on step 1 — a mid-stage abort would brick the
        # model. Hand the student a fresh copy instead.
        student0 = jax.tree.map(lambda a: jnp.array(a, copy=True),
                                self.model.params)
        state = init_state(student0, self.model.next_key())
        tkey = self.model.next_key()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            tkey = jax.device_put(
                tkey, NamedSharding(self.mesh, PartitionSpec()))
        metrics: Dict = {}
        it = iter(batches)
        for i in range(num_train_steps):
            batch = next(it)
            step_cond = cond
            if isinstance(batch, tuple):
                batch, batch_cond = batch
                step_cond = {**cond, **batch_cond}
            x_t, sig_t, v_tgt = target_fn(
                teacher_params, jax.random.fold_in(tkey, i), batch,
                **step_cond)
            state, metrics = train_step(state, x_t, sigmas=sig_t,
                                        v_target=v_tgt, **step_cond)
            if (i + 1) % log_every == 0 or i == num_train_steps - 1:
                log_fn(f"distill {tag} step {i + 1}/{num_train_steps}: "
                       f"loss={float(metrics['loss']):.5f}")
        self.model.params = state.params
        return metrics

    def stage(self, batches, num_train_steps: int,
              log_fn: Callable[[str], None] = print,
              log_every: int = 100, **cond) -> Dict:
        """One halving: train a student at steps//2; returns last metrics."""
        assert self.steps % 2 == 0, (
            f"cannot halve an odd step count ({self.steps})")
        student_steps = self.steps // 2
        target_fn = make_teacher_targets(self.model.net, student_steps,
                                         mesh=self.mesh)
        metrics = self._run_stage(
            target_fn, batches, num_train_steps, log_fn, log_every,
            tag=f"{self.steps}->{student_steps}", **cond)
        self.steps = student_steps
        return metrics

    def guidance_stage(self, batches, embedding_scale: float,
                       num_train_steps: int,
                       log_fn: Callable[[str], None] = print,
                       log_every: int = 100, **cond) -> Dict:
        """Distill classifier-free guidance into a single conditional pass.

        The teacher answers with its CFG-guided v at ``embedding_scale``
        (two batch-doubled net evaluations per step, ops/unet.py CFG
        wrapper); the student learns to produce that SAME v in one
        conditional evaluation — after this stage, sample WITHOUT
        ``embedding_scale`` (i.e. scale 1) and get guided-quality output at
        half the per-step cost (Meng et al., CVPR 2023, w-fixed variant).

        Step count is unchanged (run this BEFORE the halving ``stage``s;
        pass the same ``embedding`` conditioning to those — the teacher
        two-step targets then match the guided-distilled student's own
        conditional predictions).

        ``batches`` must carry the conditioning: either yield
        ``(x, {"embedding": ...})`` tuples or pass a fixed ``embedding=``
        kwarg. Guidance scale is baked into the student (one student per
        scale — the reference's runtime-scale flexibility trades off
        against the 2× serving win; keep the undistilled teacher for
        scale sweeps).
        """
        target_fn = make_guidance_targets(self.model.net, embedding_scale,
                                          mesh=self.mesh)
        return self._run_stage(
            target_fn, batches, num_train_steps, log_fn, log_every,
            tag=f"guidance(w={embedding_scale:g})", **cond)
