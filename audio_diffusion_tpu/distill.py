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

__all__ = ["make_distill_loss", "ProgressiveDistiller"]


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

    def stage(self, batches, num_train_steps: int,
              log_fn: Callable[[str], None] = print,
              log_every: int = 100, **cond) -> Dict:
        """One halving: train a student at steps//2; returns last metrics."""
        assert self.steps % 2 == 0, (
            f"cannot halve an odd step count ({self.steps})")
        student_steps = self.steps // 2
        net = self.model.net
        teacher_params = self.model.params["net"]
        loss = make_distill_loss(net, teacher_params, student_steps,
                                 loss_fn=self._loss_fn)

        init_state, train_step = make_train_step(
            lambda p, k, x, **c: loss(p["net"], k, x, **c),
            self.optimizer, mesh=self.mesh)
        # The train step DONATES the state; seeding it with the live
        # model.params arrays would delete them (and the teacher closure
        # aliases them too) on step 1 — a mid-stage abort would brick the
        # model. Hand the student a fresh copy instead.
        student0 = jax.tree.map(lambda a: jnp.array(a, copy=True),
                                self.model.params)
        state = init_state(student0, self.model.next_key())
        metrics: Dict = {}
        it = iter(batches)
        for i in range(num_train_steps):
            state, metrics = train_step(state, next(it), **cond)
            if (i + 1) % log_every == 0 or i == num_train_steps - 1:
                log_fn(f"distill {self.steps}->{student_steps} "
                       f"step {i + 1}/{num_train_steps}: "
                       f"loss={float(metrics['loss']):.5f}")
        self.model.params = state.params
        self.steps = student_steps
        return metrics
