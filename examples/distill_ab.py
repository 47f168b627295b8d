"""Post-hoc A/B + latency harness for a distilled flagship.

Run AFTER `python -m audio_diffusion_tpu distill --model RUN/model ...`
produced RUN/model_distilled<N>. Loads teacher and student, measures:

- RMS distance of few-step samples (teacher and student) to the teacher's
  converged 256-step trajectory at fixed noise — the distillation
  fidelity metric of PERFORMANCE.md §8c;
- steady-state batch-1 serving latency of the student at its target step
  count vs the teacher at 50 steps (on-device repetition, tunnel RTT
  excluded per PERFORMANCE.md measurement rules);
- writes one student WAV next to the run for listening.

The reference has no distillation (README stops at many-step sampling,
reference README.md:42-44); this closes the serving-latency claim of
PERFORMANCE.md §8c' at flagship scale.

    python examples/distill_ab.py                   # runs/flagship_r3, N=8
    AB_RUN=runs/my_run AB_TARGET=8 python examples/distill_ab.py
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audio_diffusion_tpu import DiffusionModel, UNetV0, presets
from audio_diffusion_tpu.data import wav_write

RUN = os.environ.get("AB_RUN", "runs/flagship_r3")
TARGET = int(os.environ.get("AB_TARGET", 8))
CROP = int(os.environ.get("AB_CROP", 2**18))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))


def main():
    model = DiffusionModel(net_t=UNetV0, dtype=jnp.bfloat16,
                           **presets.UNCONDITIONAL_48K)
    model.initialize(jnp.zeros((1, 2, CROP)))
    model.load(f"{RUN}/model")
    teacher = model.params
    model.load(f"{RUN}/model_distilled{TARGET}")
    student = model.params
    print(f"loaded teacher + distilled{TARGET} student from {RUN}",
          flush=True)

    noise = jax.random.normal(jax.random.key(42), (1, 2, CROP),
                              jnp.float32)
    ref = np.asarray(model.sample(noise, num_steps=256, params=teacher),
                     np.float32)

    def dist(params, n_steps):
        out = np.asarray(
            model.sample(noise, num_steps=n_steps, params=params),
            np.float32)
        return float(np.sqrt(np.mean((out - ref) ** 2)))

    base = {n: dist(teacher, n) for n in (TARGET, 2 * TARGET, 4 * TARGET)}
    print("teacher RMS to its 256-step:",
          {k: round(v, 4) for k, v in base.items()}, flush=True)
    after = {n: dist(student, n)
             for n in (max(TARGET // 2, 2), TARGET, 2 * TARGET)}
    print("student RMS to teacher 256-step:",
          {k: round(v, 4) for k, v in after.items()}, flush=True)

    def timed_sample(params, steps):
        # Slope measurement (bench.py rules): t(12 reps) - t(2 reps), the
        # tunnel RTT cancels in the difference.
        def many_fn(n_reps):
            noises = jax.random.normal(jax.random.key(0),
                                       (n_reps, 1, 2, CROP), jnp.float32)

            @jax.jit
            def many(p, ns):
                return jnp.sum(jax.lax.map(
                    lambda n: model.sample_fn(p, n, num_steps=steps,
                                              unroll=min(5, steps)), ns))

            return many, noises

        small, noises_small = many_fn(2)
        big, noises_big = many_fn(12)
        _ = float(small(params, noises_small))  # compile + warmup
        _ = float(big(params, noises_big))
        diffs = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(big(params, noises_big))
            t_big = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(small(params, noises_small))
            diffs.append(max(t_big - (time.perf_counter() - t0), 1e-6))
        return sorted(diffs)[1] / 10

    lat_student = timed_sample(student, TARGET)
    lat_teacher = timed_sample(teacher, 50)
    print(f"latency: student {TARGET}-step {lat_student*1000:.1f} ms, "
          f"teacher 50-step {lat_teacher*1000:.1f} ms "
          f"({lat_teacher/lat_student:.1f}x)", flush=True)

    wav_write(f"{RUN}/distilled_sample_{TARGET}step.wav",
              np.asarray(model.sample(noise, num_steps=TARGET,
                                      params=student))[0], 48000)
    print(json.dumps({
        "teacher_rms": base, "student_rms": after,
        "latency_student_ms": round(lat_student * 1000, 1),
        "latency_teacher50_ms": round(lat_teacher * 1000, 1),
    }), flush=True)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
