"""Progressively distill a trained flagship 64->32->16->8 steps, then
measure the serving-latency win.

Progressive distillation (Salimans & Ho 2022) halves the sampling step
count per stage by training a student to match two teacher DDIM steps in
one; three stages take the 64-step flagship to 8 steps. The reference has
no distillation (its README stops at many-step sampling,
reference README.md:42-44); on TPU this is the main batch-1 serving lever
because the 50-step scan is compute-bound, not bytes-bound
(PERFORMANCE.md round-3 int8 experiment).

Run AFTER a CLI training run produced RUN/model::

    python examples/distill_flagship.py            # runs/flagship_r3
    DISTILL_RUN=runs/my_run DISTILL_STAGE_STEPS=600 \
        python examples/distill_flagship.py

Env knobs: DISTILL_RUN, DISTILL_CROP (default 2^18; drop to 2^17 if the
distill-backward program overwhelms a remote compile service),
DISTILL_BATCH (4), DISTILL_STAGE_STEPS (600), DISTILL_DATA (corpus/).
Distillation data rides :class:`DeviceCorpus` — zero per-step uploads
(see data/device.py for why that matters on tunnel-attached TPUs).
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audio_diffusion_tpu import (DiffusionModel, ProgressiveDistiller,
                                 UNetV0, presets)
from audio_diffusion_tpu.data import DeviceCorpus, wav_write

RUN = os.environ.get("DISTILL_RUN", "runs/flagship_r3")
DATA = os.environ.get("DISTILL_DATA", "corpus/")
CROP = int(os.environ.get("DISTILL_CROP", 2**18))
BATCH = int(os.environ.get("DISTILL_BATCH", 4))
STAGE_STEPS = int(os.environ.get("DISTILL_STAGE_STEPS", 600))

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
    print("loaded trained flagship from", RUN, flush=True)

    dc = DeviceCorpus(DATA, crop_frames=CROP, batch_size=BATCH, seed=3)
    print(f"distill data: {len(dc.files)} files, device-resident "
          f"{dc.device_bytes/2**20:.0f} MB", flush=True)

    # Fidelity yardstick: converged 256-step sample of the TRAINED
    # teacher at fixed noise; RMS distance to it measures how much a
    # step-count cut degrades the trajectory.
    noise = jax.random.normal(jax.random.key(42), (1, 2, CROP),
                              jnp.float32)
    ref = np.asarray(model.sample(noise, num_steps=256), np.float32)

    def dist(n_steps):
        out = np.asarray(model.sample(noise, num_steps=n_steps),
                         np.float32)
        return float(np.sqrt(np.mean((out - ref) ** 2)))

    base = {n: dist(n) for n in (8, 16, 32, 64)}
    print("undistilled RMS to 256-step:",
          {k: round(v, 4) for k, v in base.items()}, flush=True)

    distiller = ProgressiveDistiller(model, base_steps=64,
                                     learning_rate=2e-5)
    t0 = time.time()
    for _stage in range(3):  # 64->32->16->8
        distiller.stage(iter(dc), num_train_steps=STAGE_STEPS,
                        log_every=200)
        print(f"stage done ({distiller.steps} steps now), "
              f"t={time.time()-t0:.0f}s", flush=True)

    after = {n: dist(n) for n in (4, 8, 16)}
    print("distilled RMS to 256-step:",
          {k: round(v, 4) for k, v in after.items()}, flush=True)
    model.save(f"{RUN}/model_distilled8")

    # Serving latency, on-device repetition (tunnel RTT excluded —
    # PERFORMANCE.md measurement rules).
    def timed_sample(params, steps):
        reps = 10
        noises = jax.random.normal(jax.random.key(0),
                                   (reps, 1, 2, CROP), jnp.float32)

        @jax.jit
        def many(p, ns):
            return jnp.sum(jax.lax.map(
                lambda n: model.sample_fn(p, n, num_steps=steps,
                                          unroll=min(5, steps)), ns))

        _ = float(many(params, noises))  # compile
        t0 = time.perf_counter()
        _ = float(many(params, noises))
        return (time.perf_counter() - t0) / reps

    lat8 = timed_sample(model.params, 8)
    print(f"distilled 8-step sample latency: {lat8*1000:.1f} ms",
          flush=True)
    wav_write(f"{RUN}/distilled_sample_8step.wav",
              np.asarray(model.sample(noise, num_steps=8))[0], 48000)
    print(json.dumps({"base_rms": base, "distilled_rms": after,
                      "latency_8step_ms": round(lat8 * 1000, 1)}),
          flush=True)
    print("DISTILL DONE", flush=True)


if __name__ == "__main__":
    main()
