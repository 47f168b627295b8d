"""On-TPU A/B of weight-only quantization: bf16 vs int8 vs int4.

ADVICE-r3 #4 follow-up: int8 was measured on device (PERFORMANCE.md r3 —
-36% HBM bytes, +2% wall clock, 1.3% rel-RMS); int4's claimed byte win was
only argued from the packing math. This measures all three the same way:

- bytes accessed per sampling step (XLA cost analysis of the full 50-step
  program / 50) — verifies the packed nibbles actually cut compiler-visible
  traffic and that the unpack relayout doesn't re-materialize int8;
- ms/step via bench.py's slope measurement (t(12 reps) - t(2 reps), all
  reps on-device in one ``lax.map`` call — the tunnel RTT cancels in the
  difference instead of being estimated);
- fidelity vs the bf16 sample at fixed noise: relative RMS + log-spectral
  distance (audio_diffusion_tpu.eval.log_spectral_distance).

Uses the trained flagship from runs/flagship_r3 when present (quality
numbers on trained weights are the meaningful ones), else random init.

    python examples/quant_bench.py            # flagship, 50 steps
    QB_STEPS=50 QB_RUN=runs/flagship_r3 python examples/quant_bench.py
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_diffusion_tpu import (DiffusionModel, UNetV0, presets,
                                 quantize_params)
from audio_diffusion_tpu.eval import log_spectral_distance

RUN = os.environ.get("QB_RUN", "runs/flagship_r3")
STEPS = int(os.environ.get("QB_STEPS", 50))
CROP = int(os.environ.get("QB_CROP", 2 ** 18))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))


def main():
    global CROP
    if os.environ.get("QB_TINY"):  # CPU smoke: exercise every code path
        CROP = 2048
        cfg = dict(in_channels=2, channels=[8, 16], factors=[1, 2],
                   items=[1, 1], modulation_features=32)
        model = DiffusionModel(net_t=UNetV0, dtype=jnp.bfloat16, **cfg)
        model.initialize(jnp.zeros((1, 2, CROP)))
        trained = False
    else:
        model = DiffusionModel(net_t=UNetV0, dtype=jnp.bfloat16,
                               **presets.UNCONDITIONAL_48K)
        model.initialize(jnp.zeros((1, 2, CROP)))
        trained = Path(RUN, "model").exists()
        if trained:
            model.load(f"{RUN}/model")
    print(f"flagship params: {'trained ' + RUN if trained else 'random init'}",
          flush=True)

    noise = jax.random.normal(jax.random.key(7), (1, 2, CROP), jnp.float32)

    def sample(params, n):
        return model.sample_fn(params, n, num_steps=STEPS, unroll=5)

    # Measured tunnel RTT (same rule as bench.py): median of trivial calls.
    @jax.jit
    def _trivial(x):
        return jnp.sum(x)

    _ = float(_trivial(jnp.ones((8,))))
    rtts = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = float(_trivial(jnp.ones((8,))))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]
    print(f"measured RTT {rtt*1000:.1f} ms", flush=True)

    REPS_SMALL, REPS_BIG = 2, 12
    reps = REPS_BIG - REPS_SMALL
    noises_small = jax.random.normal(
        jax.random.key(0), (REPS_SMALL, 1, 2, CROP), jnp.float32)
    noises_big = jax.random.normal(
        jax.random.key(0), (REPS_BIG, 1, 2, CROP), jnp.float32)

    @jax.jit
    def many(p, ns):
        return jnp.sum(jax.lax.map(lambda n: sample(p, n), ns))

    def measure(params, tag):
        lowered = jax.jit(sample).lower(params, noise).compile()
        cost = lowered.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        mb_step = float((cost or {}).get("bytes accessed", 0.0)) / STEPS / 1e6

        _ = float(many(params, noises_small))  # compile + warmup
        _ = float(many(params, noises_big))
        diffs = []
        for _k in range(3):
            t0 = time.perf_counter()
            _ = float(many(params, noises_big))
            t_big = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(many(params, noises_small))
            diffs.append(max(t_big - (time.perf_counter() - t0), 1e-6))
        ms_step = sorted(diffs)[1] * 1000 / (reps * STEPS)
        wav = np.asarray(sample(params, noise), np.float32)[0]
        print(f"{tag}: {mb_step:.0f} MB/step accessed, {ms_step:.2f} ms/step "
              f"({1000/ms_step:.1f} steps/s)", flush=True)
        return {"mb_per_step": round(mb_step, 1),
                "ms_per_step": round(ms_step, 3), "wav": wav}

    results = {"steps": STEPS, "trained": trained}
    base = measure(model.params, "bf16")
    results["bf16"] = {k: v for k, v in base.items() if k != "wav"}
    ref, ref_rms = base["wav"], float(np.sqrt(np.mean(base["wav"] ** 2)))
    min_size = 256 if os.environ.get("QB_TINY") else 65536
    for bits in (8, 4):
        q = jax.jit(lambda p: quantize_params(p, min_size=min_size,
                                              bits=bits))(model.params)
        r = measure(q, f"int{bits}")
        rel = float(np.sqrt(np.mean((r["wav"] - ref) ** 2))) / ref_rms
        lsd = float(log_spectral_distance(r["wav"], ref))
        print(f"int{bits}: rel-RMS vs bf16 {100*rel:.2f}%, LSD {lsd:.2f} dB",
              flush=True)
        results[f"int{bits}"] = {"mb_per_step": r["mb_per_step"],
                                 "ms_per_step": r["ms_per_step"],
                                 "rel_rms_pct": round(100 * rel, 2),
                                 "lsd_db": round(lsd, 2)}
    print(json.dumps(results), flush=True)
    print("QB DONE", flush=True)


if __name__ == "__main__":
    main()
