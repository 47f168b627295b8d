"""On-TPU A/B of encoder-reuse sampling ("Faster Diffusion",
arXiv:2312.09608 — PAPERS.md): ms/step and fidelity for k in {1, 2, 5}.

The U-Net down path runs every k-th step; the k−1 steps between decode
from the cached encoder state with fresh σ modulation (VSampler
``encoder_reuse``). k=1 is bit-exact with the reference sampler; k>1 is an
approximation whose quality is measured here on the trained flagship:

- ms/step via the slope method (t(12 reps) − t(2 reps), tunnel RTT
  cancels — bench.py measurement rules);
- fidelity at fixed noise vs the k=1 sample: relative RMS +
  log-spectral distance;
- band-profile distance to the training corpus for each k (the corpus
  metric of PERFORMANCE.md), so the quality delta is judged in the same
  units as the model's own eval.

    python examples/encoder_reuse_bench.py            # runs/flagship_r3
    ER_RUN=runs/my_run ER_STEPS=50 python examples/encoder_reuse_bench.py
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

from audio_diffusion_tpu import DiffusionModel, UNetV0, presets
from audio_diffusion_tpu.eval import log_spectral_distance

RUN = os.environ.get("ER_RUN", "runs/flagship_r3")
STEPS = int(os.environ.get("ER_STEPS", 50))
CROP = int(os.environ.get("ER_CROP", 2 ** 18))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))


def main():
    global CROP
    if os.environ.get("ER_TINY"):  # CPU smoke: exercise every code path
        CROP = 2048
        model = DiffusionModel(net_t=UNetV0, dtype=jnp.bfloat16,
                               in_channels=2, channels=[8, 16],
                               factors=[1, 2], items=[1, 1],
                               modulation_features=32)
        model.initialize(jnp.zeros((1, 2, CROP)))
        trained = False
    else:
        model = DiffusionModel(net_t=UNetV0, dtype=jnp.bfloat16,
                               **presets.UNCONDITIONAL_48K)
        model.initialize(jnp.zeros((1, 2, CROP)))
        trained = Path(RUN, "model").exists()
        if trained:
            model.load(f"{RUN}/model")
    print(f"params: {'trained ' + RUN if trained else 'random init'}",
          flush=True)

    noise = jax.random.normal(jax.random.key(7), (1, 2, CROP), jnp.float32)
    params = model.params

    REPS_SMALL, REPS_BIG = 2, 12
    reps = REPS_BIG - REPS_SMALL
    noises_small = jax.random.normal(
        jax.random.key(0), (REPS_SMALL, 1, 2, CROP), jnp.float32)
    noises_big = jax.random.normal(
        jax.random.key(0), (REPS_BIG, 1, 2, CROP), jnp.float32)

    def measure(k):
        def sample(p, n):
            return model.sample_fn(p, n, num_steps=STEPS, unroll=1,
                                   encoder_reuse=k)

        @jax.jit
        def many(p, ns):
            return jnp.sum(jax.lax.map(lambda n: sample(p, n), ns))

        _ = float(many(params, noises_small))  # compile + warmup
        _ = float(many(params, noises_big))
        diffs = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(many(params, noises_big))
            t_big = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(many(params, noises_small))
            diffs.append(max(t_big - (time.perf_counter() - t0), 1e-6))
        ms_step = sorted(diffs)[1] * 1000 / (reps * STEPS)
        wav = np.asarray(jax.jit(sample)(params, noise), np.float32)[0]
        print(f"k={k}: {ms_step:.2f} ms/step ({1000/ms_step:.1f} steps/s)",
              flush=True)
        return ms_step, wav

    results = {"steps": STEPS, "trained": trained}
    ms1, ref = measure(1)
    results["k1"] = {"ms_per_step": round(ms1, 3)}
    ref_rms = float(np.sqrt(np.mean(ref ** 2)))
    for k in (2, 5):
        ms, wav = measure(k)
        rel = float(np.sqrt(np.mean((wav - ref) ** 2))) / max(ref_rms, 1e-9)
        lsd = float(log_spectral_distance(wav, ref))
        print(f"k={k}: rel-RMS vs k=1 {100*rel:.2f}%, LSD {lsd:.2f} dB, "
              f"speedup {ms1/ms:.2f}x", flush=True)
        results[f"k{k}"] = {"ms_per_step": round(ms, 3),
                            "rel_rms_pct": round(100 * rel, 2),
                            "lsd_db": round(lsd, 2),
                            "speedup": round(ms1 / ms, 3)}

    # Corpus band-profile distance (same metric as CLI eval) when the
    # training corpus is on disk.
    corpus = Path("corpus")
    if trained and corpus.is_dir():
        from audio_diffusion_tpu.eval import band_distance, band_profile
        from audio_diffusion_tpu.data import wav_read

        refs = []
        for f in sorted(corpus.glob("*.wav"))[:16]:
            refs.append(np.asarray(wav_read(str(f), 0, CROP), np.float32))
        corpus_prof = band_profile(np.stack(refs), 48000)
        for k in (1, 2, 5):
            wav = (ref if k == 1 else
                   np.asarray(jax.jit(lambda p, n, _k=k: model.sample_fn(
                       p, n, num_steps=STEPS, unroll=1, encoder_reuse=_k))(
                           params, noise), np.float32)[0])
            d = band_distance(band_profile(wav, 48000), corpus_prof)
            results.setdefault(f"k{k}", {})["band_dist"] = round(float(d), 3)
            print(f"k={k}: band-profile distance to corpus {d:.3f}",
                  flush=True)

    print(json.dumps(results), flush=True)
    print("ER DONE", flush=True)


if __name__ == "__main__":
    main()
