"""Set-level encoder-reuse quality study (cross-corpus replication).

PERFORMANCE.md round 4 measured encoder-reuse quality on ONE model/corpus
with single-sample metrics; this script upgrades the measurement to a
SET-LEVEL one — the Fréchet band distance (eval.frechet_band_distance:
FAD recipe over third-octave profiles) of an N-seed sample set against the
training corpus — and runs on any trained run dir, so the study replicates
across statistically distinct corpora (examples/make_corpus.py --style).

Per k in {1, 2, 5}:

- FBD(corpus, samples_k) with two anchors: FBD(corpus half, corpus half)
  (the small-sample floor — N-item Gaussians never score 0) and
  FBD(corpus, matched-rms white noise) (the failure ceiling);
- mean per-sample band-profile distance to the corpus profile;
- pairwise diversity of the sample set (collapse detector);
- rel-RMS + LSD of each seed's sample vs its k=1 sample (trajectory
  divergence — measures a DIFFERENT sample, not a worse one).

Usage::

    ER_RUN=runs/perc ER_CORPUS=corpus_perc ER_SEEDS=32 \
        python examples/encoder_reuse_quality.py
    ER_TINY=1 python examples/encoder_reuse_quality.py   # CPU smoke
"""
import json
import os
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_diffusion_tpu import DiffusionModel, UNetV0  # noqa: E402
from audio_diffusion_tpu.eval import (  # noqa: E402
    band_distance, band_profile, frechet_band_distance, log_spectral_distance,
    pairwise_diversity)

RUN = os.environ.get("ER_RUN", "runs/flagship_r3")
CORPUS = os.environ.get("ER_CORPUS", "corpus")
STEPS = int(os.environ.get("ER_STEPS", 50))
CROP = int(os.environ.get("ER_CROP", 2 ** 17))
SEEDS = int(os.environ.get("ER_SEEDS", 32))
BATCH = int(os.environ.get("ER_BATCH", 8))
KS = tuple(int(k) for k in os.environ.get("ER_KS", "1,2,5").split(","))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))


def _load_model():
    """Build the run's recorded model (unconditional runs only)."""
    cfg = json.loads((Path(RUN) / "config.json").read_text())
    task = cfg.pop("_task", "unconditional")
    assert task == "unconditional", (
        f"this study drives unconditional models, run is {task}")
    sr = cfg.pop("_sample_rate", 48000)
    for key in ("_upsample_factor", "_init_from"):
        cfg.pop(key, None)
    dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(
        cfg.pop("_dtype", None))
    model = DiffusionModel(net_t=UNetV0, dtype=dtype, **cfg)
    model.initialize(jnp.zeros((BATCH, cfg["in_channels"], CROP)))
    model.load(f"{RUN}/model")
    return model, sr


def main():
    global CROP, SEEDS, BATCH, RUN, CORPUS
    if os.environ.get("ER_TINY"):  # CPU smoke: every code path, no run dir
        CROP, SEEDS, BATCH = 2048, 4, 2
        RUN = CORPUS = "tiny-smoke (random init, synthetic refs)"
        model = DiffusionModel(net_t=UNetV0, in_channels=2,
                               channels=[8, 16], factors=[1, 2],
                               items=[1, 1], modulation_features=32)
        model.initialize(jnp.zeros((BATCH, 2, CROP)))
        sr = 48000
        rng = np.random.default_rng(0)
        refs = rng.standard_normal((8, 2, CROP)).astype(np.float32) * 0.1
    else:
        model, sr = _load_model()
        files = sorted(Path(CORPUS).glob("*.wav"))
        assert files, f"no .wav under {CORPUS}"
        from audio_diffusion_tpu.data import wav_read

        refs = np.stack([wav_read(f, 0, CROP) for f in files])
    print(f"run {RUN} | corpus {CORPUS} ({len(refs)} refs) | "
          f"crop {CROP} | {SEEDS} seeds x {STEPS} steps | k in {KS}",
          flush=True)

    assert SEEDS % BATCH == 0, (SEEDS, BATCH)
    noise = np.stack([
        np.random.default_rng(100 + i).standard_normal(
            (refs.shape[1], CROP)).astype(np.float32)
        for i in range(SEEDS)]).reshape(SEEDS // BATCH, BATCH, -1, CROP)

    corpus_prof = band_profile(refs, sr)
    rng = np.random.default_rng(1)
    results = {"run": RUN, "corpus": CORPUS, "steps": STEPS,
               "seeds": SEEDS, "crop": CROP}
    # Anchors: the small-sample floor and the white-noise ceiling, both at
    # the SAME set sizes as the measured rows so the bias is comparable.
    half = len(refs) // 2
    if half >= 2:
        results["fbd_corpus_self"] = round(frechet_band_distance(
            refs[:half], refs[half:], sr), 2)
    noise_set = rng.standard_normal(
        (SEEDS,) + refs.shape[1:]).astype(np.float32) * float(refs.std())
    results["fbd_noise"] = round(frechet_band_distance(refs, noise_set, sr),
                                 2)

    sets = {}
    for k in KS:
        def sample(params, n, _k=k):
            return model.sample_fn(params, n, num_steps=STEPS, unroll=1,
                                   encoder_reuse=_k)

        fn = jax.jit(sample)
        outs = [np.asarray(fn(model.params, jnp.asarray(nb)), np.float32)
                for nb in noise]
        sets[k] = np.concatenate(outs)  # [SEEDS, C, CROP]
        row = {
            "fbd": round(frechet_band_distance(refs, sets[k], sr), 2),
            "band_dist_mean": round(float(np.mean(
                [band_distance(band_profile(s, sr), corpus_prof)
                 for s in sets[k]])), 3),
            "diversity": round(pairwise_diversity(sets[k], sr), 3),
        }
        if k != KS[0]:
            ref_set = sets[KS[0]]
            rels = [float(np.sqrt(np.mean((a - b) ** 2))
                          / max(np.sqrt(np.mean(b ** 2)), 1e-9))
                    for a, b in zip(sets[k], ref_set)]
            lsds = [float(log_spectral_distance(a, b))
                    for a, b in zip(sets[k], ref_set)]
            row["rel_rms_vs_k1_pct"] = round(100 * float(np.mean(rels)), 1)
            row["lsd_vs_k1_db"] = round(float(np.mean(lsds)), 2)
        results[f"k{k}"] = row
        print(f"k={k}: {row}", flush=True)

    print(json.dumps(results), flush=True)
    print("ERQ DONE", flush=True)


if __name__ == "__main__":
    main()
