"""Embedding-space quality metric: train, validate, re-score (VERDICT r4 #5 + #2).

Round 4's quality claims (encoder-reuse k=2 neutral, int8 0.74% rel-RMS,
distillation parity) all rest on third-octave band profiles — blind to
phase artifacts and transient smearing. This script:

1. trains the corpus embedder (embed.CorpusEmbedder) on the UNION of the
   music + percussive corpora (one fixed feature extractor for every
   score, the FAD methodology) and saves it to runs/embedder;
2. validates the embedding Fréchet distance (EFD) reproduces the known
   orderings: corpus self-split floor < trained-model samples < noise,
   and DPM-25 in the same band as V-50;
3. re-scores the round-4 claims with BOTH metrics and paired seed-
   bootstrap 95% CIs: k=2 / k=5 encoder reuse, int8 weight streaming,
   the 8-step distilled student — each vs the exact 50-step sampler.

Run (TPU, solo): python examples/embed_metric_eval.py
Env: EM_SEEDS (32), EM_STEPS (50), EM_CROP (2^17), EM_TRAIN_STEPS (2000),
EM_TINY=1 for a CPU smoke pass.
"""
import json
import os
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_diffusion_tpu import (  # noqa: E402
    CorpusEmbedder, DiffusionModel, DPMSampler, UNetV0,
    frechet_embedding_distance, quantize_params)
from audio_diffusion_tpu.eval import frechet_band_distance  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent
RUN = Path(os.environ.get("EM_RUN", "runs/flagship_r3"))
SEEDS = int(os.environ.get("EM_SEEDS", 32))
STEPS = int(os.environ.get("EM_STEPS", 50))
CROP = int(os.environ.get("EM_CROP", 2 ** 17))
TRAIN_STEPS = int(os.environ.get("EM_TRAIN_STEPS", 2000))
BATCH = 8
TINY = bool(os.environ.get("EM_TINY"))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / ".jax_cache"))


def _bootstrap_delta(metric, items_a, items_b, reps=400, seed=0):
    """Paired seed-bootstrap 95% CI for metric(ref, b) - metric(ref, a):
    both sets are resampled with the SAME indices (items are seed-paired
    across configs), so the CI is on the config delta, not set noise."""
    rng = np.random.default_rng(seed)
    n = len(items_a)
    deltas = []
    for _ in range(reps):
        idx = rng.integers(0, n, n)
        deltas.append(metric(items_b[idx]) - metric(items_a[idx]))
    lo, hi = np.percentile(deltas, [2.5, 97.5])
    return round(float(lo), 3), round(float(hi), 3)


def main():
    global SEEDS, CROP, TRAIN_STEPS, STEPS, BATCH
    from audio_diffusion_tpu.data import wav_read

    if TINY:
        SEEDS, CROP, TRAIN_STEPS, STEPS = 4, 4096, 30, 10
        BATCH = SEEDS
        rng = np.random.default_rng(0)
        t = np.arange(CROP * 2) / 8000.0
        corpora = {"music": np.stack([
            (np.sin(2 * np.pi * 150 * (i + 1) * t) * 0.4).astype(
                np.float32)[None].repeat(2, 0) for i in range(6)])}
        sr = 8000
        emb = CorpusEmbedder(features=8, sample_rate=sr, crop=1024,
                             n_mels=24, n_fft=256, hop=64, widths=(24, 32))
        model = DiffusionModel(net_t=UNetV0, in_channels=2,
                               channels=[8, 16], factors=[1, 2],
                               items=[1, 1], modulation_features=32)
        model.initialize(jnp.zeros((BATCH, 2, CROP)))
        model_dpm = model
        dist_params = model.params
    else:
        cfg = json.loads((RUN / "config.json").read_text())
        sr = cfg.pop("_sample_rate", 48000)
        for k in ("_task", "_upsample_factor", "_init_from"):
            cfg.pop(k, None)
        dtype = {"bf16": jnp.bfloat16}.get(cfg.pop("_dtype", None))
        model = DiffusionModel(net_t=UNetV0, dtype=dtype, **cfg)
        model.initialize(jnp.zeros((BATCH, cfg["in_channels"], CROP)))
        model.load(RUN / "model")
        model_dpm = DiffusionModel(net_t=UNetV0, dtype=dtype,
                                   sampler_t=DPMSampler, **cfg)
        model_dpm.initialize(jnp.zeros((BATCH, cfg["in_channels"], CROP)))
        model_dpm.params = model.params
        dist_dir = RUN / "model_distilled8"
        dist_params = None
        if dist_dir.exists():
            import orbax.checkpoint as ocp

            dist_params = ocp.StandardCheckpointer().restore(
                dist_dir.absolute(), target=model.params)
        corpora = {}
        for name, d in (("music", "corpus"), ("perc", "corpus_perc")):
            files = sorted(Path(d).glob("*.wav"))
            if files:
                corpora[name] = np.stack(
                    [wav_read(f, 0, 2 * CROP) for f in files])
        emb = CorpusEmbedder(features=32, sample_rate=sr, crop=48000)

    # ---- 1. train (or load) the union embedder -------------------------
    union = np.concatenate(list(corpora.values()))
    emb_dir = ROOT / "runs/embedder"
    if not TINY and emb_dir.exists() and not os.environ.get("EM_RETRAIN"):
        params_e = emb.load(emb_dir, num_classes=union.shape[0])
        print(f"embedder: loaded {emb_dir} ({union.shape[0]} classes)",
              flush=True)
    else:
        print(f"embedder: training on {union.shape[0]} files...", flush=True)
        params_e = emb.train(union, key=jax.random.key(0),
                             steps=TRAIN_STEPS, batch=32,
                             log_every=max(TRAIN_STEPS // 10, 1))
        if not TINY:
            emb.save(params_e, emb_dir)

    def efd(items_ref, items_gen):
        return frechet_embedding_distance(emb.embed(params_e, items_ref),
                                          emb.embed(params_e, items_gen))

    ref_name = os.environ.get("EM_REF", "music")
    if ref_name not in corpora:
        ref_name = next(iter(corpora))
    results = {"seeds": SEEDS, "steps": STEPS, "crop": CROP,
               "ref_corpus": ref_name,
               "embedder_classes": int(union.shape[0])}

    refs = corpora[ref_name][:, :, :CROP]
    refs_b = corpora[ref_name][:, :, CROP:2 * CROP]
    ref_feats = emb.embed(params_e, refs)

    # ---- 2. validation orderings ---------------------------------------
    rng = np.random.default_rng(1)
    noise_set = rng.standard_normal(
        (SEEDS,) + refs.shape[1:]).astype(np.float32) * float(refs.std())
    val = {"efd_corpus_self": round(efd(refs, refs_b), 3),
           "efd_noise": round(efd(refs, noise_set), 3)}

    noise = np.stack([
        np.random.default_rng(100 + i).standard_normal(
            (refs.shape[1], CROP)).astype(np.float32)
        for i in range(SEEDS)]).reshape(SEEDS // BATCH, BATCH, -1, CROP)

    def gen(m, params=None, steps=STEPS, **kw):
        outs = []
        for nb in noise:
            o = m.sample(jnp.asarray(nb), num_steps=steps,
                         **({"params": params} if params is not None
                            else {}), **kw)
            outs.append(np.asarray(o, np.float32))
        return np.concatenate(outs)

    sets = {"v50": gen(model)}
    val["efd_v50"] = round(efd(refs, sets["v50"]), 3)
    sets["dpm25"] = gen(model_dpm, steps=max(STEPS // 2, 2))
    val["efd_dpm25"] = round(efd(refs, sets["dpm25"]), 3)
    val["ordering_ok"] = bool(val["efd_corpus_self"] < val["efd_v50"]
                              < val["efd_noise"])
    results["validation"] = val
    print(f"validation: {val}", flush=True)

    # ---- 3. re-score the round-4 claims with CIs -----------------------
    sets["reuse_k2"] = gen(model, encoder_reuse=2)
    sets["reuse_k5"] = gen(model, encoder_reuse=5)
    sets["int8"] = gen(model, params=quantize_params(model.params))
    if dist_params is not None:
        sets["distilled8"] = gen(model, params=dist_params, steps=8)

    feats = {k: emb.embed(params_e, v) for k, v in sets.items()}

    def efd_of(items):
        return frechet_embedding_distance(ref_feats, items)

    def fbd_of(items):
        return frechet_band_distance(refs, items, sr)

    base = sets["v50"]
    base_feats = feats["v50"]
    rows = {}
    for name in sets:
        row = {"efd": round(efd_of(feats[name]), 3),
               "fbd": round(fbd_of(sets[name]), 3)}
        if name != "v50":
            row["d_efd_ci95"] = _bootstrap_delta(
                efd_of, base_feats, feats[name])
            row["d_fbd_ci95"] = _bootstrap_delta(
                fbd_of, base, sets[name])
        rows[name] = row
        print(f"{name}: {row}", flush=True)
    results["claims"] = rows

    print(json.dumps(results), flush=True)
    print("EM DONE", flush=True)


if __name__ == "__main__":
    main()
