"""Reconstruction-quality eval for the TRAINED task models, on held-out
audio.

The task-model families (vocoder, upsampler, autoencoder, AR — reference
README.md:85-224) are wiring-tested and CLI-drivable, but until round 4 no
trained-on-real-audio quality number existed for them. This script scores
run dirs produced by `python -m audio_diffusion_tpu train --task ...`
against a HELD-OUT test set (make_corpus.py --seed 9 — same generator
family, never trained on):

- vocoder: mel -> waveform; LSD + band-profile distance to the original,
  plus mel-domain reconstruction error (the vocoder is generative — phase
  is sampled, so mel error is the faithful metric).
- upsampler: 16x-downsampled input -> full bandwidth; band distance vs
  the original, anchored by the sinc-reupsampled input (what the model
  conditions on: no high-band content) — the gap between the two is the
  restored content.
- autoencoder: encode -> diffusion-decode round trip; LSD + band distance.
- ar: chunk-chained generation; per-chunk band distance to the training
  corpus (drift curve) + chunk-seam LSD z-score vs non-seam positions.

Usage::

    python examples/task_quality_eval.py            # scores runs/* found
    TQ_TASKS=vocoder,ar python examples/task_quality_eval.py
    TQ_TINY=1 python examples/task_quality_eval.py  # CPU smoke, untrained
"""
import json
import os
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_diffusion_tpu.eval import (  # noqa: E402
    band_distance, band_profile, log_spectral_distance)

TEST = os.environ.get("TQ_TEST", "corpus_test")
TRAIN = os.environ.get("TQ_TRAIN", "corpus")
CROP = int(os.environ.get("TQ_CROP", 2 ** 17))
STEPS = int(os.environ.get("TQ_STEPS", 50))
RUNS = {"vocoder": "runs/vocoder", "upsampler": "runs/upsampler",
        "autoencoder": "runs/ae", "ar": "runs/ar"}
SR = 48000

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))


def _build_from_run(run):
    """Rebuild a run's exact model the way the CLI does (single source of
    truth for task construction: cli._build_model)."""
    from audio_diffusion_tpu.cli import _build_model

    cfg = json.loads((Path(run) / "config.json").read_text())
    task = cfg.pop("_task")
    cfg.pop("_sample_rate", None)
    cfg.pop("_init_from", None)
    upf = cfg.pop("_upsample_factor", None)
    # Read BEFORE _build_model: it pops "_length" out of cfg (AR task).
    init_len = cfg.get("_length") or CROP
    model = _build_model(cfg, "v", task, upf)
    model.initialize(jnp.zeros((1, cfg.get("in_channels", 2), init_len)))
    model.load(f"{run}/model")
    return model


def _seam_z(x, seams, seg, rng):
    def at(pos):
        a, b = x[..., pos - seg:pos], x[..., pos:pos + seg]
        return log_spectral_distance(a, b, n_fft=seg, hop=seg)

    seam = [at(p) for p in seams]
    base = []
    while len(base) < 48:
        p = int(rng.integers(seg, x.shape[-1] - seg))
        if all(abs(p - s) > seg for s in seams):
            base.append(at(p))
    mu, sd = float(np.mean(base)), float(np.std(base))
    return round((float(np.mean(seam)) - mu) / max(sd, 1e-9), 2)


def main():
    global CROP, STEPS
    tiny = bool(os.environ.get("TQ_TINY"))
    tasks = os.environ.get("TQ_TASKS", ",".join(RUNS)).split(",")
    if tiny:
        CROP, STEPS = 4096, 4
        rng = np.random.default_rng(0)
        tests = [rng.standard_normal((2, CROP)).astype(np.float32) * 0.1
                 for _ in range(2)]
        train_refs = np.stack(tests)
    else:
        from audio_diffusion_tpu.data import wav_read

        files = sorted(Path(TEST).glob("*.wav"))
        assert files, f"no held-out .wav under {TEST}"
        tests = [np.asarray(wav_read(f, 0, CROP), np.float32)
                 for f in files]
        train_files = sorted(Path(TRAIN).glob("*.wav"))
        train_refs = np.stack(
            [wav_read(f, 0, CROP) for f in train_files[:32]])
    results = {"test_files": len(tests), "crop": CROP, "steps": STEPS}
    key = jax.random.key(0)

    def model_for(task, build_tiny, init_shape=None):
        if tiny:
            m = build_tiny()
            m.initialize(jnp.zeros(init_shape or (1, 2, CROP)))
            return m
        run = RUNS[task]
        if not Path(run, "model").exists():
            print(f"{task}: {run}/model missing — skipped", flush=True)
            return None
        return _build_from_run(run)

    TINY_NET = dict(channels=[8, 16], factors=[1, 2], items=[1, 1],
                    modulation_features=32)

    if "vocoder" in tasks:
        try:
            from audio_diffusion_tpu import DiffusionVocoder, UNetV0

            model = model_for("vocoder", lambda: DiffusionVocoder(
                net_t=UNetV0, mel_n_fft=512, mel_channels=16,
                mel_sample_rate=SR, mel_normalize_log=True, **TINY_NET))
            if model is not None:
                from audio_diffusion_tpu.dsp.mel import griffin_lim

                ms = model.to_spectrogram
                # Zero-parameter baseline from the SAME mel: pinv the
                # filterbank back to a linear-frequency magnitude, then 32
                # Griffin-Lim phase iterations — the classical vocoder any
                # diffusion vocoder must beat to justify itself.
                pinv_fb = np.linalg.pinv(np.asarray(ms._fbanks))  # [mel, freq]
                lsds, bds, mel_errs, gl_lsds, gl_bds = [], [], [], [], []
                for i, x in enumerate(tests):
                    spec = model.to_spectrogram(jnp.asarray(x)[None])
                    y = np.asarray(model.sample(
                        spec, num_steps=STEPS,
                        key=jax.random.fold_in(key, i)), np.float32)[0]
                    n = min(y.shape[-1], x.shape[-1])
                    lsds.append(log_spectral_distance(y[..., :n], x[..., :n]))
                    bds.append(band_distance(band_profile(y, SR),
                                             band_profile(x, SR)))
                    mel_y = np.asarray(model.to_spectrogram(
                        jnp.asarray(y)[None]))
                    mel_errs.append(float(np.sqrt(np.mean(
                        (mel_y[..., :spec.shape[-1]]
                         - np.asarray(spec)[..., :mel_y.shape[-1]]) ** 2))))
                    try:  # anchor only — never fail the model's own row
                        mel_lin = np.asarray(spec[0], np.float32)
                        if ms.normalize_log:
                            mel_lin = np.exp(mel_lin)
                        mag = np.einsum("cml,mf->cfl", mel_lin,
                                        pinv_fb).clip(min=0.0)
                        gl = np.asarray(griffin_lim(
                            jnp.asarray(mag), ms.n_fft, ms.hop_length,
                            ms.win_length, n_iter=32,
                            length=n + 2 * ms.padding), np.float32)
                        gl = gl[..., ms.padding:ms.padding + n]
                        gl_lsds.append(log_spectral_distance(gl, x[..., :n]))
                        gl_bds.append(band_distance(
                            band_profile(gl, SR),
                            band_profile(x[..., :n], SR)))
                    except Exception as e:
                        if not gl_lsds:
                            print(f"vocoder GL anchor unavailable: {e}",
                                  flush=True)
                # Scale anchors: a DIFFERENT test file, and Griffin-Lim.
                anchor = log_spectral_distance(tests[0][..., :CROP],
                                               tests[1][..., :CROP])
                results["vocoder"] = {
                    "lsd_db": round(float(np.mean(lsds)), 2),
                    "lsd_crossfile_anchor": round(float(anchor), 2),
                    "band_dist": round(float(np.mean(bds)), 3),
                    "mel_rmse": round(float(np.mean(mel_errs)), 4)}
                if gl_lsds:
                    results["vocoder"]["lsd_griffin_lim_anchor"] = round(
                        float(np.mean(gl_lsds)), 2)
                    results["vocoder"]["band_dist_griffin_lim"] = round(
                        float(np.mean(gl_bds)), 3)
                print(f"vocoder: {results['vocoder']}", flush=True)
        except Exception as e:  # one task must not kill the rest
            print(f"vocoder: FAILED {type(e).__name__}: {e}", flush=True)
            results["vocoder"] = {"error": f"{type(e).__name__}: {e}"}

    if "upsampler" in tasks:
        try:
            from audio_diffusion_tpu import DiffusionUpsampler, UNetV0
            from audio_diffusion_tpu.dsp import downsample, upsample

            factor = 4 if tiny else 16
            model = model_for("upsampler", lambda: DiffusionUpsampler(
                net_t=UNetV0, in_channels=2, upsample_factor=4, **TINY_NET))
            if model is not None:
                bds_model, bds_naive, lsds = [], [], []
                for i, x in enumerate(tests):
                    low = np.asarray(downsample(jnp.asarray(x)[None], factor))
                    y = np.asarray(model.sample(
                        jnp.asarray(low), num_steps=STEPS,
                        key=jax.random.fold_in(key, 100 + i)), np.float32)[0]
                    naive = np.asarray(upsample(jnp.asarray(low), factor),
                                       np.float32)[0]
                    n = min(y.shape[-1], x.shape[-1], naive.shape[-1])
                    xp = band_profile(x[..., :n], SR)
                    bds_model.append(band_distance(
                        band_profile(y[..., :n], SR), xp))
                    bds_naive.append(band_distance(
                        band_profile(naive[..., :n], SR), xp))
                    lsds.append(log_spectral_distance(y[..., :n], x[..., :n]))
                results["upsampler"] = {
                    "factor": factor,
                    "band_dist_model": round(float(np.mean(bds_model)), 3),
                    "band_dist_sinc_input": round(float(np.mean(bds_naive)), 3),
                    "lsd_db": round(float(np.mean(lsds)), 2)}
                print(f"upsampler: {results['upsampler']}", flush=True)
        except Exception as e:  # one task must not kill the rest
            print(f"upsampler: FAILED {type(e).__name__}: {e}", flush=True)
            results["upsampler"] = {"error": f"{type(e).__name__}: {e}"}

    if "autoencoder" in tasks:
        try:
            from audio_diffusion_tpu import DiffusionAE, UNetV0
            from audio_diffusion_tpu.models import MelEncoder1d

            # Encoder factor (mel hop 16 x conv 2 = 32) must equal the net's
            # cumulative factor at inject_depth: 1*8*4 = 32 at depth 2.
            model = model_for("autoencoder", lambda: DiffusionAE(
                net_t=UNetV0, in_channels=2, encoder=MelEncoder1d(
                    in_channels=2, channels=16, factors=[2], num_blocks=[1],
                    out_channels=8, mel_channels=16, mel_n_fft=64,
                    mel_sample_rate=SR), inject_depth=2,
                channels=[8, 16, 16], factors=[1, 8, 4], items=[1, 1, 1],
                modulation_features=32))
            if model is not None:
                lsds, bds = [], []
                for i, x in enumerate(tests):
                    latent = model.encode(jnp.asarray(x)[None])
                    y = np.asarray(model.decode(
                        latent, num_steps=STEPS,
                        key=jax.random.fold_in(key, 200 + i)), np.float32)[0]
                    n = min(y.shape[-1], x.shape[-1])
                    lsds.append(log_spectral_distance(y[..., :n], x[..., :n]))
                    bds.append(band_distance(band_profile(y[..., :n], SR),
                                             band_profile(x[..., :n], SR)))
                results["autoencoder"] = {
                    "lsd_db": round(float(np.mean(lsds)), 2),
                    "band_dist": round(float(np.mean(bds)), 3),
                    "latent_shape": list(np.asarray(latent).shape)}
                print(f"autoencoder: {results['autoencoder']}", flush=True)
        except Exception as e:  # one task must not kill the rest
            print(f"autoencoder: FAILED {type(e).__name__}: {e}", flush=True)
            results["autoencoder"] = {"error": f"{type(e).__name__}: {e}"}

    if "ar" in tasks:
        try:
            from audio_diffusion_tpu.models import DiffusionAR
            from audio_diffusion_tpu import UNetV0

            chunks = 4 if tiny else 12
            model = model_for("ar", lambda: DiffusionAR(
                net_t=UNetV0, in_channels=2, length=1024, num_splits=4,
                **TINY_NET), init_shape=(1, 2, 1024))
            if model is not None:
                y = np.asarray(model.sample(
                    num_items=2, num_chunks=chunks, num_steps=STEPS,
                    key=jax.random.fold_in(key, 300)), np.float32)
                clen = y.shape[-1] // chunks
                # Corpus profile at CHUNK length so the band grids match.
                prof_c = band_profile(train_refs[..., :clen], SR)
                drift = [round(float(np.mean([band_distance(
                    band_profile(item[..., j * clen:(j + 1) * clen], SR),
                    prof_c) for item in y])), 3)
                    for j in range(chunks)]
                rng = np.random.default_rng(1)
                seg = min(2048, clen // 2)
                zs = [_seam_z(item, [j * clen for j in range(1, chunks)],
                              seg, rng) for item in y]
                results["ar"] = {"chunks": chunks, "chunk_len": clen,
                                 "band_dist_per_chunk": drift,
                                 "seam_z_mean": round(float(np.mean(zs)), 2)}
                print(f"ar: {results['ar']}", flush=True)
        except Exception as e:  # one task must not kill the rest
            print(f"ar: FAILED {type(e).__name__}: {e}", flush=True)
            results["ar"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps(results), flush=True)
    print("TQ DONE", flush=True)


if __name__ == "__main__":
    main()
