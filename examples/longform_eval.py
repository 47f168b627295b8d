"""Long-form generation quality: are outpainted seams audible in the
metrics?

``generate_long`` chains RePaint-outpainted windows past the training
crop (longform.py); tests pin its mechanics but no quality number existed
on a trained model. This measures, on any unconditional run dir:

- **Seam continuity**: log-spectral distance (and rms jump) between the
  adjacent segments straddling every window seam, compared against the
  distribution of the SAME statistic at random non-seam positions — a
  seam z-score ≈ 0 means the stitch is statistically invisible to the
  metric; run at ``--resamples 1`` vs ``2`` to quantify RePaint's
  harmonization knob.
- **Window drift**: band-profile distance to the corpus for each
  generated window region — does quality decay as windows chain?

Usage::

    LF_RUN=runs/flagship_r3 LF_CORPUS=corpus python examples/longform_eval.py
    LF_TINY=1 python examples/longform_eval.py   # CPU smoke
"""
import json
import os
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_diffusion_tpu import DiffusionModel, UNetV0, generate_long  # noqa: E402
from audio_diffusion_tpu.eval import (  # noqa: E402
    band_distance, band_profile, log_spectral_distance)

RUN = os.environ.get("LF_RUN", "runs/flagship_r3")
CORPUS = os.environ.get("LF_CORPUS", "corpus")
WINDOW = int(os.environ.get("LF_WINDOW", 2 ** 18))
OVERLAP = int(os.environ.get("LF_OVERLAP", 2 ** 16))
N_WINDOWS = int(os.environ.get("LF_WINDOWS", 3))
STEPS = int(os.environ.get("LF_STEPS", 50))
BATCH = int(os.environ.get("LF_BATCH", 4))
SEG = int(os.environ.get("LF_SEG", 4096))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))


def _seam_stats(audio: np.ndarray, seams, rng) -> dict:
    """LSD + rms jump across each position's [p-SEG, p) vs [p, p+SEG)."""
    def at(pos):
        lsds, jumps = [], []
        for x in audio:  # [C, T] per batch item
            a, b = x[..., pos - SEG:pos], x[..., pos:pos + SEG]
            lsds.append(log_spectral_distance(a, b, n_fft=SEG, hop=SEG))
            ra, rb = float(np.sqrt((a**2).mean())), float(
                np.sqrt((b**2).mean()))
            jumps.append(abs(ra - rb) / max(ra + rb, 1e-9))
        return float(np.mean(lsds)), float(np.mean(jumps))

    total = audio.shape[-1]
    seam_lsd, seam_jump = zip(*[at(p) for p in seams])
    # Non-seam baseline: random positions at least SEG away from any seam.
    base = []
    while len(base) < 64:
        p = int(rng.integers(SEG, total - SEG))
        if all(abs(p - s) > SEG for s in seams):
            base.append(p)
    base_lsd, base_jump = zip(*[at(p) for p in base])
    mu, sd = float(np.mean(base_lsd)), float(np.std(base_lsd))
    return {
        "seam_lsd": round(float(np.mean(seam_lsd)), 2),
        "nonseam_lsd_mean": round(mu, 2),
        "nonseam_lsd_std": round(sd, 2),
        "seam_z": round((float(np.mean(seam_lsd)) - mu) / max(sd, 1e-9), 2),
        "seam_rms_jump": round(float(np.mean(seam_jump)), 3),
        "nonseam_rms_jump": round(float(np.mean(base_jump)), 3),
    }


def main():
    global WINDOW, OVERLAP, BATCH, SEG, RUN, CORPUS, STEPS
    if os.environ.get("LF_TINY"):  # CPU smoke
        WINDOW, OVERLAP, BATCH, SEG, STEPS = 1024, 256, 2, 256, 4
        RUN = CORPUS = "tiny-smoke"
        model = DiffusionModel(net_t=UNetV0, in_channels=2,
                               channels=[8, 16], factors=[1, 2],
                               items=[1, 1], modulation_features=32)
        model.initialize(jnp.zeros((BATCH, 2, WINDOW)))
        sr, corpus_prof = 48000, None
    else:
        cfg = json.loads((Path(RUN) / "config.json").read_text())
        assert cfg.pop("_task", "unconditional") == "unconditional"
        sr = cfg.pop("_sample_rate", 48000)
        for key in ("_upsample_factor", "_init_from"):
            cfg.pop(key, None)
        dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(
            cfg.pop("_dtype", None))
        model = DiffusionModel(net_t=UNetV0, dtype=dtype, **cfg)
        model.initialize(jnp.zeros((BATCH, cfg["in_channels"], WINDOW)))
        model.load(f"{RUN}/model")
        from audio_diffusion_tpu.data import wav_read

        files = sorted(Path(CORPUS).glob("*.wav"))
        refs = np.stack([wav_read(f, 0, min(WINDOW, 2 ** 17))
                         for f in files])
        corpus_prof = band_profile(refs, sr)

    stride = WINDOW - OVERLAP
    length = WINDOW + (N_WINDOWS - 1) * stride
    seams = [WINDOW + i * stride for i in range(N_WINDOWS - 1)]
    print(f"run {RUN} | {N_WINDOWS} windows of {WINDOW} (overlap {OVERLAP})"
          f" = {length} frames ({length/sr:.1f} s) x batch {BATCH} | "
          f"{STEPS} steps", flush=True)

    results = {"run": RUN, "windows": N_WINDOWS, "window": WINDOW,
               "overlap": OVERLAP, "steps": STEPS, "batch": BATCH}
    rng = np.random.default_rng(0)
    for resamples in (1, 2):
        audio = np.asarray(generate_long(
            model, length=length, window=WINDOW, overlap=OVERLAP,
            num_steps=STEPS, num_resamples=resamples,
            key=jax.random.key(42), batch_size=BATCH), np.float32)
        assert np.isfinite(audio).all()
        row = _seam_stats(audio, seams, rng)
        if corpus_prof is not None:
            # Quality drift across the chained window regions.
            regions = [(0, WINDOW)] + [(s, s + stride) for s in seams]
            row["band_dist_per_window"] = [
                round(float(np.mean([band_distance(
                    band_profile(x[..., a:b], sr), corpus_prof)
                    for x in audio])), 3)
                for a, b in regions]
        results[f"resamples{resamples}"] = row
        print(f"resamples={resamples}: {row}", flush=True)

    print(json.dumps(results), flush=True)
    print("LF DONE", flush=True)


if __name__ == "__main__":
    main()
