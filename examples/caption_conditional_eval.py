"""Semantic text-to-audio eval: does `sample --text` produce the
ingredients the caption names?

Protocol (pairs with make_caption_corpus.py):

1. **Ingredient probe** — a 5-way multi-label logistic regression over
   audio features (third-octave band profile + temporal stats) is fit on
   crops of the captioned TRAINING corpus (labels parsed back out of the
   sidecar captions) and validated on a FRESH corpus rendered with a
   different seed that includes the held-out combos. The probe must read
   real audio accurately before it is allowed to judge generated audio
   (validation accuracy is reported and gates the verdict).
2. **Generation** — for all 20 ingredient combos (16 seen at train time +
   4 compositionally held out), generate CC_SEEDS samples per combo from
   the caption alone (`model.net.text_encoder`, the same frozen encoder
   training used), guided (CFG scale CC_SCALE) and unguided.
3. **Scoring** — probe-predicted ingredient sets vs the caption's true
   set: per-ingredient accuracy, exact-set match, Jaccard; a
   shuffled-caption control (same samples scored against a rotated
   combo assignment) gives the no-semantics floor. Exact binomial 95%
   CIs throughout (VERDICT r4 #2 standard).

Run AFTER training (TPU, solo)::

    python examples/make_caption_corpus.py --out corpus_cap --files 64
    python examples/make_caption_corpus.py --out corpus_cap_val \
        --files 40 --seed 7 --include-held-out
    python -m audio_diffusion_tpu train --data corpus_cap/ \
        --preset configs/captioncond.json --steps 9000 --batch 8 \
        --crop 131072 --caption-dir corpus_cap/ --text-encoder random \
        --embedding-mask-proba 0.1 --ema-decay 0.999 --out runs/captioncond
    python examples/caption_conditional_eval.py
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "examples"))
sys.path.insert(0, str(ROOT))

from make_caption_corpus import COMBOS, HELD_OUT, NAMES, caption_for  # noqa: E402

MODEL = os.environ.get("CC_MODEL", "runs/captioncond/model")
TRAIN_DIR = os.environ.get("CC_TRAIN", "corpus_cap")
VAL_DIR = os.environ.get("CC_VAL", "corpus_cap_val")
SEEDS = int(os.environ.get("CC_SEEDS", 6))
STEPS = int(os.environ.get("CC_STEPS", 50))
SCALE = float(os.environ.get("CC_SCALE", 3.0))
CROP = int(os.environ.get("CC_CROP", 131072))
SR = 48_000


# --------------------------------------------------------------------------
# Features: band profile + temporal stats that separate the 5 ingredients
# (sustained pad vs plucked onsets vs low tonal bass vs beat transients vs
# smooth moving noise).
# --------------------------------------------------------------------------

def features(x: np.ndarray) -> np.ndarray:
    from audio_diffusion_tpu.eval import band_profile

    mono = np.asarray(x, np.float32).reshape(-1, x.shape[-1]).mean(0)
    prof = band_profile(mono, SR)
    hop = 1024
    n_frames = len(mono) // hop
    frames = mono[: n_frames * hop].reshape(n_frames, hop)
    rms = np.sqrt((frames ** 2).mean(-1) + 1e-12)
    crest = rms.max() / (rms.mean() + 1e-9)
    flat = rms.std() / (rms.mean() + 1e-9)
    onset = float((rms[1:] > 1.5 * rms[:-1] + 1e-4).mean())
    # Spectral-centroid drift: noise sweeps move, everything else holds.
    win = 4096
    n_w = len(mono) // win
    segs = mono[: n_w * win].reshape(n_w, win)
    mag = np.abs(np.fft.rfft(segs, axis=-1))
    fr = np.fft.rfftfreq(win, 1.0 / SR)
    cent = (mag * fr).sum(-1) / (mag.sum(-1) + 1e-9)
    cent_drift = np.log10(cent + 1.0).std()
    # Low-band (<150 Hz) energy fraction: bass/kick markers.
    spec = np.abs(np.fft.rfft(mono)) ** 2
    freqs = np.fft.rfftfreq(len(mono), 1.0 / SR)
    low = spec[freqs < 150].sum() / (spec.sum() + 1e-12)
    # Low-band spectral peakiness: a sustained fm bass is a LINE spectrum
    # in 30-250 Hz (a few partials over many seconds), a kick drum is a
    # broadband decaying thump — peak/mean of the long-FFT magnitude in
    # that band separates them where raw low-band energy cannot.
    lo_m = (freqs >= 30) & (freqs < 250)
    lo_mag = np.sqrt(spec[lo_m] + 1e-18)
    lo_peak = np.log10(lo_mag.max() / (lo_mag.mean() + 1e-12) + 1.0)
    return np.concatenate(
        [prof, [crest, flat, onset * 10.0, cent_drift * 10.0, low * 10.0,
                lo_peak]])


def parse_labels(caption: str) -> np.ndarray:
    y = np.array([phrase in caption for phrase in NAMES], np.float32)
    assert y.sum() >= 2, caption
    return y


def corpus_features(dirpath: str, crops_per_file: int, rng) -> tuple:
    from audio_diffusion_tpu.data import wav_read

    feats, labels = [], []
    for wav in sorted(Path(dirpath).glob("*.wav")):
        y = parse_labels((wav.with_suffix(".txt")).read_text())
        x = wav_read(str(wav))
        for _ in range(crops_per_file):
            off = int(rng.integers(0, max(x.shape[-1] - CROP, 1)))
            feats.append(features(x[..., off:off + CROP]))
            labels.append(y)
    return np.stack(feats), np.stack(labels)


class Probe:
    """Multi-label logistic regression (numpy, full-batch GD)."""

    def fit(self, feats, labels, iters=3000, lr=0.3, l2=1e-4):
        self.mu = feats.mean(0)
        self.sd = feats.std(0) + 1e-9
        z = (feats - self.mu) / self.sd
        d, k = z.shape[1], labels.shape[1]
        w, b = np.zeros((d, k)), np.zeros(k)
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(z @ w + b)))
            g = z.T @ (p - labels) / len(z) + l2 * w
            w -= lr * g
            b -= lr * (p - labels).mean(0)
        self.w, self.b = w, b
        return self

    def predict(self, feats) -> np.ndarray:
        z = (np.atleast_2d(feats) - self.mu) / self.sd
        return (1.0 / (1.0 + np.exp(-(z @ self.w + self.b))) > 0.5) \
            .astype(np.float32)


def ci95(k: int, n: int):
    """Exact binomial (Clopper-Pearson; Wilson fallback)."""
    try:
        from scipy.stats import beta

        lo = beta.ppf(0.025, k, n - k + 1) if k > 0 else 0.0
        hi = beta.ppf(0.975, k + 1, n - k) if k < n else 1.0
    except Exception:
        z, p = 1.96, k / n
        den = 1 + z * z / n
        mid = (p + z * z / (2 * n)) / den
        hw = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
        lo, hi = mid - hw, mid + hw
    return [round(float(lo), 3), round(float(hi), 3)]


def score(preds: np.ndarray, truths: np.ndarray) -> dict:
    """preds/truths [n, 5] multi-hot."""
    n = len(preds)
    ing_ok = int((preds == truths).sum())
    exact = int((preds == truths).all(-1).sum())
    inter = (preds * truths).sum(-1)
    union = np.maximum(preds, truths).sum(-1)
    return {
        "n": n,
        "per_ingredient_acc": round(ing_ok / (n * 5), 3),
        "per_ingredient_ci95": ci95(ing_ok, n * 5),
        "exact_set": round(exact / n, 3),
        "exact_set_ci95": ci95(exact, n),
        "jaccard": round(float((inter / np.maximum(union, 1)).mean()), 3),
    }


def main():
    import jax
    import jax.numpy as jnp

    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        jax.config.update("jax_compilation_cache_dir",
                          str(ROOT / ".jax_cache"))

    rng = np.random.default_rng(0)
    out: dict = {"steps": STEPS, "scale": SCALE, "seeds": SEEDS}

    # ---- 1. probe: fit on the training corpus, validate on fresh audio --
    print("fitting ingredient probe...", flush=True)
    tr_f, tr_y = corpus_features(TRAIN_DIR, 4, rng)
    probe = Probe().fit(tr_f, tr_y)
    va_f, va_y = corpus_features(VAL_DIR, 2, rng)
    val = score(probe.predict(va_f), va_y)
    out["probe_validation"] = val
    print(f"probe validation (fresh real audio, all 20 combos): {val}",
          flush=True)
    if val["per_ingredient_acc"] < 0.85:
        out["verdict"] = "probe too weak to judge generations"
        print(json.dumps(out))
        print("CC EVAL DONE")
        return

    # ---- 2. generate from captions --------------------------------------
    from audio_diffusion_tpu.cli import _build_model, _load_run_config

    class _Args:
        model = MODEL
        preset = None
        dtype = None

    cfg, task, sample_rate, up = _load_run_config(_Args)
    model = _build_model(dict(cfg), "v", task, up)
    c = cfg.get("in_channels", 2)
    dummy = jnp.zeros((1, cfg["embedding_max_length"],
                       cfg["embedding_features"]))
    model.initialize(jnp.zeros((1, c, CROP)), embedding=dummy)
    model.load(MODEL)
    encoder = model.net.text_encoder

    arms = {"guided": SCALE, "unguided": 1.0}
    preds = {a: [] for a in arms}
    truths = []
    held_mask = []
    for ci, combo in enumerate(COMBOS):
        cap = caption_for(combo)
        emb = np.repeat(np.asarray(encoder([cap]), np.float32), SEEDS, 0)
        noise = jax.random.normal(jax.random.key(ci), (SEEDS, c, CROP))
        truths.extend([parse_labels(cap)] * SEEDS)
        held_mask.extend([combo in HELD_OUT] * SEEDS)
        for arm, scale in arms.items():
            kw = dict(embedding=jnp.asarray(emb), num_steps=STEPS)
            if scale != 1.0:
                kw["embedding_scale"] = scale
            wav = np.asarray(model.sample(noise, **kw), np.float32)
            preds[arm].extend(probe.predict(features(w))[0] for w in wav)
        print(f"combo {ci + 1}/{len(COMBOS)}: {cap}"
              f"{'  [HELD OUT]' if combo in HELD_OUT else ''}", flush=True)

    truths = np.stack(truths)
    held = np.asarray(held_mask)
    # Shuffled-caption control: same guided samples scored against a
    # rotated combo assignment (what accuracy looks like with NO semantic
    # link between caption and audio).
    rot = np.concatenate([truths[SEEDS:], truths[:SEEDS]])

    for arm in arms:
        p = np.stack(preds[arm])
        out[arm] = {
            "all": score(p, truths),
            "seen_combos": score(p[~held], truths[~held]),
            "held_out_combos": score(p[held], truths[held]),
        }
    out["shuffled_control"] = score(np.stack(preds["guided"]), rot)

    g = out["guided"]["all"]["per_ingredient_acc"]
    ctl = out["shuffled_control"]["per_ingredient_acc"]
    ho = out["guided"]["held_out_combos"]["per_ingredient_acc"]
    out["verdict"] = (
        "semantic text conditioning works"
        if g > ctl + 0.1 and ho > ctl else "no clear semantic effect")
    print(json.dumps(out))
    print("CC EVAL DONE")


if __name__ == "__main__":
    main()
