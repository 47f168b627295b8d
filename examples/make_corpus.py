"""Synthesize a rich multi-file WAV training corpus (no external data).

The environment has no downloadable audio (zero egress), so this builds a
structured, learnable 48 kHz stereo corpus from primitives: chord pads with
detuned partials, plucked melodies (Karplus-Strong), FM basses, drum-like
transients over a tempo grid, and filtered-noise sweeps. Each file mixes a
random subset, so the corpus has shared statistics (scales, tempo, timbre
families) a diffusion model can learn, while files stay distinct.

``--style`` picks the generator family — statistically DISTINCT corpora for
cross-corpus quality studies (PERFORMANCE.md encoder-reuse):

- ``music`` (default): tonal/harmonic — pads, plucked melodies, FM bass.
- ``percussive``: broadband transients — drums, tom fills, click trains,
  noise sweeps; no sustained tonal content.

Usage::

    python examples/make_corpus.py --out /tmp/corpus --files 32 --seconds 10
    python examples/make_corpus.py --out corpus_perc --style percussive
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from audio_diffusion_tpu.data import wav_write  # noqa: E402

SR = 48_000
# A major-pentatonic pitch set keeps random melodies consonant.
SCALE_HZ = 220.0 * 2.0 ** (np.array([0, 2, 4, 7, 9, 12, 14, 16]) / 12.0)


def _env(n, attack, decay, rng=None):
    a = int(attack * SR)
    t = np.arange(n)
    e = np.minimum(t / max(a, 1), 1.0) * np.exp(-np.maximum(t - a, 0)
                                                / (decay * SR))
    return e.astype(np.float32)


def chord_pad(rng, n):
    out = np.zeros(n, np.float32)
    t = np.arange(n) / SR
    for f in rng.choice(SCALE_HZ, rng.integers(2, 4), replace=False):
        for mult, amp in ((1, 1.0), (2, 0.4), (3, 0.2)):
            det = 1.0 + rng.normal(0, 2e-4)
            ph = rng.uniform(0, 2 * np.pi)
            out += amp * np.sin(2 * np.pi * f * mult * det * t + ph) \
                * (1 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.1, 0.5) * t))
    return out * _env(n, 0.5, 6.0) * 0.1


def pluck(rng, n, f):
    """Karplus-Strong plucked string."""
    period = int(SR / f)
    buf = rng.standard_normal(period).astype(np.float32)
    out = np.empty(n, np.float32)
    for i in range(n):
        out[i] = buf[i % period]
        buf[i % period] = 0.996 * 0.5 * (buf[i % period]
                                         + buf[(i + 1) % period])
    return out


def melody(rng, n):
    out = np.zeros(n, np.float32)
    step = int(SR * rng.choice([0.25, 0.5]))
    for start in range(0, n, step):
        f = rng.choice(SCALE_HZ) * rng.choice([0.5, 1.0, 1.0, 2.0])
        seg = min(step, n - start)
        out[start:start + seg] += pluck(rng, seg, f) * 0.25
    return out


def fm_bass(rng, n):
    t = np.arange(n) / SR
    f = rng.choice(SCALE_HZ) / 4
    idx = rng.uniform(1.0, 4.0)
    mod = np.sin(2 * np.pi * f * rng.choice([0.5, 1.0, 2.0]) * t)
    return (np.sin(2 * np.pi * f * t + idx * mod)
            * _env(n, 0.01, 2.0)).astype(np.float32) * 0.15


def drums(rng, n):
    out = np.zeros(n, np.float32)
    beat = int(SR * 60 / rng.choice([90, 120, 140]))
    t_k = np.arange(int(0.2 * SR)) / SR
    kick = np.sin(2 * np.pi * (50 + 60 * np.exp(-t_k * 30)) * t_k) \
        * np.exp(-t_k * 18)
    t_h = np.arange(int(0.05 * SR)) / SR
    for start in range(0, n, beat):
        seg = min(len(kick), n - start)
        out[start:start + seg] += kick[:seg] * 0.5
        off = start + beat // 2
        if off < n:
            hat = rng.standard_normal(len(t_h)) * np.exp(-t_h * 80)
            seg = min(len(hat), n - off)
            out[off:off + seg] += hat[:seg].astype(np.float32) * 0.15
    return out


def noise_sweep(rng, n):
    """Band-passed noise with a moving center frequency (one-pole chain)."""
    x = rng.standard_normal(n).astype(np.float32)
    f0, f1 = sorted(rng.uniform(200, 8000, 2))
    fc = np.geomspace(f0, f1, n).astype(np.float32)
    a = np.exp(-2 * np.pi * fc / SR)
    lo = np.empty(n, np.float32)
    acc = 0.0
    for i in range(n):  # low-pass with time-varying pole
        acc = a[i] * acc + (1 - a[i]) * x[i]
        lo[i] = acc
    return (lo - np.concatenate([[0], lo[:-1]])) * 2.0 * 0.3


def clicks(rng, n):
    """Clap/click train: broadband bursts with random micro-timing."""
    out = np.zeros(n, np.float32)
    t_c = np.arange(int(0.03 * SR)) / SR
    n_events = int(rng.uniform(2.0, 8.0) * n / SR)
    for _ in range(n_events):
        start = int(rng.integers(0, max(n - len(t_c), 1)))
        burst = rng.standard_normal(len(t_c)).astype(np.float32) \
            * np.exp(-t_c * rng.uniform(100, 400), dtype=np.float32)
        out[start:start + len(burst)] += burst * rng.uniform(0.2, 0.5)
    return out


def tom_fill(rng, n):
    """Pitched drum hits over a tempo grid (decaying-pitch sine bursts)."""
    out = np.zeros(n, np.float32)
    beat = int(SR * 60 / rng.choice([100, 130, 160]) / 2)
    t_h = np.arange(int(0.15 * SR)) / SR
    for start in range(0, n, beat):
        if rng.random() > 0.7:
            continue  # syncopation: drop ~30% of grid slots
        f = rng.choice([80.0, 110.0, 150.0, 200.0])
        hit = np.sin(2 * np.pi * (f + 30 * np.exp(-t_h * 25)) * t_h) \
            * np.exp(-t_h * rng.uniform(10, 25))
        seg = min(len(hit), n - start)
        out[start:start + seg] += hit[:seg].astype(np.float32) * 0.4
    return out


GENERATORS = (chord_pad, melody, fm_bass, drums, noise_sweep)
STYLES = {
    "music": GENERATORS,
    "percussive": (drums, tom_fill, clicks, noise_sweep),
}


def make_file(rng, seconds, gens=GENERATORS):
    n = int(seconds * SR)
    picks = rng.choice(len(gens), rng.integers(2, 4), replace=False)
    mono = np.zeros(n, np.float32)
    for gi in picks:
        mono += gens[gi](rng, n)
    # Stereo: mid/side with a slowly moving pan.
    pan = 0.2 * np.sin(2 * np.pi * rng.uniform(0.05, 0.2)
                       * np.arange(n) / SR).astype(np.float32)
    stereo = np.stack([mono * (1 + pan), mono * (1 - pan)])
    peak = np.abs(stereo).max()
    return stereo * (0.7 / max(peak, 1e-6))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--style", choices=sorted(STYLES), default="music")
    args = ap.parse_args(argv)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(args.files):
        rng = np.random.default_rng(args.seed * 10_000 + i)
        wav_write(out / f"corpus_{i:03d}.wav",
                  make_file(rng, args.seconds, STYLES[args.style]), SR)
        print(f"wrote {i + 1}/{args.files}", end="\r", flush=True)
    print(f"\n{args.files} files x {args.seconds}s {args.style} stereo @ "
          f"{SR} Hz -> {out}")


if __name__ == "__main__":
    main()
