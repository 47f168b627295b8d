"""Sample-quality metrics (eval.py) + the `eval` CLI subcommand.

The reference ships no evaluation tooling; these are the metrics behind
every PERFORMANCE.md quality claim, so they get their own contract tests:
identity => 0, white noise far from tonal corpus, diversity collapse
detection, LSD dB scaling.
"""
import json

import numpy as np
import pytest

from audio_diffusion_tpu.eval import (band_distance, band_profile,
                                      log_spectral_distance,
                                      pairwise_diversity)

SR = 16000


def _tone(freq, n=SR, amp=0.5, sr=SR):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_band_profile_shape_and_tone_peak():
    prof = band_profile(_tone(440)[None], SR)
    # Third-octave bands from 20 Hz to Nyquist: floor(log2(8000/20)*3)+1.
    assert prof.ndim == 1 and 20 <= len(prof) <= 30
    # The 440 Hz band must dominate: band edges 20*2^(k/3).
    edges = 20 * 2 ** (np.arange(len(prof) + 1) / 3.0)
    k440 = int(np.searchsorted(edges, 440.0)) - 1
    assert prof.argmax() == k440


def test_band_distance_identity_and_noise():
    corpus = np.stack([_tone(220 + 110 * i) for i in range(4)])[:, None]
    cp = band_profile(corpus, SR)
    assert band_distance(cp, cp) == 0.0
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal((2, 1, SR)) * 0.35).astype(np.float32)
    d_noise = band_distance(band_profile(noise, SR), cp)
    # Tonal subset of the same corpus stays much closer than white noise.
    d_sub = band_distance(band_profile(corpus[:2], SR), cp)
    assert d_noise > 2 * d_sub and d_noise > 0.5


def test_pairwise_diversity_detects_collapse():
    distinct = np.stack([_tone(200), _tone(400), _tone(800)])[:, None]
    collapsed = np.stack([_tone(300)] * 3)[:, None]
    assert (pairwise_diversity(distinct, SR)
            > 10 * pairwise_diversity(collapsed, SR))


def test_lsd_identity_and_gain():
    x = _tone(330, n=8192)
    assert log_spectral_distance(x, x) == 0.0
    # A pure 2x gain shifts every power bin by 10*log10(4) ~= 6.02 dB.
    # Broadband noise keeps all bins above the numeric floor (a pure
    # tone's sidelobe bins would be floored and dilute the distance).
    rng = np.random.default_rng(5)
    n = (rng.standard_normal(8192) * 0.3).astype(np.float32)
    lsd = log_spectral_distance(2.0 * n, n)
    assert abs(lsd - 20 * np.log10(2.0)) < 0.1


def test_cli_eval(tmp_path, capsys):
    from audio_diffusion_tpu.cli import main
    from audio_diffusion_tpu.data import wav_write

    ref = tmp_path / "ref"
    gen = tmp_path / "gen"
    ref.mkdir()
    gen.mkdir()
    for i in range(3):
        wav_write(ref / f"r{i}.wav", _tone(220 * (i + 1))[None], SR)
    # One in-distribution sample, one white-noise sample.
    wav_write(gen / "good.wav", _tone(440)[None], SR)
    rng = np.random.default_rng(1)
    wav_write(gen / "noise.wav",
              (rng.standard_normal((1, SR)) * 0.3).astype(np.float32), SR)

    main(["eval", "--ref", str(ref), "--samples", str(gen)])
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["num_samples"] == 2
    assert summary["sample_rate"] == SR
    assert summary["pairwise_diversity"] > 0
    assert summary["band_dist_worst"] >= summary["band_dist_mean"] > 0
    # Per-file lines name each sample.
    assert any("good.wav" in ln for ln in out)
    assert any("noise.wav" in ln for ln in out)


def test_cli_eval_empty_dir(tmp_path):
    from audio_diffusion_tpu.cli import main

    (tmp_path / "ref").mkdir()
    (tmp_path / "gen").mkdir()
    with pytest.raises(SystemExit, match="no .wav files"):
        main(["eval", "--ref", str(tmp_path / "ref"),
              "--samples", str(tmp_path / "gen")])


# ---------------------------------------------------------------- Fréchet
def _toneset(freqs, sr=8000, n=2048, amp=0.2, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    out = []
    for f in freqs:
        f = f * (1 + jitter * rng.standard_normal())
        out.append((amp * np.sin(2 * np.pi * f * t)).astype(np.float32))
    return np.stack(out)[:, None, :]  # [n_items, 1, frames]


def test_frechet_band_distance_identity_and_ordering():
    from audio_diffusion_tpu.eval import frechet_band_distance

    freqs = [100, 200, 400, 800, 1600, 220, 330, 550]
    a = _toneset(freqs, jitter=0.02, seed=1)
    b = _toneset(freqs, jitter=0.02, seed=2)   # same distribution
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(a.shape) * float(a.std())).astype(
        np.float32)

    same = frechet_band_distance(a, a, 8000)
    close = frechet_band_distance(a, b, 8000)
    far = frechet_band_distance(a, noise, 8000)
    assert same == pytest.approx(0.0, abs=1e-6)
    assert close < far  # matched distributions beat white noise
    assert far > 1.0


def test_frechet_band_distance_heterogeneity_robust():
    """The motivating case: a heterogeneous reference set. A sample set
    drawn from the SAME mixture must beat white noise, even though noise
    is closer to the MEAN profile than individual real items are."""
    from audio_diffusion_tpu.eval import (band_distance, band_profile,
                                          frechet_band_distance)

    lows = _toneset([60, 70, 80, 90], seed=3, jitter=0.05)
    highs = _toneset([2000, 2400, 2800, 3200], seed=4, jitter=0.05)
    ref = np.concatenate([lows, highs])
    gen = np.concatenate([_toneset([65, 85], seed=5, jitter=0.05),
                          _toneset([2200, 3000], seed=6, jitter=0.05)])
    rng = np.random.default_rng(1)
    noise = (rng.standard_normal(gen.shape) * float(ref.std())).astype(
        np.float32)

    fbd_gen = frechet_band_distance(ref, gen, 8000)
    fbd_noise = frechet_band_distance(ref, noise, 8000)
    assert fbd_gen < fbd_noise

    # Real items are FAR from the corpus-mean profile (the heterogeneity
    # that defeats per-file metrics) yet the set-level FBD still ranks
    # the matched mixture clearly better.
    mean_prof = band_profile(ref, 8000)
    d_real = band_distance(band_profile(lows[0], 8000), mean_prof)
    assert d_real > 1.0
