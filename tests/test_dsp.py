"""DSP parity tests against CPU torch as the numeric oracle.

- conv1d / conv_transpose1d geometry + values vs torch.nn.functional
- stft vs torch.stft (center=False, periodic hann — the torchaudio
  Spectrogram configuration the reference uses, components.py:206-212)
- windowed-sinc resample vs the reference algorithm (utils.py:82-109)
  evaluated in torch
- mel filterbank structural properties (torchaudio is not installed in this
  environment; the HTK formula is checked by construction + properties)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from audio_diffusion_tpu.dsp import MelSpectrogram, melscale_fbanks, stft
from audio_diffusion_tpu.dsp.resample import resample
from audio_diffusion_tpu.ops.conv import conv1d, conv_transpose1d


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 37, 5)).astype(np.float32)  # [B, L, C]
    w = rng.standard_normal((4, 5, 7)).astype(np.float32)  # [K, Cin, Cout]
    for stride, pad, dil in [(1, 0, 1), (2, 3, 1), (3, 1, 2)]:
        ours = conv1d(jnp.asarray(x), jnp.asarray(w), stride, pad, dil)
        theirs = F.conv1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w.transpose(2, 1, 0)),
            stride=stride, padding=pad, dilation=dil,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 19, 6)).astype(np.float32)
    w = rng.standard_normal((8, 6, 3)).astype(np.float32)  # [K, Cin, Cout]
    for stride, pad in [(1, 0), (4, 2), (2, 3)]:
        ours = conv_transpose1d(jnp.asarray(x), jnp.asarray(w), stride, pad)
        theirs = F.conv_transpose1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w.transpose(1, 2, 0)),  # torch: [Cin, Cout, K]
            stride=stride, padding=pad,
        ).numpy().transpose(0, 2, 1)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_stft_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    n_fft, hop = 128, 32
    ours = stft(jnp.asarray(x), n_fft, hop)
    theirs = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop, win_length=n_fft,
        window=torch.hann_window(n_fft, periodic=True), center=False,
        normalized=False, onesided=True, return_complex=True).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(np.abs(ours), np.abs(theirs),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(ours.real, theirs.real, atol=1e-3, rtol=1e-3)


def test_stft_win_length_padding():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 512)).astype(np.float32)
    n_fft, hop, win = 64, 16, 32
    ours = stft(jnp.asarray(x), n_fft, hop, win)
    theirs = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win, periodic=True), center=False,
        return_complex=True).numpy()
    np.testing.assert_allclose(np.abs(ours), np.abs(theirs),
                               atol=1e-3, rtol=1e-3)


def _torch_reference_resample(waveforms, factor_in, factor_out,
                              rolloff=0.99, lowpass_filter_width=6):
    """The reference's resample algorithm (utils.py:82-109) as the oracle."""
    from math import ceil, pi

    b, _c, length = waveforms.shape
    length_target = int(factor_out * length / factor_in)
    base_factor = min(factor_in, factor_out) * rolloff
    width = ceil(lowpass_filter_width * factor_in / base_factor)
    idx = torch.arange(-width, width + factor_in,
                       dtype=torch.float64)[None, None] / factor_in
    t = torch.arange(0, -factor_out, step=-1,
                     dtype=torch.float64)[:, None, None] / factor_out + idx
    t = (t * base_factor).clamp(-lowpass_filter_width,
                                lowpass_filter_width) * pi
    window = torch.cos(t / lowpass_filter_width / 2) ** 2
    scale = base_factor / factor_in
    kernels = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64),
                          t.sin() / t)
    kernels = (kernels * window * scale).float()
    c = waveforms.shape[1]
    wf = waveforms.reshape(b * c, length)
    wf = F.pad(wf, (width, width + factor_in))
    resampled = F.conv1d(wf[:, None], kernels, stride=factor_in)  # [(bc),k,l]
    # "(b c) k l -> b c (l k)" polyphase interleave
    resampled = resampled.permute(0, 2, 1).reshape(b, c, -1)
    return resampled[..., :length_target]


def test_resample_matches_reference_algorithm():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 1, 256)).astype(np.float32)
    for fi, fo in [(1, 4), (4, 1), (2, 3)]:
        ours = np.asarray(resample(jnp.asarray(x), fi, fo))
        theirs = _torch_reference_resample(
            torch.from_numpy(x), fi, fo).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_resample_preserves_tone():
    # A pure low-frequency tone should survive down->up resampling.
    t = np.arange(4096) / 4096
    tone = np.sin(2 * np.pi * 16 * t).astype(np.float32)[None, None]
    x = jnp.asarray(tone)
    down = resample(x, factor_in=4, factor_out=1)
    up = resample(down, factor_in=1, factor_out=4)
    err = np.mean((np.asarray(up)[..., 64:-64] - tone[..., 64:-64]) ** 2)
    assert err < 1e-3


def test_melscale_fbanks_properties():
    fb = melscale_fbanks(n_freqs=513, n_mels=80, sample_rate=48000)
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # Triangles: each filter has one peak, interior filters sum overlap to ~1
    # in mel-dense regions; every filter is nonzero somewhere.
    assert np.all(fb.max(axis=0) > 0)
    # Filter centers increase monotonically.
    centers = fb.argmax(axis=0)
    assert np.all(np.diff(centers) >= 0)


def test_mel_spectrogram_shapes_and_norms():
    mel = MelSpectrogram(n_fft=128, hop_length=32, win_length=128,
                         sample_rate=16000, n_mel_channels=16,
                         normalize_log=True)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 2, 1024)).astype(np.float32))
    out = mel(x)
    assert out.shape == (2, 2, 16, 1024 // 32)
    assert bool(jnp.all(jnp.isfinite(out)))
    mel_pow = MelSpectrogram(n_fft=128, hop_length=32, win_length=128,
                             sample_rate=16000, n_mel_channels=16,
                             normalize=True)
    out2 = mel_pow(x)
    assert float(out2.max()) <= 1.0 + 1e-5 and float(out2.min()) >= -1.0 - 1e-5


def test_istft_inverts_stft():
    """Window-square-normalized OLA inverts the center=False STFT."""
    from audio_diffusion_tpu.dsp import istft, stft

    x = jax.random.normal(jax.random.key(0), (2, 1, 4096))
    spec = stft(x, n_fft=256, hop_length=64)
    y = istft(spec, n_fft=256, hop_length=64, length=4096)
    # Interior is exact (COLA); the first/last partial-coverage edges are
    # still finite but less constrained.
    np.testing.assert_allclose(np.asarray(y[..., 256:-256]),
                               np.asarray(x[..., 256:-256]),
                               atol=1e-4)
    assert np.isfinite(np.asarray(y)).all()


def test_griffin_lim_reconstructs_tone():
    """GL from magnitude-only recovers a sinusoid up to sign/phase: the
    reconstruction's spectrum must concentrate at the true frequency."""
    from audio_diffusion_tpu.dsp import griffin_lim, stft

    sr, t_len = 8000, 4096
    t = jnp.arange(t_len) / sr
    x = jnp.sin(2 * jnp.pi * 440.0 * t)[None]
    mag = jnp.abs(stft(x, n_fft=512, hop_length=128))
    y = np.asarray(griffin_lim(mag, n_fft=512, hop_length=128, n_iter=32,
                               length=t_len))[0]
    spec = np.abs(np.fft.rfft(y * np.hanning(t_len)))
    peak_bin = int(np.argmax(spec))
    true_bin = round(440.0 * t_len / sr)
    assert abs(peak_bin - true_bin) <= 1, (peak_bin, true_bin)
    # Energy concentration: the tone dominates the reconstruction.
    band = spec[true_bin - 3:true_bin + 4]
    assert band.sum() / spec.sum() > 0.8
