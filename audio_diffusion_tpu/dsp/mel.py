"""On-device STFT + mel front end (XLA-native, no torchaudio).

Replaces the reference's torchaudio Spectrogram/MelScale pipeline
(reference components.py:188-236; SURVEY.md §2.11 "on-device XLA STFT" north
star). Semantics matched to the exact torchaudio defaults the reference uses:

- Spectrogram(n_fft, hop_length, win_length, center=False, power=None):
  periodic Hann window, no centering, one-sided complex STFT; magnitude is
  taken by the caller (reference components.py:224-226).
- MelScale(n_mels, n_stft=n_fft//2+1, sample_rate): HTK mel scale
  (mel = 2595·log10(1 + f/700)), f_min=0, f_max=sample_rate/2, no norm,
  triangular filters — torchaudio's defaults.

Framing is a strided gather + windowed rfft; the mel projection is a plain
[freq, mel] matmul (MXU). Numerically validated against torch/torchaudio on
CPU in tests/test_dsp.py.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["stft", "istft", "griffin_lim", "melscale_fbanks",
           "MelSpectrogram"]


def _hann_window(win_length: int) -> Array:
    """Periodic Hann window (torch.hann_window(periodic=True))."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))


def stft(x: Array, n_fft: int, hop_length: int,
         win_length: Optional[int] = None) -> Array:
    """One-sided complex STFT of [..., t], center=False.

    Returns [..., n_fft//2+1, n_frames] (torch.stft layout).
    """
    win_length = win_length or n_fft
    t = x.shape[-1]
    assert t >= n_fft, (
        f"signal length {t} is shorter than n_fft {n_fft} (center=False "
        "STFT needs at least one full frame)")
    num_frames = 1 + (t - n_fft) // hop_length
    window = _framing_window(n_fft, win_length)
    # Strided frame gather: [num_frames, n_fft] indices.
    idx = (jnp.arange(num_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = x[..., idx]  # [..., num_frames, n_fft]
    frames = frames * window
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., num_frames, n_freq]
    return jnp.swapaxes(spec, -1, -2)  # [..., n_freq, num_frames]


def _framing_window(n_fft: int, win_length: int) -> Array:
    window = _hann_window(win_length)
    if win_length < n_fft:  # torch zero-pads the window symmetrically
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    return window


def istft(spec: Array, n_fft: int, hop_length: int,
          win_length: Optional[int] = None,
          length: Optional[int] = None) -> Array:
    """Inverse of :func:`stft` (center=False): windowed overlap-add with
    window-square normalization (the least-squares inverse for any COLA
    window/hop). spec: [..., n_fft//2+1, n_frames] -> [..., t]."""
    win_length = win_length or n_fft
    window = _framing_window(n_fft, win_length)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window  # [..., num_frames, n_fft]
    num_frames = frames.shape[-2]
    t = length or (num_frames - 1) * hop_length + n_fft
    idx = (jnp.arange(num_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    out = jnp.zeros(frames.shape[:-2] + (t,), frames.dtype)
    out = out.at[..., idx].add(frames)
    wsq = jnp.zeros((t,), frames.dtype).at[idx].add(
        jnp.broadcast_to(window**2, idx.shape))
    return out / jnp.maximum(wsq, 1e-11)


def griffin_lim(magnitude: Array, n_fft: int, hop_length: int,
                win_length: Optional[int] = None, n_iter: int = 32,
                length: Optional[int] = None) -> Array:
    """Classical phase reconstruction (Griffin & Lim 1984) from an STFT
    magnitude [..., n_fft//2+1, n_frames] -> waveform [..., t].

    A zero-parameter baseline vocoder next to DiffusionVocoder: repeatedly
    project between the magnitude constraint and the set of consistent
    STFTs. Deterministic (zero-phase init); jit-compatible (fixed n_iter
    fori_loop)."""
    import jax

    mag = magnitude.astype(jnp.float32)

    def _unit_phasor(angles):
        # NOT jnp.exp(1j*angles): complex exp is UNIMPLEMENTED on the TPU
        # backend; cos/sin + lax.complex lowers everywhere.
        return jax.lax.complex(jnp.cos(angles), jnp.sin(angles))

    def body(_, angles):
        x = istft(mag * _unit_phasor(angles), n_fft, hop_length,
                  win_length, length=length)
        rebuilt = stft(x, n_fft, hop_length, win_length)
        # stft of a len-`length` signal can lose a trailing partial frame;
        # keep the previous phase there.
        f = rebuilt.shape[-1]
        new = jnp.angle(rebuilt)
        return jnp.concatenate([new, angles[..., f:]], axis=-1) \
            if f < angles.shape[-1] else new[..., :angles.shape[-1]]

    angles = jnp.zeros(mag.shape, jnp.float32)
    angles = jax.lax.fori_loop(0, n_iter, body, angles)
    return istft(mag * _unit_phasor(angles), n_fft, hop_length, win_length,
                 length=length)


def _hz_to_mel_htk(freq: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + freq / 700.0)


def _mel_to_hz_htk(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def melscale_fbanks(n_freqs: int, n_mels: int, sample_rate: int,
                    f_min: float = 0.0,
                    f_max: Optional[float] = None) -> np.ndarray:
    """Triangular HTK mel filterbank [n_freqs, n_mels] (torchaudio
    melscale_fbanks with norm=None, mel_scale='htk'). Pure numpy — computed
    once at module build, constant-folded under jit."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(np.array(f_min)),
                        _hz_to_mel_htk(np.array(f_max)), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


class MelSpectrogram:
    """Waveform -> mel front end (reference components.py:188-236 parity).

    Parameterless (the filterbank is a precomputed constant), so this is a
    plain callable, not a linen module. Input [b, c, t] (or any leading
    dims + time), output [b, c, n_mels, n_frames].
    """

    def __init__(
        self,
        n_fft: int,
        hop_length: int,
        win_length: int,
        sample_rate: int,
        n_mel_channels: int,
        center: bool = False,
        normalize: bool = False,
        normalize_log: bool = False,
    ):
        assert not center, "reference uses center=False (components.py:210)"
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.sample_rate = sample_rate
        self.n_mel_channels = n_mel_channels
        self.normalize = normalize
        self.normalize_log = normalize_log
        # Reflect-pad (n_fft − hop)/2 on both sides (components.py:201, 222).
        self.padding = (n_fft - hop_length) // 2
        self._fbanks = jnp.asarray(melscale_fbanks(
            n_freqs=n_fft // 2 + 1, n_mels=n_mel_channels,
            sample_rate=sample_rate))

    def __call__(self, waveform: Array) -> Array:
        leading = waveform.shape[:-1]
        x = waveform.reshape((-1, waveform.shape[-1]))  # pack "* t"
        x = jnp.pad(x, ((0, 0), (self.padding, self.padding)), mode="reflect")
        spec = stft(x, self.n_fft, self.hop_length, self.win_length)
        magnitude = jnp.abs(spec)  # [N, n_freq, frames]
        mel = jnp.einsum("nfl,fm->nml", magnitude,
                         self._fbanks.astype(magnitude.dtype))
        if self.normalize:
            mel = mel / jnp.max(mel)
            mel = 2.0 * jnp.power(mel, 0.25) - 1.0
        if self.normalize_log:
            mel = jnp.log(jnp.clip(mel, min=1e-5))
        return mel.reshape(leading + mel.shape[1:])  # unpack "* f l"
