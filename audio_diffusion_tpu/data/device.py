"""Device-resident corpus: upload the training data ONCE, crop on device.

The reference's training story (reference README.md:37-44) assumes a host
dataloader feeding every step — the right design when the accelerator is
PCIe-attached. On a remote/tunnel-attached TPU the per-step host→device
batch upload is (a) the measured throughput bound of remote training
(PERFORMANCE.md: 16.8 MB/step f32; PCM16 passthrough cut it 4×) and
(b) *leaked by the tunnel client's transfer staging*: host RSS grows by
the full uploaded byte count of every call (measured 8.0–8.1 MB/iter for
an 8 MB batch across same-object reuse, gc.collect, and explicit
``device.delete()`` — the staging buffers are never reclaimed), which
OOM-killed a 30k-step flagship run at ~19k steps / 130 GB RSS.

:class:`DeviceCorpus` removes the per-step upload entirely: the corpus is
concatenated into one HBM-resident ``[channels, total_frames]`` array
(int16 for PCM16 sources — lossless, half of f32's footprint), and every
batch is produced by a jitted on-device program that draws (file, offset)
uniformly — the same two-level distribution as ``AudioDataset`` — and
gathers ``[batch, channels, crop]`` windows with ``lax.dynamic_slice``.
A training step then uploads only a folded PRNG counter (bytes, not
megabytes); batches never touch the host.

Usage (drop-in for ``AudioDataset`` in ``Trainer.fit``)::

    dc = DeviceCorpus("wavs/", crop_frames=2**18, batch_size=8)
    trainer.fit(iter(dc), num_steps=30_000)

Sampling differs from ``AudioDataset`` only in the RNG stream (jax
threefry on device vs numpy philox on host); both draw file uniform then
offset uniform. int16 corpora yield int16 batches — the train step's
in-graph ``dequant_pcm16`` (parallel/train_step.py:194-197) reproduces
the float path bit-exactly.
"""
from __future__ import annotations

from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .loader import AudioDataset, wav_read

__all__ = ["DeviceCorpus"]


class DeviceCorpus:
    """HBM-resident random-crop sampler over a directory of WAV files.

    Parameters mirror :class:`AudioDataset` (source, crop_frames,
    batch_size, channels, seed, host_id/num_hosts file sharding, dtype
    auto/int16/float32); ``max_bytes`` guards HBM: construction refuses a
    corpus whose device footprint would exceed it (default 2 GiB —
    training state needs the rest; use ``AudioDataset`` for bigger sets).

    ``mesh`` (a ``('data', 'model')`` mesh from
    :func:`~audio_diffusion_tpu.parallel.create_mesh`): the corpus and
    index arrays replicate across all devices and every batch comes out
    already sharded over ``'data'`` — each chip gathers its own batch
    shard from its local replica, so multi-chip DP training never moves
    batch bytes between devices. ``batch_size`` must be divisible by the
    data-axis size.
    """

    def __init__(
        self,
        source,
        crop_frames: int,
        batch_size: int,
        channels: Optional[int] = None,
        seed: int = 0,
        host_id: Optional[int] = None,
        num_hosts: Optional[int] = None,
        dtype: str = "auto",
        max_bytes: int = 2 << 30,
        mesh=None,
    ):
        # Reuse AudioDataset's discovery/validation/probe pass: file list,
        # channel resolution, too-short/mismatch skips, PCM16 detection.
        ds = AudioDataset(source, crop_frames=crop_frames,
                          batch_size=batch_size, channels=channels,
                          seed=seed, host_id=host_id, num_hosts=num_hosts,
                          dtype=dtype)
        self.files = ds.files
        self.frames = ds.frames
        self.channels = ds.channels
        self.sample_rate = ds.sample_rate
        self.dtype = ds.dtype
        self.crop_frames = crop_frames
        self.batch_size = batch_size

        total = int(np.sum(self.frames))
        nbytes = total * self.channels * self.dtype.itemsize
        if nbytes > max_bytes:
            raise ValueError(
                f"corpus is {nbytes/2**30:.2f} GiB on device "
                f"(> max_bytes={max_bytes/2**30:.2f} GiB): use the host "
                "AudioDataset, or raise max_bytes if HBM allows")

        # Concatenate along time. int16 sources decode losslessly through
        # the native PCM16 batch reader (one full-length "crop" per file).
        parts = []
        for f, n in zip(self.files, self.frames):
            if self.dtype == np.int16:
                parts.append(_read_full_i16(f, self.channels, n))
            else:
                parts.append(wav_read(f))
        flat = np.concatenate(parts, axis=1)  # [C, total]

        starts = np.cumsum([0] + self.frames[:-1]).astype(np.int32)
        max_off = (np.asarray(self.frames, np.int32) - crop_frames)

        # On a mesh, REPLICATE the corpus/index arrays over every device
        # and emit batches sharded over 'data': each chip then gathers its
        # own batch shard locally, with no cross-device batch scatter per
        # step. Single-device (mesh=None): plain placement.
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._corpus = jax.device_put(flat, rep)
            self._starts = jax.device_put(starts, rep)
            self._max_off = jax.device_put(max_off, rep)
            # jit out_shardings needs exact divisibility (unlike the train
            # step's internal GSPMD constraint, which pads): small batches
            # on big meshes fall back to replicated output and let the
            # train step lay the batch out.
            if batch_size % mesh.shape["data"] == 0:
                self._out_sharding = NamedSharding(mesh,
                                                   P("data", None, None))
            else:
                self._out_sharding = rep
        else:
            self._corpus = jax.device_put(flat)
            self._starts = jax.device_put(starts)
            self._max_off = jax.device_put(max_off)
            self._out_sharding = None
        self._base_key = jax.random.key(seed)
        self._crop_jit = jax.jit(
            partial(_crop_batch, batch=batch_size, crop=crop_frames),
            out_shardings=self._out_sharding)

    @property
    def device_bytes(self) -> int:
        return int(self._corpus.nbytes)

    def batch_at(self, step: int):
        """The batch for one step index (device array [B, C, crop];
        int16 when the corpus is PCM16 — dequantized in-graph by the
        train step). Pure in `step`, so any iteration order or resume
        point reproduces the same data."""
        return self._crop_jit(self._corpus, self._starts, self._max_off,
                              jax.random.fold_in(self._base_key, step))

    def __iter__(self) -> Iterator:
        step = 0
        while True:
            yield self.batch_at(step)
            step += 1


def _read_full_i16(path, channels: int, frames: int) -> np.ndarray:
    """Decode one PCM16 file fully, losslessly, via the native batch
    reader (a single full-length crop at offset 0)."""
    import ctypes

    from .loader import _load_lib

    lib = _load_lib()
    out = np.empty((1, channels, frames), np.int16)
    paths = (ctypes.c_char_p * 1)(str(path).encode())
    starts = np.zeros(1, np.int64)
    err = lib.wav_read_batch_i16(
        paths, starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1, channels, frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    if err != 0:
        raise IOError(f"wav_read_batch_i16({path}) failed with code {err}")
    return out[0]


def _crop_batch(corpus, starts, max_off, key, *, batch: int, crop: int):
    """Jitted on-device batch assembly: per-element uniform (file, offset)
    then a dynamic-slice gather. Matches AudioDataset._make_batch's
    distribution (file uniform over usable files, offset uniform over
    [0, frames-crop])."""
    n_files = starts.shape[0]
    c = corpus.shape[0]
    kf, ko = jax.random.split(key)
    idx = jax.random.randint(kf, (batch,), 0, n_files)
    # Offset via floor(u * (max_off+1)): uniform under a traced per-file
    # bound (randint needs concrete bounds).
    u = jax.random.uniform(ko, (batch,))
    off = (u * (max_off[idx] + 1).astype(jnp.float32)).astype(jnp.int32)
    off = jnp.minimum(off, max_off[idx])  # u ~ 1.0 edge
    flat = starts[idx] + off

    def one(s):
        return lax.dynamic_slice(corpus, (0, s), (c, crop))

    return jax.vmap(one)(flat)
