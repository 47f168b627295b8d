"""DeviceCorpus: HBM-resident corpus with on-device random cropping."""
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu.data import AudioDataset, DeviceCorpus, wav_read


def _write_pcm16(path, data_i16, sr=8000):
    """data_i16: [channels, frames] int16."""
    with wave.open(str(path), "wb") as w:
        w.setnchannels(data_i16.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.ascontiguousarray(data_i16.T).tobytes())


def _make_corpus(tmp_path, n_files=3, frames=400, channels=2):
    """Each sample encodes its (file, position): value = file*1000 + pos
    (int16-exact), so any crop can be located and verified."""
    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(n_files):
        pos = np.arange(frames, dtype=np.int16)
        data = np.stack([i * 1000 + pos] * channels)
        data[1:] += 7  # channels distinguishable
        _write_pcm16(d / f"f{i}.wav", data.astype(np.int16))
    return d


def test_crops_are_real_file_windows(tmp_path):
    d = _make_corpus(tmp_path, n_files=3, frames=400)
    dc = DeviceCorpus(d, crop_frames=64, batch_size=16, seed=1)
    assert dc.dtype == np.int16  # PCM16 corpus -> lossless int16 residence
    assert dc.device_bytes == 3 * 400 * 2 * 2
    batch = np.asarray(dc.batch_at(0))
    assert batch.shape == (16, 2, 64) and batch.dtype == np.int16
    for el in batch:
        v0 = int(el[0, 0])
        fid, pos = divmod(v0, 1000)
        assert 0 <= fid < 3
        assert pos + 64 <= 400  # window never crosses the file end
        np.testing.assert_array_equal(
            el[0], (fid * 1000 + pos + np.arange(64)).astype(np.int16))
        np.testing.assert_array_equal(el[1], el[0] + 7)


def test_deterministic_and_step_addressable(tmp_path):
    d = _make_corpus(tmp_path)
    a = DeviceCorpus(d, crop_frames=64, batch_size=4, seed=5)
    b = DeviceCorpus(d, crop_frames=64, batch_size=4, seed=5)
    np.testing.assert_array_equal(np.asarray(a.batch_at(3)),
                                  np.asarray(b.batch_at(3)))
    # The iterator is just batch_at(0), batch_at(1), ... — resume at any
    # step reproduces the stream.
    it = iter(a)
    first = next(it)
    np.testing.assert_array_equal(np.asarray(first),
                                  np.asarray(b.batch_at(0)))
    assert np.asarray(a.batch_at(1)).tolist() != np.asarray(
        a.batch_at(2)).tolist()


def test_samples_all_files_and_offsets(tmp_path):
    d = _make_corpus(tmp_path, n_files=4, frames=300)
    dc = DeviceCorpus(d, crop_frames=32, batch_size=64, seed=0)
    batch = np.asarray(dc.batch_at(0))
    fids = {int(v) // 1000 for v in batch[:, 0, 0]}
    offsets = {int(v) % 1000 for v in batch[:, 0, 0]}
    assert len(fids) >= 3  # 64 draws over 4 files: virtually surely >= 3
    assert len(offsets) > 10  # offsets spread over [0, 268]


def test_float_corpus_matches_wav_read(tmp_path):
    """A non-PCM16 corpus resides as float32 with wav_read's values."""
    import struct

    d = tmp_path / "f32corpus"
    d.mkdir()
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, 200)) * 0.3).astype(np.float32)
    # Minimal IEEE-float WAV (format tag 3).
    pcm = audio.T.astype("<f4").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " +
           struct.pack("<IHHIIHH", 16, 3, 1, 8000, 8000 * 4, 4, 32) +
           b"data" + struct.pack("<I", len(pcm)))
    (d / "a.wav").write_bytes(hdr + pcm)
    dc = DeviceCorpus(d, crop_frames=50, batch_size=2, seed=0)
    assert dc.dtype == np.float32
    ref = wav_read(d / "a.wav")
    batch = np.asarray(dc.batch_at(0))
    for el in batch:
        # locate the window within the (single) file
        hits = [s for s in range(151)
                if np.array_equal(el, ref[:, s:s + 50])]
        assert len(hits) >= 1


def test_max_bytes_guard(tmp_path):
    d = _make_corpus(tmp_path)
    with pytest.raises(ValueError, match="max_bytes"):
        DeviceCorpus(d, crop_frames=64, batch_size=2, max_bytes=100)


def test_trainer_fit_on_device_corpus(tmp_path):
    """End-to-end: Trainer.fit over DeviceCorpus batches, including the
    steps_per_call device-side stacking path (jnp.stack, no host hop)."""
    from audio_diffusion_tpu import DiffusionModel, UNetV0
    from audio_diffusion_tpu.train import Trainer, TrainerConfig

    d = _make_corpus(tmp_path, n_files=3, frames=600)
    dc = DeviceCorpus(d, crop_frames=256, batch_size=2, seed=0)
    model = DiffusionModel(net_t=UNetV0, in_channels=2, channels=[8, 16],
                           factors=[1, 2], items=[1, 1],
                           modulation_features=32)
    model.initialize(jnp.zeros((1, 2, 256)))
    logs = []
    trainer = Trainer(model, TrainerConfig(log_every=1, steps_per_call=2),
                      log_fn=logs.append)
    metrics = trainer.fit(iter(dc), num_steps=5)  # 2+2+1 tail
    assert int(metrics["step"]) == 5
    assert np.isfinite(float(metrics["loss"]))
    assert len(logs) >= 2


def test_int16_dequant_equivalence(tmp_path):
    """The int16-resident corpus trains on the same values the float32
    host path would produce: dequant(x)/32768 == wav_read's floats."""
    from audio_diffusion_tpu.utils import dequant_pcm16

    d = _make_corpus(tmp_path, n_files=1, frames=300)
    dc = DeviceCorpus(d, crop_frames=64, batch_size=4, seed=2)
    ref = wav_read(next(iter(sorted((d).glob("*.wav")))))
    batch = np.asarray(dc.batch_at(0))
    deq = np.asarray(dequant_pcm16(jnp.asarray(batch)))
    for el_i16, el_f in zip(batch, deq):
        pos = int(el_i16[0, 0]) % 1000
        np.testing.assert_array_equal(el_f, ref[:, pos:pos + 64])


def test_mesh_sharded_batches(tmp_path):
    """With a mesh, the corpus replicates and batches come out sharded
    over 'data' — each chip gathers its shard locally."""
    from audio_diffusion_tpu.parallel import create_mesh

    d = _make_corpus(tmp_path, n_files=3, frames=400)
    mesh = create_mesh()  # 8 virtual CPU devices -> data=8
    dc = DeviceCorpus(d, crop_frames=64, batch_size=8, seed=1, mesh=mesh)
    batch = dc.batch_at(0)
    assert len(batch.sharding.device_set) == len(mesh.devices.ravel())
    # Leading (batch) axis is partitioned over 'data'.
    shard_shapes = {s.data.shape for s in batch.addressable_shards}
    assert shard_shapes == {(1, 2, 64)}
    # Content check: still genuine file windows.
    host = np.asarray(batch)
    for el in host:
        v0 = int(el[0, 0])
        fid, pos = divmod(v0, 1000)
        np.testing.assert_array_equal(
            el[0], (fid * 1000 + pos + np.arange(64)).astype(np.int16))
    # Mesh and unsharded corpora draw identical data for a given seed.
    dc0 = DeviceCorpus(d, crop_frames=64, batch_size=8, seed=1)
    np.testing.assert_array_equal(host, np.asarray(dc0.batch_at(0)))
