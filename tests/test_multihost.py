"""Two-process multi-host simulation (VERDICT r2 item 3).

Spawns two REAL processes, each with 4 virtual CPU devices, joined via
``jax.distributed`` (gloo collectives): the actually-multi-host code paths
— host-sharded datasets, cross-process gradient psum, multi-host orbax
save/restore — run with ``jax.process_count() == 2`` instead of being
faked inside one process.
"""
import json
import os
import socket
import subprocess
import sys
import wave
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_wav(path, data, sr=16000):
    c, n = data.shape
    with wave.open(str(path), "wb") as f:
        f.setnchannels(c)
        f.setframerate(sr)
        f.setsampwidth(2)
        pcm = np.clip(data.T.reshape(-1) * 32768, -32768, 32767).astype("<i2")
        f.writeframes(pcm.tobytes())


@pytest.mark.slow
def test_two_process_training(tmp_path):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        _write_wav(wav_dir / f"f{i}.wav",
                   (rng.standard_normal((2, 2000)) * 0.3).astype(np.float32))

    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PALLAS_AXON_POOL_IPS": "",
        # Workers must not inherit a conftest-driven device count of 8.
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "multihost_worker.py"),
             str(i), "2", f"127.0.0.1:{port}", str(wav_dir), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = [json.load(open(tmp_path / f"result_{i}.json"))
               for i in range(2)]
    for i, r in enumerate(results):
        assert r["process_index"] == i
        assert r["process_count"] == 2
        assert r["device_count"] == 8
        assert r["local_device_count"] == 4

    # Host-sharded dataset: disjoint shards covering all 5 files
    # (files[host::2] — 3 on host 0, 2 on host 1).
    s0, s1 = set(results[0]["shard_files"]), set(results[1]["shard_files"])
    assert s0.isdisjoint(s1)
    assert len(s0 | s1) == 5

    # The global train step produced IDENTICAL losses on both processes
    # (the psum crosses the process boundary; metrics replicate).
    assert results[0]["losses"] == pytest.approx(results[1]["losses"],
                                                 rel=1e-6)
    assert results[0]["step"] == results[1]["step"] == 3

    # Multi-host orbax checkpoint round-tripped exactly on BOTH hosts.
    for r in results:
        assert r["restore_step"] == 3
        assert r["restore_exact"] is True
        assert np.isfinite(r["post_restore_loss"])

    # Cross-topology equivalence: the same global batches through the same
    # model/optimizer in ONE process (8 virtual devices via conftest)
    # reproduce the distributed losses.
    import jax
    import jax.numpy as jnp
    from audio_diffusion_tpu import DiffusionModel, UNetV0
    from audio_diffusion_tpu.parallel import create_mesh, shard_batch
    from audio_diffusion_tpu.train import Trainer, TrainerConfig

    model = DiffusionModel(net_t=UNetV0, in_channels=2, channels=[8, 16],
                           factors=[1, 2], items=[1, 1],
                           modulation_features=32, seed=0)
    model.initialize(jnp.zeros((1, 2, 256)))
    mesh = create_mesh()
    trainer = Trainer(model, TrainerConfig(learning_rate=1e-3,
                                           log_every=1000),
                      mesh=mesh, log_fn=lambda s: None)
    trainer.init_state(key=jax.random.key(7))
    ref_losses = []
    rngs = [np.random.default_rng(100 + i) for i in range(2)]
    for _ in range(3):
        locals_ = [r.standard_normal((4, 2, 256)).astype(np.float32) * 0.1
                   for r in rngs]
        gb = shard_batch(jnp.asarray(np.concatenate(locals_)), mesh)
        trainer.state, metrics = trainer.train_step(trainer.state, gb)
        ref_losses.append(float(metrics["loss"]))
    assert ref_losses == pytest.approx(results[0]["losses"], rel=2e-4)
