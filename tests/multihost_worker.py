"""Worker process for the two-process multi-host simulation test.

Launched by tests/test_multihost.py (NOT a pytest module itself): each of
two processes owns 4 virtual CPU devices and joins a gloo-backed
``jax.distributed`` cluster, exercising the code paths that only run when
``jax.process_count() > 1``:

- ``AudioDataset(num_hosts=...)`` host sharding (data/loader.py),
- ``parallel.global_batch`` per-host batch assembly,
- a sharded train step over the 2-process mesh (gradient psum crosses the
  process boundary),
- multi-host orbax checkpoint save + sharded restore via the Trainer.

Writes a JSON result file per process for the test to assert on.

Usage: multihost_worker.py <proc_id> <nprocs> <coordinator> <wav_dir> <out_dir>
"""
import json
import os
import sys

proc_id, nprocs = int(sys.argv[1]), int(sys.argv[2])
coordinator, wav_dir, out_dir = sys.argv[3], sys.argv[4], sys.argv[5]

import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=nprocs, process_id=proc_id)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from audio_diffusion_tpu import DiffusionModel, UNetV0  # noqa: E402
from audio_diffusion_tpu.data import AudioDataset  # noqa: E402
from audio_diffusion_tpu.parallel import create_mesh, global_batch  # noqa: E402
from audio_diffusion_tpu.train import Trainer, TrainerConfig  # noqa: E402

result = {
    "process_index": jax.process_index(),
    "process_count": jax.process_count(),
    "device_count": jax.device_count(),
    "local_device_count": jax.local_device_count(),
}

# --- host-sharded dataset (loader.py multi-host path: host_id defaults to
# jax.process_index() when num_hosts is given) ---------------------------
ds = AudioDataset(wav_dir, crop_frames=256, batch_size=2, num_hosts=nprocs)
result["shard_files"] = sorted(p.name for p in ds.files)

# --- model + mesh + trainer --------------------------------------------
model = DiffusionModel(net_t=UNetV0, in_channels=2, channels=[8, 16],
                       factors=[1, 2], items=[1, 1],
                       modulation_features=32, seed=0)
model.initialize(jnp.zeros((1, 2, 256)))

mesh = create_mesh()  # 8 devices over 2 processes, data axis
ckpt_dir = os.path.join(out_dir, "ckpt")
trainer = Trainer(model, TrainerConfig(learning_rate=1e-3, log_every=1000,
                                       checkpoint_dir=ckpt_dir),
                  mesh=mesh, log_fn=lambda s: None)
trainer.init_state(key=jax.random.key(7))

# Deterministic local batches (seeded per host) so the single-process
# reference in the test can reconstruct the exact global batch.
rng = np.random.default_rng(100 + proc_id)
local_batches = [rng.standard_normal((4, 2, 256)).astype(np.float32) * 0.1
                 for _ in range(3)]

losses = []
for lb in local_batches:
    gb = global_batch(lb, mesh)
    assert gb.shape[0] == 4 * nprocs, gb.shape
    trainer.state, metrics = trainer.train_step(trainer.state, gb)
    losses.append(float(metrics["loss"]))
result["losses"] = losses
result["step"] = int(trainer.state.step)

# --- multi-host orbax checkpoint: save, perturb, restore ----------------
trainer.save_checkpoint(wait=True)
p_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                        trainer.state.params)
trainer.state = trainer.state._replace(
    params=jax.tree.map(lambda x: x * 0.0, trainer.state.params))
restored_step = trainer.restore_latest()
p_after = jax.tree.map(np.asarray, trainer.state.params)
leaves_b = jax.tree.leaves(p_before)
leaves_a = jax.tree.leaves(p_after)
result["restore_step"] = restored_step
result["restore_exact"] = bool(all(
    np.array_equal(a, b) for a, b in zip(leaves_a, leaves_b)))

# One more step after restore proves the restored state is usable.
gb = global_batch(local_batches[0], mesh)
trainer.state, metrics = trainer.train_step(trainer.state, gb)
result["post_restore_loss"] = float(metrics["loss"])

with open(os.path.join(out_dir, f"result_{proc_id}.json"), "w") as f:
    json.dump(result, f)
print(f"worker {proc_id} OK", flush=True)
