"""Model-code-free deployment: export once, serve from (artifact, params).

Stage 1 (build host — has the model config):
    python examples/deploy_artifact.py export RUN_DIR ARTIFACT_DIR

Stage 2 (serving host — needs ONLY this framework, no model config):
    python examples/deploy_artifact.py serve ARTIFACT_DIR RUN_DIR/model

The exported StableHLO program pins platform, shapes, and step count
(exactly the things XLA compilation pins anyway); params stay an argument,
so re-trained checkpoints of the same config redeploy without re-export.
See docs/OPERATIONS.md "Model-code-free hosts".
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu import (ArtifactSampler, DiffusionModel,
                                 GenerationService, UNetV0, export_sampler,
                                 load_params, presets)

LENGTH = 2**18


def do_export(run_dir: str, artifact_dir: str) -> None:
    # The build host knows the config (here: the flagship preset; a real
    # pipeline would read RUN_DIR/config.json — the CLI `export`
    # subcommand does exactly that).
    model = DiffusionModel(net_t=UNetV0, dtype=jnp.bfloat16,
                           **presets.UNCONDITIONAL_48K)
    model.initialize(jnp.zeros((1, 2, 4096)))  # short: params are
    model.load(f"{run_dir}/model")             # length-independent
    manifest = export_sampler(model, artifact_dir, length=LENGTH,
                              batch_size=1, num_steps=50,
                              sample_rate=48000)
    print("exported:", manifest)


def do_serve(artifact_dir: str, params_dir: str) -> None:
    # The serving host reconstructs everything from two directories.
    sampler = ArtifactSampler(artifact_dir, load_params(params_dir))
    service = GenerationService(sampler, num_steps=sampler.num_steps,
                                batch_size=sampler.batch_size,
                                result_format="pcm16")
    try:
        futs = [service.submit_seed(s, length=sampler.length,
                                    channels=sampler.in_channels)
                for s in range(4)]
        for s, f in enumerate(futs):
            audio = f.result(timeout=600)
            print(f"seed {s}: {audio.shape} int16, "
                  f"peak {np.abs(audio).max()}")
    finally:
        service.close()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 3 else ""
    if mode == "export":
        do_export(sys.argv[2], sys.argv[3])
    elif mode == "serve":
        do_serve(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(__doc__)
