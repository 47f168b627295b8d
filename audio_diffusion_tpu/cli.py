"""Command-line interface: train on a directory of WAVs, sample to WAVs.

The reference has no CLI (users hand-write loops, reference README.md:37);
this provides the two production entry points end-to-end on the native
stack (C++ WAV decode -> sharded train step -> orbax checkpoints; compiled
scan sampling -> native WAV writer)::

    python -m audio_diffusion_tpu train --data wavs/ --preset \
        UNCONDITIONAL_48K --steps 100000 --batch 8 --crop 262144 \
        --out run1/
    python -m audio_diffusion_tpu sample --model run1/model --preset \
        UNCONDITIONAL_48K --num 4 --steps 25 --sampler dpm \
        --length 262144 --out samples/

``--preset`` is a name from :mod:`audio_diffusion_tpu.presets` or a path to
a JSON file of UNetV0/DiffusionModel kwargs (so any custom config is
scriptable). Training runs data-parallel over all local devices.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, Optional

__all__ = ["main"]


# Named presets this CLI can drive end-to-end. The task-model presets
# (UPSAMPLER/VOCODER/AUTOENCODER) need their task classes and conditioning
# inputs, and TEXT_CONDITIONAL needs caption plumbing — use the Python API
# for those (README "Upsampler / Vocoder / Autoencoder" section).
_CLI_PRESETS = ("UNCONDITIONAL_48K",)


def _resolve_config(preset: str) -> Dict:
    from . import presets

    name = preset.upper()
    if name in _CLI_PRESETS:
        return dict(getattr(presets, name))
    p = Path(preset)
    if p.exists():
        return json.loads(p.read_text())
    if hasattr(presets, name):
        raise SystemExit(
            f"preset {preset!r} is a task-model/text config that needs the "
            "Python API (DiffusionUpsampler/DiffusionVocoder/DiffusionAE "
            "classes or text= conditioning); this CLI drives plain "
            f"DiffusionModel configs: {', '.join(_CLI_PRESETS)} or a JSON "
            "kwargs file")
    raise SystemExit(
        f"unknown preset {preset!r}: pass one of "
        f"[{', '.join(_CLI_PRESETS)}] or a path to a JSON file of model "
        "kwargs")


def _build_model(cfg: Dict, sampler: str):
    from . import DiffusionModel, DPMSampler, UNetV0, VSampler

    sampler_t = {"v": VSampler, "dpm": DPMSampler}[sampler]
    return DiffusionModel(net_t=UNetV0, sampler_t=sampler_t, **cfg)


def _cmd_train(args) -> None:
    import jax.numpy as jnp

    from .data import AudioDataset
    from .parallel import create_mesh
    from .train import Trainer, TrainerConfig

    ds = AudioDataset(args.data, crop_frames=args.crop,
                      batch_size=args.batch, seed=args.seed)
    print(f"dataset: {len(ds.files)} files, {ds.channels} ch @ "
          f"{ds.sample_rate} Hz, crop {args.crop}")
    cfg = _resolve_config(args.preset)
    cfg["in_channels"] = ds.channels  # the data decides the channel count
    model = _build_model(cfg, "v")
    model.initialize(jnp.zeros((1, ds.channels, args.crop)))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    # Persist the RESOLVED config (incl. the channel override and the
    # training sample rate) so `sample` rebuilds the exact same net.
    (out / "config.json").write_text(json.dumps(
        {**cfg, "_sample_rate": ds.sample_rate}, indent=1))
    trainer = Trainer(model, TrainerConfig(
        learning_rate=args.lr, ema_decay=args.ema_decay,
        checkpoint_dir=str(out / "ckpts"),
        checkpoint_every=args.checkpoint_every, log_every=args.log_every,
        accum_steps=args.accum_steps), mesh=create_mesh())
    resumed = trainer.restore_latest()
    remaining = args.steps
    if resumed is not None:
        # --steps is the TOTAL budget: a preempted job finishes the
        # remainder instead of re-running the full count.
        remaining = max(args.steps - resumed, 0)
        print(f"resumed from step {resumed}; {remaining} steps remain")
    trainer.fit(iter(ds), num_steps=remaining)
    if args.ema_decay is not None:
        # Export the EMA weights (sampling quality) as the saved model.
        model.params = trainer.ema_params
    model.save(out / "model")
    print(f"saved model params to {out / 'model'}")


def _cmd_sample(args) -> None:
    import jax
    import numpy as np

    from .data import wav_write

    run_cfg = Path(args.model).parent / "config.json"
    recorded = json.loads(run_cfg.read_text()) if run_cfg.exists() else {}
    if args.preset is not None:
        cfg = _resolve_config(args.preset)
    elif recorded:
        cfg = dict(recorded)
    else:
        raise SystemExit(
            f"no {run_cfg} next to the model dir — pass --preset "
            "(the config used for training)")
    # The training data's rate (recorded by `train`) wins over the 48k
    # default even when the net config comes from --preset.
    sample_rate = (args.sample_rate or cfg.get("_sample_rate")
                   or recorded.get("_sample_rate") or 48000)
    cfg.pop("_sample_rate", None)
    if args.in_channels is not None:
        cfg["in_channels"] = args.in_channels
    model = _build_model(cfg, args.sampler)
    c = model.net.in_channels
    model.initialize(jax.numpy.zeros((1, c, args.length)))
    model.load(args.model)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    # One batched device program for all requested samples (batch-8
    # sampling measures ~1.4x batch-1 samples/min, PERFORMANCE.md); each
    # sample still derives from its own seed, so outputs are per-seed
    # deterministic regardless of --num.
    noise = np.stack([
        np.random.default_rng(args.seed + i).standard_normal(
            (c, args.length)).astype(np.float32)
        for i in range(args.num)])
    audio = np.asarray(model.sample(noise, num_steps=args.steps))
    for i in range(args.num):
        wav_write(out / f"sample_{args.seed + i}.wav", audio[i],
                  sample_rate)
    print(f"wrote {args.num} samples ({args.steps}-step "
          f"{args.sampler}, {sample_rate} Hz) to {out}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="audio_diffusion_tpu",
                                 description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train on a directory of WAV files")
    t.add_argument("--data", required=True, help="directory of .wav files")
    t.add_argument("--preset", required=True,
                   help="presets name or JSON config path")
    t.add_argument("--out", required=True, help="run directory")
    t.add_argument("--steps", type=int, default=100_000)
    t.add_argument("--batch", type=int, default=8)
    t.add_argument("--crop", type=int, default=2**18)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--ema-decay", type=float, default=None)
    t.add_argument("--accum-steps", type=int, default=1)
    t.add_argument("--checkpoint-every", type=int, default=1000)
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--seed", type=int, default=0)
    t.set_defaults(fn=_cmd_train)

    s = sub.add_parser("sample", help="generate WAVs from a trained model")
    s.add_argument("--model", required=True,
                   help="model dir saved by `train` (…/model)")
    s.add_argument("--preset", default=None,
                   help="preset/JSON config; defaults to the config.json "
                        "recorded next to the model dir by `train`")
    s.add_argument("--out", required=True)
    s.add_argument("--num", type=int, default=1)
    s.add_argument("--steps", type=int, default=50)
    s.add_argument("--sampler", choices=("v", "dpm"), default="v")
    s.add_argument("--length", type=int, default=2**18)
    s.add_argument("--in-channels", type=int, default=None)
    s.add_argument("--sample-rate", type=int, default=None,
                   help="defaults to the training data's rate "
                        "(from config.json), else 48000")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=_cmd_sample)

    args = ap.parse_args(argv)
    args.fn(args)
