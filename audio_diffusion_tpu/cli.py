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


# Named presets this CLI can drive end-to-end, mapped to their task.
# TEXT_CONDITIONAL trains from sidecar captions (train --caption-dir:
# one <wav stem>.txt per corpus file) through the pluggable text-encoder
# interface, then samples with `sample --text "..."`.
_CLI_PRESETS = {
    "UNCONDITIONAL_48K": "unconditional",
    "TEXT_CONDITIONAL_48K": "unconditional",
    "UPSAMPLER_16X": "upsampler",
    "VOCODER_48K": "vocoder",
    "AUTOENCODER_48K": "autoencoder",
}

# The reference README's diffusion-autoencoder encoder configuration
# (reference README.md:139-152: MelE1d out_channels=32, mel 80 bins,
# channels 512, one 2x stage, inject_depth=6) — the CLI default; override
# per-key via an "_encoder" dict (+ "_inject_depth") in a JSON config.
_AE_ENCODER_DEFAULTS = dict(channels=512, factors=[2], num_blocks=[12],
                            out_channels=32, mel_channels=80)
_AE_INJECT_DEPTH = 6


def _resolve_config(preset: str):
    """Returns (cfg kwargs, task name). JSON configs may carry an embedded
    ``"_task"`` key (as written by `train` into config.json)."""
    from . import presets

    name = preset.upper()
    if name in _CLI_PRESETS:
        return dict(getattr(presets, name)), _CLI_PRESETS[name]
    p = Path(preset)
    if p.exists():
        cfg = json.loads(p.read_text())
        return cfg, cfg.pop("_task", "unconditional")
    if hasattr(presets, name):
        raise SystemExit(
            f"preset {preset!r} needs the Python API (text conditioning "
            "requires caption plumbing); this CLI drives: "
            f"{', '.join(_CLI_PRESETS)} or a JSON kwargs file")
    raise SystemExit(
        f"unknown preset {preset!r}: pass one of "
        f"[{', '.join(_CLI_PRESETS)}] or a path to a JSON file of model "
        "kwargs")


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (verified to work through remote
    TPU backends, PERFORMANCE.md: 3-5× faster second-process compiles —
    a resumed/preempted run skips the multi-minute recompile). Env
    JAX_COMPILATION_CACHE_DIR wins when set."""
    import os

    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # CPU compiles are fast and the cached AOT objects carry exact
        # machine-feature sets (noisy cross-feature load warnings);
        # the cache pays off on remote TPU backends.
        return
    import jax

    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                Path.home() / ".cache"))
    cache = cache / "audio_diffusion_tpu" / "jax_cache"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))


def _make_text_encoder(spec: Dict, cfg: Dict):
    """Build the pluggable text encoder a run recorded (``_text_encoder``
    in config.json) or the user requested (train --text-encoder). The
    encoder's max_length/features default to the net's declared embedding
    geometry so the two can't drift apart."""
    from .ops import text as text_mod

    kind = spec.get("kind", "t5")
    max_length = spec.get("max_length",
                          cfg.get("embedding_max_length", 64))
    features = spec.get("features", cfg.get("embedding_features", 768))
    if kind == "t5":
        return text_mod.T5TextEncoder(spec.get("model_name", "t5-base"),
                                      max_length=max_length)
    if kind == "random":
        return text_mod.RandomT5TextEncoder(max_length=max_length,
                                            features=features)
    if kind == "stub":
        return text_mod.StubTextEncoder(max_length=max_length,
                                        features=features)
    raise SystemExit(f"unknown text encoder kind {kind!r}: "
                     "pass t5, random, or stub")


def _build_model(cfg: Dict, sampler: str, task: str = "unconditional",
                 upsample_factor: Optional[int] = None):
    import jax.numpy as jnp

    from . import (DiffusionModel, DiffusionUpsampler, DiffusionVocoder,
                   DPMSampler, UNetV0, VSampler)

    # Pluggable text encoder (recorded by train --caption-dir). Built
    # HERE so `sample --text` / text-conditional training never fall back
    # to the T5 default (which needs a local HF cache) by surprise.
    text_spec = cfg.pop("_text_encoder", None)
    if text_spec is not None and task == "unconditional":
        cfg["text_encoder"] = _make_text_encoder(text_spec, cfg)

    # Compute dtype (master params stay f32 either way). bf16 is the TPU
    # production setting (every PERFORMANCE.md number); configs record it
    # as a string.
    dtype = cfg.pop("_dtype", None)
    if dtype is not None:
        cfg["dtype"] = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                        "f32": None, "float32": None}[dtype]
    cfg.pop("_init_from", None)  # provenance record, not model geometry
    sampler_t = {"v": VSampler, "dpm": DPMSampler}[sampler]
    if task == "upsampler":
        return DiffusionUpsampler(
            net_t=UNetV0, sampler_t=sampler_t,
            upsample_factor=upsample_factor or 16, **cfg)
    if task == "vocoder":
        return DiffusionVocoder(net_t=UNetV0, sampler_t=sampler_t, **cfg)
    if task == "autoencoder":
        from .models import DiffusionAE, MelEncoder1d

        enc_cfg = {**_AE_ENCODER_DEFAULTS, **(cfg.pop("_encoder", None)
                                              or {})}
        inject_depth = cfg.pop("_inject_depth", _AE_INJECT_DEPTH)
        encoder = MelEncoder1d(in_channels=cfg.get("in_channels", 2),
                               dtype=cfg.get("dtype"), **enc_cfg)
        return DiffusionAE(net_t=UNetV0, sampler_t=sampler_t,
                           encoder=encoder, inject_depth=inject_depth,
                           **cfg)
    if task == "ar":
        # Autoregressive: context window + split count are model geometry
        # (the σ ladder); sampling is ARVSampler regardless of --sampler.
        from .models import DiffusionAR

        if "_length" not in cfg:
            raise SystemExit(
                "ar configs need \"_length\" (and optionally "
                "\"_num_splits\") — train records them in the run's "
                "config.json; add them to a hand-written JSON")
        return DiffusionAR(net_t=UNetV0, length=cfg.pop("_length"),
                           num_splits=cfg.pop("_num_splits", 4), **cfg)
    assert task == "unconditional", task
    return DiffusionModel(net_t=UNetV0, sampler_t=sampler_t, **cfg)


def _load_dataset(args, mesh):
    """Dataset with --data-placement semantics shared by train/distill:
    "device" keeps the whole corpus HBM-resident and crops batches on
    device — zero per-step uploads, which on remote/tunnel TPUs is both
    the throughput bound AND a host-memory leak in the tunnel client
    (see data/device.py). "auto" picks device when the corpus fits
    comfortably (<= 1 GiB)."""
    from .data import AudioDataset, DeviceCorpus

    ds = AudioDataset(args.data, crop_frames=args.crop,
                      batch_size=args.batch, seed=args.seed)
    corpus_bytes = sum(ds.frames) * ds.channels * ds.dtype.itemsize
    use_device = (args.data_placement == "device"
                  or (args.data_placement == "auto"
                      and corpus_bytes <= 1 << 30))
    if use_device:
        ds = DeviceCorpus(args.data, crop_frames=args.crop,
                          batch_size=args.batch, seed=args.seed,
                          max_bytes=max(corpus_bytes, 1 << 30), mesh=mesh)
    place = (f"device-resident ({corpus_bytes/2**20:.0f} MB HBM, zero "
             "per-step uploads)" if use_device
             else f"host (upload dtype {ds.dtype.name}"
             + (", lossless PCM16 passthrough, 4x smaller batches)"
                if ds.dtype.name == "int16" else ")"))
    print(f"dataset: {len(ds.files)} files, {ds.channels} ch @ "
          f"{ds.sample_rate} Hz, crop {args.crop}, data {place}")
    return ds


def _paired_embedding_feed(ds, embedding_dir):
    """Pair each corpus crop with its file's precomputed embedding
    (DIR/<wav stem>.npy): yields (x, {"embedding": ...}) tuples — the
    text-conditional data path without a local T5 (train --embedding-dir,
    distill --embedding-dir). ``ds`` must be an AudioDataset built with
    return_indices=True."""
    import numpy as np

    emb_dir = Path(embedding_dir)
    missing = [f.stem for f in ds.files
               if not (emb_dir / f"{f.stem}.npy").exists()]
    if missing:
        raise SystemExit(
            f"--embedding-dir is missing .npy for: "
            f"{', '.join(missing[:5])}"
            + (f" (+{len(missing) - 5} more)" if len(missing) > 5 else ""))
    table = np.stack([np.load(emb_dir / f"{f.stem}.npy").astype(
        np.float32) for f in ds.files])

    def paired():
        for x, idx in ds:
            yield x, {"embedding": table[idx]}

    return paired()


def _caption_table(ds, caption_dir, encoder):
    """Sidecar captions (DIR/<wav stem>.txt, one per corpus file) encoded
    ONCE into a [files, max_length, features] table — the text-conditional
    training path (train --caption-dir): each crop rides with its file's
    caption embedding, so training needs no per-batch encoder calls and
    the same trained model serves `sample --text` through the identical
    encoder (recorded in config.json)."""
    import numpy as np

    cap_dir = Path(caption_dir)
    missing = [f.stem for f in ds.files
               if not (cap_dir / f"{f.stem}.txt").exists()]
    if missing:
        raise SystemExit(
            f"--caption-dir is missing .txt for: {', '.join(missing[:5])}"
            + (f" (+{len(missing) - 5} more)" if len(missing) > 5 else ""))
    captions = [(cap_dir / f"{f.stem}.txt").read_text().strip()
                for f in ds.files]
    return np.asarray(encoder(captions), np.float32), captions


def _cmd_train(args) -> None:
    _enable_compile_cache()
    import jax.numpy as jnp

    from .parallel import create_mesh
    from .train import Trainer, TrainerConfig

    mesh = create_mesh()
    if args.embedding_dir is not None and args.caption_dir is not None:
        raise SystemExit("pass --embedding-dir OR --caption-dir, not both")
    if args.caption_dir is not None:
        # Sidecar captions (x.wav + x.txt) through the pluggable text
        # encoder — the reference's T5 workflow (README.md:47-76), CLI-
        # complete offline: --text-encoder random/stub substitutes until
        # real T5 weights are cached. Host data path like --embedding-dir.
        from .data import AudioDataset

        ds = AudioDataset(args.data, crop_frames=args.crop,
                          batch_size=args.batch, seed=args.seed,
                          return_indices=True)
        print(f"dataset: {len(ds.files)} files, {ds.channels} ch @ "
              f"{ds.sample_rate} Hz, crop {args.crop}, sidecar captions "
              f"from {args.caption_dir} ({args.text_encoder} encoder)")
    elif args.embedding_dir is not None:
        # Paired precomputed embeddings (text-conditional training without
        # a local T5): one DIR/<wav stem>.npy per corpus file; each crop's
        # embedding rides the batch as an (x, cond) tuple. Host data path
        # (the embedding table is indexed per-crop on the host).
        from .data import AudioDataset

        ds = AudioDataset(args.data, crop_frames=args.crop,
                          batch_size=args.batch, seed=args.seed,
                          return_indices=True)
        print(f"dataset: {len(ds.files)} files, {ds.channels} ch @ "
              f"{ds.sample_rate} Hz, crop {args.crop}, paired embeddings "
              f"from {args.embedding_dir}")
    else:
        ds = _load_dataset(args, mesh)
    cfg, task = _resolve_config(args.preset)
    if args.task is not None:
        task = args.task
    cfg["in_channels"] = ds.channels  # the data decides the channel count
    if task == "vocoder":
        # The mel front end's rate defaults to the training data's.
        cfg.setdefault("mel_sample_rate", ds.sample_rate)
    if task == "autoencoder":
        # The encoder's mel front end likewise follows the data.
        enc = dict(cfg.get("_encoder") or {})
        enc.setdefault("mel_sample_rate", ds.sample_rate)
        cfg["_encoder"] = enc
    if task == "ar":
        # The AR context window is the training crop.
        cfg["_length"] = args.crop
        cfg.setdefault("_num_splits", args.num_splits)
    if args.caption_dir is not None:
        if not any(cfg.get("cross_attentions") or []):
            raise SystemExit(
                "--caption-dir needs a text-conditional config "
                "(cross_attentions + embedding features — e.g. --preset "
                "TEXT_CONDITIONAL_48K or a JSON config declaring them)")
        # Record the encoder choice so `sample --text` rebuilds the SAME
        # encoder (t5 when a local HF cache exists; random/stub offline).
        cfg["_text_encoder"] = {
            "kind": args.text_encoder,
            "max_length": cfg.get("embedding_max_length", 64),
            "features": cfg.get("embedding_features", 768)}
    elif cfg.get("use_text_conditioning") and args.embedding_dir is None:
        raise SystemExit(
            "this config is text-conditional: train it with --caption-dir "
            "(sidecar x.txt captions) or --embedding-dir (precomputed "
            ".npy embeddings)")
    cfg.setdefault("_dtype", args.dtype)
    model = _build_model(dict(cfg), "v", task, args.upsample_factor)
    model.initialize(jnp.zeros((1, ds.channels, args.crop)),
                     **_init_cond_kwargs(cfg))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    # Persist the RESOLVED config (incl. the channel override, task, and
    # training sample rate) so `sample` rebuilds the exact same model.
    recorded = {**cfg, "_sample_rate": ds.sample_rate, "_task": task}
    if task == "upsampler":
        recorded["_upsample_factor"] = args.upsample_factor or 16
    (out / "config.json").write_text(json.dumps(recorded, indent=1))
    if args.init_from is not None:
        # Warm start (continuation / fine-tuning): load exported params
        # into the freshly built model BEFORE the trainer snapshots its
        # initial state. The step counter and optimizer start fresh —
        # resume-from-checkpoint (below) is the path that preserves them,
        # and it takes precedence if this run dir already has checkpoints.
        model.load(args.init_from)
        recorded["_init_from"] = str(args.init_from)
        (out / "config.json").write_text(json.dumps(recorded, indent=1))
        print(f"warm start: params loaded from {args.init_from}")
    trainer = Trainer(model, TrainerConfig(
        learning_rate=args.lr, ema_decay=args.ema_decay,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
        total_steps=args.steps if args.lr_schedule == "cosine" else None,
        max_grad_norm=args.max_grad_norm,
        checkpoint_dir=str(out / "ckpts"),
        checkpoint_every=args.checkpoint_every, log_every=args.log_every,
        accum_steps=args.accum_steps,
        steps_per_call=args.steps_per_call), mesh=mesh)
    resumed = trainer.restore_latest()
    remaining = args.steps
    if resumed is not None:
        # --steps is the TOTAL budget: a preempted job finishes the
        # remainder instead of re-running the full count.
        remaining = max(args.steps - resumed, 0)
        print(f"resumed from step {resumed}; {remaining} steps remain")
    feed = iter(ds)
    fit_cond: Dict = {}
    if args.caption_dir is not None:
        table, _ = _caption_table(ds, args.caption_dir,
                                  model.net.text_encoder)

        def caption_feed():
            for x, idx in ds:
                yield x, {"embedding": table[idx]}

        feed = caption_feed()
        fit_cond["embedding_mask_proba"] = args.embedding_mask_proba
    elif args.embedding_dir is not None:
        feed = _paired_embedding_feed(ds, args.embedding_dir)
        # CFG training: drop the embedding at this rate so the null
        # branch learns (reference README.md:70 embedding_mask_proba).
        fit_cond["embedding_mask_proba"] = args.embedding_mask_proba
    trainer.fit(feed, num_steps=remaining, **fit_cond)
    if args.ema_decay is not None:
        # Export the EMA weights (sampling quality) as the saved model.
        model.params = trainer.ema_params
    model.save(out / "model")
    print(f"saved model params to {out / 'model'}")


def _load_run_config(args):
    """Resolve ``(cfg, task, sample_rate, upsample_factor)`` from --preset
    or the run's config.json (written by `train` next to the model dir).
    Underscore bookkeeping keys are consumed HERE — unconditionally, so an
    explicit --sample-rate cannot leave ``_sample_rate`` behind to crash
    the net constructor — leaving cfg as model kwargs (plus ``_dtype``,
    which `_build_model` consumes)."""
    run_cfg = Path(args.model).parent / "config.json"
    recorded = json.loads(run_cfg.read_text()) if run_cfg.exists() else {}
    if args.preset is not None:
        cfg, task = _resolve_config(args.preset)
    elif recorded:
        cfg = dict(recorded)
        task = cfg.pop("_task", "unconditional")
    else:
        raise SystemExit(
            f"no {run_cfg} next to the model dir — pass --preset "
            "(the config used for training)")
    rec_rate = cfg.pop("_sample_rate", None) or recorded.get("_sample_rate")
    sample_rate = getattr(args, "sample_rate", None) or rec_rate or 48000
    upsample_factor = (cfg.pop("_upsample_factor", None)
                       or recorded.get("_upsample_factor"))
    cfg.setdefault("_dtype", args.dtype)
    return cfg, task, sample_rate, upsample_factor


def _init_cond_kwargs(cfg: Dict) -> Dict:
    """Conditioning arrays required at initialization time: cross-attention
    levels trace an embedding input, so param building needs a (dummy)
    one of the declared shape."""
    import jax.numpy as jnp

    out: Dict = {}
    if cfg.get("embedding_features") and any(cfg.get("cross_attentions")
                                             or []):
        out["embedding"] = jnp.zeros(
            (1, cfg.get("embedding_max_length", 64),
             cfg["embedding_features"]), jnp.float32)
    return out


def _short_init_length(cfg: Dict) -> int:
    """A valid (factor-divisible) initialization length: conv-net param
    shapes are length-independent, so building the tree for orbax restore
    never needs the full serving length (which would compile a forward at
    2^18 — minutes on a remote TPU backend)."""
    import numpy as np

    return max(int(np.prod(cfg.get("factors", [1])) or 1), 64)


def _cmd_distill(args) -> None:
    """Progressive distillation (Salimans & Ho 2022, distill.py) of a
    trained run: halve the sampling step count stage by stage so serving
    runs at --target-steps with near-teacher quality. The distilled
    params drop into the ordinary `sample`/`serve` commands::

        python -m audio_diffusion_tpu distill --model run/model \\
            --data wavs/ --base-steps 64 --target-steps 8
        python -m audio_diffusion_tpu sample \\
            --model run/model_distilled8 --steps 8 --out fast/
    """
    _enable_compile_cache()
    import jax.numpy as jnp

    from . import ProgressiveDistiller
    from .parallel import create_mesh

    cfg, task, _, _ = _load_run_config(args)
    if task != "unconditional":
        raise SystemExit(
            f"distill drives unconditional models; a {task} model's "
            "conditioning channels need the Python API "
            "(ProgressiveDistiller.stage(**cond))")
    if args.guidance_scale is not None and not cfg.get("use_embedding_cfg"):
        raise SystemExit(
            "--guidance-scale requires a CFG model (use_embedding_cfg in "
            "the run config); this run has no guidance to distill")
    if args.guidance_scale is not None and args.embedding_dir is None:
        raise SystemExit(
            "--guidance-scale needs --embedding-dir: guidance distillation "
            "trains on (audio, embedding) pairs")
    # The halving ladder must land exactly on the target.
    stages, n = 0, args.base_steps
    while n > args.target_steps and n % 2 == 0:
        n //= 2
        stages += 1
    if n != args.target_steps or stages == 0:
        raise SystemExit(
            f"--target-steps {args.target_steps} is not reachable from "
            f"--base-steps {args.base_steps} by halving")
    init_len = _short_init_length(cfg)
    model = _build_model(dict(cfg), "v", task)
    c = cfg.get("in_channels", 2)
    model.initialize(jnp.zeros((1, c, init_len)),
                 **_init_cond_kwargs(cfg))
    model.load(args.model)

    mesh = create_mesh()
    if args.embedding_dir is not None:
        # Paired embeddings ride each batch as (x, cond) tuples (host data
        # path, like train --embedding-dir); the teacher's conditional
        # predictions then match how the model was trained.
        from .data import AudioDataset

        ds = AudioDataset(args.data, crop_frames=args.crop,
                          batch_size=args.batch, seed=args.seed,
                          return_indices=True)
        print(f"dataset: {len(ds.files)} files, {ds.channels} ch @ "
              f"{ds.sample_rate} Hz, crop {args.crop}, paired embeddings "
              f"from {args.embedding_dir}")
        batches = _paired_embedding_feed(ds, args.embedding_dir)
    else:
        ds = _load_dataset(args, mesh)
        batches = iter(ds)
    distiller = ProgressiveDistiller(model, base_steps=args.base_steps,
                                     learning_rate=args.lr, mesh=mesh)
    if args.guidance_scale is not None:
        distiller.guidance_stage(batches,
                                 embedding_scale=args.guidance_scale,
                                 num_train_steps=args.guidance_steps,
                                 log_every=args.log_every)
        print(f"guidance stage done: CFG scale {args.guidance_scale} "
              "distilled into a single conditional pass")
    for _ in range(stages):
        distiller.stage(batches, num_train_steps=args.stage_steps,
                        log_every=args.log_every)
        print(f"stage done: model now samples at {distiller.steps} steps")
    out = Path(args.out) if args.out else (
        Path(args.model).parent / f"model_distilled{args.target_steps}")
    model.save(out)
    # `sample --model OUT` resolves OUT's parent config.json; a custom
    # --out outside the run dir has none, so replicate the run's record
    # there (otherwise the printed follow-up command could not work).
    src_cfg = Path(args.model).parent / "config.json"
    dst_cfg = out.parent / "config.json"
    if src_cfg.exists() and not dst_cfg.exists():
        dst_cfg.write_text(src_cfg.read_text())
    print(f"saved distilled params to {out} — sample with "
          f"--model {out} --steps {args.target_steps}")


def _cmd_sample(args) -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data import wav_read, wav_write

    # The training data's rate (recorded by `train`) wins over the 48k
    # default even when the net config comes from --preset.
    cfg, task, sample_rate, upsample_factor = _load_run_config(args)
    if task != "unconditional":
        # Refuse, rather than silently ignore, unconditional-only flags.
        bad = [f for f, v in [("--embedding", args.embedding),
                              ("--text", args.text),
                              ("--inpaint", args.inpaint),
                              ("--total-length", args.total_length)]
               if v is not None]
        if bad:
            raise SystemExit(f"{', '.join(bad)} only appl"
                             f"{'y' if len(bad) > 1 else 'ies'} to "
                             f"unconditional models (this run is {task})")
    if args.in_channels is not None:
        cfg["in_channels"] = args.in_channels
    # AR models fix their own context window; init must match it.
    ar_length = cfg.get("_length")
    model = _build_model(cfg, args.sampler, task, upsample_factor)
    c = cfg.get("in_channels", 2)
    model.initialize(jnp.zeros((1, c, ar_length or args.length)),
                     **_init_cond_kwargs(cfg))
    model.load(args.model)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if task == "ar":
        # Autoregressive long-context generation: --chunks windows of
        # length/num_splits frames each (reference models.py:227-250 +
        # diffusion.py:249-296 usage).
        audio = np.asarray(model.sample(
            num_items=args.num, num_chunks=args.chunks,
            num_steps=args.steps, key=jax.random.key(args.seed)))
        for i in range(args.num):
            wav_write(out / f"ar_{args.seed}_{i}.wav", audio[i],
                      sample_rate)
        print(f"wrote {args.num} AR samples ({audio.shape[-1]} frames = "
              f"{args.chunks} chunks, {args.steps}-step ladder, "
              f"{sample_rate} Hz) to {out}")
        return

    if task == "upsampler":
        # --input is the LOW-RATE audio; output is its bandwidth-extended
        # version at upsample_factor × the input length (reference
        # README.md:97-109 usage).
        if args.input is None:
            raise SystemExit("upsampler sampling needs --input "
                             "(the low-rate WAV to upsample)")
        low = wav_read(args.input)
        audio = np.asarray(model.sample(
            jnp.asarray(low)[None], num_steps=args.steps,
            key=jax.random.key(args.seed)))
        dest = out / f"upsampled_{Path(args.input).stem}.wav"
        wav_write(dest, audio[0], sample_rate)
        print(f"wrote {dest} ({low.shape[-1]} -> {audio.shape[-1]} frames, "
              f"{args.steps}-step {args.sampler}, {sample_rate} Hz)")
        return
    if task == "vocoder":
        # --input is a reference WAV: its mel spectrogram is computed with
        # the model's own front end, then vocoded back to audio (reference
        # README.md:126-131 usage with a real mel instead of torch.randn).
        if args.input is None:
            raise SystemExit("vocoder sampling needs --input "
                             "(a WAV whose mel spectrogram to re-vocode)")
        ref = wav_read(args.input)
        spec = model.to_spectrogram(jnp.asarray(ref)[None])  # [1, c, f, l]
        audio = np.asarray(model.sample(
            spec, num_steps=args.steps, key=jax.random.key(args.seed)))
        dest = out / f"vocoded_{Path(args.input).stem}.wav"
        wav_write(dest, audio[0], sample_rate)
        print(f"wrote {dest} (mel {tuple(spec.shape)} -> "
              f"{audio.shape[-1]} frames, {args.steps}-step {args.sampler}, "
              f"{sample_rate} Hz)")
        return

    if task == "autoencoder":
        # --input round-trips through the latent: encode, then diffusion-
        # decode (reference README.md:133-168 latent = encode; decode).
        if args.input is None:
            raise SystemExit("autoencoder sampling needs --input "
                             "(a WAV to round-trip through the latent)")
        ref = wav_read(args.input)
        latent = model.encode(jnp.asarray(ref)[None])
        audio = np.asarray(model.decode(
            latent, num_steps=args.steps, key=jax.random.key(args.seed)))
        dest = out / f"reconstructed_{Path(args.input).stem}.wav"
        wav_write(dest, audio[0], sample_rate)
        print(f"wrote {dest} (latent {tuple(latent.shape)} -> "
              f"{audio.shape[-1]} frames, {args.steps}-step {args.sampler}, "
              f"{sample_rate} Hz)")
        return

    # Conditioning: --text encodes a caption through the run's recorded
    # text encoder (train --caption-dir); --embedding loads precomputed
    # .npy arrays (the deployment path when embeddings were produced
    # elsewhere). Both feed the same embedding= input; encoding happens
    # HERE (host-side, once), so every downstream path — plain sampling,
    # --inpaint, --total-length long-form — conditions identically.
    cond = {}
    if args.text is not None and args.embedding is not None:
        raise SystemExit("pass --text OR --embedding, not both")
    if args.text is not None:
        encoder = getattr(model.net, "text_encoder", None)
        if encoder is None:
            raise SystemExit(
                "--text needs a text-conditional run (train with "
                "--caption-dir, or a config with use_text_conditioning "
                "and a recorded _text_encoder)")
        cond["embedding"] = np.repeat(
            np.asarray(encoder([args.text]), np.float32), args.num, 0)
        if args.embedding_scale is not None:
            cond["embedding_scale"] = args.embedding_scale
    elif args.embedding is not None:
        emb = np.load(args.embedding)
        if emb.ndim == 2:  # [tokens, features] -> same text for every sample
            emb = np.repeat(emb[None], args.num, 0)
        if emb.shape[0] != args.num:
            raise SystemExit(
                f"--embedding batch {emb.shape[0]} != --num {args.num} "
                "(pass [tokens, features] to broadcast)")
        cond["embedding"] = emb
        if args.embedding_scale is not None:
            cond["embedding_scale"] = args.embedding_scale
    elif args.embedding_scale is not None:
        raise SystemExit("--embedding-scale needs --embedding or --text")

    if args.inpaint is not None:
        # RePaint inpainting (reference README.md:182-204 usage): the
        # samples inside --mask-start/--mask-end are regenerated, the
        # rest is kept and harmonized via --resamples.
        from .longform import make_inpainter

        if args.num != 1:
            raise SystemExit("--inpaint processes one file (--num 1); "
                             "run per-seed invocations for variants")
        src = wav_read(args.inpaint)
        a, b = args.mask_start, args.mask_end
        if a is None or b is None:
            raise SystemExit("--inpaint needs --mask-start and --mask-end")
        if not 0 <= a < b <= src.shape[-1]:
            raise SystemExit(
                f"--mask-start/--mask-end must satisfy 0 <= start < end "
                f"<= {src.shape[-1]} (the input length); got {a}:{b}")
        mask = np.ones(src.shape, bool)
        mask[..., a:b] = False  # True = keep; the gap is regenerated
        inpainter = make_inpainter(model)
        audio = np.asarray(inpainter.sample(
            model.params["net"], jax.random.key(args.seed),
            jnp.asarray(src)[None], jnp.asarray(mask)[None],
            num_steps=args.steps, num_resamples=args.resamples, **cond))
        dest = out / f"inpainted_{Path(args.inpaint).stem}.wav"
        wav_write(dest, audio[0], sample_rate)
        print(f"wrote {dest} (regenerated [{a}:{b}) of {src.shape[-1]} "
              f"frames, {args.steps}-step RePaint x{args.resamples}, "
              f"{sample_rate} Hz)")
        return

    if args.total_length is not None and args.total_length > args.length:
        # Long-form: chain RePaint-outpainted windows past the training
        # crop (longform.generate_long). One key drives the whole batch,
        # so outputs are deterministic in (--seed, --num) together.
        from .longform import generate_long

        overlap = args.overlap or max(1, args.length // 4)
        audio = np.asarray(generate_long(
            model, length=args.total_length, window=args.length,
            overlap=overlap, num_steps=args.steps,
            num_resamples=args.resamples,
            key=jax.random.key(args.seed), batch_size=args.num, **cond))
        for i in range(args.num):
            wav_write(out / f"long_{args.seed}_{i}.wav", audio[i],
                      sample_rate)
        print(f"wrote {args.num} long-form samples ({args.total_length} "
              f"frames = {args.total_length / sample_rate:.1f} s, "
              f"window {args.length}, overlap {overlap}, {args.steps}-step) "
              f"to {out}")
        return

    # One batched device program for all requested samples (batch-8
    # sampling measures ~1.4x batch-1 samples/min, PERFORMANCE.md); each
    # sample still derives from its own seed, so outputs are per-seed
    # deterministic regardless of --num.
    noise = np.stack([
        np.random.default_rng(args.seed + i).standard_normal(
            (c, args.length)).astype(np.float32)
        for i in range(args.num)])
    audio = np.asarray(model.sample(noise, num_steps=args.steps, **cond))
    for i in range(args.num):
        wav_write(out / f"sample_{args.seed + i}.wav", audio[i],
                  sample_rate)
    print(f"wrote {args.num} samples ({args.steps}-step "
          f"{args.sampler}, {sample_rate} Hz) to {out}")


def _cmd_serve(args) -> None:
    """Serve a trained model over HTTP: concurrent POSTs microbatch into
    fixed-size device batches (serve.py); results are quantized to PCM16
    on device (4x smaller downloads) and returned as WAV bodies."""
    _enable_compile_cache()
    import jax.numpy as jnp

    from . import GenerationService
    from .server import make_server

    if args.artifact is not None:
        # Model-code-free deployment: the AOT artifact + the params dir
        # are the whole payload (export.py). Shapes/steps are the
        # artifact's; a mismatched request fails loudly.
        ignored = [flag for flag, given in [
            ("--steps", args.steps != 50), ("--sampler", args.sampler != "v"),
            ("--dtype", args.dtype != "bf16"),
            ("--length", args.length != 2**18),
            ("--batch-size", args.batch_size != 8),
            ("--preset", args.preset is not None)] if given]
        if ignored:
            print(f"warning: {', '.join(ignored)} ignored in --artifact "
                  "mode (steps/shapes/batch are baked into the artifact's "
                  "manifest; re-export to change them)")
        from .export import ArtifactSampler, load_params

        model = ArtifactSampler(args.artifact, load_params(args.model))
        service = GenerationService(
            model, num_steps=model.num_steps, batch_size=model.batch_size,
            max_wait_ms=args.max_wait_ms, result_format="pcm16")
        server = make_server(
            service,
            sample_rate=(args.sample_rate or model.sample_rate or 48000),
            default_length=model.length, channels=model.in_channels,
            task="unconditional", model=model, host=args.host,
            port=args.port, verbose=True)
        host, port = server.server_address[:2]
        print(f"serving AOT artifact {args.artifact} "
              f"({model.num_steps}-step, batch {model.batch_size}, "
              f"length {model.length}) on http://{host}:{port}")
        _serve_until_stopped(server, service)
        return

    cfg, task, sample_rate, upsample_factor = _load_run_config(args)
    if task == "ar":
        raise SystemExit(
            "AR serving needs the Python API (its sampler generates from "
            "a key, not per-request noise/input payloads)")
    model = _build_model(cfg, args.sampler, task, upsample_factor)
    c = cfg.get("in_channels", 2)
    model.initialize(jnp.zeros((1, c, args.length)),
                 **_init_cond_kwargs(cfg))
    model.load(args.model)

    service = GenerationService(
        model, num_steps=args.steps, batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms, result_format="pcm16",
        # AE serving batches latent->audio diffusion decodes; /transform
        # encodes each upload before submitting.
        method="decode" if task == "autoencoder" else "sample")
    server = make_server(
        service, sample_rate=sample_rate, default_length=args.length,
        channels=c, task=task, model=model, host=args.host, port=args.port,
        verbose=True)
    host, port = server.server_address[:2]
    print(f"serving {task} model ({args.steps}-step {args.sampler}, batch "
          f"{args.batch_size}, {sample_rate} Hz) on http://{host}:{port}")
    print("POST /generate {\"seed\": 1}  |  GET /stats  |  GET /healthz"
          if task == "unconditional" else
          "POST /transform (WAV body)  |  GET /stats  |  GET /healthz")
    _serve_until_stopped(server, service)


def _serve_until_stopped(server, service) -> None:
    # Orchestrators stop containers with SIGTERM: drain in-flight batches
    # instead of dying mid-request (KeyboardInterrupt covers ^C).
    import signal

    def _sigterm(_sig, _frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


def _cmd_export(args) -> None:
    """AOT-export a trained run's sampling program (export.py): the
    artifact + the params dir are the full deployment payload — serving
    hosts run it without this package's model-definition code."""
    _enable_compile_cache()
    import jax.numpy as jnp

    from .export import export_sampler

    cfg, task, sample_rate, _ = _load_run_config(args)
    if task != "unconditional":
        raise SystemExit(
            f"export drives unconditional models; a {task} model's array "
            "conditioning needs the Python API (export_sampler(**cond))")
    cond = {}
    if args.embedding is not None:
        # Conditional artifact: the embedding becomes a traced INPUT of
        # the exported program (shape taken from the example .npy, batched
        # to the serving batch); serving hosts pass a matching array per
        # call. --embedding-scale bakes guided two-pass sampling in;
        # guided-distilled students omit it (single pass).
        import jax
        import numpy as np

        emb = np.load(args.embedding)
        cond["embedding"] = jax.ShapeDtypeStruct(
            (args.batch_size,) + tuple(emb.shape), jnp.float32)
        if args.embedding_scale is not None:
            cond["embedding_scale"] = args.embedding_scale
    elif args.embedding_scale is not None:
        raise SystemExit("--embedding-scale needs --embedding (the "
                         "example .npy that fixes the input shape)")
    # Param shapes are length-independent: build the tree at a short
    # length (fast), then export traces at the real serving length via
    # shape specs — no full-length forward compile at export time.
    init_len = _short_init_length(cfg)
    model = _build_model(dict(cfg), args.sampler, task)
    c = cfg.get("in_channels", 2)
    model.initialize(jnp.zeros((1, c, init_len)),
                 **_init_cond_kwargs(cfg))
    model.load(args.model)
    manifest = export_sampler(
        model, args.out, length=args.length, batch_size=args.batch_size,
        num_steps=args.steps, sample_rate=sample_rate, **cond)
    print(f"exported {manifest['noise_shape']} x {args.steps}-step "
          f"{args.sampler} sampler for platforms "
          f"{manifest['platforms']} to {args.out}")


def _cmd_info(args) -> None:
    """Describe a training run: recorded config, geometry, param count,
    available checkpoints — without touching an accelerator."""
    import numpy as np

    run = Path(args.run)
    cfg_path = run / "config.json"
    if not cfg_path.exists():
        raise SystemExit(f"no config.json under {run} — is this a run "
                         "directory written by `train`?")
    recorded = json.loads(cfg_path.read_text())
    cfg = dict(recorded)
    task = cfg.pop("_task", "unconditional")
    sr = cfg.pop("_sample_rate", None)
    cfg.pop("_upsample_factor", None)
    dtype = cfg.pop("_dtype", None)

    print(f"run: {run}")
    print(f"task: {task}   sample_rate: {sr}   compute dtype: "
          f"{dtype or 'f32'}")
    chs = cfg.get("channels")
    if chs is not None:
        factors = cfg.get("factors", [])
        print(f"net: {len(chs)}-level U-Net, channels {chs}")
        if factors:
            print(f"     factors {factors} (total downsampling "
                  f"x{int(np.prod(factors))})")
        att = cfg.get("attentions")
        if att:
            print(f"     attention at levels "
                  f"{[i for i, a in enumerate(att) if a]}")
    ckpts = run / "ckpts"
    if ckpts.exists():
        steps = sorted(int(p.name) for p in ckpts.iterdir()
                       if p.name.isdigit())
        print(f"checkpoints: {steps if steps else 'none'}")
    exported = [p for p in ([run / "model"]
                            + sorted(run.glob("model_distilled*")))
                if p.exists()]
    for p in exported:
        print(f"exported params: {p}")
    if args.params:
        # Param count needs the real tree: initialize at a short length
        # (conv nets: the count is length-independent).
        import jax
        import jax.numpy as jnp

        try:
            dev = jax.devices("cpu")[0]
        except RuntimeError:
            dev = jax.devices()[0]
        with jax.default_device(dev):
            # Keep the MODEL-shaping underscore keys (_encoder,
            # _inject_depth, _length, _num_splits) — dropping them would
            # rebuild a different model (wrong/missing encoder, AR
            # KeyError) and report a wrong parameter count. Only the
            # bookkeeping keys (_task/_sample_rate/...) are stripped.
            drop = {"_task", "_sample_rate", "_upsample_factor", "_dtype",
                    "_init_from"}
            net_cfg = {k: v for k, v in recorded.items() if k not in drop}
            if dtype:
                net_cfg["_dtype"] = dtype
            model = _build_model(net_cfg, "v", task,
                                 recorded.get("_upsample_factor"))
            c = cfg.get("in_channels", 2)
            L = recorded.get("_length") or int(
                np.prod(cfg.get("factors", [1])) or 1)
            model.initialize(jnp.zeros((1, c, max(L, 64))),
                             **_init_cond_kwargs(cfg))
            n = sum(int(np.prod(p.shape))
                    for p in jax.tree_util.tree_leaves(model.params))
            print(f"parameters: {n/1e6:.1f} M "
                  f"({n*4/1e9:.2f} GB f32 master)")


def _cmd_eval(args) -> None:
    import numpy as np

    from .data import wav_probe, wav_read
    from .eval import (band_distance, band_profile, frechet_band_distance,
                       pairwise_diversity)

    refs = sorted(Path(args.ref).glob("*.wav"))[:args.max_ref]
    if not refs:
        raise SystemExit(f"no .wav files under {args.ref}")
    samples = sorted(Path(args.samples).glob("*.wav"))
    if not samples:
        raise SystemExit(f"no .wav files under {args.samples}")

    # One common crop so every profile lives on the same band grid.
    lengths = [wav_probe(f)[2] for f in refs + samples]
    crop = min([args.crop] + lengths) if args.crop else min(lengths)
    sr = args.sample_rate or wav_probe(refs[0])[1]

    ref_audio = np.stack([wav_read(f, 0, crop) for f in refs])
    ref_prof = band_profile(ref_audio, sr)
    rng = np.random.default_rng(0)
    noise_base = band_distance(band_profile(
        rng.standard_normal(ref_audio.shape[1:]).astype(np.float32)
        * float(ref_audio.std()), sr), ref_prof)

    dists = []
    sample_audio = []
    for f in samples:
        x = wav_read(f, 0, crop)
        sample_audio.append(x)
        d = band_distance(band_profile(x, sr), ref_prof)
        dists.append(d)
        print(f"{f.name}: band-dist {d:.3f}, rms {x.std():.3f}, "
              f"peak {np.abs(x).max():.3f}, "
              f"finite {bool(np.isfinite(x).all())}")
    div = (pairwise_diversity(np.stack(sample_audio), sr)
           if len(sample_audio) >= 2 else None)
    # Set-level Fréchet distance in band-profile space: the heterogeneity-
    # robust headline metric (per-file distance to the corpus MEAN profile
    # misleads when real files are diverse — see eval.py). Baseline: a
    # same-size set of white-noise clips at the corpus rms.
    fbd = fbd_noise = None
    if len(sample_audio) >= 2 and len(refs) >= 2:
        fbd = frechet_band_distance(ref_audio, np.stack(sample_audio), sr)
        noise_set = (rng.standard_normal((len(sample_audio),)
                                         + ref_audio.shape[1:])
                     .astype(np.float32) * float(ref_audio.std()))
        fbd_noise = frechet_band_distance(ref_audio, noise_set, sr)
    summary = {"num_samples": len(samples), "sample_rate": sr,
               "crop": int(crop),
               "band_dist_mean": round(float(np.mean(dists)), 4),
               "band_dist_worst": round(float(np.max(dists)), 4),
               "noise_baseline": round(noise_base, 4),
               "frechet_band_dist": (round(fbd, 4)
                                     if fbd is not None else None),
               "frechet_noise_baseline": (round(fbd_noise, 4)
                                          if fbd_noise is not None
                                          else None),
               "pairwise_diversity": (round(div, 4)
                                      if div is not None else None)}
    print(json.dumps(summary))


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
    t.add_argument("--lr-schedule", choices=("constant", "cosine"),
                   default="constant",
                   help="cosine decays to 0 over --steps (with warmup)")
    t.add_argument("--warmup-steps", type=int, default=0)
    t.add_argument("--max-grad-norm", type=float, default=None,
                   help="global-norm gradient clipping")
    t.add_argument("--ema-decay", type=float, default=None)
    t.add_argument("--accum-steps", type=int, default=1)
    t.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps scanned per device call (uploads "
                        "that many stacked batches at once; amortizes "
                        "per-step dispatch/RTT on remote-attached TPUs)")
    t.add_argument("--init-from", default=None, metavar="PARAMS_DIR",
                   help="warm-start params from an exported model dir "
                        "(continuation / fine-tuning; optimizer and step "
                        "counter start fresh — existing checkpoints in "
                        "--out still take precedence)")
    t.add_argument("--checkpoint-every", type=int, default=1000)
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--data-placement", choices=("auto", "host", "device"),
                   default="auto",
                   help="device: keep the corpus HBM-resident and crop "
                        "batches on device (zero per-step uploads — the "
                        "remote-TPU fast path); auto picks device for "
                        "corpora <= 1 GiB")
    t.add_argument("--task", choices=("unconditional", "upsampler",
                                      "vocoder", "autoencoder", "ar"),
                   default=None,
                   help="model task (default: inferred from the preset "
                        "name or the JSON config's _task key)")
    t.add_argument("--upsample-factor", type=int, default=None,
                   help="upsampler task: the rate ratio (default 16)")
    t.add_argument("--num-splits", type=int, default=4,
                   help="ar task: σ-ladder splits of the --crop context "
                        "window")
    t.add_argument("--caption-dir", default=None, metavar="DIR",
                   help="sidecar captions: one DIR/<wav stem>.txt per "
                        "corpus file, encoded once through --text-encoder "
                        "and paired with that file's crops (the reference "
                        "T5 workflow, CLI-complete; needs a text-"
                        "conditional config, e.g. TEXT_CONDITIONAL_48K)")
    t.add_argument("--text-encoder", choices=("t5", "random", "stub"),
                   default="t5",
                   help="caption encoder: t5 = frozen t5-base from the "
                        "local HF cache; random = real T5 architecture "
                        "with frozen random weights (offline); stub = "
                        "hash embeddings (tests). Recorded in config.json "
                        "so `sample --text` reuses the same encoder")
    t.add_argument("--embedding-dir", default=None,
                   help="directory of per-file .npy embeddings "
                        "(<wav stem>.npy, [tokens, features]): trains a "
                        "cross-attention model on precomputed text/CLAP "
                        "embeddings — no local T5 needed")
    t.add_argument("--embedding-mask-proba", type=float, default=0.1,
                   help="CFG embedding-dropout rate during "
                        "--embedding-dir training")
    t.add_argument("--dtype", choices=("bf16", "f32"), default="bf16",
                   help="compute dtype (master params stay f32); bf16 is "
                        "the TPU production setting")
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
    s.add_argument("--input", default=None,
                   help="task-model input WAV: low-rate audio for an "
                        "upsampler, a reference WAV (mel source) for a "
                        "vocoder, audio to round-trip through the latent "
                        "for an autoencoder")
    s.add_argument("--dtype", choices=("bf16", "f32"), default="bf16",
                   help="compute dtype; the recorded training config wins "
                        "when present")
    s.add_argument("--total-length", type=int, default=None,
                   help="generate audio LONGER than --length by chaining "
                        "RePaint-outpainted windows (longform.generate_long); "
                        "--length stays the per-window size the model was "
                        "trained at")
    s.add_argument("--overlap", type=int, default=None,
                   help="window overlap for --total-length "
                        "(default --length//4)")
    s.add_argument("--resamples", type=int, default=2,
                   help="RePaint harmonization resamples per step for "
                        "--total-length windows")
    s.add_argument("--text", default=None, metavar="CAPTION",
                   help="text prompt, encoded through the run's recorded "
                        "text encoder (train --caption-dir); combine with "
                        "--embedding-scale for classifier-free guidance")
    s.add_argument("--embedding", default=None,
                   help=".npy of precomputed text/conditioning embeddings "
                        "([tokens, features] broadcast to --num, or "
                        "[num, tokens, features]) for cross-attention "
                        "models trained via the Python API")
    s.add_argument("--embedding-scale", type=float, default=None,
                   help="CFG guidance scale (needs --embedding and a "
                        "use_embedding_cfg model)")
    s.add_argument("--chunks", type=int, default=8,
                   help="ar task: number of generated chunks "
                        "(output length = chunks x length/num_splits)")
    s.add_argument("--inpaint", default=None,
                   help="WAV to inpaint: frames in "
                        "[--mask-start, --mask-end) are regenerated "
                        "(RePaint), the rest kept; --resamples controls "
                        "seam harmonization")
    s.add_argument("--mask-start", type=int, default=None,
                   help="first frame to regenerate (with --inpaint)")
    s.add_argument("--mask-end", type=int, default=None,
                   help="one past the last frame to regenerate")
    s.set_defaults(fn=_cmd_sample)

    d = sub.add_parser(
        "distill", help="progressively distill a trained model to fewer "
        "sampling steps (64 -> 8: ~8x lower serving latency)")
    d.add_argument("--model", required=True,
                   help="model dir saved by `train` (…/model)")
    d.add_argument("--data", required=True,
                   help="directory of .wav files (the training corpus)")
    d.add_argument("--preset", default=None,
                   help="preset/JSON config; defaults to the config.json "
                        "recorded next to the model dir")
    d.add_argument("--base-steps", type=int, default=64,
                   help="step count the teacher is considered to run at")
    d.add_argument("--target-steps", type=int, default=8,
                   help="distilled step count (base halved stage by stage)")
    d.add_argument("--stage-steps", type=int, default=2000,
                   help="training steps per halving stage")
    d.add_argument("--lr", type=float, default=2e-5)
    d.add_argument("--batch", type=int, default=4)
    d.add_argument("--crop", type=int, default=2**18)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--log-every", type=int, default=200)
    d.add_argument("--data-placement", choices=("auto", "host", "device"),
                   default="auto")
    d.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    d.add_argument("--embedding-dir", default=None,
                   help="paired per-file .npy embeddings (text-conditional "
                        "runs trained with train --embedding-dir)")
    d.add_argument("--guidance-scale", type=float, default=None,
                   help="distill classifier-free guidance at this scale "
                        "into a single conditional pass first (Meng et "
                        "al. 2023); requires --embedding-dir")
    d.add_argument("--guidance-steps", type=int, default=2000,
                   help="training steps for the guidance stage")
    d.add_argument("--out", default=None,
                   help="output params dir (default: "
                        "<run>/model_distilled<target>)")
    d.set_defaults(fn=_cmd_distill)

    e = sub.add_parser(
        "eval", help="score generated WAVs against a reference corpus "
        "(third-octave band-profile distance + diversity; the metrics "
        "behind PERFORMANCE.md's quality numbers)")
    e.add_argument("--ref", required=True,
                   help="directory of reference corpus WAVs")
    e.add_argument("--samples", required=True,
                   help="directory of generated WAVs to score")
    e.add_argument("--crop", type=int, default=None,
                   help="analysis length in frames (default: shortest "
                        "file among refs+samples)")
    e.add_argument("--max-ref", type=int, default=16,
                   help="number of reference files for the corpus profile")
    e.add_argument("--sample-rate", type=int, default=None,
                   help="override the rate probed from the first ref")
    e.set_defaults(fn=_cmd_eval)

    v = sub.add_parser(
        "serve", help="serve a trained model over HTTP (microbatching: "
        "concurrent requests share fixed-size device batches)")
    v.add_argument("--model", required=True,
                   help="model dir saved by `train` (…/model)")
    v.add_argument("--preset", default=None,
                   help="preset/JSON config; defaults to the config.json "
                        "recorded next to the model dir")
    v.add_argument("--artifact", default=None,
                   help="serve from an AOT artifact written by `export` "
                        "(no model-definition code: --model is just the "
                        "params dir; shapes/steps/batch come from the "
                        "artifact's manifest)")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8000)
    v.add_argument("--batch-size", type=int, default=8,
                   help="device batch size (partial batches are padded)")
    v.add_argument("--steps", type=int, default=50,
                   help="default sampling steps (per-request num_steps "
                        "overrides)")
    v.add_argument("--max-wait-ms", type=float, default=100.0,
                   help="how long to hold an incomplete batch open")
    v.add_argument("--length", type=int, default=2**18,
                   help="default generation length in frames")
    v.add_argument("--sampler", choices=("v", "dpm"), default="v")
    v.add_argument("--sample-rate", type=int, default=None)
    v.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    v.set_defaults(fn=_cmd_serve)

    x = sub.add_parser(
        "export", help="AOT-export the sampling program (StableHLO + "
        "manifest): deploy without the model-definition code")
    x.add_argument("--model", required=True,
                   help="model dir saved by `train` (…/model)")
    x.add_argument("--out", required=True, help="artifact directory")
    x.add_argument("--preset", default=None,
                   help="preset/JSON config; defaults to the config.json "
                        "recorded next to the model dir")
    x.add_argument("--length", type=int, default=2**18)
    x.add_argument("--batch-size", type=int, default=1)
    x.add_argument("--steps", type=int, default=50)
    x.add_argument("--sampler", choices=("v", "dpm"), default="v")
    x.add_argument("--sample-rate", type=int, default=None)
    x.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    x.add_argument("--embedding", default=None,
                   help="example .npy fixing the conditional artifact's "
                        "embedding input shape (batched to --batch-size)")
    x.add_argument("--embedding-scale", type=float, default=None,
                   help="bake guided two-pass CFG at this scale into the "
                        "artifact (omit for guided-distilled students)")
    x.set_defaults(fn=_cmd_export)

    i = sub.add_parser("info", help="describe a training run (config, "
                       "geometry, checkpoints, optional param count)")
    i.add_argument("--run", required=True,
                   help="run directory written by `train`")
    i.add_argument("--params", action="store_true",
                   help="also initialize the net (CPU) and count params")
    i.set_defaults(fn=_cmd_info)

    args = ap.parse_args(argv)
    args.fn(args)
