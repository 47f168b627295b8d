"""CLI: train on a tiny WAV directory, then sample from the saved model."""
import json
import wave

import numpy as np
import pytest

from audio_diffusion_tpu.cli import main


def _write_wav(path, frames=2048, channels=1, sr=8000, seed=0):
    rng = np.random.default_rng(seed)
    data = (rng.standard_normal((frames, channels)) * 0.1 * 32767).astype(
        np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


@pytest.fixture()
def tiny_setup(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    for i in range(3):
        _write_wav(data / f"{i}.wav", seed=i)
    cfg = tmp_path / "tiny.json"
    cfg.write_text(json.dumps(dict(
        in_channels=1, channels=[8, 16], factors=[1, 2], items=[1, 1],
        modulation_features=32)))
    return data, cfg, tmp_path


def test_cli_train_then_sample(tiny_setup):
    data, cfg, tmp = tiny_setup
    run = tmp / "run"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "3", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "2"])
    assert (run / "model").exists()

    # Re-running the same command resumes AND respects the total budget
    # (fit runs 0 remaining steps), then re-exports the model (overwrite).
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "3", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "2"])

    out = tmp / "samples"
    # No --preset / --sample-rate: both come from run/config.json.
    main(["sample", "--model", str(run / "model"),
          "--out", str(out), "--num", "2", "--steps", "2",
          "--sampler", "dpm", "--length", "512"])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2
    from audio_diffusion_tpu.data import wav_probe

    c, sr, n = wav_probe(wavs[0])
    assert (c, sr, n) == (1, 8000, 512)


def test_cli_train_init_from_warm_start(tiny_setup):
    """--init-from loads exported params into a NEW run (continuation /
    fine-tuning): the warm-started run's initial params equal the source
    run's export, and provenance lands in config.json."""
    import jax.numpy as jnp
    import jax

    data, cfg, tmp = tiny_setup
    src = tmp / "src"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(src), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "100"])
    cont = tmp / "cont"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(cont), "--steps", "0", "--batch", "2",
          "--crop", "512", "--init-from", str(src / "model"),
          "--checkpoint-every", "100"])
    assert json.loads((cont / "config.json").read_text())["_init_from"] \
        == str(src / "model")
    # 0 further steps: the continuation's export equals the source export.
    from audio_diffusion_tpu import DiffusionModel, UNetV0

    kw = json.loads(cfg.read_text())
    a = DiffusionModel(net_t=UNetV0, **kw)
    a.initialize(jnp.zeros((1, 1, 512)))
    a.load(src / "model")
    b = DiffusionModel(net_t=UNetV0, **kw)
    b.initialize(jnp.zeros((1, 1, 512)))
    b.load(cont / "model")
    flat_a = jax.tree_util.tree_leaves(a.params)
    flat_b = jax.tree_util.tree_leaves(b.params)
    assert all(bool(jnp.array_equal(x, y))
               for x, y in zip(flat_a, flat_b))
    # sample/info rebuild from config.json: the _init_from provenance key
    # must not leak into model kwargs (regression: TypeError in UNetV0).
    out = tmp / "warm_samples"
    main(["sample", "--model", str(cont / "model"), "--out", str(out),
          "--num", "1", "--steps", "2", "--length", "512"])
    assert len(list(out.glob("*.wav"))) == 1
    main(["info", "--run", str(cont)])


def test_cli_unknown_preset_errors(tmp_path):
    with pytest.raises(SystemExit, match="unknown preset"):
        main(["sample", "--model", "x", "--preset", "NOPE",
              "--out", str(tmp_path)])
    # TEXT_CONDITIONAL became CLI-drivable in round 5 (--caption-dir /
    # sample --text); training it still demands a caption source.
    from audio_diffusion_tpu.cli import _resolve_config

    cfg, task = _resolve_config("TEXT_CONDITIONAL_48K")
    assert task == "unconditional" and cfg["use_text_conditioning"]


def test_cli_named_preset_resolves():
    from audio_diffusion_tpu.cli import _resolve_config

    cfg, task = _resolve_config("unconditional_48k")
    assert cfg["in_channels"] == 2 and len(cfg["channels"]) == 9
    assert task == "unconditional"
    _, task = _resolve_config("VOCODER_48K")
    assert task == "vocoder"
    _, task = _resolve_config("UPSAMPLER_16X")
    assert task == "upsampler"


def test_cli_upsampler_task(tmp_path):
    """Train an upsampler via the CLI, then upsample a low-rate WAV."""
    data = tmp_path / "data"
    data.mkdir()
    for i in range(2):
        _write_wav(data / f"{i}.wav", seed=i)
    cfg = tmp_path / "up.json"
    cfg.write_text(json.dumps(dict(
        _task="upsampler", channels=[8, 16], factors=[1, 2], items=[1, 1],
        modulation_features=32)))
    run = tmp_path / "run_up"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--upsample-factor", "4",
          "--log-every", "2", "--checkpoint-every", "100"])
    rec = json.loads((run / "config.json").read_text())
    assert rec["_task"] == "upsampler" and rec["_upsample_factor"] == 4

    low = tmp_path / "low.wav"
    _write_wav(low, frames=128, seed=9, sr=2000)
    out = tmp_path / "up_out"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--steps", "2", "--length", "512", "--input", str(low)])
    from audio_diffusion_tpu.data import wav_probe

    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 1 and wavs[0].name == "upsampled_low.wav"
    c, sr, n = wav_probe(wavs[0])
    assert (c, sr, n) == (1, 8000, 128 * 4)  # 4x the low-rate input


def test_cli_vocoder_task(tmp_path):
    """Train a vocoder via the CLI, then re-vocode a reference WAV's mel."""
    data = tmp_path / "data"
    data.mkdir()
    for i in range(2):
        _write_wav(data / f"{i}.wav", seed=i)
    cfg = tmp_path / "voc.json"
    cfg.write_text(json.dumps(dict(
        _task="vocoder", mel_n_fft=64, mel_channels=8,
        channels=[8, 16], factors=[1, 2], items=[1, 1],
        modulation_features=32)))
    run = tmp_path / "run_voc"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "2",
          "--checkpoint-every", "100"])
    assert json.loads((run / "config.json").read_text())["_task"] == "vocoder"

    ref = tmp_path / "ref.wav"
    _write_wav(ref, frames=512, seed=9)
    out = tmp_path / "voc_out"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--steps", "2", "--length", "512", "--input", str(ref)])
    from audio_diffusion_tpu.data import wav_probe

    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 1 and wavs[0].name == "vocoded_ref.wav"
    c, sr, n = wav_probe(wavs[0])
    assert (c, sr, n) == (1, 8000, 512)


def test_cli_info(tiny_setup, capsys):
    data, cfg, tmp = tiny_setup
    run = tmp / "run_info"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "1", "--checkpoint-every", "2"])
    capsys.readouterr()
    main(["info", "--run", str(run), "--params"])
    out = capsys.readouterr().out
    assert "task: unconditional" in out
    assert "2-level U-Net" in out and "[8, 16]" in out
    assert "exported params" in out
    assert "parameters:" in out and " M " in out

    with pytest.raises(SystemExit, match="config.json"):
        main(["info", "--run", str(tmp / "nonexistent")])


def test_cli_serve_builds_and_binds(tiny_setup, monkeypatch, capsys):
    """`serve` resolves the run config, loads params, binds the HTTP
    server, and tears down cleanly (serve_forever stubbed; the HTTP
    surface itself is covered by test_server.py)."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_srv"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "1", "--batch", "2",
          "--crop", "512", "--log-every", "1", "--checkpoint-every", "5"])

    from audio_diffusion_tpu import server as server_mod

    bound = {}

    def fake_serve_forever(self):
        bound["addr"] = self.server_address
        bound["task"] = self.task

    monkeypatch.setattr(server_mod.HttpGenerationServer, "serve_forever",
                        fake_serve_forever)
    # BaseServer.shutdown() waits for serve_forever's loop to exit; with
    # serve_forever stubbed the loop never ran, so stub shutdown too.
    monkeypatch.setattr(server_mod.HttpGenerationServer, "shutdown",
                        lambda self: self.server_close())
    main(["serve", "--model", str(run / "model"), "--port", "0",
          "--steps", "2", "--batch-size", "2", "--length", "512"])
    assert bound["addr"][1] > 0  # bound a real free port
    assert bound["task"] == "unconditional"
    out = capsys.readouterr().out
    assert "serving unconditional model" in out
    assert f":{bound['addr'][1]}" in out  # the real bound port is printed


def test_cli_train_cosine_schedule(tiny_setup):
    """--lr-schedule cosine + warmup + grad clipping drive end-to-end."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_cos"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "3", "--batch", "2",
          "--crop", "512", "--log-every", "1", "--checkpoint-every", "9",
          "--lr-schedule", "cosine", "--warmup-steps", "1",
          "--max-grad-norm", "1.0"])
    assert (run / "model").exists()


def test_cli_sample_total_length_longform(tiny_setup):
    """--total-length chains outpainted windows: output exceeds the crop."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_long"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "2"])

    out = tmp / "long_samples"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--num", "2", "--steps", "2", "--length", "512",
          "--total-length", "1200", "--overlap", "128",
          "--resamples", "1"])
    wavs = sorted(out.glob("long_*.wav"))
    assert len(wavs) == 2
    from audio_diffusion_tpu.data import wav_probe

    c, sr, n = wav_probe(wavs[0])
    assert (c, sr, n) == (1, 8000, 1200)


def test_cli_distill_then_sample(tiny_setup, capsys):
    """distill halves 4->2, saves next to the run, and `sample`/`info`
    pick the distilled params up without extra flags."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_distill"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "9"])

    main(["distill", "--model", str(run / "model"), "--data", str(data),
          "--base-steps", "4", "--target-steps", "2",
          "--stage-steps", "2", "--batch", "2", "--crop", "512",
          "--log-every", "1"])
    distilled = run / "model_distilled2"
    assert distilled.exists()

    out = tmp / "fast_samples"
    main(["sample", "--model", str(distilled), "--out", str(out),
          "--num", "1", "--steps", "2", "--length", "512"])
    assert len(list(out.glob("*.wav"))) == 1

    main(["info", "--run", str(run)])
    assert "model_distilled2" in capsys.readouterr().out


def test_cli_distill_guards(tiny_setup):
    data, cfg, tmp = tiny_setup
    with pytest.raises(SystemExit, match="not reachable"):
        main(["distill", "--model", str(tmp / "nope"), "--data", str(data),
              "--preset", str(cfg),
              "--base-steps", "6", "--target-steps", "4"])


def test_cli_export_artifact(tiny_setup, capsys):
    """export writes a loadable AOT artifact that reproduces the trained
    model's sampling bit-exactly."""
    import jax
    import numpy as np

    data, cfg, tmp = tiny_setup
    run = tmp / "run_export"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "9"])
    art = tmp / "artifact"
    main(["export", "--model", str(run / "model"), "--out", str(art),
          "--length", "512", "--steps", "2"])
    assert "exported" in capsys.readouterr().out

    from audio_diffusion_tpu.export import load_sampler

    sampler, manifest = load_sampler(art)
    assert manifest["sample_rate"] == 8000  # recorded training rate
    assert manifest["noise_shape"] == [1, 1, 512]

    # Rebuild the model the way `sample` would, and A/B the artifact.
    from audio_diffusion_tpu.cli import _build_model

    import json as _json
    recorded = _json.loads((run / "config.json").read_text())
    recorded.pop("_task"), recorded.pop("_sample_rate")
    model = _build_model(recorded, "v", "unconditional")
    import jax.numpy as jnp

    model.initialize(jnp.zeros((1, 1, 512)))
    model.load(run / "model")
    noise = jax.random.normal(jax.random.key(0), (1, 1, 512), jnp.float32)
    want = np.asarray(model.sample(noise, num_steps=2))
    got = np.asarray(sampler(model.params, noise))
    np.testing.assert_array_equal(got, want)


def test_cli_serve_from_artifact(tiny_setup, monkeypatch, capsys):
    """`serve --artifact` deploys from (artifact, params) with no model
    config: shapes/steps/batch come from the manifest."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_art"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "1", "--batch", "2",
          "--crop", "512", "--log-every", "1", "--checkpoint-every", "5"])
    art = tmp / "artifact_srv"
    main(["export", "--model", str(run / "model"), "--out", str(art),
          "--length", "512", "--batch-size", "2", "--steps", "2"])

    from audio_diffusion_tpu import server as server_mod

    bound = {}

    def fake_serve_forever(self):
        bound["addr"] = self.server_address
        bound["length"] = self.default_length
        bound["sr"] = self.sample_rate
        # Drive one request through the artifact-backed service while the
        # "server" is up — the full device path, not just binding.
        fut = self.service.submit_seed(3, length=512, channels=1,
                                       num_steps=2)
        bound["audio"] = fut.result(timeout=120)

    monkeypatch.setattr(server_mod.HttpGenerationServer, "serve_forever",
                        fake_serve_forever)
    monkeypatch.setattr(server_mod.HttpGenerationServer, "shutdown",
                        lambda self: self.server_close())
    main(["serve", "--model", str(run / "model"), "--artifact", str(art),
          "--port", "0"])
    assert bound["addr"][1] > 0
    assert bound["length"] == 512
    assert bound["sr"] == 8000  # manifest recorded the training rate
    assert bound["audio"].dtype == np.int16  # pcm16 on-device results
    assert bound["audio"].shape == (1, 512)
    assert "serving AOT artifact" in capsys.readouterr().out


def test_cli_sample_rate_override_with_recorded_config(tiny_setup):
    """Explicit --sample-rate must not leave _sample_rate behind in the
    net kwargs (regression: the pop used to short-circuit inside `or`,
    crashing model construction for sample/serve/export)."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_sr"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "1", "--batch", "2",
          "--crop", "512", "--log-every", "1", "--checkpoint-every", "5"])
    out = tmp / "sr_samples"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--num", "1", "--steps", "2", "--length", "512",
          "--sample-rate", "4000"])
    from audio_diffusion_tpu.data import wav_probe

    assert wav_probe(next(out.glob("*.wav")))[1] == 4000

    art = tmp / "sr_artifact"
    main(["export", "--model", str(run / "model"), "--out", str(art),
          "--length", "512", "--steps", "2", "--sample-rate", "4000"])
    import json as _json

    assert _json.loads((art / "manifest.json").read_text())[
        "sample_rate"] == 4000


def test_cli_distill_custom_out_is_sampleable(tiny_setup):
    """A custom --out outside the run dir still yields a dir `sample`
    can consume (the run config is replicated next to it)."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_dout"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "1", "--batch", "2",
          "--crop", "512", "--log-every", "1", "--checkpoint-every", "5"])
    custom = tmp / "elsewhere" / "fast_model"
    main(["distill", "--model", str(run / "model"), "--data", str(data),
          "--base-steps", "2", "--target-steps", "1",
          "--stage-steps", "1", "--batch", "2", "--crop", "512",
          "--out", str(custom)])
    out = tmp / "dout_samples"
    main(["sample", "--model", str(custom), "--out", str(out),
          "--num", "1", "--steps", "1", "--length", "512"])
    assert len(list(out.glob("*.wav"))) == 1


def test_cli_autoencoder_task(tmp_path):
    """AUTOENCODER task trains and round-trips a WAV through the latent
    from the CLI (encoder config via the JSON's _encoder/_inject_depth)."""
    data = tmp_path / "data"
    data.mkdir()
    for i in range(2):
        _write_wav(data / f"{i}.wav", frames=2048, channels=2, seed=i)
    cfg = tmp_path / "ae.json"
    cfg.write_text(json.dumps(dict(
        in_channels=2, channels=[8, 16, 32], factors=[1, 4, 8],
        items=[1, 1, 1], modulation_features=32,
        _task="autoencoder", _inject_depth=2,
        _encoder=dict(channels=32, out_channels=4, factors=[2],
                      num_blocks=[1], mel_channels=16, mel_n_fft=64))))
    run = tmp_path / "run_ae"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "1024", "--log-every", "2", "--checkpoint-every", "9"])
    assert (run / "model").exists()
    # The recorded config carries the encoder spec and the data's rate.
    recorded = json.loads((run / "config.json").read_text())
    assert recorded["_task"] == "autoencoder"
    assert recorded["_encoder"]["mel_sample_rate"] == 8000

    out = tmp_path / "ae_out"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--input", str(data / "0.wav"), "--steps", "2",
          "--length", "1024"])
    from audio_diffusion_tpu.data import wav_probe

    dest = out / "reconstructed_0.wav"
    c, sr, n = wav_probe(dest)
    assert (c, sr, n) == (2, 8000, 2048)  # closest_power_2 of 64*32


def test_cli_sample_with_precomputed_embedding(tmp_path):
    """Text-conditional deployment without T5: a Python-API-trained
    cross-attention model samples from the CLI with --embedding (.npy)
    and CFG --embedding-scale."""
    import jax.numpy as jnp

    from audio_diffusion_tpu.cli import _build_model

    cfg = dict(in_channels=1, channels=[8, 32], factors=[1, 4],
               items=[1, 1], cross_attentions=[0, 1], attention_heads=2,
               attention_features=8, modulation_features=32,
               use_embedding_cfg=True, embedding_max_length=8,
               embedding_features=16)
    run = tmp_path / "run_txt"
    run.mkdir()
    # Stand in for a Python-API training run: model params + config.json.
    model = _build_model(dict(cfg, _dtype="f32"), "v", "unconditional")
    model.initialize(jnp.zeros((1, 1, 256)),
                     embedding=jnp.zeros((1, 8, 16)))
    model.save(run / "model")
    (run / "config.json").write_text(json.dumps(
        {**cfg, "_dtype": "f32", "_sample_rate": 8000,
         "_task": "unconditional"}))

    emb = np.random.default_rng(0).standard_normal((8, 16)).astype(
        np.float32)
    np.save(tmp_path / "emb.npy", emb)
    out = tmp_path / "txt_samples"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--num", "2", "--steps", "2", "--length", "256",
          "--embedding", str(tmp_path / "emb.npy"),
          "--embedding-scale", "3.0"])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2
    with pytest.raises(SystemExit, match="needs --embedding"):
        main(["sample", "--model", str(run / "model"), "--out", str(out),
              "--num", "1", "--steps", "2", "--length", "256",
              "--embedding-scale", "3.0"])


def test_cli_caption_workflow_end_to_end(tiny_setup):
    """The captioned-text workflow, CLI-complete (VERDICT r4 #6): sidecar
    x.txt captions train a text-conditional model through the pluggable
    encoder (stub offline), the encoder choice is recorded, and
    `sample --text` + CFG scale generate from a caption."""
    data, _, tmp = tiny_setup
    caps = tmp / "caps"
    caps.mkdir()
    for i, text in enumerate(["warm pad", "snare roll", "low drone"]):
        (caps / f"{i}.txt").write_text(text + "\n")
    cfg = tmp / "txt.json"
    cfg.write_text(json.dumps(dict(
        in_channels=1, channels=[8, 16], factors=[1, 4], items=[1, 1],
        cross_attentions=[0, 1], attention_heads=2, attention_features=8,
        modulation_features=32, use_text_conditioning=True,
        use_embedding_cfg=True, embedding_max_length=8,
        embedding_features=16)))
    run = tmp / "run_cap"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--caption-dir", str(caps),
          "--text-encoder", "stub", "--log-every", "2",
          "--checkpoint-every", "9"])
    recorded = json.loads((run / "config.json").read_text())
    assert recorded["_text_encoder"] == {
        "kind": "stub", "max_length": 8, "features": 16}

    out = tmp / "cap_samples"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--num", "2", "--steps", "2", "--length", "512",
          "--text", "warm pad", "--embedding-scale", "2.0"])
    assert len(sorted(out.glob("*.wav"))) == 2

    # Misuse is loud: --text on a run without a text encoder...
    uncond = tmp / "plain.json"
    uncond.write_text(json.dumps(dict(
        in_channels=1, channels=[8, 16], factors=[1, 2], items=[1, 1],
        modulation_features=32)))
    run2 = tmp / "run_plain"
    main(["train", "--data", str(data), "--preset", str(uncond),
          "--out", str(run2), "--steps", "1", "--batch", "2",
          "--crop", "512", "--log-every", "1", "--checkpoint-every", "9"])
    with pytest.raises(SystemExit, match="text-conditional run"):
        main(["sample", "--model", str(run2 / "model"), "--out", str(out),
              "--num", "1", "--steps", "2", "--length", "512",
              "--text", "anything"])
    # ...a text-conditional config trained without captions/embeddings...
    with pytest.raises(SystemExit, match="caption-dir"):
        main(["train", "--data", str(data), "--preset", str(cfg),
              "--out", str(tmp / "x"), "--steps", "1", "--batch", "2",
              "--crop", "512"])
    # ...and a caption dir with holes names the files.
    (caps / "2.txt").unlink()
    with pytest.raises(SystemExit, match="missing .txt for: 2"):
        main(["train", "--data", str(data), "--preset", str(cfg),
              "--out", str(tmp / "y"), "--steps", "1", "--batch", "2",
              "--crop", "512", "--caption-dir", str(caps),
              "--text-encoder", "stub"])


def test_cli_ar_task(tiny_setup):
    """Autoregressive task: --task ar trains on the crop window and
    `sample --chunks` generates past it."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_ar"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--task", "ar", "--num-splits", "4",
          "--log-every", "2", "--checkpoint-every", "9"])
    recorded = json.loads((run / "config.json").read_text())
    assert recorded["_task"] == "ar"
    assert recorded["_length"] == 512 and recorded["_num_splits"] == 4

    out = tmp / "ar_samples"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--num", "2", "--steps", "4", "--chunks", "6"])
    from audio_diffusion_tpu.data import wav_probe

    wavs = sorted(out.glob("ar_*.wav"))
    assert len(wavs) == 2
    c, sr, n = wav_probe(wavs[0])
    assert (c, sr, n) == (1, 8000, 6 * 128)  # chunks x length/num_splits


def test_cli_inpaint(tiny_setup):
    """--inpaint regenerates only the masked window: outside it the
    output equals the source bit-for-bit (after PCM16 quantization)."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_inp"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "9"])

    out = tmp / "inp_out"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--steps", "2", "--length", "512",
          "--inpaint", str(data / "0.wav"),
          "--mask-start", "128", "--mask-end", "384", "--resamples", "1"])
    from audio_diffusion_tpu.data import wav_read

    got = wav_read(out / "inpainted_0.wav")
    src = wav_read(data / "0.wav")
    assert got.shape == src.shape
    # Kept region: identical up to the writer's PCM16 quantization of the
    # same values (source was PCM16, so bit-equal).
    np.testing.assert_array_equal(got[..., :128], src[..., :128])
    np.testing.assert_array_equal(got[..., 384:], src[..., 384:])
    assert not np.array_equal(got[..., 128:384], src[..., 128:384])

    with pytest.raises(SystemExit, match="mask-start"):
        main(["sample", "--model", str(run / "model"), "--out", str(out),
              "--steps", "2", "--inpaint", str(data / "0.wav")])


def test_cli_longform_with_cfg_embedding(tmp_path):
    """--total-length + --embedding + --embedding-scale: CFG scalars must
    stay STATIC through longform's jitted inpainter (regression: tracing
    the scale crashed the CFG wrapper's Python branch)."""
    import jax.numpy as jnp

    from audio_diffusion_tpu.cli import _build_model

    cfg = dict(in_channels=1, channels=[8, 32], factors=[1, 4],
               items=[1, 1], cross_attentions=[0, 1], attention_heads=2,
               attention_features=8, modulation_features=32,
               use_embedding_cfg=True, embedding_max_length=8,
               embedding_features=16)
    run = tmp_path / "run_lf"
    run.mkdir()
    model = _build_model(dict(cfg, _dtype="f32"), "v", "unconditional")
    model.initialize(jnp.zeros((1, 1, 256)),
                     embedding=jnp.zeros((1, 8, 16)))
    model.save(run / "model")
    (run / "config.json").write_text(json.dumps(
        {**cfg, "_dtype": "f32", "_sample_rate": 8000,
         "_task": "unconditional"}))
    np.save(tmp_path / "emb.npy",
            np.zeros((8, 16), np.float32))
    out = tmp_path / "lf_out"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--num", "1", "--steps", "2", "--length", "256",
          "--total-length", "600", "--overlap", "64", "--resamples", "1",
          "--embedding", str(tmp_path / "emb.npy"),
          "--embedding-scale", "2.0"])
    from audio_diffusion_tpu.data import wav_probe

    assert wav_probe(out / "long_0_0.wav")[2] == 600


def test_cli_task_flag_guards_and_info_params(tiny_setup, capsys):
    """Unconditional-only flags are refused (not ignored) for task runs,
    and info --params rebuilds task models from their recorded configs."""
    data, cfg, tmp = tiny_setup
    run = tmp / "run_ar2"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "1", "--batch", "2",
          "--crop", "512", "--task", "ar", "--log-every", "1",
          "--checkpoint-every", "5"])
    with pytest.raises(SystemExit, match="only applies to unconditional"):
        main(["sample", "--model", str(run / "model"), "--out", str(tmp),
              "--inpaint", str(data / "0.wav")])
    # info --params must keep _length (regression: KeyError '_length').
    main(["info", "--run", str(run), "--params"])
    assert "parameters:" in capsys.readouterr().out

    ae_cfg = tmp / "ae2.json"
    ae_cfg.write_text(json.dumps(dict(
        in_channels=1, channels=[8, 16, 32], factors=[1, 4, 8],
        items=[1, 1, 1], modulation_features=32,
        _task="autoencoder", _inject_depth=2,
        _encoder=dict(channels=16, out_channels=4, factors=[2],
                      num_blocks=[1], mel_channels=16, mel_n_fft=64))))
    run2 = tmp / "run_ae2"
    main(["train", "--data", str(data), "--preset", str(ae_cfg),
          "--out", str(run2), "--steps", "1", "--batch", "2",
          "--crop", "1024", "--log-every", "1", "--checkpoint-every", "5"])
    # info --params must rebuild the RECORDED encoder (regression:
    # underscore keys were stripped -> default 512-wide encoder at
    # inject_depth 6 -> IndexError on a 3-level net).
    main(["info", "--run", str(run2), "--params"])
    assert "parameters:" in capsys.readouterr().out


def test_cli_train_with_embedding_dir(tiny_setup):
    """Text-conditional TRAINING without T5: per-file .npy embeddings pair
    with crops via (x, cond) batches; the trained model then samples from
    the CLI with --embedding."""
    data, _, tmp = tiny_setup
    emb_dir = tmp / "embs"
    emb_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):  # one embedding per corpus file stem
        np.save(emb_dir / f"{i}.npy",
                rng.standard_normal((8, 16)).astype(np.float32))
    cfg = tmp / "txt.json"
    cfg.write_text(json.dumps(dict(
        in_channels=1, channels=[8, 32], factors=[1, 4], items=[1, 1],
        cross_attentions=[0, 1], attention_heads=2, attention_features=8,
        modulation_features=32, use_embedding_cfg=True,
        embedding_max_length=8, embedding_features=16)))
    run = tmp / "run_txttrain"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "9",
          "--embedding-dir", str(emb_dir)])
    assert (run / "model").exists()

    out = tmp / "txttrain_samples"
    main(["sample", "--model", str(run / "model"), "--out", str(out),
          "--num", "1", "--steps", "2", "--length", "512",
          "--embedding", str(emb_dir / "0.npy"),
          "--embedding-scale", "2.0"])
    assert len(list(out.glob("*.wav"))) == 1

    with pytest.raises(SystemExit, match="missing .npy"):
        main(["train", "--data", str(data), "--preset", str(cfg),
              "--out", str(tmp / "run_missing"), "--steps", "1",
              "--batch", "2", "--crop", "512",
              "--embedding-dir", str(tmp)])  # wrong dir: no stems


def test_cli_distill_guidance_scale(tiny_setup):
    """Guided distillation from the CLI: --guidance-scale bakes CFG into a
    single conditional pass before the halving stages; the distilled run
    then samples WITHOUT --embedding-scale."""
    data, _, tmp = tiny_setup
    emb_dir = tmp / "embs"
    emb_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        np.save(emb_dir / f"{i}.npy",
                rng.standard_normal((8, 16)).astype(np.float32))
    cfg = tmp / "txt.json"
    cfg.write_text(json.dumps(dict(
        in_channels=1, channels=[8, 32], factors=[1, 4], items=[1, 1],
        cross_attentions=[0, 1], attention_heads=2, attention_features=8,
        modulation_features=32, use_embedding_cfg=True,
        embedding_max_length=8, embedding_features=16)))
    run = tmp / "run_gdistill"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "2", "--batch", "2",
          "--crop", "512", "--log-every", "2", "--checkpoint-every", "9",
          "--embedding-dir", str(emb_dir)])

    main(["distill", "--model", str(run / "model"), "--data", str(data),
          "--base-steps", "4", "--target-steps", "2",
          "--stage-steps", "2", "--batch", "2", "--crop", "512",
          "--log-every", "1", "--embedding-dir", str(emb_dir),
          "--guidance-scale", "3.0", "--guidance-steps", "2"])
    distilled = run / "model_distilled2"
    assert distilled.exists()

    out = tmp / "gdistill_samples"
    main(["sample", "--model", str(distilled), "--out", str(out),
          "--num", "1", "--steps", "2", "--length", "512",
          "--embedding", str(emb_dir / "0.npy")])  # single-pass: no scale
    assert len(list(out.glob("*.wav"))) == 1


def test_cli_distill_guidance_guards(tiny_setup):
    data, cfg, tmp = tiny_setup
    run = tmp / "run_gg"
    main(["train", "--data", str(data), "--preset", str(cfg),
          "--out", str(run), "--steps", "1", "--batch", "2",
          "--crop", "512", "--log-every", "1", "--checkpoint-every", "9"])
    with pytest.raises(SystemExit, match="no guidance to distill"):
        main(["distill", "--model", str(run / "model"), "--data",
              str(data), "--base-steps", "4", "--target-steps", "2",
              "--guidance-scale", "3.0",
              "--embedding-dir", str(tmp)])
