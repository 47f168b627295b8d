"""Full-model numeric parity: torch oracle vs the assembled JAX net.

The torch oracle (parity/torch_oracle.py) implements the §2.9 network
contract with plain torch convs on [B, C, T]; its weights are imported into
the JAX UNetV0 (parity/importer.py) and both run on host-injected identical
inputs. This is the BASELINE.json parity-gate harness (waveform MSE <= 1e-3
at matched seeds) run against the oracle in place of the uninstallable
pinned a-unet reference.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.parity.importer import import_unet_params
from audio_diffusion_tpu.parity.torch_oracle import (
    TorchUNetV0,
    v_loss_torch,
    v_sample_torch,
)

LENGTH = 256


def build_pair(**overrides):
    """Build (jax_model, oracle) with identical config and oracle weights."""
    cfg = dict(
        in_channels=2,
        channels=[8, 32, 64],
        factors=[1, 4, 2],
        items=[1, 2, 1],
        attentions=[0, 0, 1],
        cross_attentions=[0, 0, 0],
        attention_heads=4,
        attention_features=8,
        modulation_features=64,
    )
    cfg.update(overrides)
    torch.manual_seed(0)
    oracle = TorchUNetV0(**cfg).eval()
    model = DiffusionModel(net_t=UNetV0, **cfg)
    return model, oracle


def init_from_oracle(model, oracle, x, **kwargs):
    model.initialize(x, **kwargs)
    imported = import_unet_params(oracle)
    # Structural check: the importer must produce the exact tree.
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     model.params["net"])[0]}
    imp_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(imported)[0]}
    assert ref_paths == imp_paths, (
        f"tree mismatch:\n missing={sorted(ref_paths - imp_paths)}\n "
        f"extra={sorted(imp_paths - ref_paths)}")
    model.params = {"net": imported}


def test_forward_parity_unconditional():
    model, oracle = build_pair()
    x = np.random.RandomState(1).randn(2, 2, LENGTH).astype(np.float32)
    init_from_oracle(model, oracle, jnp.asarray(x))
    for sigma in (0.0, 0.25, 0.5, 0.9):
        sig_j = jnp.full((2,), sigma, jnp.float32)
        out_j = np.asarray(model.net.apply(
            model.params["net"], jnp.asarray(x), sig_j))
        with torch.no_grad():
            out_t = oracle(torch.from_numpy(x),
                           torch.full((2,), sigma)).numpy()
        err = np.abs(out_j - out_t).max()
        assert err < 1e-3, f"sigma={sigma}: max err {err}"
        assert np.mean((out_j - out_t) ** 2) < 1e-8


def test_forward_parity_full_conditioning():
    """Cross-attention + CFG + context injection, all at once."""
    model, oracle = build_pair(
        cross_attentions=[0, 0, 1],
        context_channels=[0, 0, 5],
        use_embedding_cfg=True,
        embedding_max_length=8,
        embedding_features=32,
    )
    rs = np.random.RandomState(2)
    x = rs.randn(2, 2, LENGTH).astype(np.float32)
    emb = rs.randn(2, 8, 32).astype(np.float32)
    ctx = rs.randn(2, 5, LENGTH // 8).astype(np.float32)
    chans = [None, None, jnp.asarray(ctx)]
    init_from_oracle(model, oracle, jnp.asarray(x),
                     embedding=jnp.asarray(emb), channels=chans)
    sig = jnp.full((2,), 0.3, jnp.float32)
    out_j = np.asarray(model.net.apply(
        model.params["net"], jnp.asarray(x), sig,
        embedding=jnp.asarray(emb), channels=chans))
    with torch.no_grad():
        out_t = oracle(torch.from_numpy(x), torch.full((2,), 0.3),
                       embedding=torch.from_numpy(emb),
                       channels=[None, None, torch.from_numpy(ctx)]).numpy()
    assert np.abs(out_j - out_t).max() < 1e-3
    # Guided (CFG two-pass) parity.
    out_jg = np.asarray(model.net.apply(
        model.params["net"], jnp.asarray(x), sig,
        embedding=jnp.asarray(emb), channels=chans, embedding_scale=3.0))
    with torch.no_grad():
        out_tg = oracle(torch.from_numpy(x), torch.full((2,), 0.3),
                        embedding=torch.from_numpy(emb),
                        embedding_scale=3.0,
                        channels=[None, None, torch.from_numpy(ctx)]).numpy()
    assert np.abs(out_jg - out_tg).max() < 5e-3


def test_sample_50step_waveform_parity():
    """The BASELINE.json parity gate: 50-step sample from identical noise,
    waveform MSE <= 1e-3."""
    model, oracle = build_pair()
    noise = np.random.RandomState(3).randn(1, 2, LENGTH).astype(np.float32)
    init_from_oracle(model, oracle, jnp.asarray(noise))
    out_j = np.asarray(model.sample(jnp.asarray(noise), num_steps=50))
    out_t = v_sample_torch(oracle, torch.from_numpy(noise), 50).numpy()
    mse = float(np.mean((out_j - out_t) ** 2))
    assert mse <= 1e-3, f"waveform MSE {mse}"
    # With matched f32 math the gate should clear by orders of magnitude.
    assert mse <= 1e-6, f"waveform MSE {mse} unexpectedly large"


def test_train_loss_parity():
    """VDiffusion loss with host-injected noise and sigmas."""
    model, oracle = build_pair()
    rs = np.random.RandomState(4)
    x = rs.randn(2, 2, LENGTH).astype(np.float32)
    noise = rs.randn(2, 2, LENGTH).astype(np.float32)
    sigmas = np.array([0.2, 0.7], np.float32)
    init_from_oracle(model, oracle, jnp.asarray(x))

    # JAX side: recompute the loss from the pure pieces (inject noise).
    a = jnp.cos(jnp.asarray(sigmas) * math.pi / 2)[:, None, None]
    b = jnp.sin(jnp.asarray(sigmas) * math.pi / 2)[:, None, None]
    x_noisy = a * jnp.asarray(x) + b * jnp.asarray(noise)
    v_target = a * jnp.asarray(noise) - b * jnp.asarray(x)
    v_pred = model.net.apply(model.params["net"], x_noisy,
                             jnp.asarray(sigmas))
    loss_j = float(jnp.mean((v_pred - v_target) ** 2))

    with torch.no_grad():
        loss_t = float(v_loss_torch(oracle, torch.from_numpy(x),
                                    torch.from_numpy(sigmas),
                                    torch.from_numpy(noise)))
    assert loss_j == pytest.approx(loss_t, rel=1e-4)


def test_forward_parity_full_readme_geometry():
    """All 9 levels of the README flagship geometry (length scaled down to
    2^15 for CPU): every fold width, factor and attention level exercised."""
    cfg = dict(
        in_channels=2,
        channels=[8, 32, 64, 128, 256, 512, 512, 1024, 1024],
        factors=[1, 4, 4, 4, 2, 2, 2, 2, 2],
        items=[1, 2, 2, 2, 2, 2, 2, 4, 4],
        attentions=[0, 0, 0, 0, 0, 1, 1, 1, 1],
        attention_heads=8,
        attention_features=64,
        modulation_features=1024,
    )
    torch.manual_seed(5)
    oracle = TorchUNetV0(**cfg).eval()
    model = DiffusionModel(net_t=UNetV0, **cfg)
    x = np.random.RandomState(6).randn(1, 2, 2**15).astype(np.float32)
    init_from_oracle(model, oracle, jnp.asarray(x))
    sig = jnp.full((1,), 0.5, jnp.float32)
    out_j = np.asarray(model.net.apply(model.params["net"], jnp.asarray(x),
                                       sig))
    with torch.no_grad():
        out_t = oracle(torch.from_numpy(x), torch.full((1,), 0.5)).numpy()
    err = np.abs(out_j - out_t).max()
    mse = float(np.mean((out_j - out_t) ** 2))
    assert mse <= 1e-3 and err < 5e-2, f"MSE {mse}, max err {err}"


def test_forward_parity_no_modulation():
    """SkipCat path (use_modulation=False): regression — the importer used
    to nest the skip kernel under Dense_0 where flax SkipCat declares it
    top-level."""
    model, oracle = build_pair(use_modulation=False,
                               use_time_conditioning=False)
    x = np.random.default_rng(0).standard_normal(
        (2, 2, LENGTH)).astype(np.float32)
    init_from_oracle(model, oracle, jnp.asarray(x))
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(model.net.apply(model.params["net"], jnp.asarray(x)))
    assert np.mean((got - want) ** 2) < 1e-9, np.abs(got - want).max()
