"""Importer negative-path drill (VERDICT r4 #8).

Synthesizes weight trees embodying the PARITY.md geometry-risk register's
ALTERNATIVE a-unet readings (rows 1/2/4) and asserts
``validate_imported_params`` rejects each with an error that names the
mismatched module path AND the register row — so a future import of a real
a-unet state_dict that embodies one of those readings fails actionably,
not opaquely at apply time.
"""
import jax.numpy as jnp
import pytest
import torch
from torch import nn

from audio_diffusion_tpu import DiffusionModel, UNetV0
from audio_diffusion_tpu.parity.importer import (
    import_unet_params,
    validate_imported_params,
)
from audio_diffusion_tpu.parity.torch_oracle import TorchUNetV0

CFG = dict(
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


def _pair():
    torch.manual_seed(0)
    oracle = TorchUNetV0(**CFG).eval()
    model = DiffusionModel(net_t=UNetV0, **CFG)
    model.initialize(jnp.zeros((1, 2, 256)))
    return model, oracle


def test_validate_accepts_matching_import():
    model, oracle = _pair()
    validate_imported_params(import_unet_params(oracle),
                             model.params["net"])


def test_register_row2_overlapping_downsample_kernel():
    """Row 2: source uses kernel=2*factor overlapping downsample windows
    (torch-era audio-diffusion `kernel_multiplier=2`)."""
    model, oracle = _pair()
    out_c, in_c, f = oracle.unet.down_1.weight.shape
    oracle.unet.down_1.weight = nn.Parameter(
        torch.zeros(out_c, in_c, 2 * f))
    with pytest.raises(ValueError) as e:
        validate_imported_params(import_unet_params(oracle),
                                 model.params["net"])
    msg = str(e.value)
    assert "down_1/kernel" in msg
    assert "register row 2" in msg and "OVERLAPPING" in msg


def test_register_row1_width_preserving_resample():
    """Row 1: source resampling is width-preserving; the channel change
    lives in the level's first resnet (1x1-conv shortcut)."""
    model, oracle = _pair()
    out_c, in_c, f = oracle.unet.down_1.weight.shape  # (32, 8, 4)
    oracle.unet.down_1.weight = nn.Parameter(torch.zeros(in_c, in_c, f))
    oracle.unet.down_1.bias = nn.Parameter(torch.zeros(in_c))
    # ...and the first resnet of that level reads the NARROW width.
    rn = oracle.unet.items_down_1.ResnetModItem_0
    rn.conv1.weight = nn.Parameter(torch.zeros(out_c, in_c, 3))
    with pytest.raises(ValueError) as e:
        validate_imported_params(import_unet_params(oracle),
                                 model.params["net"])
    msg = str(e.value)
    assert "down_1/kernel" in msg
    assert "conv1_kernel" in msg
    assert "register row 1" in msg
    assert "channel_change='first_item'" in msg


def test_register_row4_geglu_feedforward():
    """Row 4: source feed-forward is GEGLU — the first Dense is doubled
    for the gate."""
    model, oracle = _pair()
    ff = oracle.unet.items_down_2.AttentionItem_0.FeedForward_0
    hid, feats = ff.Dense_0.weight.shape
    ff.Dense_0.weight = nn.Parameter(torch.zeros(2 * hid, feats))
    ff.Dense_0.bias = nn.Parameter(torch.zeros(2 * hid))
    with pytest.raises(ValueError) as e:
        validate_imported_params(import_unet_params(oracle),
                                 model.params["net"])
    msg = str(e.value)
    assert "FeedForward_0/Dense_0" in msg
    assert "register row 4" in msg and "GEGLU" in msg


def test_extra_and_missing_leaves_are_named():
    """A structurally different source (extra item) is reported leaf by
    leaf as unexpected-in-import, naming the module."""
    model, oracle = _pair()
    from audio_diffusion_tpu.parity.torch_oracle import TResnetModItem

    oracle.unet.items_down_1.add_module(
        "ResnetModItem_9",
        TResnetModItem(32, 8, 64, True))
    with pytest.raises(ValueError) as e:
        validate_imported_params(import_unet_params(oracle),
                                 model.params["net"])
    msg = str(e.value)
    assert "unexpected in import" in msg
    assert "ResnetModItem_9" in msg
