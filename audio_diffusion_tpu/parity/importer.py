"""Torch -> JAX weight importer (SURVEY.md §5.4: "a one-way torch->JAX
weight-converter script").

The low-level transforms below encode how torch's native parameter layouts
map onto the TPU-first JAX net's layouts:

- patch Conv1d (kernel == stride == factor)  -> Downsample matmul kernel
- patch ConvTranspose1d                      -> Upsample matmul kernel
- Conv1d(k=3, p=1)                           -> [3, in, out] conv3 kernel
- Conv1d(k=1)                                -> Dense kernel (1x1 conv == Dense)
- Linear                                     -> Dense kernel (transpose)
- GroupNorm/LayerNorm weight                 -> scale

`import_unet_params` walks a `parity.torch_oracle.TorchUNetV0` and emits the
exact flax parameter tree of the matching `UNetV0` net. To import weights
from the real `a-unet` package (when installable), reuse the same transforms
with a name walk over a-unet's module tree — the math mapping is identical,
only the names differ.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = [
    "patch_conv_to_dense",
    "patch_convtranspose_to_dense",
    "conv3_kernel",
    "conv1x1_to_dense",
    "linear_to_dense",
    "import_unet_params",
    "validate_imported_params",
]


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def patch_conv_to_dense(weight) -> jnp.ndarray:
    """Conv1d weight [out, in, k] (k == stride) -> matmul kernel [k*in, out]
    over position-major (pos, channel) frames."""
    out_c, in_c, k = weight.shape
    return jnp.asarray(_np(weight).transpose(2, 1, 0).reshape(k * in_c, out_c))


def patch_convtranspose_to_dense(weight) -> jnp.ndarray:
    """ConvTranspose1d weight [in, out, k] (k == stride) -> matmul kernel
    [in, k*out] emitting position-major frames."""
    in_c, out_c, k = weight.shape
    return jnp.asarray(_np(weight).transpose(0, 2, 1).reshape(in_c, k * out_c))


def patch_convtranspose_bias(bias, k: int) -> jnp.ndarray:
    """ConvTranspose1d bias [out] -> per-frame bias [k*out] (the matmul
    emits k positions at once; the per-channel bias repeats per position)."""
    return jnp.asarray(np.tile(_np(bias), k))


def conv3_kernel(weight) -> jnp.ndarray:
    """Conv1d weight [out, in, 3] -> JAX conv kernel [3, in, out]."""
    return jnp.asarray(_np(weight).transpose(2, 1, 0))


def conv1x1_to_dense(weight) -> jnp.ndarray:
    """Conv1d weight [out, in, 1] -> Dense kernel [in, out]."""
    return jnp.asarray(_np(weight)[:, :, 0].T)


def linear_to_dense(weight) -> jnp.ndarray:
    """Linear weight [out, in] -> Dense kernel [in, out]."""
    return jnp.asarray(_np(weight).T)


def _j(t) -> jnp.ndarray:
    return jnp.asarray(_np(t))


def _dense_from_linear(mod) -> Dict:
    d = {"kernel": linear_to_dense(mod.weight)}
    if mod.bias is not None:
        d["bias"] = _j(mod.bias)
    return d


def _dense_from_conv1x1(mod) -> Dict:
    d = {"kernel": conv1x1_to_dense(mod.weight)}
    if mod.bias is not None:
        d["bias"] = _j(mod.bias)
    return d


def _layernorm(mod) -> Dict:
    return {"scale": _j(mod.weight), "bias": _j(mod.bias)}


def _attention(mod) -> Dict:
    tree = {"to_out": {"kernel": linear_to_dense(mod.to_out.weight)}}
    if hasattr(mod, "to_qkv"):
        tree["to_qkv"] = {"kernel": linear_to_dense(mod.to_qkv.weight)}
    else:
        for name in ("to_q", "to_k", "to_v"):
            tree[name] = {"kernel": linear_to_dense(getattr(mod, name).weight)}
    return tree


def _attention_item(mod) -> Dict:
    return {
        "LayerNorm_0": _layernorm(mod.LayerNorm_0),
        "Attention_0": _attention(mod.Attention_0),
        "LayerNorm_1": _layernorm(mod.LayerNorm_1),
        "FeedForward_0": {
            "Dense_0": _dense_from_linear(mod.FeedForward_0.Dense_0),
            "Dense_1": _dense_from_linear(mod.FeedForward_0.Dense_1),
        },
    }


def _resnet_mod_item(mod) -> Dict:
    tree = {
        "gn1_scale": _j(mod.gn1.weight), "gn1_bias": _j(mod.gn1.bias),
        "conv1_kernel": conv3_kernel(mod.conv1.weight),
        "conv1_bias": _j(mod.conv1.bias),
        "gn2_scale": _j(mod.gn2.weight), "gn2_bias": _j(mod.gn2.bias),
        "conv2_kernel": conv3_kernel(mod.conv2.weight),
        "conv2_bias": _j(mod.conv2.bias),
    }
    if mod.use_modulation:
        tree["mod_gn_scale"] = _j(mod.mod_gn.weight)
        tree["mod_gn_bias"] = _j(mod.mod_gn.bias)
        tree["mod_dense"] = _dense_from_linear(mod.mod_dense)
    return tree


def _item_stack(mod) -> Dict:
    tree: Dict = {}
    for name, child in mod.named_children():
        if name.startswith("ResnetModItem"):
            tree[name] = _resnet_mod_item(child)
        elif name.startswith("InjectChannelsItem"):
            tree[name] = {"Dense_0": _dense_from_conv1x1(child.Dense_0)}
        elif name.startswith(("AttentionItem", "CrossAttentionItem")):
            tree[name] = _attention_item(child)
    return tree


def _xunet(mod) -> Dict:
    tree: Dict = {
        "out_gn_scale": _j(mod.out_gn.weight),
        "out_gn_bias": _j(mod.out_gn.bias),
        "out_kernel": conv3_kernel(mod.out_conv.weight),
        "out_bias": _j(mod.out_conv.bias),
    }
    for name, child in mod.named_children():
        if name.startswith("down_"):
            tree[name] = {"kernel": patch_conv_to_dense(child.weight),
                          "bias": _j(child.bias)}
        elif name.startswith("up_"):
            tree[name] = {"kernel": patch_convtranspose_to_dense(child.weight),
                          "bias": patch_convtranspose_bias(
                              child.bias, child.weight.shape[2])}
        elif name.startswith("items_"):
            tree[name] = _item_stack(child)
        elif name.startswith("skip_"):
            if hasattr(child, "Dense_0") and child.Dense_0.weight.ndim == 3:
                # TSkipCat (1x1 conv): flax SkipCat declares kernel/bias at
                # the TOP level of the skip module, not under Dense_0.
                tree[name] = _dense_from_conv1x1(child.Dense_0)
            else:
                # TSkipModulate: a zero-init gate nn.Dense named Dense_0.
                tree[name] = {"Dense_0": _dense_from_linear(child.Dense_0)}
    return tree


def _flatten_shapes(tree, prefix="") -> Dict[str, tuple]:
    out: Dict[str, tuple] = {}
    for k in tree:
        path = f"{prefix}/{k}" if prefix else str(k)
        v = tree[k]
        if hasattr(v, "keys"):
            out.update(_flatten_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def _register_hint(path: str, got: tuple, want: tuple) -> str:
    """Map a shape mismatch to the PARITY.md geometry-risk register row
    that most plausibly explains it (the register's 'plausible alternative'
    readings of a-unet), so a failed real-weights import is actionable."""
    leaf = path.rsplit("/", 1)[-1]
    if "/down_" in path or path.startswith("down_"):
        if (len(got) == len(want) == 2 and got[1] == want[1]
                and want[0] and got[0] == 2 * want[0]):
            return (" — PARITY.md register row 2: source downsample uses "
                    "OVERLAPPING kernels (kernel=2*factor); this build "
                    "assumes non-overlapping kernel=factor patches")
        if len(got) == len(want) == 2 and got[1] != want[1]:
            return (" — PARITY.md register row 1: source resampling looks "
                    "width-preserving (channel change lives in the level's "
                    "first resnet); rebuild with "
                    "UNetV0(channel_change='first_item', lane_fold=False)")
    if "conv1_kernel" in leaf and len(got) == len(want) == 3 \
            and got[1] != want[1]:
        return (" — PARITY.md register row 1: first-resnet input width "
                "differs — source changes channels inside the resnet; "
                "rebuild with UNetV0(channel_change='first_item', "
                "lane_fold=False)")
    if "FeedForward" in path and "Dense_0" in path and len(got) >= 1 \
            and len(want) >= 1 and got[-1] == 2 * want[-1]:
        return (" — PARITY.md register row 4: source feed-forward is GEGLU "
                "(first Dense doubled for the gate); this build uses a "
                "plain 2-layer MLP")
    return ""


def validate_imported_params(imported, expected) -> None:
    """Shape-check an imported tree against the target net's params.

    Raises ``ValueError`` listing EVERY missing / unexpected /
    shape-mismatched leaf by its module path, each annotated with the
    PARITY.md geometry-risk register row that plausibly explains it — so
    importing a real a-unet state_dict that embodies an alternative
    geometry reading fails actionably (naming the misread module), not
    opaquely at apply time. ``expected`` is the matching net's own
    parameter tree (``model.params['net']``)."""
    imp, exp = _flatten_shapes(imported), _flatten_shapes(expected)
    problems = []
    for path in sorted(set(imp) | set(exp)):
        got, want = imp.get(path), exp.get(path)
        if got is None:
            problems.append(f"missing from import: {path} "
                            f"(net expects shape {want})")
        elif want is None:
            problems.append(f"unexpected in import: {path} shape {got}")
        elif got != want:
            problems.append(
                f"shape mismatch at {path}: imported {got} vs net {want}"
                + _register_hint(path, got, want))
    if problems:
        raise ValueError(
            f"imported parameter tree does not match the net "
            f"({len(problems)} problem(s)):\n  " + "\n  ".join(problems)
            + "\nSee the PARITY.md geometry-risk register for the likely "
            "alternative a-unet reading behind each mismatch.")


def import_unet_params(oracle) -> Dict:
    """TorchUNetV0 -> the flax parameter tree of the matching UNetV0 Net."""
    tree = _xunet(oracle.unet)
    if oracle.use_embedding_cfg:
        tree = {"inner": tree, "fixed_embedding": _j(oracle.fixed_embedding)}
    if oracle.use_time_conditioning:
        se = oracle.sigma_embedding
        tree = {
            "inner": tree,
            "sigma_embedding": {
                "freqs": _j(se.freqs),
                "Dense_0": _dense_from_linear(se.Dense_0),
                "Dense_1": _dense_from_linear(se.Dense_1),
            },
        }
    return tree
