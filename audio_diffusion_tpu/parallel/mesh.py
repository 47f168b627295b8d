"""Device mesh + sharding rules.

The reference has NO distributed story (SURVEY.md §2.12: no NCCL/MPI/
torch.distributed anywhere); in the TPU-native framework the "communication
backend" is this module: a `jax.sharding.Mesh` with named axes and
NamedSharding rules, letting XLA insert ICI collectives (psum for gradient
allreduce on the `data` axis, all-gathers for tensor-sharded params).

Axes:
- ``data``: batch-sharded data parallelism (the workhorse at these model
  sizes — SURVEY.md §2.12 table).
- ``model``: optional tensor parallelism; large kernels are sharded on their
  output-feature axis (Megatron-style column parallel), letting XLA's SPMD
  partitioner place the matching collectives. The README-scale U-Nets
  (≤ ~1B params) don't need it, but the axis exists so the same train step
  scales past a single chip's HBM.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "shard_batch", "shard_params",
           "param_sharding_rules", "global_batch"]

# Param kernels at least this wide on their last axis are considered for
# tensor sharding; small params (biases, norms scales, tiny convs) replicate.
_MIN_SHARD_WIDTH = 256


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a 2-D ('data', 'model') mesh; data fills remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, (
        f"data({data}) × model({model}) != devices({n})")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Place a batch pytree with its leading axis sharded over 'data'."""
    def put(x: Array):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def global_batch(batch, mesh: Mesh):
    """Assemble PER-HOST local batches into one global array sharded on
    'data' (multi-host DP: each host loads its own disjoint shard via
    ``AudioDataset(num_hosts=...)``, then contributes it as the local part
    of the global batch). Single-process: equivalent to :func:`shard_batch`.

    The global batch size is ``local_batch × process_count``; device order
    in the mesh determines which global slice each host's data lands in.
    """
    def conv(x):
        x = np.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(conv, batch)


def param_sharding_rules(params, mesh: Mesh):
    """PartitionSpec pytree for params: wide 2D+ kernels shard their
    output-feature (last) axis over 'model'; everything else replicates.

    With model=1 meshes this degenerates to full replication (pure DP).
    """
    model_size = mesh.shape["model"]

    def rule(x: Array) -> P:
        if (model_size > 1 and x.ndim >= 2
                and x.shape[-1] >= _MIN_SHARD_WIDTH
                and x.shape[-1] % model_size == 0):
            return P(*([None] * (x.ndim - 1)), "model")
        return P()

    return jax.tree_util.tree_map(rule, params)


def shard_params(params, mesh: Mesh):
    """Place params according to :func:`param_sharding_rules`."""
    specs = param_sharding_rules(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
