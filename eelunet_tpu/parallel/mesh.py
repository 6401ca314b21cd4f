"""Device mesh + sharding layout.

The reference is strictly single-device (train.py:236; SURVEY.md §2.8). Here
scaling is mesh-native:

- axes ``('data', 'model')``: batches shard over ``data``; optionally the
  widest kernels (the 1024-channel EELUnet bottleneck and token-MLP Dense
  layers) shard their output features over ``model`` (tensor parallelism).
  XLA's SPMD partitioner propagates these NamedShardings through the jitted
  train step and inserts the all-reduce/all-gather collectives over ICI — no
  hand-written comms (the NCCL-equivalent layer is the compiler).
- gradients reduce via the same mechanism: sharded batch + replicated params
  means pjit emits a psum over ``data`` for the grads automatically.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data_axis: int = -1, model_axis: int = 1, spatial_axis: int = 1, devices=None) -> Mesh:
    """Build a ('data','model','spatial') mesh. data_axis=-1 uses all
    remaining devices. 'spatial' shards image HEIGHT (activations) — the
    framework's sequence-parallel analog (SURVEY.md §5) — and composes with
    data parallelism in one jitted step; XLA inserts the conv halo exchanges
    and pooling/norm psums."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    model_axis = max(model_axis, 1)
    spatial_axis = max(spatial_axis, 1)
    per_replica = model_axis * spatial_axis
    if data_axis == -1:
        if n % per_replica != 0:
            raise ValueError(
                f"{n} devices not divisible by model_axis*spatial_axis={per_replica}"
            )
        data_axis = n // per_replica
    if data_axis * per_replica > n:
        raise ValueError(f"mesh {data_axis}x{model_axis}x{spatial_axis} needs more than {n} devices")
    grid = devices[: data_axis * per_replica].reshape(data_axis, model_axis, spatial_axis)
    return Mesh(grid, ("data", "model", "spatial"))


def spatial_size(mesh: Mesh) -> int:
    return mesh.shape["spatial"] if "spatial" in mesh.axis_names else 1


def batch_sharding(mesh: Mesh, ndim: int = 4, with_spatial: bool = True) -> NamedSharding:
    """Shard batch over 'data' and (NHWC dim 1) image height over 'spatial'
    when that axis is >1; replicate the rest. ``with_spatial=False`` shards
    rows only (the fallback for image heights that don't divide the spatial
    axis)."""
    sp = "spatial" if with_spatial and ndim >= 2 and spatial_size(mesh) > 1 else None
    return NamedSharding(mesh, P("data", sp, *([None] * (ndim - 2))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, min_features: int = 512):
    """Per-parameter NamedShardings: tensor-shard wide kernels over 'model'.

    A kernel's trailing (output-feature) axis is sharded over ``model`` when it
    is divisible by the axis size and at least ``min_features`` wide — i.e. the
    EELUnet bottleneck convs and the 256/1024-wide token-MLP Dense layers.
    Everything else (biases, norms, small convs) is replicated; at
    model_axis=1 this degenerates to pure data parallelism.
    """
    m = mesh.shape["model"]

    def rule(path, p):
        if (
            m > 1
            and hasattr(p, "ndim")
            and p.ndim >= 2
            and p.shape[-1] >= min_features
            and p.shape[-1] % m == 0
        ):
            return NamedSharding(mesh, P(*([None] * (p.ndim - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
