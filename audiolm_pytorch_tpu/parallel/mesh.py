"""Device-mesh construction and sharding helpers.

Replaces the reference's accelerate/DDP backend (reference: trainer.py:56-58,
270-280, 391-408) with SPMD over a jax.sharding.Mesh: parameters replicated,
batches sharded over the `data` axis, gradients and VQ-EMA statistics psum'd
over ICI (DCN across slices via standard JAX multihost init).

An optional `model` axis is provisioned for tensor parallelism of the LM
matmuls (not required for parity — reference is DP-only, SURVEY.md §2.4).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "data_axis_name", "replicate"]

data_axis_name = "data"
model_axis_name = "model"


def make_mesh(num_data: int | None = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Mesh over (data, model). Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model <= n, \
        f"mesh {num_data}x{num_model} exceeds {n} devices"
    arr = np.array(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(arr, (data_axis_name, model_axis_name))


def shard_batch(mesh: Mesh, batch, axis: int = 0):
    """Place a host batch with its leading dim sharded over the data axis."""
    def put(x):
        spec = [None] * x.ndim
        spec[axis] = data_axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())) if hasattr(x, "shape") else x,
        tree)
