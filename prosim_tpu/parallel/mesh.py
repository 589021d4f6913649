"""Device mesh and sharding helpers.

The reference scales with torch DDP + a file-lock rollout farm
(reference: prosim/trainer.py:121-123, rollout/distributed_utils.py:95-226).
The TPU-native replacement is SPMD over a `jax.sharding.Mesh` with two axes:

  data  - scenes (batch axis). DDP gradient allreduce becomes the psum XLA
          inserts for replicated params; the 44k-scene WOSAC farm becomes
          static scene sharding over this axis.
  model - reserved for tensor-parallel sharding of the Llama3 text encoder
          (Megatron-style qkv/o splits over ICI).

All SceneBatch arrays lead with the scene axis, so one PartitionSpec("data")
on dim 0 shards every input.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: int = -1,
    num_model: int = 1,
    devices: Optional[list] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data == -1:
        num_data = n // num_model
    assert num_data * num_model == n, (
        f"mesh {num_data}x{num_model} does not cover {n} devices"
    )
    arr = np.array(devices).reshape(num_data, num_model)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard dim 0 (scenes) over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a SceneBatch so dim 0 of every batch-leading leaf is split over
    `data`. Per-batch constants (t_indices) are replicated."""
    sh = batch_sharding(mesh, data_axis)
    rep = replicated_sharding(mesh)
    if hasattr(batch, "map_batch_leaves"):
        return batch.map_batch_leaves(
            lambda x: jax.device_put(x, sh), lambda x: jax.device_put(x, rep)
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
