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


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         **kwargs) -> int:
    """Bootstrap the JAX distributed runtime for multi-host (DCN) runs.

    The reference reaches multi-node only through Lightning DDP env plumbing
    (reference: prosim/trainer.py:121-123); here the same role is played by
    `jax.distributed.initialize`: processes rendezvous over DCN, after which
    `jax.devices()` is the global device list and the data mesh axis spans
    hosts (collectives ride ICI within a host, DCN across).

    No-op when single-process with no coordinator configured (explicitly or
    via the standard cluster env vars). Returns the process count.
    """
    import os

    configured = (
        coordinator_address is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if configured:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
        except RuntimeError as e:
            # Only tolerate re-initialization; a failed rendezvous (bad
            # coordinator, timeout) must NOT degrade into N independent runs
            # that all think they are process 0.
            if "already initialized" not in str(e).lower():
                raise
    return jax.process_count()


def process_local_scene_indices(num_scenes: int,
                                process_index: Optional[int] = None,
                                process_count: Optional[int] = None) -> list:
    """Deterministic strided shard of the global scene list for this host -
    the lock-free replacement for the reference farm's touch-file claims
    (reference: rollout/distributed_utils.py:151-158) and for DDP's
    per-rank batch split (trainer.py:182-183)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(range(pi, num_scenes, pc))


def make_mesh(
    num_data: int = -1,
    num_model: int = 1,
    devices: Optional[list] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    if devices is None:
        devices = jax.devices()
        n = len(devices)
        if num_data == -1:
            num_data = n // num_model
        assert num_data * num_model == n, (
            f"mesh {num_data}x{num_model} does not cover {n} devices"
        )
        # let mesh_utils pick a topology-aware layout (keeps the model axis
        # on ICI neighbors; on multi-host, DCN hops land on the data axis)
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh(
                (num_data, num_model), devices=devices
            )
            return Mesh(arr, (data_axis, model_axis))
        except Exception:
            pass
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
    `data`. Per-batch constants (t_indices) are replicated.

    On multi-host runs each process passes its LOCAL batch (its
    `process_local_scene_indices` share) and the leaves are assembled into
    global arrays via `jax.make_array_from_process_local_data` - the
    data-feeding contract the reference gets from DDP's per-rank loaders."""
    sh = batch_sharding(mesh, data_axis)
    rep = replicated_sharding(mesh)
    if jax.process_count() > 1:
        put_sh = lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x))
    else:
        put_sh = lambda x: jax.device_put(x, sh)
    if hasattr(batch, "map_batch_leaves"):
        return batch.map_batch_leaves(put_sh, lambda x: jax.device_put(x, rep))
    return jax.tree.map(put_sh, batch)


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
