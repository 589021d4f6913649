"""Mesh sharding tests on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Guards the driver's multichip path: scenes sharded on the mesh `data` axis,
params replicated, per-batch constants (io_pairs.t_indices) replicated rather
than data-sharded (a data-axis device_put on a [T] array is invalid)."""

import numpy as np
import jax
import pytest

from prosim_tpu.config import get_config
from prosim_tpu.data.synthetic import make_synthetic_batch
from prosim_tpu.models.prosim import ProSim
from prosim_tpu.parallel.mesh import make_mesh, replicate, shard_batch

SMALL_OPTS = [
    "MODEL.SCENE_ENCODER.ATTN.NUM_LAYER", "1",
    "MODEL.DECODER.ATTN.NUM_LAYER", "1",
    "MODEL.POLICY.ACT_DECODER.ATTN.NUM_LAYER", "1",
    "MODEL.HIDDEN_DIM", "16",
    "MODEL.SCENE_ENCODER.ATTN.FF_DIM", "2",
    "MODEL.DECODER.ATTN.FF_DIM", "2",
    "MODEL.POLICY.ACT_DECODER.ATTN.FF_DIM", "2",
    "MODEL.SCENE_ENCODER.ATTN.MAX_NUM_NEIGH", "4",
    "MODEL.DECODER.ATTN.MAX_NUM_NEIGH", "4",
    "MODEL.POLICY.ACT_DECODER.ATTN.MAX_NUM_NEIGH", "4",
]


def test_shard_batch_replicates_t_indices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = get_config(opts=SMALL_OPTS)
    batch = make_synthetic_batch(
        cfg, batch_size=8, num_lanes=8, num_obs_agents=6, num_agents=4, num_replan=2
    )
    mesh = make_mesh(num_data=8, num_model=1)
    sharded = shard_batch(batch, mesh)
    # scene-axis leaves split 8 ways; t_indices fully replicated
    assert sharded.prompt.mask.sharding.is_fully_replicated is False
    assert sharded.io_pairs.t_indices.sharding.is_fully_replicated


def test_process_local_scene_indices_partition():
    """Strided host shards cover every scene exactly once (the lock-free farm
    contract, reference: rollout/distributed_utils.py:151-158)."""
    from prosim_tpu.parallel.mesh import process_local_scene_indices

    shards = [
        process_local_scene_indices(11, process_index=i, process_count=3)
        for i in range(3)
    ]
    flat = sorted(x for s in shards for x in s)
    assert flat == list(range(11))
    # single process = everything; defaults read the live (single) process
    assert process_local_scene_indices(5) == list(range(5))


def test_initialize_multihost_noop_single_process():
    from prosim_tpu.parallel.mesh import initialize_multihost

    assert initialize_multihost() == 1  # no coordinator configured -> no-op


def test_sharded_forward_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = get_config(opts=SMALL_OPTS)
    model = ProSim(cfg)
    batch = make_synthetic_batch(
        cfg, batch_size=8, num_lanes=8, num_obs_agents=6, num_agents=4, num_replan=2
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(3)

    fwd = jax.jit(lambda p, b, k: model.forward(p, b, "val", k)["rollout_traj"])
    ref = np.asarray(fwd(params, batch, key))

    mesh = make_mesh(num_data=8, num_model=1)
    out = np.asarray(fwd(replicate(params, mesh), shard_batch(batch, mesh), key))
    mask = np.asarray(batch.prompt.mask)
    # partition-dependent reduction order compounds through the closed loop;
    # 1e-4 absorbs it while still catching real sharding bugs
    np.testing.assert_allclose(out[mask], ref[mask], atol=1e-4, rtol=1e-4)


def test_two_process_multihost_smoke():
    """2-process DCN bootstrap end-to-end (VERDICT item 10): real
    jax.distributed rendezvous on localhost, gloo CPU collectives, global
    mesh over both processes' devices, `shard_batch` assembling global arrays
    from process-local SceneBatch slices, and a cross-process reduction
    matching the single-process value (reference counterpart: DDP multi-node
    env plumbing, trainer.py:121-123)."""
    import socket
    import subprocess
    import sys
    import os

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"OK pid={pid}" in out
