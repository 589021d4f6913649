"""Worker process for the 2-process multi-host (DCN) smoke test.

Run by tests/test_parallel.py as `python multihost_worker.py <pid> <port>`.
Exercises the real DCN bootstrap path: `initialize_multihost` rendezvous,
`process_local_scene_indices` sharding, `make_mesh` over the GLOBAL device
list, and `shard_batch`'s `make_array_from_process_local_data` branch with a
real SceneBatch (reference counterpart: Lightning DDP multi-node env
plumbing, prosim/trainer.py:121-123, 182-183).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]

    import numpy as np

    from prosim_tpu.parallel.mesh import (
        initialize_multihost,
        make_mesh,
        process_local_scene_indices,
        shard_batch,
    )

    n = initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert n == 2, n
    assert jax.process_index() == pid
    assert len(jax.devices()) == 4  # 2 procs x 2 virtual devices

    # deterministic strided farm sharding
    mine = process_local_scene_indices(10)
    assert mine == list(range(pid, 10, 2)), mine

    mesh = make_mesh(num_data=4, num_model=1)

    # a real (tiny) SceneBatch: each process builds its LOCAL half of the
    # global batch; shard_batch assembles global arrays from process-local
    # data. Global batch 4 = 2 local scenes per process.
    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch

    cfg = get_config(opts=[
        "MODEL.HIDDEN_DIM", "8",
        "PROMPT.CONDITION.TYPES", "[]",
    ])
    rng_seed = 7  # SAME seed: both processes generate the full global batch
    gbatch = make_synthetic_batch(
        cfg, batch_size=4, num_lanes=4, num_obs_agents=3, num_agents=2,
        num_replan=1, seed=rng_seed,
    )
    # local slice = this process's scenes
    local = jax.tree.map(
        lambda x: np.asarray(x)[2 * pid: 2 * pid + 2]
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == 4 else x,
        gbatch,
    )
    sharded = shard_batch(local, mesh)

    # a global reduction over the sharded batch must agree across processes
    # AND with the single-process value computed from the global batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    total = jax.jit(
        lambda b: jax.tree.reduce(
            lambda a, x: a + x,
            jax.tree.map(lambda l: l.astype(jax.numpy.float32).sum(),
                         b.init_obs.feat),
            0.0,
        ),
        out_shardings=NamedSharding(mesh, P()),
    )(sharded)
    expect = float(np.asarray(gbatch.init_obs.feat, np.float32).sum())
    got = float(total)
    assert abs(got - expect) < abs(expect) * 1e-5 + 1e-3, (got, expect)
    print(f"OK pid={pid} sum={got}", flush=True)


if __name__ == "__main__":
    main()
