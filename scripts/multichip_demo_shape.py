"""Multi-chip dryrun at DEMO-ARCHITECTURE shapes (VERDICT r3 weak #6).

The driver's `__graft_entry__.dryrun_multichip` proves the sharded train step
compiles+executes, but at tiny shapes (HIDDEN_DIM=32, 16 lanes). This script
runs the same 8-virtual-device mesh at the real demo architecture and bench
padding (HIDDEN_DIM=128, 2048 lanes, 160 obs agents, 128 policy agents,
8 replans) — one sharded TRAIN step and one sharded ROLLOUT step — so
sharding-induced layout/memory issues at production shapes are exercised.
Writes docs/evidence/multichip_demo_shape.json.

Run on the CPU host (virtual devices):
    python scripts/multichip_demo_shape.py [--devices 8] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8,
                    help="total scenes across the mesh")
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--obs-agents", type=int, default=160)
    ap.add_argument("--agents", type=int, default=128)
    ap.add_argument("--out", default="docs/evidence/multichip_demo_shape.json")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert len(jax.devices()) == args.devices, jax.devices()

    import jax.numpy as jnp

    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.prosim import ProSim
    from prosim_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from prosim_tpu.rollout.rollout import parallel_rollout
    from prosim_tpu.train.optim import build_optimizer
    from prosim_tpu.train.train_step import make_train_step

    config = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", str(args.lanes),
        "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", str(args.obs_agents),
        "DATASET.FORMAT.PAD.NUM_AGENTS", str(args.agents),
        "PROMPT.CONDITION.TYPES",
        "['goal','v_action_tag','drag_point','llm_text_OneText']",
        "MODEL.DTYPE", "bfloat16",
        "TRAIN.BATCH_SIZE", str(args.batch),
    ])
    model = ProSim(config, dtype=jnp.bfloat16)
    batch = make_synthetic_batch(
        config, batch_size=args.batch, num_lanes=args.lanes,
        num_obs_agents=args.obs_agents, num_agents=args.agents, num_replan=8,
    )
    ev = {"devices": args.devices, "batch": args.batch,
          "lanes": args.lanes, "agents": args.agents,
          "hidden_dim": config.MODEL.HIDDEN_DIM}

    params = model.init(jax.random.PRNGKey(0), batch)
    optimizer = build_optimizer(config, params)
    opt_state = optimizer.init(params)
    mesh = make_mesh(num_data=args.devices, num_model=1,
                     devices=jax.devices())
    sb = shard_batch(batch, mesh)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    step = jax.jit(make_train_step(model, optimizer, config),
                   donate_argnums=(0, 1))
    t0 = time.time()
    params, opt_state, losses = step(params, opt_state, sb,
                                     jax.random.PRNGKey(2))
    loss = float(losses["full_loss"])
    ev["train_step_s"] = round(time.time() - t0, 1)
    ev["train_full_loss"] = loss
    assert jnp.isfinite(loss), loss
    print(f"train step OK in {ev['train_step_s']}s loss={loss:.3f}",
          flush=True)

    roll = jax.jit(lambda p, b, k: parallel_rollout(model, p, b, 2, k)
                   ["rollout_traj"])
    t0 = time.time()
    out = roll(params, sb, jax.random.PRNGKey(3))
    out = jax.block_until_ready(out)
    ev["rollout_step_s"] = round(time.time() - t0, 1)
    ev["rollout_shape"] = list(out.shape)
    assert bool(jnp.isfinite(out).all()), "non-finite rollout"
    print(f"rollout step OK in {ev['rollout_step_s']}s shape={out.shape}",
          flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(ev, f, indent=2)
    print("->", args.out, flush=True)


if __name__ == "__main__":
    main()
