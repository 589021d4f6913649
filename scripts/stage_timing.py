"""Decompose closed-loop rollout device time by pipeline stage on TPU.

Times, at bench shapes, each with its own jit and queue-drain host fetch:
  - forward        : prepare + rollout_scan (the bench measurement)
  - prepare        : scene/prompt encode + policy generation + k-select
  - scan           : rollout_scan alone, given prepare outputs
  - policy_step    : one policy.apply call (the scan runs R of these)
  - update_obs     : one incremental scene-encoder update (scan runs R-1)

    python scripts/stage_timing.py [--batch 64] [--iters 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

import os as _os
_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                             "/root/.cache/jax_comp_cache")
_os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)  # compile + warm
    # NOTE: block_until_ready returns early through the axon tunnel; a host
    # fetch is the only reliable queue drain (see .claude/skills/verify).
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    # queue-drain timing: fetch a scalar from the LAST iteration's output
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:14s} {dt * 1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--obs-agents", type=int, default=160)
    ap.add_argument("--agents", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.prosim import ProSim

    config = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", str(args.lanes),
        "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", str(args.obs_agents),
        "DATASET.FORMAT.PAD.NUM_AGENTS", str(args.agents),
        "MODEL.DTYPE", "bfloat16",
    ] + list(args.opts))
    model = ProSim(config, dtype=jnp.bfloat16)
    batch = make_synthetic_batch(
        config, batch_size=args.batch, num_lanes=args.lanes,
        num_obs_agents=args.obs_agents, num_agents=args.agents, num_replan=8,
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    print(f"backend={jax.default_backend()} batch={args.batch}", flush=True)

    fwd = jax.jit(lambda p, b, k: model.forward(p, b, "rollout", k)["rollout_traj"])
    t_fwd = timeit("forward", fwd, params, batch, key, iters=args.iters)

    prep = jax.jit(lambda p, b, k: model.prepare(p, b, "rollout", k))
    scene, policy_emd, _ = prep(params, batch, key)
    t_prep = timeit("prepare", prep, params, batch, key, iters=args.iters)

    scan = jax.jit(
        lambda p, b, s, e, k:
        model.rollout_scan(p, b, s, e, "rollout", k)["rollout_traj"]
    )
    t_scan = timeit("scan", scan, params, batch, scene, policy_emd, key,
                    iters=args.iters)

    # one policy step at scan shapes
    Th = model.hist_steps
    B, N = batch.prompt.mask.shape
    pos_now = scene.pos[:, scene.num_map:scene.num_map + N]
    theta_now = scene.ori[:, scene.num_map:scene.num_map + N]
    pol = jax.jit(
        lambda p, e, s, pn, tn: model.policy.apply(
            {"params": p["policy"]}, e, s, pn, tn,
            batch.prompt.mask, batch.prompt.agent_type, True,
        )["motion_pred"]
    )
    t_pol = timeit("policy_step", pol, params, policy_emd, scene,
                   pos_now, theta_now, iters=args.iters)

    fo_feat = batch.fut_obs.feat[:, 0]
    fo_mask = batch.fut_obs.mask[:, 0]
    fo_pos = batch.fut_obs.pos[:, 0]
    fo_ori = batch.fut_obs.ori[:, 0]
    upd = jax.jit(
        lambda p, s: model.scene_encoder.apply(
            {"params": p["scene_encoder"]}, s,
            fo_feat, fo_mask, fo_pos, fo_ori, True, method="update_obs",
        ).tokens
    )
    t_upd = timeit("update_obs", upd, params, scene, iters=args.iters)

    R = int(batch.fut_obs.feat.shape[1])
    print(f"\nR={R} replan steps")
    print(f"scan reconstruction: {R}*policy + {R - 1}*update = "
          f"{(R * t_pol + (R - 1) * t_upd) * 1e3:.2f} ms "
          f"(measured scan {t_scan * 1e3:.2f} ms)")
    print(f"forward reconstruction: prepare + scan = "
          f"{(t_prep + t_scan) * 1e3:.2f} ms "
          f"(measured forward {t_fwd * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
