"""Benchmark: full 8 s closed-loop scene rollouts per second on one chip.

Runs the flagship ProSim model (demo architecture: 6-layer encoders, 128-dim,
2048 map polylines, 128 policy agents, 8 replan steps) on synthetic
demo-shaped batches and measures steady-state jitted throughput.

Prints ONE JSON line. `vs_baseline` compares against the per-chip share of
the BASELINE.json target (>=100 scene rollouts/sec on a v5e-8 => 12.5 per
chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax

# The environment may preset JAX_PLATFORMS to a plugin name that can fail to
# initialize transiently (remote-TPU tunnel). Retry before falling back to
# auto-selection -- a silent CPU fallback would turn the bench into an
# hours-long CPU compile and report a bogus number.
import os


def _tpu_visible():
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


# A remote-TPU tunnel can transiently fail init or degrade to proxying the
# remote host's CPU; benching there would report a bogus number. The plugin
# caches its connection for the process lifetime, so retry by re-exec'ing a
# fresh interpreter (up to 12 times, then run on whatever is available).
if not _tpu_visible():
    _retries = int(os.environ.get("PROSIM_BENCH_RETRY", "0"))
    if _retries < 12:
        print(f"bench: no TPU visible (attempt {_retries + 1}); "
              "retrying in a fresh process...", file=sys.stderr, flush=True)
        time.sleep(10)
        os.environ["PROSIM_BENCH_RETRY"] = str(_retries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", None)
print(f"bench: backend={jax.default_backend()} devices={jax.devices()}",
      file=sys.stderr, flush=True)

# Persistent compilation cache: the full-size rollout graph can take a long
# time to compile through a remote-TPU tunnel; cache it so repeat runs (and
# the driver's bench invocation) start hot.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/root/.cache/jax_comp_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TARGET_PER_CHIP = 100.0 / 8.0  # BASELINE.json: >=100 scenes/s on v5e-8


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--obs-agents", type=int, default=160)
    ap.add_argument("--agents", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--mode", default="rollout", choices=["rollout", "train"],
                    help="closed-loop inference or full training step")
    ap.add_argument("--conditions", default="none",
                    choices=["none", "goal", "tags", "text", "all"],
                    help="prompt-condition types to run through the "
                         "condition transformer (promptable-path bench)")
    ap.add_argument("--real-data", action="store_true",
                    help="use demo trajdata-cache scenes instead of synthetic")
    ap.add_argument("--cache-dir",
                    default="/root/reference/demo_dataset/trajdata_cache")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="extra config KEY VALUE overrides")
    args = ap.parse_args()

    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.prosim import ProSim
    import jax.numpy as jnp

    cond_types = {
        "none": [],
        "goal": ["goal"],
        "tags": ["goal", "v_action_tag", "drag_point"],
        "text": ["llm_text_OneText"],
        "all": ["goal", "v_action_tag", "drag_point", "llm_text_OneText"],
    }[args.conditions]
    config = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", str(args.lanes),
        "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", str(args.obs_agents),
        "DATASET.FORMAT.PAD.NUM_AGENTS", str(args.agents),
        "MODEL.DTYPE", args.dtype,
        "PROMPT.CONDITION.TYPES", repr(cond_types),
    ] + list(args.opts))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = ProSim(config, dtype=dtype)
    if args.real_data:
        import os

        from prosim_tpu.data.dataset import ProSimImitationDataset
        from prosim_tpu.data.formatter import collate

        env = "waymo_train"
        cfg2 = config.clone()
        cfg2.defrost()
        cfg2.DATASET.SOURCE.VAL = [env]
        cfg2.freeze()
        ds = ProSimImitationDataset(cfg2, "val", args.cache_dir)
        singles = [ds.get_scene_batch(i % len(ds)) for i in range(args.batch)]
        batch = collate(singles)
    else:
        batch = make_synthetic_batch(
            config,
            batch_size=args.batch,
            num_lanes=args.lanes,
            num_obs_agents=args.obs_agents,
            num_agents=args.agents,
            num_replan=8,
        )
    params = model.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    if args.mode == "train":
        from prosim_tpu.train.optim import build_optimizer
        from prosim_tpu.train.train_step import make_train_step

        optimizer = build_optimizer(config, params)
        opt_state = optimizer.init(params)
        step = jax.jit(make_train_step(model, optimizer, config))
        params, opt_state, losses = step(params, opt_state, batch, key)
        float(losses["full_loss"])  # compile + warmup + drain
        t0 = time.perf_counter()
        for i in range(args.iters):
            params, opt_state, losses = step(
                params, opt_state, batch, jax.random.fold_in(key, i)
            )
        # params chain step-to-step; fetching the last loss drains the queue
        float(losses["full_loss"])
        dt = time.perf_counter() - t0
        metric = "train_scenes_per_sec_per_chip"
    else:
        # NOTE: measurements must end in a host fetch of a value derived from
        # the LAST iteration's output. Through the remote-TPU tunnel,
        # jax.block_until_ready returns before the device queue drains, so a
        # block-based timing over-reports throughput by orders of magnitude
        # (verified: dispatch-only loops "finish" in ms while the device needs
        # seconds per batch). Device execution is FIFO, so fetching a scalar
        # from the final output bounds the full pipeline.
        fwd = jax.jit(
            lambda p, b, k: model.forward(p, b, "rollout", k)["rollout_traj"].sum()
        )
        float(fwd(params, batch, key))  # compile + warmup + drain
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fwd(params, batch, jax.random.fold_in(key, i))
        float(out)  # forced fetch: waits for every queued iteration
        dt = time.perf_counter() - t0
        metric = "closed_loop_scene_rollouts_per_sec_per_chip"

    scenes_per_sec = args.batch * args.iters / dt

    # agent-steps/sec/chip (BASELINE.md tracked metric): valid policy agents
    # per scene x 80 closed-loop steps (8 replans x 10 Hz chunks)
    import numpy as np

    agents_per_scene = float(np.asarray(batch.prompt.mask).sum()) / args.batch
    steps = int(batch.fut_obs.feat.shape[1]) * config.ROLLOUT.POLICY.REPLAN_FREQ
    agent_steps = scenes_per_sec * agents_per_scene * steps

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/s",
                "vs_baseline": round(scenes_per_sec / TARGET_PER_CHIP, 3),
                "agent_steps_per_sec_per_chip": round(agent_steps, 1),
                "conditions": args.conditions,
                "mode": args.mode,
                "real_data": bool(args.real_data),
            }
        )
    )


if __name__ == "__main__":
    main()
