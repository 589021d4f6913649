"""Scale-proof of the data path: 1,000-scene synthetic WOMD run.

Raw WOMD is not mounted here, so this drives the WHOLE owned pipeline at a
four-digit scene count with synthetic Scenario shards
(prosim_tpu/data/womd_synth.py):

  1. synthesize N Scenario protos -> TFRecord shards (WOMD shard naming)
  2. womd_ingest: shards -> trajdata-layout cache
  3. pipelined host loader at steady state over the cache (host-only)
  4. streaming train steps fed by the pipelined loader
  5. the rollout farm (4 workers, deterministic index sharding)
     + package_submission over the outputs
  6. peak host RSS

Artifacts: --out JSON (default docs/evidence/scale_1k.json). Reference scale
contract: prosim/rollout/package_submission.py:66 (44,097 scenes),
prosim/rollout/distributed_utils.py:95-226 (per-scene worker farm).

Usage:
    python scripts/scale_evidence.py [--scenes 1000] [--train-steps 500]
        [--farm-scenes 160] [--cpu] [--workdir /tmp/prosim_scale]
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SMALL_ARCH = [
    "DATASET.FORMAT.MAP.MAX_POINTS", "256",
    "DATASET.FORMAT.PAD.NUM_LANES", "256",
    "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", "48",
    "DATASET.FORMAT.PAD.NUM_AGENTS", "32",
    "DATASET.AGENT.SCENE_MAX_AGENT", "32",
    "MODEL.HIDDEN_DIM", "64",
    "MODEL.SCENE_ENCODER.ATTN.NUM_LAYER", "2",
    "MODEL.DECODER.ATTN.NUM_LAYER", "2",
    "MODEL.POLICY.ACT_DECODER.ATTN.NUM_LAYER", "2",
    "MODEL.SCENE_ENCODER.ATTN.MAX_NUM_NEIGH", "32",
    "MODEL.DECODER.ATTN.MAX_NUM_NEIGH", "32",
    "MODEL.POLICY.ACT_DECODER.ATTN.MAX_NUM_NEIGH", "32",
]


def rss_gb():
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=1000)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--train-steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--loader-batches", type=int, default=30,
                    help="steady-state loader batches to time (host-only)")
    ap.add_argument("--farm-scenes", type=int, default=160)
    ap.add_argument("--farm-workers", type=int, default=4)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/prosim_scale")
    ap.add_argument("--out", default="docs/evidence/scale_1k.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reuse-cache", action="store_true",
                    help="skip synth+ingest if the cache already exists")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from prosim_tpu.config import get_config
    from prosim_tpu.data import womd_ingest
    from prosim_tpu.data.dataset import ProSimImitationDataset
    from prosim_tpu.data.loader import pipelined_batches
    from prosim_tpu.data.womd_synth import synthesize_shards

    ev = {"scenes": args.scenes, "backend": jax.default_backend()}
    shard_dir = os.path.join(args.workdir, "shards")
    cache_dir = os.path.join(args.workdir, "cache")

    # ---- 1+2: synthesize + ingest
    if not (args.reuse_cache and os.path.isdir(cache_dir)):
        t0 = time.time()
        paths = synthesize_shards(shard_dir, args.scenes, args.shards)
        ev["synth_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        summaries = womd_ingest.ingest_shards(paths, cache_dir, "waymo_train")
        dt = time.time() - t0
        ev["ingest_s"] = round(dt, 1)
        ev["ingest_scenes_per_s"] = round(len(summaries) / dt, 1)
        assert len(summaries) == args.scenes, (len(summaries), args.scenes)
        print(f"synth {ev['synth_s']}s ingest {ev['ingest_s']}s "
              f"({ev['ingest_scenes_per_s']}/s)", flush=True)

    config = get_config(opts=[
        "DATASET.SOURCE.TRAIN", "['waymo_train']",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "DATASET.SOURCE.ROLLOUT", "['waymo_train']",
        "PROMPT.CONDITION.TYPES", "['goal']",
        "TRAIN.BATCH_SIZE", str(args.batch),
        "TRAIN.SCHEDULER.WARMUP_STEPS", "50",
        "TRAIN.SCHEDULER.MAX_STEPS", str(max(args.train_steps, 100)),
        "MAX_EPOCHES", "100",
        "EXPERIMENT_DIR", args.workdir,
        "EXPERIMENT_NAME", "scale_train",
        "MODEL.DTYPE", "bfloat16",
        *SMALL_ARCH,
    ])

    # ---- 3: pipelined loader steady state (host work only: transfer=None)
    ds = ProSimImitationDataset(config, "train", cache_dir)
    ev["cache_scenes"] = len({(e, n) for e, n, _ in ds.index})
    ev["dataset_len"] = len(ds)

    n_warm, n_meas = 4, args.loader_batches
    pairs = [(i % len(ds), i) for i in range((n_warm + n_meas) * args.batch)]
    gen = pipelined_batches(
        lambda j, s: ds.get_scene_batch(j, seed=s, device=False),
        pairs, args.batch, transfer=None)
    for _ in range(n_warm):
        next(gen)
    t0 = time.time()
    for _ in range(n_meas):
        next(gen)
    dt = time.time() - t0
    del gen
    ev["loader_scenes_per_s_host"] = round(n_meas * args.batch / dt, 1)
    print(f"loader steady-state: {ev['loader_scenes_per_s_host']} scenes/s "
          f"(host-only)", flush=True)

    # ---- 4: streaming train steps
    from prosim_tpu.train.trainer import Trainer

    trainer = Trainer(config)
    first = next(iter(ds.batches(args.batch, drop_last=True)))
    trainer.setup(first)
    t0 = time.time()

    def stream():
        return ds.batches(args.batch, shuffle=True, seed=0, drop_last=True,
                          num_workers=1)

    trainer.fit(stream, max_steps=args.train_steps)
    dt = time.time() - t0
    ev["train_steps"] = args.train_steps
    ev["train_scenes_per_s"] = round(args.train_steps * args.batch / dt, 1)
    ev["train_wall_s"] = round(dt, 1)
    print(f"train: {ev['train_scenes_per_s']} scenes/s", flush=True)

    # ---- 5: rollout farm (4 workers) + submission packaging
    from prosim_tpu.rollout import runner
    from prosim_tpu.rollout.wosac import package_submission

    roll_dir = os.path.join(args.workdir, "rollouts")
    t0 = time.time()
    for w in range(args.farm_workers):
        runner.run_rollout_eval(
            config, cache_dir, out_dir=roll_dir, worker_id=w,
            num_workers=args.farm_workers,
            max_scenes=args.farm_scenes // args.farm_workers,
            m=args.m, params=trainer.params, model=trainer.model,
            compute_metrics=False,
        )
    dt = time.time() - t0
    npz = [f for f in os.listdir(roll_dir) if f.endswith(".npz")]
    ev["farm_scenes"] = len(npz)
    ev["farm_scenes_per_s"] = round(len(npz) / dt, 2)
    # exactly-once coverage: worker w owns dataset rows w, w+W, w+2W, ...
    # (deterministic index sharding, runner.py `assigned`); with per-scene
    # output filenames, "every expected scene present, none duplicated"
    # is the full coverage contract
    expected = set()
    ds_roll = ProSimImitationDataset(config, "rollout", cache_dir)
    for w in range(args.farm_workers):
        for idx in list(range(w, len(ds_roll), args.farm_workers))[
                : args.farm_scenes // args.farm_workers]:
            env, scene_name, _ = ds_roll.index[idx]
            expected.add(f"{env}__{scene_name}.npz")
    ev["farm_exactly_once"] = (set(npz) == expected
                               and len(npz) == len(expected))
    assert ev["farm_exactly_once"], (
        f"coverage mismatch: {len(npz)} outputs vs {len(expected)} expected")
    sub = package_submission(roll_dir, os.path.join(args.workdir, "submission"))
    ev["submission"] = os.path.basename(sub)
    assert os.path.getsize(sub) > 0
    ev["peak_host_rss_gb"] = rss_gb()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(ev, f, indent=2)
    print(json.dumps(ev), flush=True)


if __name__ == "__main__":
    main()
