"""End-to-end training evidence on the real demo cache.

Trains the full demo architecture (goal-conditioned) on the 16 cached Waymo
scenes, then evaluates the SAME checkpoints three ways:

  1. imitation metrics (ADE/FDE/rollout ADE) before vs after training,
  2. WOSAC realism composite of the trained policy vs random init,
  3. the const-velocity baseline as the floor.

Artifacts land in --out (default runs/demo_evidence): log.jsonl with the
loss curve, orbax checkpoints, and evidence.json with the before/after
numbers. This is the single strongest "the framework actually learns"
check that fits one chip + the bundled data (the reference's analogue is
watching train/full_loss + rollout_callback metrics in wandb).

Usage:
    python scripts/train_demo_evidence.py [--steps 400] [--batch 16] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir",
                    default="/root/reference/demo_dataset/trajdata_cache")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--m", type=int, default=8, help="WOSAC rollout replicas")
    ap.add_argument("--cond-types", default="goal",
                    choices=["goal", "all", "text"],
                    help="'all' trains the full promptable surface "
                         "(goal + action-tag + drag-point + LLM text, mixed "
                         "fix-mode sampling) so every Table-1 row evaluates "
                         "a trained encoder (reference trains with "
                         "cond_sampler/text_goal_dragpoint_v_action_tag_0.25;"
                         " at demo-cache scale we sample at 0.5 so 400 steps "
                         "see enough conditioned agents per type)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="small arch + padding (CI/CPU smoke)")
    ap.add_argument("--out", default="runs/demo_evidence")
    ap.add_argument("--skip-wosac", action="store_true",
                    help="train + imitation eval only (the bow-vs-llama "
                         "text-steering twins don't need WOSAC)")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="extra config KEY VALUE overrides (e.g. "
                         "MODEL.CONDITION_TRANSFORMER.TEXT_ATTN.TYPE bow)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from prosim_tpu.config import get_config
    from prosim_tpu.data.dataset import ProSimImitationDataset
    from prosim_tpu.train.trainer import Trainer

    if args.cond_types == "all":
        cond_opts = [
            "PROMPT.CONDITION.TYPES",
            "['llm_text_OneText','goal','drag_point','v_action_tag']",
            "PROMPT.CONDITION.SAMPLE_MODE.TRAIN", "fix",
            "PROMPT.CONDITION.SAMPLE_MODE.VAL", "fix",
            "PROMPT.CONDITION.RANDOM_SAMPLE.TRAIN", "True",
            "PROMPT.CONDITION.RANDOM_SAMPLE.VAL", "True",
            "PROMPT.CONDITION.SAMPLE_RATE", "0.5",
        ]
    elif args.cond_types == "text":
        # text-ONLY at rate 1.0: the bow-vs-llama steering experiment
        # (VERDICT r3/r4 task 3). Trained alongside goal/drag, text gets
        # out-competed by geometrically explicit conditions; alone, the
        # motion-tag content of the captions is the only conditioning signal
        # and a flat result indicts the encoder, not the mixture.
        cond_opts = [
            "PROMPT.CONDITION.TYPES", "['llm_text_OneText']",
            "PROMPT.CONDITION.SAMPLE_MODE.TRAIN", "fix",
            "PROMPT.CONDITION.SAMPLE_MODE.VAL", "fix",
            "PROMPT.CONDITION.RANDOM_SAMPLE.TRAIN", "True",
            "PROMPT.CONDITION.RANDOM_SAMPLE.VAL", "True",
            "PROMPT.CONDITION.SAMPLE_RATE", "1.0",
        ]
    else:
        cond_opts = ["PROMPT.CONDITION.TYPES", "['goal']"]
    opts = [
        "DATASET.SOURCE.TRAIN", "['waymo_train']",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "DATASET.SOURCE.ROLLOUT", "['waymo_train']",
        # goal heads + their K-way distribution loss: the WOSAC eval's replica
        # diversity comes from sampling each replica's goal condition from
        # these heads (rollout/runner.py goal_sampler='auto'; reference
        # protocol gpu_utils.py:179-216). Without them all M replicas are the
        # argmax rollout and every histogram feature collapses to a delta.
        "MODEL.DECODER.GOAL_PRED.ENABLE", "True",
        "LOSS.GOAL_DIST_PRED.ENABLE", "True",
        # GOAL_MODEL_LR_SCALE defaults to 0.0 (reference waymo_demo.yaml:112
        # freezes its PRE-TRAINED heads); training from scratch needs them
        # live, and 10x base LR lets Adam reach real goal magnitudes
        # (p90 = 50 m on the demo cache) within a few hundred steps. With the
        # scale at 0 the heads stay at random init (~1 m outputs), every
        # sampled goal snaps to (0,0) via stop_smooth, and all M replicas
        # collapse to one rollout — the r3/r4 kinematic ~0 signature.
        "LOSS.ROLLOUT_TRAJ.GOAL_MODEL_LR_SCALE", "10.0",
        *cond_opts,
        "TRAIN.LR", str(args.lr),
        "TRAIN.BATCH_SIZE", str(args.batch),
        "TRAIN.SCHEDULER.WARMUP_STEPS", "50",
        "TRAIN.SCHEDULER.MAX_STEPS", str(max(args.steps, 100)),
        # fit() walks MAX_EPOCHES epochs and the demo cache is ~1 batch per
        # epoch; give it enough epochs that max_steps is the binding limit
        "MAX_EPOCHES", str(args.steps),
        "CHECKPOINT_INTERVAL", "100",
        "EXPERIMENT_DIR", os.path.dirname(args.out) or ".",
        "EXPERIMENT_NAME", os.path.basename(args.out),
        "MODEL.DTYPE", "bfloat16",
    ]
    if args.small:
        opts += [
            "DATASET.FORMAT.MAP.MAX_POINTS", "128",
            "DATASET.FORMAT.PAD.NUM_LANES", "128",
            "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", "24",
            "DATASET.FORMAT.PAD.NUM_AGENTS", "16",
            "DATASET.AGENT.SCENE_MAX_AGENT", "16",
            "MODEL.HIDDEN_DIM", "32",
            "MODEL.SCENE_ENCODER.ATTN.NUM_LAYER", "2",
            "MODEL.DECODER.ATTN.NUM_LAYER", "2",
            "MODEL.POLICY.ACT_DECODER.ATTN.NUM_LAYER", "2",
            "MODEL.SCENE_ENCODER.ATTN.FF_DIM", "4",
            "MODEL.DECODER.ATTN.FF_DIM", "4",
            "MODEL.POLICY.ACT_DECODER.ATTN.FF_DIM", "4",
            "MODEL.SCENE_ENCODER.ATTN.MAX_NUM_NEIGH", "8",
            "MODEL.DECODER.ATTN.MAX_NUM_NEIGH", "8",
            "MODEL.POLICY.ACT_DECODER.ATTN.MAX_NUM_NEIGH", "8",
        ]
    config = get_config(opts=opts + list(args.opts))

    os.makedirs(args.out, exist_ok=True)
    train_ds = ProSimImitationDataset(config, "train", args.cache_dir)
    val_ds = ProSimImitationDataset(config, "val", args.cache_dir)
    print(f"{len(train_ds)} scenes in cache", flush=True)

    def batches(split_ds, bs, shuffle, seed=0):
        def gen():
            return split_ds.batches(bs, shuffle=shuffle, seed=seed,
                                    drop_last=False)
        return gen

    trainer = Trainer(config)
    first = next(iter(train_ds.batches(args.batch, drop_last=False)))
    trainer.setup(first)

    val_bs = min(args.batch, len(val_ds))
    evidence = {"steps": args.steps, "batch": args.batch, "lr": args.lr}

    t0 = time.time()
    before = trainer.evaluate(batches(val_ds, val_bs, False))
    evidence["val_before"] = before
    roll_before = trainer.rollout_callback(batches(val_ds, val_bs, False))
    evidence["rollout_before"] = roll_before
    print("before:", json.dumps(before), flush=True)

    # materialize one epoch of formatted batches and cycle them: host-side
    # formatting costs ~30 s per 16-scene epoch, which would dominate the
    # ~2 s device step when fit() rebuilds the generator every epoch
    train_list = list(train_ds.batches(args.batch, shuffle=True, seed=0,
                                       drop_last=False))
    trainer.fit(lambda: iter(train_list), max_steps=args.steps)
    evidence["train_wall_s"] = round(time.time() - t0, 1)

    after = trainer.evaluate(batches(val_ds, val_bs, False))
    evidence["val_after"] = after
    roll_after = trainer.rollout_callback(batches(val_ds, val_bs, False))
    evidence["rollout_after"] = roll_after
    print("after:", json.dumps(after), flush=True)

    if args.skip_wosac:
        with open(os.path.join(args.out, "evidence.json"), "w") as f:
            json.dump(evidence, f, indent=2, default=float)
        print(json.dumps({k: evidence[k] for k in
                          ("val_before", "val_after", "train_wall_s")},
                         default=float), flush=True)
        print("evidence ->", os.path.join(args.out, "evidence.json"),
              flush=True)
        return

    # WOSAC realism: trained vs random init vs const-vel floor
    from prosim_tpu.rollout import runner
    from prosim_tpu.rollout.baseline import run_constant_velocity_eval

    wosac_dir = os.path.join(args.out, "wosac_trained")
    runner.run_rollout_eval(config, args.cache_dir, out_dir=wosac_dir,
                            m=args.m, params=trainer.params)
    with open(os.path.join(wosac_dir, "wosac_metrics.json")) as f:
        evidence["wosac_trained"] = json.load(f)

    import jax.random as jrand

    rand_params = trainer.model.init(jrand.PRNGKey(123), first)
    wosac_rand = os.path.join(args.out, "wosac_random")
    runner.run_rollout_eval(config, args.cache_dir, out_dir=wosac_rand,
                            m=args.m, params=rand_params)
    with open(os.path.join(wosac_rand, "wosac_metrics.json")) as f:
        evidence["wosac_random"] = json.load(f)

    try:
        evidence["wosac_const_vel"] = run_constant_velocity_eval(
            config, args.cache_dir, max_scenes=len(val_ds))
    except Exception as e:  # baseline is informative, not load-bearing
        evidence["wosac_const_vel_error"] = str(e)

    with open(os.path.join(args.out, "evidence.json"), "w") as f:
        json.dump(evidence, f, indent=2, default=float)
    print(json.dumps({k: evidence[k] for k in
                      ("val_before", "val_after", "train_wall_s")},
                     default=float), flush=True)
    print("evidence ->", os.path.join(args.out, "evidence.json"), flush=True)


if __name__ == "__main__":
    main()
