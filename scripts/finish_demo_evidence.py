"""Complete an interrupted train_demo_evidence.py run without retraining.

train_demo_evidence.py trains, then evaluates (imitation metrics, WOSAC of
trained vs random init, const-vel floor) and writes evidence.json last. If
the process dies mid-eval, the expensive part (training + any finished WOSAC
shards) is already on disk: checkpoints under <out>/ckpt_last, per-scene npz
under <out>/wosac_*, and the full metric history in <out>/log.jsonl (the
trainer logs the same evaluate()/rollout_callback() numbers it returns).

This resumes exactly there: restore ckpt_last, re-run only the missing WOSAC
shards (skip_existing), recompute the const-vel floor, and reassemble
evidence.json with val_before/after pulled from log.jsonl steps 0/final.

Usage:
    python scripts/finish_demo_evidence.py --out runs/demo_evidence_all \
        --cond-types all [--m 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log_metrics(log_path):
    """(before, after) dicts of val/* and rollout/* keys from log.jsonl."""
    vals, rolls = [], []
    with open(log_path) as f:
        for line in f:
            rec = json.loads(line)
            if any(k.startswith("val/") for k in rec):
                vals.append(rec)
            if any(k.startswith("rollout/") for k in rec):
                rolls.append(rec)
    return (vals[0], vals[-1]), (rolls[0], rolls[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir",
                    default="/root/reference/demo_dataset/trajdata_cache")
    ap.add_argument("--out", default="runs/demo_evidence_all")
    ap.add_argument("--cond-types", default="all", choices=["goal", "all"])
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from prosim_tpu.config import get_config
    from prosim_tpu.rollout import runner
    from prosim_tpu.rollout.baseline import run_constant_velocity_eval

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
    else:
        cond_opts = ["PROMPT.CONDITION.TYPES", "['goal']"]
    config = get_config(opts=[
        "DATASET.SOURCE.TRAIN", "['waymo_train']",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "DATASET.SOURCE.ROLLOUT", "['waymo_train']",
        *cond_opts,
        # evidence checkpoints train goal heads (train_demo_evidence.py);
        # without these the restore would drop the heads AND
        # run_rollout_eval's goal_sampler='auto' would silently fall back to
        # sampler-less collapsed replicas
        "MODEL.DECODER.GOAL_PRED.ENABLE", "True",
        "LOSS.GOAL_DIST_PRED.ENABLE", "True",
        "MODEL.DTYPE", "bfloat16",
    ])

    ckpt = os.path.join(args.out, "ckpt_last")
    params, model, ds = runner.restore_eval_params(config, ckpt,
                                                   args.cache_dir)

    (val_before, val_after), (roll_before, roll_after) = log_metrics(
        os.path.join(args.out, "log.jsonl"))
    evidence = {
        "resumed_from": ckpt,
        "batch": args.batch,
        "val_before": val_before, "val_after": val_after,
        "rollout_before": roll_before, "rollout_after": roll_after,
    }

    wosac_dir = os.path.join(args.out, "wosac_trained")
    runner.run_rollout_eval(config, args.cache_dir, out_dir=wosac_dir,
                            m=args.m, params=params, model=model,
                            skip_existing=True)
    with open(os.path.join(wosac_dir, "wosac_metrics.json")) as f:
        evidence["wosac_trained"] = json.load(f)

    rand_params = model.init(jax.random.PRNGKey(123), ds.get_scene_batch(0))
    wosac_rand = os.path.join(args.out, "wosac_random")
    runner.run_rollout_eval(config, args.cache_dir, out_dir=wosac_rand,
                            m=args.m, params=rand_params, model=model,
                            skip_existing=True)
    with open(os.path.join(wosac_rand, "wosac_metrics.json")) as f:
        evidence["wosac_random"] = json.load(f)

    try:
        evidence["wosac_const_vel"] = run_constant_velocity_eval(config,
                                                                 args.cache_dir)
    except Exception as e:  # baseline is informative, not load-bearing
        evidence["wosac_const_vel_error"] = str(e)

    out_json = os.path.join(args.out, "evidence.json")
    with open(out_json, "w") as f:
        json.dump(evidence, f, indent=2, default=float)
    print("evidence ->", out_json, flush=True)


if __name__ == "__main__":
    main()
