"""Prompt-conditioned vs unconditioned closed-loop rollout ADE.

The reference's headline controllability table (BASELINE.md "Prompt ADE":
Goal Point 0.3882 m, +59.12% vs unconditioned, prosim_table_1.jpg) measures
how much closer rollouts track the logged future when the prompt carries the
agents' actual conditions. This reproduces that protocol on the bundled demo
cache with a checkpoint trained by scripts/train_demo_evidence.py: the SAME
params are rolled out once per condition set (configs/cond_sampler/
uncondition vs goal_1.0 etc.) and the mean-replica rollout ADE is compared.

Usage:
    python scripts/prompt_ade_evidence.py --ckpt runs/demo_evidence/<run>/ckpt_last \
        [--cond-sets uncondition goal_1.0] [--m 4] [--cpu]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_ckpt(root):
    """Latest ckpt dir under a train_demo_evidence output tree."""
    cands = sorted(glob.glob(os.path.join(root, "**", "ckpt_*"), recursive=True),
                   key=os.path.getmtime)
    if not cands:
        raise SystemExit(f"no ckpt_* under {root}")
    return cands[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir",
                    default="/root/reference/demo_dataset/trajdata_cache")
    ap.add_argument("--ckpt", default="runs/demo_evidence")
    ap.add_argument("--cond-sets", nargs="*",
                    default=["uncondition", "goal_1.0"])
    ap.add_argument("--train-cond-types", default="goal",
                    choices=["goal", "all", "text"],
                    help="must match the --cond-types the checkpoint was "
                         "trained with (defines the model's condition "
                         "encoder set and hence the param tree)")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="extra config KEY VALUE overrides; must match "
                         "training (e.g. "
                         "MODEL.CONDITION_TRANSFORMER.TEXT_ATTN.TYPE bow)")
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="runs/demo_evidence/prompt_ade.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from prosim_tpu.config import get_config, get_cond_set_config
    from prosim_tpu.data.dataset import ProSimImitationDataset
    from prosim_tpu.rollout.rollout import parallel_rollout, replica_rollout_metrics
    from prosim_tpu.rollout.runner import restore_eval_params

    ckpt = args.ckpt if os.path.basename(args.ckpt).startswith("ckpt_") \
        else find_ckpt(args.ckpt)
    print("checkpoint:", ckpt, flush=True)

    # the train config (must match training, it defines the param tree)
    types = {"all": "['llm_text_OneText','goal','drag_point','v_action_tag']",
             "text": "['llm_text_OneText']",
             "goal": "['goal']"}[args.train_cond_types]
    config = get_config(opts=[
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "DATASET.SOURCE.ROLLOUT", "['waymo_train']",
        "PROMPT.CONDITION.TYPES", types,
        "MODEL.DTYPE", "bfloat16",
        # evidence checkpoints train goal heads (WOSAC replica diversity);
        # mirror them so the restored param surface matches training
        "MODEL.DECODER.GOAL_PRED.ENABLE", "True",
        "LOSS.GOAL_DIST_PRED.ENABLE", "True",
    ] + list(args.opts))
    params, model, _ = restore_eval_params(config, ckpt, args.cache_dir)

    results = {}
    for name in args.cond_sets:
        cfg = get_cond_set_config(config, name)
        ds = ProSimImitationDataset(cfg, "val", args.cache_dir)
        batch = next(iter(ds.batches(min(args.batch, len(ds)))))
        out = parallel_rollout(model, params, batch, args.m,
                               jax.random.PRNGKey(7))
        metrics = {k: float(v) for k, v in
                   replica_rollout_metrics(out, batch, args.m).items()}
        results[name] = metrics
        print(name, json.dumps(metrics), flush=True)

    base = results.get("uncondition")
    for name, m in results.items():
        if base and name != "uncondition" and "mean_ade" in m:
            gain = 100.0 * (base["mean_ade"] - m["mean_ade"]) / max(
                base["mean_ade"], 1e-9)
            results[name]["ade_gain_vs_uncond_pct"] = round(gain, 2)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("->", args.out, flush=True)


if __name__ == "__main__":
    main()
