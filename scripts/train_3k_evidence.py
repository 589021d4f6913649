"""Longer-horizon training-stability evidence (VERDICT r3 task 8).

~3,000 steps on the 1,000-scene synthetic cache (scripts/scale_evidence.py
workdir) with: periodic val evals, ONE FORCED MID-RUN RESUME (a second
Trainer instance auto-resumes from the newest checkpoint, exactly as a
restarted process would), and a visibly-decaying LR schedule. Artifacts:
docs/evidence/train_3k.json + train_3k_curve.png. Reference analogue:
Lightning auto-resume semantics (prosim/trainer.py:305-311) under its 228k-step
warmup-cosine schedule.

Usage:
    python scripts/train_3k_evidence.py [--steps 3000] [--resume-at 1500]
        [--workdir /tmp/prosim_scale] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--resume-at", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/prosim_scale")
    ap.add_argument("--out", default="docs/evidence/train_3k.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume-run", action="store_true",
                    help="keep an existing run dir: phase 1 fast-forwards "
                         "from its newest checkpoint instead of retraining")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from prosim_tpu.config import get_config
    from prosim_tpu.data.dataset import ProSimImitationDataset
    from prosim_tpu.train.trainer import Trainer
    from scripts.scale_evidence import SMALL_ARCH

    cache_dir = os.path.join(args.workdir, "cache")
    assert os.path.isdir(cache_dir), (
        f"{cache_dir} missing - run scripts/scale_evidence.py first")

    run_name = "train3k"
    config = get_config(opts=[
        "DATASET.SOURCE.TRAIN", "['waymo_train']",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "PROMPT.CONDITION.TYPES", "['goal']",
        "TRAIN.BATCH_SIZE", str(args.batch),
        "TRAIN.LR", "3e-4",
        "TRAIN.SCHEDULER.WARMUP_STEPS", "200",
        "TRAIN.SCHEDULER.MAX_STEPS", str(args.steps),
        "MAX_EPOCHES", "10000",
        "CHECKPOINT_INTERVAL", "250",
        "VAL_INTERVAL", "8",
        # the point of this harness: a FRESH Trainer must auto-resume from
        # the newest checkpoint of the run, exactly as a restarted process
        # would (reference: Lightning auto-resume, trainer.py:305-311)
        "LOAD_CHECKPOINT_TRAINER", "True",
        "EXPERIMENT_DIR", args.workdir,
        "EXPERIMENT_NAME", run_name,
        "MODEL.DTYPE", "bfloat16",
        *SMALL_ARCH,
    ])
    run_dir = os.path.join(args.workdir, run_name)
    if os.path.isdir(run_dir) and not args.resume_run:
        import shutil

        shutil.rmtree(run_dir)  # a stale run would auto-resume past phase 1

    train_ds = ProSimImitationDataset(config, "train", cache_dir)
    val_ds = ProSimImitationDataset(config, "val", cache_dir)

    def train_stream():
        return train_ds.batches(args.batch, shuffle=True, seed=0,
                                drop_last=True, num_workers=1)

    def val_stream():
        return val_ds.batches(args.batch, drop_last=True)

    ev = {"steps": args.steps, "resume_at": args.resume_at,
          "batch": args.batch, "backend": jax.default_backend(),
          "cache_scenes": len({(e, n) for e, n, _ in train_ds.index})}

    # ---- phase 1: train to the interruption point
    t0 = time.time()
    tr1 = Trainer(config)
    first = next(iter(train_ds.batches(args.batch, drop_last=True)))
    tr1.setup(first)
    assert args.resume_run or tr1.step == 0, tr1.step
    tr1.fit(train_stream, val_batches=val_stream, max_steps=args.resume_at)
    ev["phase1_final_step"] = tr1.step
    del tr1

    # ---- phase 2: a FRESH Trainer (as a restarted process) must auto-resume
    tr2 = Trainer(config)
    tr2.setup(first)
    ev["resumed_step"] = tr2.step
    assert tr2.step >= args.resume_at - config.CHECKPOINT_INTERVAL, (
        f"auto-resume failed: step={tr2.step}")
    tr2.fit(train_stream, val_batches=val_stream, max_steps=args.steps)
    ev["train_wall_s"] = round(time.time() - t0, 1)
    final_val = tr2.evaluate(val_stream)
    ev["final_val"] = {k: float(v) for k, v in final_val.items()}

    # ---- curve: loss from log.jsonl + the analytic LR schedule
    steps, losses = [], []
    with open(os.path.join(run_dir, "log.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "train/full_loss" in r:
                steps.append(r["step"])
                losses.append(r["train/full_loss"])
    ev["loss_first_100_mean"] = round(float(np.mean(
        [l for s, l in zip(steps, losses) if s <= 100])), 3)
    ev["loss_last_100_mean"] = round(float(np.mean(
        [l for s, l in zip(steps, losses) if s > args.steps - 100])), 3)

    from prosim_tpu.train.optim import warmup_cos2_schedule

    sched = warmup_cos2_schedule(
        config.TRAIN.LR, config.TRAIN.SCHEDULER.WARMUP_STEPS,
        config.TRAIN.SCHEDULER.MAX_STEPS)
    lr = [float(sched(s)) for s in steps]
    ev["lr_at_warmup_end"] = float(sched(config.TRAIN.SCHEDULER.WARMUP_STEPS))
    ev["lr_final"] = float(sched(args.steps))
    assert ev["lr_final"] < 0.5 * ev["lr_at_warmup_end"], (
        "LR schedule did not visibly decay")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax1 = plt.subplots(figsize=(8, 4))
        ax1.plot(steps, losses, lw=0.8, label="train/full_loss")
        ax1.axvline(ev["resumed_step"], color="red", ls="--", lw=1,
                    label=f"forced resume @ {ev['resumed_step']}")
        ax1.set_xlabel("step"); ax1.set_ylabel("loss")
        ax2 = ax1.twinx()
        ax2.plot(steps, lr, color="gray", lw=0.8, alpha=0.7, label="lr")
        ax2.set_ylabel("lr")
        ax1.legend(loc="upper right")
        fig.tight_layout()
        png = os.path.join(os.path.dirname(args.out), "train_3k_curve.png")
        fig.savefig(png, dpi=110)
        ev["curve_png"] = os.path.basename(png)
    except Exception as e:  # plot is evidence garnish, not load-bearing
        ev["curve_png_error"] = str(e)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(ev, f, indent=2)
    print(json.dumps(ev), flush=True)


if __name__ == "__main__":
    main()
