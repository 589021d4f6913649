"""Overfit verification: train the closed-loop model on the demo scenes and
show imitation learning works end to end (loss drops, rollout ADE vs the
logged future shrinks, rollouts visually track GT).

This is the strongest single-machine check of the whole learning stack:
data pipeline -> conditions -> closed-loop scan -> rollout losses ->
param groups/schedule -> metrics. (The reference's analogue is watching
train/full_loss in wandb on a real run.)

Usage:
    python scripts/overfit_demo.py [--steps 300] [--cache-dir DIR]
        [--cpu] [--out /tmp/overfit_demo]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/overfit_demo")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from prosim_tpu.config import get_config
    from prosim_tpu.data.dataset import ProSimImitationDataset
    from prosim_tpu.data.formatter import collate
    from prosim_tpu.train.trainer import Trainer

    cfg = get_config(opts=[
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "DATASET.FORMAT.MAP.MAX_POINTS", "512",
        "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", "64",
        "DATASET.FORMAT.PAD.NUM_AGENTS", "48",
        # mid-size model: big enough to fit the scenes, small enough to be quick
        "MODEL.HIDDEN_DIM", "64",
        "MODEL.SCENE_ENCODER.ATTN.NUM_LAYER", "3",
        "MODEL.DECODER.ATTN.NUM_LAYER", "3",
        "MODEL.POLICY.ACT_DECODER.ATTN.NUM_LAYER", "3",
        "MODEL.SCENE_ENCODER.ATTN.FF_DIM", "8",
        "MODEL.DECODER.ATTN.FF_DIM", "8",
        "MODEL.POLICY.ACT_DECODER.ATTN.FF_DIM", "8",
        "PROMPT.CONDITION.TYPES", "['goal']",
        "TRAIN.LR", str(args.lr),
        "TRAIN.SCHEDULER.TYPE", "none",
        "EXPERIMENT_DIR", args.out,
        "EXPERIMENT_NAME", "overfit",
        "SAVE_CHECKPOINT", "False",
        "ENABLE_VIS", "False",
        "MAX_EPOCHES", "100000",
    ])
    ds = ProSimImitationDataset(cfg, "val", args.cache_dir)
    batch = collate([ds.get_scene_batch(i) for i in range(min(2, len(ds)))])

    tr = Trainer(cfg)
    tr.setup(batch)

    m0 = tr.evaluate([batch])
    t0 = time.time()
    tr.fit(lambda: iter([batch]), max_steps=args.steps)
    dt = time.time() - t0
    m1 = tr.evaluate([batch])
    roll = tr.rollout_callback([batch], m=2)
    tr.visualization_callback(
        batch, tr._eval_step(tr.params, batch, jax.random.PRNGKey(0))[2],
        tag="overfit",
    )

    result = {
        "steps": args.steps,
        "seconds": round(dt, 1),
        "loss_before": m0["full_loss"],
        "loss_after": m1["full_loss"],
        "rollout_ade_before": m0.get("rollout_ade"),
        "rollout_ade_after": m1.get("rollout_ade"),
        "min_ade_after": roll["min_ade"],
    }
    print(json.dumps(result, indent=2))
    assert np.isfinite(m1["full_loss"])
    # the loss has a sizable irreducible floor (heading/vel noise terms);
    # imitation quality is the signal: closed-loop rollout ADE must halve
    assert m1["full_loss"] < m0["full_loss"] / 1.5, (
        f"loss did not drop 1.5x: {m0['full_loss']} -> {m1['full_loss']}"
    )
    assert m1["rollout_ade"] < m0["rollout_ade"] / 2, (
        f"rollout ADE did not halve: {m0['rollout_ade']} -> {m1['rollout_ade']}"
    )
    print("OVERFIT OK")


if __name__ == "__main__":
    main()
