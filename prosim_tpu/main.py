"""CLI entry point.

    python -m prosim_tpu.main --run-type {train,eval,data_debug,rollout} \
        --exp-config path/to/exp.yaml [KEY VALUE ...]

(reference: prosim/main.py:19-91)
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--run-type",
        choices=["train", "eval", "data_debug", "rollout"],
        required=True,
    )
    parser.add_argument("--exp-config", type=str, default=None)
    parser.add_argument("--cache-dir", type=str, default=None)
    parser.add_argument(
        "opts",
        default=None,
        nargs=argparse.REMAINDER,
        help="config overrides: KEY VALUE pairs",
    )
    args = parser.parse_args()
    run_exp(args.run_type, args.exp_config, args.opts, args.cache_dir)


def run_exp(run_type: str, exp_config, opts, cache_dir=None):
    from prosim_tpu.config import get_config

    config = get_config(exp_config, opts)
    np.random.seed(config.SEED)

    from prosim_tpu.data.dataset import ProSimImitationDataset
    from prosim_tpu.train.trainer import Trainer

    if run_type == "data_debug":
        ds = ProSimImitationDataset(config, "train", cache_dir)
        for i, batch in enumerate(ds.batches(config.TRAIN.BATCH_SIZE)):
            print(f"batch {i}: B={batch.batch_size} "
                  f"agents={int(np.asarray(batch.prompt.mask).sum())}")
        return

    if run_type == "train":
        from prosim_tpu.parallel.mesh import initialize_multihost

        initialize_multihost()  # no-op unless a DCN coordinator is configured
        train_ds = ProSimImitationDataset(config, "train", cache_dir)
        val_ds = ProSimImitationDataset(config, "val", cache_dir)
        trainer = Trainer(config)
        trainer.setup(next(iter(train_ds.batches(config.TRAIN.BATCH_SIZE))))
        trainer.fit(
            lambda: train_ds.batches(
                config.TRAIN.BATCH_SIZE, shuffle=True,
                num_workers=config.TRAIN.NUM_WORKERS,
            ),
            lambda: val_ds.batches(
                config.VAL.BATCH_SIZE, num_workers=config.VAL.NUM_WORKERS
            ),
        )
        return

    if run_type == "eval":
        val_ds = ProSimImitationDataset(config, "val", cache_dir)
        trainer = Trainer(config)
        trainer.setup(next(iter(val_ds.batches(config.VAL.BATCH_SIZE))))
        if config.PROMPT.CONDITION.EVAL_COND_SETS:
            print(trainer.evaluate_cond_sets(cache_dir))
        else:
            print(trainer.evaluate(lambda: val_ds.batches(config.VAL.BATCH_SIZE),
                                   save_tag="val"))
        return

    if run_type == "rollout":
        from prosim_tpu.rollout.runner import run_rollout_eval

        run_rollout_eval(config, cache_dir)
        return


if __name__ == "__main__":
    main()
