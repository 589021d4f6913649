"""Training orchestration.

JAX-native replacement for the reference's Lightning wiring
(reference: prosim/trainer.py:35-327): builds the model/optimizer, shards
batches over the device mesh, runs jitted train/eval steps, accumulates
metrics with explicit reductions, checkpoints via orbax, and logs as JSONL
(wandb-compatible key naming).

Checkpoint/resume semantics follow the reference: save on every
VAL_INTERVAL epoch + keep best by train/full_loss + save_last
(reference: trainer.py:248-256, models/base.py:134-147).
"""

import json
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prosim_tpu.core.registry import registry
from prosim_tpu.models.prosim import ProSim
from prosim_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from prosim_tpu.train.metrics import compute_metrics, merge_metric_states
from prosim_tpu.train.optim import build_optimizer
from prosim_tpu.train.train_step import make_eval_step, make_train_step


def find_latest_checkpoint(run_dir: str):
    """Most recent checkpoint under a run dir - the TPU counterpart of the
    reference's hpc_ckpt_* glob resume (reference:
    rollout/distributed_utils.py:38-48). Prefers ckpt_last, else newest
    ckpt_* by mtime; None when the run has no checkpoints."""
    import glob as _glob

    last = os.path.join(run_dir, "ckpt_last")
    if os.path.isdir(last):
        return last
    cands = [p for p in _glob.glob(os.path.join(run_dir, "ckpt_*"))
             if os.path.isdir(p)]
    return max(cands, key=os.path.getmtime) if cands else None


class Trainer:
    def __init__(self, config, model: Optional[ProSim] = None,
                 mesh=None, log_path: Optional[str] = None):
        self.config = config
        self.model = model or ProSim(config)
        self.mesh = mesh or make_mesh(
            num_data=config.PARALLEL.NUM_DATA, num_model=config.PARALLEL.NUM_MODEL
        )
        self.run_dir = os.path.join(config.EXPERIMENT_DIR, config.EXPERIMENT_NAME)
        os.makedirs(self.run_dir, exist_ok=True)
        self.log_path = log_path or os.path.join(self.run_dir, "log.jsonl")
        self.step = 0
        self.best_loss = float("inf")
        self._rng = None  # training rng, persisted across save/restore

        self.params = None
        self.opt_state = None
        self.optimizer = None
        self._train_step = None
        self._eval_step = None

    # ----------------------------------------------------------------- setup
    def setup(self, example_batch, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.SEED)
        self.params = self.model.init(rng, example_batch)
        self.optimizer = build_optimizer(self.config, self.params)
        self.opt_state = self.optimizer.init(self.params)
        self.params = replicate(self.params, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)
        self._train_step = jax.jit(
            make_train_step(self.model, self.optimizer, self.config),
            donate_argnums=(0, 1),
        )
        self._eval_step = jax.jit(make_eval_step(self.model, self.config))

        if self.config.LOAD_CHECKPOINT_MODEL or self.config.LOAD_CHECKPOINT_TRAINER:
            path = self.config.LOAD_CHECKPOINT_PATH
            if not path and self.config.LOAD_CHECKPOINT_TRAINER:
                # auto-resume: newest checkpoint of this run (reference
                # hpc_ckpt_* glob, distributed_utils.py:38-48)
                path = find_latest_checkpoint(self.run_dir)
            if path:
                self.load_checkpoint(
                    path, trainer_state=self.config.LOAD_CHECKPOINT_TRAINER
                )

    # ------------------------------------------------------------------ train
    def fit(self, train_batches: Iterator, val_batches=None,
            max_steps: Optional[int] = None):
        if self._rng is None:
            self._rng = jax.random.PRNGKey(self.config.SEED + 1)
        t0 = time.time()
        ckpt_every = max(1, self.config.CHECKPOINT_INTERVAL)
        for epoch in range(self.config.MAX_EPOCHES):
            for batch in train_batches() if callable(train_batches) else train_batches:
                batch = shard_batch(batch, self.mesh)
                self._rng, sub = jax.random.split(self._rng)
                self.params, self.opt_state, losses = self._train_step(
                    self.params, self.opt_state, batch, sub
                )
                self.step += 1
                if self.step % 10 == 0 or max_steps:
                    loss = float(losses["full_loss"])
                    if not np.isfinite(loss):
                        self._dump_error_batch(batch, losses)
                    rec = {
                        "step": self.step,
                        "epoch": epoch,
                        "train/full_loss": loss,
                        "train/grad_norm": float(losses["grad_norm"]),
                        "wall": time.time() - t0,
                    }
                    # full loss breakdown (goal_dist_*, per-cond rollout
                    # losses, ...): the r5 goal-head zero-LR bug hid for two
                    # rounds because only full_loss/grad_norm were logged
                    for k_, v_ in losses.items():
                        if k_ not in ("full_loss", "grad_norm") and \
                                getattr(v_, "ndim", None) == 0:
                            rec[f"train/{k_}"] = float(v_)
                    self.log(rec)
                    self._improved = loss < self.best_loss
                    if self._improved:
                        self.best_loss = loss
                # Periodic saves (reference: Lightning ModelCheckpoint
                # save_last + top-1 by train/full_loss, trainer.py:248-256) -
                # throttled to CHECKPOINT_INTERVAL so early training doesn't
                # write orbax checkpoints near-continuously.
                if self.config.SAVE_CHECKPOINT and self.step % ckpt_every == 0:
                    self.save_checkpoint("last")
                    if self._improved:
                        self.save_checkpoint("best")
                        self._improved = False
                if max_steps and self.step >= max_steps:
                    break
            if max_steps and self.step >= max_steps:
                break  # stop cycling epochs too, not just the batch loop
            if val_batches is not None and (epoch + 1) % self.config.VAL_INTERVAL == 0:
                self.evaluate(val_batches)
                rc = self.config.ROLLOUT
                if (rc.ENABLE and (epoch + 1) > rc.WARMUP_EPOCH
                        and (epoch + 1) % rc.INTERVAL_EPOCH == 0):
                    self.rollout_callback(val_batches)
                    if rc.REQUEST_METRIC and self.config.ROLLOUT_REQUEST_PATH:
                        self.submit_rollout_request(epoch + 1)
            if max_steps and self.step >= max_steps:
                break
        if self.config.SAVE_CHECKPOINT:
            self.save_checkpoint("last")
        return self.params

    # ------------------------------------------------------------------- eval
    def evaluate(self, val_batches, save_tag: Optional[str] = None) -> Dict[str, float]:
        rng = jax.random.PRNGKey(0)
        states = []
        losses_acc = []
        vis_pair = None
        for batch in val_batches() if callable(val_batches) else val_batches:
            batch = shard_batch(batch, self.mesh)
            rng, sub = jax.random.split(rng)
            losses, metric_state, output = self._eval_step(self.params, batch, sub)
            states.append(jax.tree.map(np.asarray, metric_state))
            losses_acc.append(float(losses["full_loss"]))
            if vis_pair is None and self.config.ENABLE_VIS:
                vis_pair = (batch, output)
        merged = merge_metric_states(states) if states else {}
        metrics = compute_metrics(merged) if states else {}
        metrics["full_loss"] = float(np.mean(losses_acc)) if losses_acc else float("nan")
        self.log({"step": self.step, **{f"val/{k}": v for k, v in metrics.items()}})
        if save_tag:
            # raw metric-state arrays + scalars for offline analysis
            # (reference: trainer.py:287-292 _save_metric -> {mode}_metrics.npy)
            np.save(os.path.join(self.run_dir, f"{save_tag}_metrics.npy"),
                    {"metrics": metrics, "state": merged})
        if vis_pair is not None:
            self.visualization_callback(*vis_pair)
        return metrics

    # -------------------------------------------------------------- callbacks
    def visualization_callback(self, batch, output, tag: str = "val",
                               make_gif: bool = False):
        """Render the first scene's closed-loop rollout (map + GT + predicted
        trajectories) and log the image path, plus optionally a GIF
        (reference: models/utils/visualization.py:303-329 visualization
        callback logging wandb images/videos during validation)."""
        from prosim_tpu.viz.plots import save_rollout_gif, save_scene_png

        vis_dir = os.path.join(self.run_dir, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        record = {"step": self.step}
        png = save_scene_png(
            batch, os.path.join(vis_dir, f"step{self.step}_{tag}.png"),
            output=output,
        )
        record[f"vis/{tag}_rollout"] = png
        if make_gif:
            record[f"vis/{tag}_rollout_gif"] = save_rollout_gif(
                batch, output, os.path.join(vis_dir, f"step{self.step}_{tag}.gif")
            )
        self.log(record)
        return record

    def rollout_callback(self, val_batches, m: Optional[int] = None,
                         max_batches: int = 1) -> Dict[str, float]:
        """Batched M-replica closed-loop rollout during validation with sim
        metrics (min/mean replica ADE vs the logged future, crash and
        goal-reach rates), the TPU-native counterpart of the reference's
        rollout_callback_gpu (rollout/callbacks.py:229-307): the M stochastic
        futures are a batch-axis tile inside one compiled rollout instead of
        a per-scene GPU loop."""
        from prosim_tpu.rollout.rollout import (
            parallel_rollout,
            parallel_rollout_with_sampler,
            replica_rollout_metrics,
        )

        m = m or self.config.ROLLOUT.SAMPLE_NUM
        if self._rollout_fn is None or self._rollout_m != m:
            # replica diversity as in the WOSAC farm (rollout/runner.py):
            # with goal heads trained, each replica rolls out under its own
            # sampled top-K goal condition; without them all M replicas are
            # the argmax rollout and min_ade == mean_ade exactly
            use_sampler = (m > 1
                           and self.config.MODEL.DECODER.GOAL_PRED.ENABLE)

            def _roll(params, batch, key):
                if use_sampler:
                    out = parallel_rollout_with_sampler(
                        self.model, params, batch, m, key,
                        self.model, params, top_k=3)
                else:
                    out = parallel_rollout(self.model, params, batch, m, key)
                return replica_rollout_metrics(out, batch, m)

            self._rollout_fn = jax.jit(_roll)
            self._rollout_m = m

        # The tiled rollout runs B*m scenes at once; at the WOSAC default
        # M=32 a full val batch blows HBM (measured 51 GB of per-edge gather
        # tables at B=16, m=32). Chunk scenes so B_chunk*m stays within
        # ROLLOUT.MAX_TILE, picking a chunk that divides B so every chunk
        # reuses one compiled shape.
        max_tile = max(int(self.config.ROLLOUT.MAX_TILE), m)
        rng = jax.random.PRNGKey(self.config.SEED + 2)
        acc = []
        for i, batch in enumerate(
            val_batches() if callable(val_batches) else val_batches
        ):
            if i >= max_batches:
                break
            B = int(batch.prompt.mask.shape[0])
            lim = max(1, min(max_tile // m, B))
            # chunks must divide B (one compiled shape for all chunks) and be
            # multiples of the data-axis size (shardable) — the same
            # divisibility the un-chunked batch always needed. If MAX_TILE is
            # tighter than one data-shard per chunk, exceed it minimally.
            n_data = dict(self.mesh.shape).get("data", 1)
            even = [d for d in range(1, B + 1) if B % d == 0 and d % n_data == 0]
            under = [d for d in even if d <= lim]
            c = max(under) if under else (min(even) if even else B)
            for s in range(0, B, c):
                sub_batch = batch.map_batch_leaves(lambda x: x[s : s + c])
                sub_batch = shard_batch(sub_batch, self.mesh)
                rng, sub = jax.random.split(rng)
                metrics = self._rollout_fn(self.params, sub_batch, sub)
                acc.append({k: float(v) for k, v in metrics.items()})
        out = {
            k: float(np.mean([a[k] for a in acc])) for k in acc[0]
        } if acc else {}
        self.log({"step": self.step,
                  **{f"rollout/{k}": v for k, v in out.items()}})
        return out

    _rollout_fn = None
    _rollout_m = None
    _improved = False

    def submit_rollout_request(self, epoch: int) -> str:
        """Save a mid-training checkpoint and drop a JSON request file for an
        external WOSAC rollout farm (reference: rollout/callbacks.py:373-399
        submit_rollout_request). A farm worker watches ROLLOUT_REQUEST_PATH,
        loads the checkpoint and runs rollout.runner.run_rollout_eval."""
        import datetime

        tag = f"rollout_ep{epoch}"
        self.save_checkpoint(tag)
        req_dir = self.config.ROLLOUT_REQUEST_PATH
        os.makedirs(req_dir, exist_ok=True)
        exp_name = os.path.join(
            self.config.EXPERIMENT_DIR, self.config.EXPERIMENT_NAME
        ).replace("/", "_")
        time_str = datetime.datetime.now().strftime("%m-%d-%Y_%H-%M-%S")
        request = {
            "ckpt_path": os.path.abspath(
                os.path.join(self.run_dir, f"ckpt_{tag}")
            ),
            "exp_folder": os.path.abspath(self.run_dir),
            "time_str": time_str,
            "epoch": epoch,
            "global_step": self.step,
            "m": self.config.ROLLOUT.SAMPLE_NUM,
        }
        path = os.path.join(req_dir, f"{exp_name}_{time_str}_epoch_{epoch}.json")
        with open(path, "w") as f:
            json.dump(request, f)
        self.log({"step": self.step, "rollout_request": path})
        return path

    def evaluate_cond_sets(self, cache_dir, split="val", batch_size=None):
        """One eval pass per PROMPT.CONDITION.EVAL_COND_SETS entry, each with
        its own condition generator and metric namespace (reference:
        prosim/trainer.py:198-206, metrics/base.py per-cond-set instances)."""
        from prosim_tpu.config import get_cond_set_config
        from prosim_tpu.data.dataset import ProSimImitationDataset

        batch_size = batch_size or self.config.VAL.BATCH_SIZE
        out = {}
        for name in self.config.PROMPT.CONDITION.EVAL_COND_SETS:
            cfg = get_cond_set_config(self.config, name)
            ds = ProSimImitationDataset(cfg, split, cache_dir)
            metrics = self.evaluate(lambda: ds.batches(batch_size))
            self.log({
                "step": self.step,
                **{f"val/{name}/{k}": v for k, v in metrics.items()},
            })
            out[name] = metrics
        return out

    def _dump_error_batch(self, batch, losses):
        """Serialize a batch that produced a non-finite loss for offline
        debugging (reference: loss_func.py:203-213 error-batch dumper)."""
        import jax.tree_util as jtu

        path = os.path.join(self.run_dir, f"error_batch_step{self.step}.npz")
        arrays = {}
        for kp, leaf in jtu.tree_leaves_with_path(batch):
            if hasattr(leaf, "shape"):
                arrays[jtu.keystr(kp)] = np.asarray(leaf)
        for k, v in losses.items():
            arrays[f"loss/{k}"] = np.asarray(v)
        np.savez_compressed(path, **arrays)
        self.log({"step": self.step, "error_batch": path})
        return path

    # ------------------------------------------------------------ checkpoints
    @staticmethod
    def _strip_frozen_llm(params):
        """Drop the frozen LLM body from a params tree, keeping LoRA leaves
        (reference: models/base.py:134-139 on_save_checkpoint) -- a Llama3-8B
        body would otherwise add ~16 GB per checkpoint."""
        def walk(node, in_llm):
            if not isinstance(node, dict):
                return node
            out = {}
            for k, v in node.items():
                inside = in_llm or k == "llm"
                if isinstance(v, dict):
                    sub = walk(v, inside)
                    if sub:
                        out[k] = sub
                elif not inside or k.startswith("lora"):
                    out[k] = v
            return out

        return walk(params, False)

    def _trainer_state(self):
        """Full resumable state: params (frozen LLM stripped) + optimizer
        state + step + best loss + training rng (reference Lightning ckpt
        carries optimizer/scheduler state for LOAD_CHECKPOINT_TRAINER resume,
        trainer.py:305-311)."""
        if self._rng is None:
            self._rng = jax.random.PRNGKey(self.config.SEED + 1)
        return {
            "params": self._strip_frozen_llm(
                jax.tree.map(np.asarray, self.params)
            ),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "step": self.step,
            "best_loss": np.asarray(self.best_loss, np.float32),
            "rng": np.asarray(self._rng),
        }

    def save_checkpoint(self, tag: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.run_dir, f"ckpt_{tag}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self._trainer_state(), force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str, trainer_state: bool = False):
        """Non-strict restore (reference: models/base.py:141-147): leaves
        absent from the checkpoint (the stripped frozen LLM body) keep their
        current values. With trainer_state=True (LOAD_CHECKPOINT_TRAINER),
        also restores optimizer state, step, best loss, and the training rng
        so a resumed run continues the interrupted one exactly."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        current = jax.tree.map(np.asarray, self.params)
        target = self._trainer_state()
        try:
            restored = ckptr.restore(os.path.abspath(path), target)
        except Exception:
            # legacy round-1 checkpoints carried params+step only
            restored = ckptr.restore(
                os.path.abspath(path),
                {"params": target["params"], "step": 0},
            )

        def merge(cur, res):
            if not isinstance(cur, dict):
                return res
            return {
                k: merge(v, res[k]) if k in res else v for k, v in cur.items()
            }

        merged = merge(current, restored["params"])
        self.params = replicate(merged, self.mesh)
        self.step = int(restored["step"])
        if trainer_state and "opt_state" in restored:
            self.opt_state = replicate(restored["opt_state"], self.mesh)
            self.best_loss = float(restored["best_loss"])
            self._rng = jnp.asarray(restored["rng"])

    # -------------------------------------------------------------- profiling
    def profile(self, batch, steps: int = 3, out_dir: Optional[str] = None):
        """Capture a jax profiler trace of the train step (replaces the
        reference's Lightning simple profiler, prosim/trainer.py:104)."""
        out_dir = out_dir or os.path.join(self.run_dir, "profile")
        rng = jax.random.PRNGKey(0)
        batch = shard_batch(batch, self.mesh)
        with jax.profiler.trace(out_dir):
            for i in range(steps):
                rng, sub = jax.random.split(rng)
                self.params, self.opt_state, losses = self._train_step(
                    self.params, self.opt_state, batch, sub
                )
            jax.block_until_ready(losses["full_loss"])
        return out_dir

    # ---------------------------------------------------------------- logging
    def log(self, record: Dict):
        with open(self.log_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        print(json.dumps(record), flush=True)
        if self._wandb_run is not None:
            self._wandb_run.log(record, step=record.get("step"))

    _wandb_run = None

    def enable_wandb(self, **init_kwargs):
        """Optional wandb mirror of the JSONL log (reference logs everything
        to wandb, prosim/trainer.py:227-242). No-op if wandb is absent."""
        try:
            import wandb

            self._wandb_run = wandb.init(
                project=self.config.WANDB_PROJ,
                name=self.config.EXPERIMENT_NAME,
                config=self.config.to_dict(),
                **init_kwargs,
            )
        except Exception as e:  # pragma: no cover
            print(f"wandb unavailable: {e}")
            self._wandb_run = None
