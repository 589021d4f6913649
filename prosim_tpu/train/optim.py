"""Optimizers, LR schedule, and per-group LR scaling.

Mirrors the reference's training recipe (reference: prosim/models/base.py:13-132,
225-318): AdamW/Adam/SGD, linear-warmup + cos^2-annealing schedule, global-norm
gradient clipping at TRAIN.GRAD_CLIP, and parameter groups with scaled LRs for
LoRA / adapter / goal-pred / condition-transformer parameters. Groups are
identified by path predicates over the param pytree - the JAX analogue of the
reference's name-substring matching.
"""

import math
from typing import Callable

import jax
import optax


def warmup_cos2_schedule(base_lr: float, warmup_steps: int, total_steps: int):
    """eta_t = eta_max * cos^2((t - warm) / (total - warm) * pi/2) after a
    linear warmup (reference: base.py:49-59)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = jnp.asarray(warmup_steps, jnp.float32)
        t = jnp.asarray(step, jnp.float32)
        lin = t / jnp.maximum(warm, 1.0)
        cosf = (t - warm) / jnp.maximum(total_steps - warm, 1.0)
        ann = jnp.cos(cosf * (math.pi / 2)) ** 2
        return base_lr * jnp.clip(jnp.where(t < warm, lin, ann), 0.0, None)

    return schedule


def _group_of(path: str, config) -> str:
    if "lora" in path:
        return "lora"
    if "prompt_to_llm" in path or "llm_to_cond" in path or "ln_prompt" in path:
        return "adapter"
    if "/llm/" in path or path.endswith("/llm") or path.startswith("llm/"):
        # the Llama BODY: frozen, trained only through its LoRA leaves — the
        # reference excludes it from every param group via requires_grad=False
        # (reference: base.py:94 named_parameters filter) and
        # Trainer._strip_frozen_llm drops it from checkpoints on the same
        # assumption
        return "llm_frozen"
    if "pred_mlp" in path or "goal_prob_head" in path or "goal_point_head" in path:
        return "goal_pred"
    if "condition_transformer" in path:
        return "cond"
    return "model"


GROUP_SCALE_KEYS = {
    "model": lambda c: 1.0,
    "lora": lambda c: c.MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM.LORA_LR_SCALE,
    "adapter": lambda c: c.MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM.ADAPTER_LR_SCALE,
    "goal_pred": lambda c: c.LOSS.ROLLOUT_TRAJ.GOAL_MODEL_LR_SCALE,
    "cond": lambda c: c.MODEL.CONDITION_TRANSFORMER.LR_SCALE,
}


def build_optimizer(config, params) -> optax.GradientTransformation:
    base_lr = config.TRAIN.LR if config.TRAIN.LR > 0 else 1e-3
    # when TRAIN.LR == 0, the main model is frozen while special groups train
    # (reference: base.py:108-110)
    model_lr = config.TRAIN.LR

    sched_cfg = config.TRAIN.SCHEDULER
    if sched_cfg.TYPE == "LinearWarmupCosineAnnealingLR":
        mk_sched = lambda lr: warmup_cos2_schedule(
            lr, sched_cfg.WARMUP_STEPS, sched_cfg.MAX_STEPS
        )
    elif sched_cfg.TYPE == "MultiStepLR":
        mk_sched = lambda lr: optax.piecewise_constant_schedule(
            lr,
            {int(s): 0.1 for s in getattr(sched_cfg, "MILESTONES", [])} or
            {sched_cfg.MAX_STEPS // 2: 0.1},
        )
    elif sched_cfg.TYPE == "CosineAnnealingLR":
        mk_sched = lambda lr: optax.cosine_decay_schedule(lr, sched_cfg.MAX_STEPS)
    else:
        mk_sched = lambda lr: lr

    def mk_opt(lr):
        opt_name = config.TRAIN.OPTIMIZER.lower()
        if opt_name == "adamw":
            return optax.adamw(mk_sched(lr), weight_decay=config.TRAIN.WEIGHT_DECAY)
        if opt_name == "adam":
            return optax.adam(mk_sched(lr))
        if opt_name == "sgd":
            return optax.sgd(mk_sched(lr))
        raise KeyError(f"unknown optimizer {config.TRAIN.OPTIMIZER}")

    def label_fn(tree):
        def path_label(path, _):
            joined = "/".join(str(getattr(k, "key", k)) for k in path)
            return _group_of(joined, config)

        return jax.tree_util.tree_map_with_path(path_label, tree)

    transforms = {}
    for group in ("model", "lora", "adapter", "goal_pred", "cond"):
        lr = (model_lr if group == "model" else base_lr * GROUP_SCALE_KEYS[group](config))
        transforms[group] = mk_opt(lr)
    transforms["llm_frozen"] = optax.set_to_zero()

    opt = optax.multi_transform(transforms, label_fn)
    if config.TRAIN.GRAD_CLIP and config.TRAIN.GRAD_CLIP > 0:
        opt = optax.chain(optax.clip_by_global_norm(config.TRAIN.GRAD_CLIP), opt)
    return opt
