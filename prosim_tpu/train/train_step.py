"""Jittable train / eval steps."""

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from prosim_tpu.train.losses import loss_func_dict


def make_train_step(model, optimizer, config):
    """Returns train_step(params, opt_state, batch, rng) -> (params, opt_state,
    losses). Pure; jit/pjit it with batch sharded on the data axis - XLA
    inserts the gradient allreduce for the replicated params (the reference's
    DDP allreduce, prosim/trainer.py:121-123)."""
    loss_name = config.TASK.MOTION_PRED.LOSS
    loss_fn_impl = loss_func_dict[loss_name]
    task_weight = config.TASK.MOTION_PRED.WEIGHT

    def loss_fn(params, batch, rng):
        output = model.forward(params, batch, "train", rng)
        losses = loss_fn_impl(batch, output, config)
        return losses["full_loss"] * task_weight, losses

    def train_step(params, opt_state, batch, rng):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, losses

    return train_step


def make_eval_step(model, config):
    from prosim_tpu.train.metrics import pair_traj_pred_update

    loss_name = config.TASK.MOTION_PRED.LOSS
    loss_fn_impl = loss_func_dict[loss_name]

    def eval_step(params, batch, rng):
        output = model.forward(params, batch, "val", rng)
        losses = loss_fn_impl(batch, output, config)
        metrics = pair_traj_pred_update(batch, output, config)
        return losses, metrics, output

    return eval_step
