"""Evaluation metrics.

Functional equivalents of the reference torchmetrics
(reference: prosim/metrics/motion_pred.py:10-199, metrics/base.py:16-63):
masked ADE/FDE/minADE/minFDE over per-step chunk predictions, closed-form
rollout ADE over the full horizon, and per-condition-type ADE breakdowns.

Each metric update returns {name: (sum, count)} pairs; accumulate across
batches (and psum across devices) then divide. That replaces torchmetrics'
`sync_dist=True` epoch reduction with explicit collectives.
"""

from typing import Dict, Tuple

import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.train.losses import rollout_traj


def _masked_sum_count(err, mask):
    return jnp.where(mask, err, 0.0).sum(), mask.sum()


def chunk_ade_fde(pred, prob, tgt, tgt_valid):
    """pred [B,N,T,K,S,D], prob [B,N,T,K], tgt [B,N,T,S,D], tgt_valid same.

    Returns dict of (sum, count) for ade/fde/min_ade/min_fde.
    """
    pos_valid = tgt_valid[..., :2].all(-1)  # [B,N,T,S]
    dist = jnp.linalg.norm(pred[..., :2] - tgt[:, :, :, None, :, :2], axis=-1)  # [B,N,T,K,S]
    dist = jnp.where(pos_valid[:, :, :, None], dist, 0.0)
    steps = jnp.clip(pos_valid.sum(-1), 1, None)  # [B,N,T]

    ade_k = dist.sum(-1) / steps[..., None]  # [B,N,T,K]
    # fde at last valid step
    last = jnp.clip(jnp.max(jnp.where(pos_valid, jnp.arange(pos_valid.shape[-1]), -1), -1), 0, None)
    fde_k = jnp.take_along_axis(dist, last[:, :, :, None, None], axis=-1)[..., 0]  # [B,N,T,K]

    top = jnp.argmax(prob, axis=-1)  # [B,N,T]
    ade = jnp.take_along_axis(ade_k, top[..., None], axis=-1)[..., 0]
    fde = jnp.take_along_axis(fde_k, top[..., None], axis=-1)[..., 0]
    pair_valid = pos_valid.any(-1)

    out = {}
    out["ade"] = _masked_sum_count(ade, pair_valid)
    out["fde"] = _masked_sum_count(fde, pair_valid)
    out["min_ade"] = _masked_sum_count(ade_k.min(-1), pair_valid)
    out["min_fde"] = _masked_sum_count(fde_k.min(-1), pair_valid)
    return out


@registry.register_metric(name="pair_traj_pred")
def pair_traj_pred_update(batch, output, config) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Update for the main metric set (reference: motion_pred.py:109-199)."""
    io = batch.io_pairs
    pred = jnp.transpose(output["motion_pred"], (1, 2, 0, 3, 4, 5))  # [B,N,T,K,S,D]
    prob = jnp.transpose(output["motion_prob"], (1, 2, 0, 3))
    tgt = jnp.transpose(io.tgt, (0, 2, 1, 3, 4))
    tgt_valid = jnp.transpose(io.tgt_valid, (0, 2, 1, 3, 4))
    pair_mask = jnp.transpose(io.mask, (0, 2, 1)) & batch.prompt.mask[:, :, None]
    tgt_valid = tgt_valid & pair_mask[..., None, None]
    tgt = jnp.where(tgt_valid, tgt, 0.0)

    metrics = chunk_ade_fde(pred, prob, tgt, tgt_valid)

    # closed-form rollout ADE over the full horizon
    rollout_steps = config.ROLLOUT.POLICY.REPLAN_FREQ
    k_sel = jnp.argmax(prob, axis=-1)
    pred_sel = jnp.take_along_axis(pred, k_sel[..., None, None, None], axis=3)[:, :, :, 0]
    if pred_sel.shape[-1] == tgt.shape[-1] + 3:
        # PRED_GMM layout [x, y, h, gmm(3), vel?] - drop the gmm columns
        pred_sel = jnp.concatenate(
            [pred_sel[..., :3], pred_sel[..., 6:]], axis=-1
        )
    pred_sel = jnp.where(tgt_valid, pred_sel, 0.0)
    tgt_rt = rollout_traj(tgt, rollout_steps)
    pred_rt = rollout_traj(pred_sel, rollout_steps)
    B, N = pair_mask.shape[:2]
    step_valid = tgt_valid[..., :rollout_steps, :2].all(-1).reshape(B, N, -1)
    rdist = jnp.linalg.norm(tgt_rt[..., :2] - pred_rt[..., :2], axis=-1)
    rd = jnp.where(step_valid, rdist, 0.0).sum(-1) / jnp.clip(step_valid.sum(-1), 1, None)
    agent_valid = step_valid.any(-1)
    metrics["rollout_ade"] = _masked_sum_count(rd, agent_valid)

    # per-condition-type rollout ADE
    for ctype, c in (batch.conditions or {}).items():
        pm = c["prompt_mask"] if isinstance(c, dict) else c.prompt_mask
        metrics[f"rollout_ade_{ctype}"] = _masked_sum_count(rd, agent_valid & pm)
    return metrics


def merge_metric_states(states):
    """Sum (sum, count) pairs across batches."""
    out = {}
    for st in states:
        for k, (s, c) in st.items():
            if k in out:
                out[k] = (out[k][0] + s, out[k][1] + c)
            else:
                out[k] = (s, c)
    return out


def compute_metrics(state):
    return {k: float(s) / max(float(c), 1.0) for k, (s, c) in state.items()}


@registry.register_metric(name="debug")
def debug_metric_update(batch, output, config):
    """No-op metric (reference: prosim/metrics/base.py:66)."""
    import jax.numpy as jnp

    return {"count": (jnp.asarray(0.0), jnp.asarray(1.0))}


@registry.register_metric(name="ego_traj_pred")
def ego_traj_pred_update(batch, output, config):
    """Ego-only ADE/FDE (reference: motion_pred.py:77). Ego occupies target
    slot 0 by construction of the formatter."""
    state = pair_traj_pred_update(batch, output, config)
    return {f"ego_{k}": v for k, v in state.items() if "rollout" not in k}


@registry.register_metric(name="all_traj_pred")
def all_traj_pred_update(batch, output, config):
    """All-agent ADE/FDE over chunk predictions (reference: motion_pred.py:88)."""
    return pair_traj_pred_update(batch, output, config)
