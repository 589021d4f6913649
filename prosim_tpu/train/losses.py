"""Loss subsystem.

Re-implements the reference's loss semantics on padded [B, N, T] tensors with
no string indexing (reference: prosim/loss/loss_func.py):

  * closed-form rollout re-integration of per-step delta chunks into the full
    horizon trajectory (rollout_traj, loss_func.py:215-248)
  * masked huber/L1 rollout distance on pos/heading/vel (loss_func.py:315-361)
  * k-way step loss with closest-endpoint mode selection (loss_func.py:10-171)
  * goal reconstruction + prompt-mask aux losses (loss_func.py:490-607)
  * per-condition-type rollout-loss breakdown (loss_func.py:376-402)
"""

from typing import Dict

import jax
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.utils.geometry import rotate_2d, wrap_angle


def huber(x, y, delta=1.0):
    d = x - y
    a = jnp.abs(d)
    return jnp.where(a <= delta, 0.5 * d * d, delta * (a - 0.5 * delta))


def _criterion(config):
    if config.LOSS.TRAJ_CRITERION.TYPE == "mse":
        return lambda a, b: (a - b) ** 2
    delta = config.LOSS.TRAJ_CRITERION.HUBER_DELTA
    return lambda a, b: huber(a, b, delta)


def rollout_traj(traj, rollout_steps):
    """Closed-form re-integration of per-replan-step local chunks.

    traj [B, N, T, S, D>=3]: chunk t holds cumulative (dx, dy) offsets and
    cumulative heading offsets in the frame of the agent's pose at replan
    step t. Returns [B, N, T*rollout_steps, D] in the frame of step 0.
    """
    B, N, T, S, D = traj.shape
    pred_vel = D == 5

    # heading anchor of each chunk = cumsum of previous chunks' total rotation
    dtheta = traj[..., rollout_steps - 1, 2]  # [B, N, T]
    theta = jnp.cumsum(dtheta, axis=-1)
    theta = jnp.concatenate([jnp.zeros_like(theta[..., :1]), theta[..., :-1]], axis=-1)
    theta = wrap_angle(theta)

    # per-step deltas within each chunk
    dx = jnp.diff(traj[..., :2], axis=-2)
    dx = jnp.concatenate([traj[..., :1, :2], dx], axis=-2)  # [B, N, T, S, 2]

    dx_rot = rotate_2d(dx, theta[..., None])
    dx_rot = dx_rot[..., :rollout_steps, :].reshape(B, N, -1, 2)
    xy = jnp.cumsum(dx_rot, axis=-2)

    th = traj[..., :rollout_steps, 2] + theta[..., None]
    th = wrap_angle(th.reshape(B, N, -1))

    out = jnp.concatenate([xy, th[..., None]], axis=-1)
    if pred_vel:
        vel = rotate_2d(traj[..., :rollout_steps, 3:5], theta[..., None])
        out = jnp.concatenate([out, vel.reshape(B, N, -1, 2)], axis=-1)
    return out


def compute_rollout_loss(tgt_rt, pred_rt, step_valid, config, gmm_params=None):
    """tgt_rt/pred_rt [B, N, T*, D], step_valid [B, N, T*] bool. When the
    policy emits GMM parameters the position term becomes the bivariate NLL
    (reference: loss_func.py:322-326)."""
    crit = _criterion(config)

    if gmm_params is not None:
        pos = gmm_nll(tgt_rt[..., :2], pred_rt[..., :2], gmm_params)
    else:
        pos = crit(tgt_rt[..., :2], pred_rt[..., :2]).sum(-1)
    tgt_h = jnp.stack([jnp.sin(tgt_rt[..., 2]), jnp.cos(tgt_rt[..., 2])], axis=-1)
    pred_h = jnp.stack([jnp.sin(pred_rt[..., 2]), jnp.cos(pred_rt[..., 2])], axis=-1)
    head = jnp.abs(tgt_h - pred_h).sum(-1)

    dists = {"pos": pos, "heading": head}
    if tgt_rt.shape[-1] == 5:
        dists["vel"] = crit(tgt_rt[..., 3:], pred_rt[..., 3:]).sum(-1)

    agent_valid = step_valid.any(axis=-1)
    denom_t = jnp.clip(step_valid.sum(axis=-1), 1, None)
    denom_a = jnp.clip(agent_valid.sum(), 1, None)

    loss, per_agent = {}, {}
    for k, d in dists.items():
        dm = jnp.where(step_valid, d, 0.0)
        step_mean = dm.sum(axis=-1) / denom_t  # [B, N]
        loss[k] = jnp.where(agent_valid, step_mean, 0.0).sum() / denom_a
        per_agent[k] = step_mean
    per_agent["agent_valid"] = agent_valid
    return loss, per_agent


def step_loss_k_way(tgt, tgt_valid, pred, prob, config):
    """K-way chunk loss with closest-endpoint mode selection.

    tgt [*, S, D], tgt_valid [*, S, D] bool, pred [*, K, S, Dp], prob [*, K].
    """
    crit = _criterion(config)
    K = pred.shape[-3]

    gmm = None
    if config.MODEL.POLICY.ACT_DECODER.TRAJ.PRED_GMM and (
        pred.shape[-1] == tgt.shape[-1] + 3
    ):
        # PRED_GMM columns [x, y, h, log_std1, log_std2, rho, (xd, yd)]
        # (reference: loss_func.py:137-149)
        gmm = pred[..., 3:6]
        pred = jnp.concatenate([pred[..., :3], pred[..., 6:]], axis=-1)

    t_mask = tgt_valid.all(-1)  # [*, S]
    idx_range = jnp.arange(t_mask.shape[-1])
    last_valid = jnp.max(jnp.where(t_mask, idx_range, -1), axis=-1)  # [*]
    safe_last = jnp.clip(last_valid, 0, None)
    tgt_end = jnp.take_along_axis(tgt, safe_last[..., None, None], axis=-2)[..., 0, :2]
    pred_end = jnp.take_along_axis(
        pred, safe_last[..., None, None, None], axis=-2
    )[..., 0, :2]
    end_dist = crit(tgt_end[..., None, :], pred_end).mean(-1)  # [*, K]
    min_idx = jnp.argmin(end_dist, axis=-1)  # [*]

    best = jnp.take_along_axis(pred, min_idx[..., None, None, None], axis=-3)
    best = jnp.squeeze(best, axis=-3)  # [*, S, Dp]

    pos_mask = tgt_valid[..., :2]
    if gmm is not None:
        # bivariate NLL position term (reference: loss_func.py:146-149)
        best_gmm = jnp.take_along_axis(
            gmm, min_idx[..., None, None, None], axis=-3
        )[..., 0, :, :]
        nll = gmm_nll(tgt[..., :2], best[..., :2], best_gmm)  # [*, S]
        m2 = pos_mask.all(-1)
        pos_l = jnp.where(m2, nll, 0.0).sum() / jnp.clip(m2.sum(), 1, None)
    else:
        pos = jnp.where(pos_mask, crit(tgt[..., :2], best[..., :2]), 0.0)
        pos_l = pos.sum() / jnp.clip(pos_mask.sum(), 1, None) * 2

    tgt_h = jnp.stack([jnp.sin(tgt[..., 2]), jnp.cos(tgt[..., 2])], axis=-1)
    pred_h = jnp.stack([jnp.sin(best[..., 2]), jnp.cos(best[..., 2])], axis=-1)
    h_mask = jnp.repeat(tgt_valid[..., 2:3], 2, axis=-1)
    head = jnp.where(h_mask, jnp.abs(tgt_h - pred_h), 0.0)
    head_l = head.sum() / jnp.clip(h_mask.sum(), 1, None) * 2

    cls_mask = tgt_valid[..., 0].any(-1)
    logp = jax.nn.log_softmax(prob, axis=-1)
    cls = -jnp.take_along_axis(logp, min_idx[..., None], axis=-1)[..., 0]
    cls_l = jnp.where(cls_mask, cls, 0.0).sum() / jnp.clip(cls_mask.sum(), 1, None)

    result = {
        "pos_loss": pos_l * config.LOSS.STEP_TRAJ.POS_WEIGHT,
        "head_loss": head_l * config.LOSS.STEP_TRAJ.HEAD_WEIGHT,
        "cls_loss": cls_l * config.LOSS.STEP_TRAJ.CLS_WEIGHT,
    }
    if tgt.shape[-1] >= 5:
        v_mask = tgt_valid[..., 3:5]
        vel = jnp.where(v_mask, jnp.abs(tgt[..., 3:5] - best[..., 3:5]), 0.0)
        vel_l = vel.sum() / jnp.clip(v_mask.sum(), 1, None) * 2
        result["vel_loss"] = vel_l * config.LOSS.STEP_TRAJ.VEL_WEIGHT
    result["full_loss"] = sum(result.values())
    return result, min_idx


@registry.register_loss(name="paired_mse_k")
def paired_mse_k(batch, output, config) -> Dict[str, jnp.ndarray]:
    """Main training loss (reference: loss_func.py:404-488).

    output['motion_pred'] [R, B, N, K, S, D], output['motion_prob'] [R, B, N, K];
    batch.io_pairs.tgt [B, T, N, S, D] with T == R.
    """
    io = batch.io_pairs
    pred = jnp.transpose(output["motion_pred"], (1, 2, 0, 3, 4, 5))  # [B, N, T, K, S, D]
    prob = jnp.transpose(output["motion_prob"], (1, 2, 0, 3))        # [B, N, T, K]

    tgt = jnp.transpose(io.tgt, (0, 2, 1, 3, 4))          # [B, N, T, S, D]
    tgt_valid = jnp.transpose(io.tgt_valid, (0, 2, 1, 3, 4))
    pair_mask = jnp.transpose(io.mask, (0, 2, 1))          # [B, N, T]
    pair_mask = pair_mask & batch.prompt.mask[:, :, None]
    tgt_valid = tgt_valid & pair_mask[..., None, None]
    tgt = jnp.where(tgt_valid, tgt, 0.0)

    results = {}
    full = jnp.asarray(0.0)

    if config.LOSS.ROLLOUT_TRAJ.ENABLE:
        rollout_steps = config.ROLLOUT.POLICY.REPLAN_FREQ
        k_sel = jnp.argmax(prob, axis=-1)  # [B, N, T]
        pred_sel = jnp.take_along_axis(
            pred, k_sel[..., None, None, None], axis=3
        )[:, :, :, 0]  # [B, N, T, S, Dp]

        B, N, T = pair_mask.shape
        gmm_params = None
        if config.MODEL.POLICY.ACT_DECODER.TRAJ.PRED_GMM:
            # motion_pred columns under PRED_GMM: [x, y, h, log_std1,
            # log_std2, rho, (xd, yd)] - gmm params feed the bivariate NLL
            # position term, vel moves to columns 6:8
            # (reference: loss_func.py:250-326 rollout_temp_traj_preds)
            gmm_params = pred_sel[..., :rollout_steps, 3:6].reshape(B, N, -1, 3)
            traj_cols = [pred_sel[..., :3]]
            if tgt.shape[-1] == 5:
                traj_cols.append(pred_sel[..., 6:8])
            pred_sel = jnp.concatenate(traj_cols, axis=-1)
        pred_sel = jnp.where(tgt_valid, pred_sel, 0.0)

        tgt_rt = rollout_traj(tgt, rollout_steps)
        pred_rt = rollout_traj(pred_sel, rollout_steps)

        step_valid = tgt_valid[..., :rollout_steps, :2].all(-1).reshape(B, N, -1)

        rloss, per_agent = compute_rollout_loss(
            tgt_rt, pred_rt, step_valid, config, gmm_params=gmm_params
        )
        results["rollout_pos_loss"] = rloss["pos"]
        results["rollout_head_loss"] = rloss["heading"]
        r_total = rloss["pos"] + rloss["heading"] * config.LOSS.ROLLOUT_TRAJ.HEAD_WEIGHT
        if "vel" in rloss:
            results["rollout_vel_loss"] = rloss["vel"]
            r_total = r_total + rloss["vel"] * config.LOSS.ROLLOUT_TRAJ.VEL_WEIGHT
        full = full + r_total * config.LOSS.ROLLOUT_TRAJ.WEIGHT

        results.update(
            condition_type_breakdown(batch, per_agent)
        )

        rcfg = config.LOSS.ROLLOUT_TRAJ
        if rcfg.USE_OFFROAD_LOSS or rcfg.USE_COLLISION_LOSS:
            # scene-frame rollout: rotate each agent's t=0 local frame out
            base_pos = io.pos[:, 0]   # [B, N, 2]
            base_ori = io.ori[:, 0]   # [B, N]
            xy_s = rotate_2d(pred_rt[..., :2], base_ori[..., None]) + base_pos[..., None, :]
            h_s = wrap_angle(pred_rt[..., 2] + base_ori[..., None])
            traj_s = jnp.concatenate([xy_s, h_s[..., None]], axis=-1)
            extents = io.extent[:, 0]
            agent_ok = per_agent["agent_valid"]

            if rcfg.USE_OFFROAD_LOSS and batch.road_edges is not None:
                if config.DATASET.USE_WAYMO_ROAD_EDGE:
                    from prosim_tpu.train.safety_losses import offroad_loss

                    ol = offroad_loss(
                        traj_s, extents, agent_ok,
                        batch.road_edges.pts, batch.road_edges.nxt,
                        batch.road_edges.valid,
                        t_sample=rcfg.OFFROAD_T_SAMPLE_RATE,
                    )
                else:
                    from prosim_tpu.train.safety_losses import offroad_loss_centerline

                    gt_xy_s = rotate_2d(tgt_rt[..., :2], base_ori[..., None]) + base_pos[..., None, :]
                    gt_h_s = wrap_angle(tgt_rt[..., 2] + base_ori[..., None])
                    gt_s = jnp.concatenate([gt_xy_s, gt_h_s[..., None]], axis=-1)
                    ol = offroad_loss_centerline(
                        traj_s, extents, agent_ok,
                        batch.road_edges.pts, batch.road_edges.nxt,
                        batch.road_edges.valid,
                        t_sample=rcfg.OFFROAD_T_SAMPLE_RATE,
                        margin=rcfg.OFFROAD_MARGIN,
                        gt_traj_xyh=gt_s,
                    )
                results["rollout_offroad_loss"] = ol
                full = full + ol * rcfg.OFFROAD_WEIGHT

            if rcfg.USE_COLLISION_LOSS:
                from prosim_tpu.train.safety_losses import collision_loss

                gt_xy_c = rotate_2d(tgt_rt[..., :2], base_ori[..., None]) + base_pos[..., None, :]
                gt_h_c = wrap_angle(tgt_rt[..., 2] + base_ori[..., None])
                gt_c = jnp.concatenate([gt_xy_c, gt_h_c[..., None]], axis=-1)
                cl = collision_loss(
                    traj_s, extents, agent_ok,
                    agent_types=io.agent_type[:, 0],
                    k=rcfg.COLLISION_K,
                    t_sample=rcfg.COLLISION_T_SAMPLE_RATE,
                    threshold=rcfg.COLLISION_THRESHOLD,
                    vehicle_only=rcfg.COLLISION_VEHICLE_ONLY,
                    gt_traj_xyh=gt_c,
                )
                results["rollout_collision_loss"] = cl
                full = full + cl * rcfg.COLLISION_WEIGHT
    else:
        sl, _ = step_loss_k_way(tgt, tgt_valid, pred, prob, config)
        results.update({k: v for k, v in sl.items() if k != "full_loss"})
        full = full + sl["full_loss"]

    if config.LOSS.GOAL_DIST_PRED.ENABLE and "goal_point" in output:
        gls = goal_prob_pred_loss(batch, output, config)
        results.update(gls)
        if "goal_dist_all" in gls:
            full = full + gls["goal_dist_all"] * config.LOSS.GOAL_DIST_PRED.WEIGHT

    if config.LOSS.ROLLOUT_TRAJ.USE_GOAL_PRED_LOSS and "reconst_pred" in output:
        goal_losses = goal_recon_loss(batch, output, config)
        goal_all = jnp.asarray(0.0)
        for k, v in goal_losses.items():
            if config.LOSS.ROLLOUT_TRAJ.GOAL_PRED_LOSS_COND_MASK and "uncond" in k:
                continue
            results[k] = v
            goal_all = goal_all + v
        results["goal_loss_all"] = goal_all
        full = full + goal_all * config.LOSS.ROLLOUT_TRAJ.GOAL_WEIGHT

    if config.LOSS.ROLLOUT_TRAJ.USE_PROMPT_LOSS and output.get("prompt_loss_aux") is not None:
        for k, v in output["prompt_loss_aux"].items():
            results[k] = v
            full = full + v * config.LOSS.ROLLOUT_TRAJ.PROMPT_WEIGHT

    results["full_loss"] = full
    return results


def goal_recon_loss(batch, output, config):
    """MSE of the policy-embedding goal reconstruction against the GT goal at
    t=0, split into conditioned/unconditioned agents
    (reference: loss_func.py:524-554)."""
    recon = output["reconst_pred"]
    if recon.ndim == 4:  # [R, B, N, 2] -> step 0 == t = 0
        recon = recon[0]
    goal = batch.io_pairs.goal[:, 0]  # [B, N, 2]
    base_mask = batch.io_pairs.mask[:, 0] & batch.prompt.mask

    cond_mask = jnp.zeros_like(base_mask)
    for key in ("goal_OneText", "motion_tag_OneText", "llm_text_OneText"):
        c = batch.conditions.get(key)
        if c is not None:
            pm = c["prompt_mask"] if isinstance(c, dict) else c.prompt_mask
            cond_mask = cond_mask | pm

    out = {}
    for name, m in (("cond", base_mask & cond_mask), ("uncond", base_mask & ~cond_mask)):
        se = ((recon - goal) ** 2).sum(-1) / 2  # mean over the 2 coords
        out[f"{name}_goal"] = jnp.where(m, se, 0.0).sum() / jnp.clip(m.sum(), 1, None)
    return out


def condition_type_breakdown(batch, per_agent):
    """Per-condition-type rollout-loss diagnostics
    (reference: loss_func.py:376-402). Stop-gradient metrics only."""
    out = {}
    if not batch.conditions:
        return out
    agent_valid = per_agent["agent_valid"]
    union = jnp.zeros_like(agent_valid)
    masks = {}
    for ctype, c in batch.conditions.items():
        pm = c["prompt_mask"] if isinstance(c, dict) else c.prompt_mask
        union = union | pm
        masks[ctype] = pm & agent_valid
    masks["none"] = agent_valid & ~union
    for ctype, m in masks.items():
        denom = jnp.clip(m.sum(), 1, None)
        for lname in ("pos", "heading", "vel"):
            if lname in per_agent:
                val = jnp.where(m, per_agent[lname], 0.0).sum() / denom
                out[f"conditional_{ctype}_rollout_{lname}_loss"] = jax.lax.stop_gradient(val)
    return out


loss_func_dict = {
    "paired_mse_k": paired_mse_k,
}


def gmm_nll(tgt_xy, pred_xy, gmm_params, log_std_range=(-1.609, 5.0), rho_limit=0.5):
    """Bivariate Gaussian NLL (MTR-style, reference: loss_func.py:37-75).

    tgt_xy/pred_xy [..., 2]; gmm_params [..., 3] = (log_std1, log_std2, rho).
    """
    res = tgt_xy - pred_xy
    dx, dy = res[..., 0], res[..., 1]
    log_std1 = jnp.clip(gmm_params[..., 0], *log_std_range)
    log_std2 = jnp.clip(gmm_params[..., 1], *log_std_range)
    std1, std2 = jnp.exp(log_std1), jnp.exp(log_std2)
    rho = jnp.clip(gmm_params[..., 2], -rho_limit, rho_limit)
    log_coef = log_std1 + log_std2 + 0.5 * jnp.log(1 - rho ** 2)
    expo = (0.5 / (1 - rho ** 2)) * (
        (dx / std1) ** 2 + (dy / std2) ** 2 - 2 * rho * dx * dy / (std1 * std2)
    )
    return log_coef + expo


def goal_prob_pred_loss(batch, output, config):
    """K-way goal distribution loss (reference: loss_func.py:556-607):
    cross-entropy toward the goal hypothesis nearest to GT + huber on that
    hypothesis + variance/entropy regularizers."""
    if "goal_point" not in output:
        return {}
    goal_point = output["goal_point"]   # [B, N, K, 2]
    goal_prob = output["goal_prob"]     # [B, N, K]
    gt = batch.io_pairs.goal[:, 0]      # [B, N, 2]
    mask = batch.io_pairs.mask[:, 0] & batch.prompt.mask

    dist = jnp.linalg.norm(goal_point - gt[:, :, None], axis=-1)  # [B, N, K]
    sel = jnp.argmin(dist, axis=-1)

    logp = jax.nn.log_softmax(goal_prob, axis=-1)
    ce = -jnp.take_along_axis(logp, sel[..., None], axis=-1)[..., 0]
    denom = jnp.clip(mask.sum(), 1, None)
    prob_loss = jnp.where(mask, ce, 0.0).sum() / denom

    best = jnp.take_along_axis(goal_point, sel[..., None, None], axis=2)[:, :, 0]
    delta = config.LOSS.TRAJ_CRITERION.HUBER_DELTA
    point = huber(best, gt, delta).mean(-1)
    point_loss = jnp.where(mask, point, 0.0).sum() / denom

    # spread regularizer: keep hypotheses diverse
    var = jnp.var(goal_point, axis=2).mean(-1)
    logvar = jnp.log(jnp.where(mask, var, 1.0) + 1e-6)
    neg_logvar = -(jnp.where(mask, logvar, 0.0).sum() / denom)

    p = jax.nn.softmax(goal_prob, axis=-1)
    ent = -(p * jnp.log(p + 1e-6)).sum(-1)
    entropy = jax.lax.stop_gradient(jnp.where(mask, ent, 0.0).sum() / denom)

    # reference loss_func.py:602: point + CLS_WEIGHT * ce - VAR_WEIGHT * logvar
    full = (point_loss
            + prob_loss * config.LOSS.GOAL_DIST_PRED.CLS_WEIGHT
            + neg_logvar * config.LOSS.GOAL_DIST_PRED.VAR_WEIGHT)
    return {
        "goal_dist_prob_loss": prob_loss,
        "goal_dist_point_loss": point_loss,
        "goal_dist_neg_logvar": neg_logvar,
        "goal_dist_entropy": entropy,
        "goal_dist_all": full,
    }
