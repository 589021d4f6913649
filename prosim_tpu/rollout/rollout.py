"""Batched M-replica closed-loop rollout + world-frame conversion.

The WOSAC protocol requires M=32 stochastic joint futures per scene
(reference: prosim/rollout/gpu_utils.py:59-228). The reference replicates
tensors M x on one GPU after encoding once; here the scene is encoded once and
the M replicas become a batch-axis tile of (scene tokens, policy embeddings,
fut_obs), so the whole (B*M) rollout is one compiled scan that shards over the
data mesh axis like any other batch.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prosim_tpu.data.batch import Condition, SceneBatch, SceneTokens
from prosim_tpu.utils.geometry import rotate_2d, wrap_angle


def _tile(x, m):
    return jnp.repeat(x, m, axis=0) if hasattr(x, "ndim") and x.ndim >= 1 else x


def tile_batch_for_replicas(batch: SceneBatch, m: int) -> SceneBatch:
    """Repeat every scene m times along the batch axis (scene i replicas
    occupy rows i*m ... i*m+m-1)."""
    return batch.map_batch_leaves(lambda x: _tile(x, m))


def parallel_rollout(model, params, batch: SceneBatch, m: int, rng,
                     mode: str = "rollout") -> Dict:
    """Encode once, tile M x, rollout (B*M) scenes in one scan.

    Returns the model output dict with leading batch axis B*M.
    """
    rng, prep_rng = jax.random.split(rng)
    scene, policy_emd, aux = model.prepare(params, batch, mode, prep_rng)

    scene_m = SceneTokens(
        tokens=_tile(scene.tokens, m),
        pos=_tile(scene.pos, m),
        ori=_tile(scene.ori, m),
        mask=_tile(scene.mask, m),
        num_map=scene.num_map,
    )
    policy_m = {
        k: (_tile(v, m) if hasattr(v, "ndim") and v.ndim >= 1 else v)
        for k, v in policy_emd.items()
    }
    batch_m = tile_batch_for_replicas(batch, m)
    return model.rollout_scan(params, batch_m, scene_m, policy_m, mode, rng, aux)


def rollout_to_world(output: Dict, batch: SceneBatch, center_xy, center_h):
    """Local (agent-init-frame) rollout -> world frame.

    output['rollout_traj'] [B, N, T, 4]; init pos/heading in the scene frame;
    (center_xy, center_h) [B, 2]/[B] = scene-frame origin pose in world
    coordinates (reference: gpu_utils.py:230-281).

    Returns world xyh [B, N, T, 3].
    """
    traj = output["rollout_traj"]
    init_pos = output["init_pos"]       # [B, N, 2]
    init_h = output["init_heading"]     # [B, N]

    xy_scene = rotate_2d(traj[..., :2], init_h[..., None]) + init_pos[..., None, :]
    h_scene = wrap_angle(
        jnp.arctan2(traj[..., 2], traj[..., 3]) + init_h[..., None]
    )
    xy_world = rotate_2d(xy_scene, center_h[:, None, None]) + center_xy[:, None, None, :]
    h_world = wrap_angle(h_scene + center_h[:, None, None])
    return jnp.concatenate([xy_world, h_world[..., None]], axis=-1)


# ------------------------------------------------------------- sim metrics

def crash_and_goal_metrics(world_xyh, extents, agent_mask, goals_world,
                           goal_radius: float = 2.0):
    """Crash rate (disc-overlap approximation) and goal-reach rate over the
    rollout (reference: prosim/rollout/metrics.py:21-135, which uses shapely
    IoU; here a vectorized disc test on device).

    world_xyh [B, N, T, 3], extents [B, N, 2], agent_mask [B, N],
    goals_world [B, N, 2].
    """
    xy = world_xyh[..., :2]
    B, N, T, _ = xy.shape
    radius = jnp.linalg.norm(extents, axis=-1) / 2.0  # [B, N]

    rsum = radius[:, :, None] + radius[:, None, :]
    pair_mask = (
        agent_mask[:, :, None]
        & agent_mask[:, None, :]
        & ~jnp.eye(N, dtype=bool)[None]
    )

    # pairwise distances blocked over time: the naive [B, N, N, T, 2] diff
    # temp is gigabytes at rollout-callback tile counts (B = scenes*M); a
    # scan over T-blocks keeps the live temp to [Tb, B, N, N] with identical
    # math (any() over time commutes with blocking)
    tb = 8
    pad = (-T) % tb
    xy_t = jnp.moveaxis(xy, 2, 0)  # [T, B, N, 2]
    if pad:
        # padded steps sit at +1e9: never within collision range
        xy_t = jnp.concatenate(
            [xy_t, jnp.full((pad, B, N, 2), 1e9, xy_t.dtype)], axis=0
        )
    xy_blocks = xy_t.reshape(-1, tb, B, N, 2)

    def _block(crashed, xy_b):  # xy_b [Tb, B, N, 2]
        d = jnp.linalg.norm(
            xy_b[:, :, :, None] - xy_b[:, :, None, :], axis=-1
        )  # [Tb, B, N, N]
        c = (d < rsum[None] * 0.7) & pair_mask[None]
        return crashed | c.any(axis=(0, 3)), None

    crashed, _ = jax.lax.scan(
        _block, jnp.zeros((B, N), bool), xy_blocks
    )  # [B, N]
    crash_rate = jnp.where(agent_mask, crashed, False).sum() / jnp.clip(
        agent_mask.sum(), 1, None
    )

    goal_d = jnp.linalg.norm(xy - goals_world[:, :, None], axis=-1).min(axis=-1)
    reached = goal_d < goal_radius
    goal_rate = jnp.where(agent_mask, reached, False).sum() / jnp.clip(
        agent_mask.sum(), 1, None
    )
    return {"crash_rate": crash_rate, "goal_reach_rate": goal_rate}

def replica_rollout_metrics(output: Dict, batch: SceneBatch, m: int) -> Dict:
    """Validation-time sim metrics over an M-replica rollout (the metric set
    the reference's rollout callback logs, rollout/callbacks.py:229-307 +
    rollout/metrics.py): per-scene min/mean ADE of the M joint futures vs the
    logged future, plus crash / goal-reach rates in the scene frame.

    `output` = rollout_scan output on the tiled batch (leading axis B*m);
    `batch` = the UN-tiled batch (leading axis B). Pure/jittable.
    """
    traj = output["rollout_traj"]                       # [B*m, N, T, 4]
    BM, N, T, _ = traj.shape
    B = BM // m
    mask = batch.prompt.mask                            # [B, N]

    # --- replica ADE vs GT (both live in each agent's init frame)
    gt_xy = batch.io_pairs.full_traj_xy[:, :, :T]       # [B, N, T, 2]
    gt_valid = batch.io_pairs.full_traj_valid[:, :, :T] & mask[..., None]
    pred = traj[..., :2].reshape(B, m, N, T, 2)
    err = jnp.linalg.norm(pred - gt_xy[:, None].astype(pred.dtype), axis=-1)
    w = gt_valid[:, None].astype(pred.dtype)            # [B, 1, N, T]
    ade_r = (err * w).sum((2, 3)) / jnp.clip(w.sum((2, 3)), 1, None)  # [B, m]
    scene_has = gt_valid.any((1, 2))                    # [B]
    denom = jnp.clip(scene_has.sum(), 1, None)
    min_ade = jnp.where(scene_has, ade_r.min(1), 0.0).sum() / denom
    mean_ade = jnp.where(scene_has, ade_r.mean(1), 0.0).sum() / denom

    # --- crash / goal-reach in the scene frame (rigid transform of world)
    init_pos = output["init_pos"]                       # [B*m, N, 2]
    init_h = output["init_heading"]                     # [B*m, N]
    xy_scene = rotate_2d(traj[..., :2], init_h[..., None]) + init_pos[..., None, :]
    h_scene = wrap_angle(jnp.arctan2(traj[..., 2], traj[..., 3]) + init_h[..., None])
    xyh = jnp.concatenate([xy_scene, h_scene[..., None]], axis=-1)

    tile = lambda x: jnp.repeat(x, m, axis=0)
    goals_scene = batch.prompt.goal_point  # already scene-frame (batch.py:65)
    sim = crash_and_goal_metrics(
        xyh, tile(batch.prompt.extent), output["agent_mask"], tile(goals_scene)
    )
    return {"min_ade": min_ade, "mean_ade": mean_ade, **sim}


def sample_goal_conditions(goal_point, goal_prob, prompt_mask, m, rng,
                           top_k: int = 8, stop_smooth: float = 5.0,
                           horizon: float = 80.0) -> Condition:
    """Per-replica goal conditions from a goal-sampler model's K-goal heads
    (reference: gpu_utils.py:125-177 sample_M_goal_cond_to_batch): each of the
    m replicas independently picks one of every agent's top-K goals; goals
    within `stop_smooth` metres of the origin snap to (0, 0) (stopping).

    goal_point [B, N, K, 2], goal_prob [B, N, K] -> Condition with feat
    [B*m, N, 3] = (x, y, horizon), replicas of scene i at rows i*m..i*m+m-1.
    """
    B, N, K, _ = goal_point.shape
    k_eff = min(top_k, K)
    _, topk_idx = jax.lax.top_k(goal_prob, k_eff)               # [B, N, k]
    pick = jax.random.randint(rng, (B, m, N), 0, k_eff)
    sel = jnp.take_along_axis(
        jnp.broadcast_to(topk_idx[:, None], (B, m, N, k_eff)),
        pick[..., None], axis=-1,
    )[..., 0]                                                    # [B, m, N]
    goals = jnp.take_along_axis(
        jnp.broadcast_to(goal_point[:, None], (B, m, N, K, 2)),
        sel[..., None, None], axis=3,
    )[:, :, :, 0, :]                                             # [B, m, N, 2]
    stop = (jnp.abs(goals[..., 0]) < stop_smooth) & (jnp.abs(goals[..., 1]) < stop_smooth)
    goals = jnp.where(stop[..., None], 0.0, goals)

    feat = jnp.concatenate(
        [goals, jnp.full((B, m, N, 1), horizon, goals.dtype)], axis=-1
    ).reshape(B * m, N, 3)
    mask = jnp.broadcast_to(prompt_mask[:, None], (B, m, N)).reshape(B * m, N)
    prompt_idx = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, :, None], (B * m, N, 1)
    )
    return Condition(feat=feat, mask=mask, prompt_idx=prompt_idx, prompt_mask=mask)


def parallel_rollout_with_sampler(model, params, batch: SceneBatch, m: int, rng,
                                  sampler_model, sampler_params,
                                  top_k: int = 8, stop_smooth: float = 5.0,
                                  mode: str = "rollout") -> Dict:
    """M-replica rollout where a goal-sampler model proposes a distinct goal
    condition per replica (reference: gpu_utils.py:199-216): encode the scene
    once, tile, attach sampled goal conditions, then decode per-replica
    policies and run one batched scan."""
    rng, r_s, r_g, r_sel = jax.random.split(rng, 4)
    # the WOSAC protocol evaluates UNPROMPTED realism: dataset conditions
    # must not steer the sampler's goal prediction (nor, below, the policy —
    # the sampled goals replace them wholesale)
    batch = batch.replace(conditions={})
    _, s_emd, _ = sampler_model.prepare(sampler_params, batch, "val", r_s)
    if "goal_point" not in s_emd:
        raise ValueError("sampler model has no goal heads (DECODER.GOAL_PRED)")
    goal_cond = sample_goal_conditions(
        s_emd["goal_point"], s_emd["goal_prob"], batch.prompt.mask, m, r_g,
        top_k=top_k, stop_smooth=stop_smooth,
    )

    scene = model.encode_scene(params, batch)
    scene_m = SceneTokens(
        tokens=_tile(scene.tokens, m), pos=_tile(scene.pos, m),
        ori=_tile(scene.ori, m), mask=_tile(scene.mask, m),
        num_map=scene.num_map,
    )
    batch_m = tile_batch_for_replicas(batch, m)
    # the sampled goals REPLACE the dataset conditions wholesale (reference:
    # gpu_utils.py:175 sets all_cond = {'goal': goal_cond_M}) - the WOSAC
    # protocol evaluates unprompted realism, so no other condition rides along
    batch_m = batch_m.replace(conditions={"goal": goal_cond})
    # conditions are replaced BEFORE the prompt encoder runs: with
    # 'prompt_encoder' in CONDITION_LOCATIONS (the reference default), an
    # encode-once-then-tile prompt embedding would smuggle the dataset
    # conditions along and collapse the per-replica goal diversity. The
    # encode-once fast path is only valid when the prompt encoder never
    # sees conditions.
    if "prompt_encoder" in model.condition_locations:
        prompt_emb_m = model.encode_prompt(params, batch_m)
    else:
        # conditions unused at this location: encode once and tile
        prompt_emb_m = _tile(model.encode_prompt(params, batch), m)

    policy_emd, aux = model.generate_policy(
        params, batch_m, scene_m, prompt_emb_m
    )
    policy_emd = model.select_k_emd(policy_emd, batch_m, mode, r_sel)
    return model.rollout_scan(params, batch_m, scene_m, policy_emd, mode, rng, aux)
