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

from prosim_tpu.data.batch import SceneBatch, SceneTokens
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

    d = jnp.linalg.norm(xy[:, :, None] - xy[:, None, :], axis=-1)  # [B, N, N, T]
    rsum = radius[:, :, None] + radius[:, None, :]
    pair_mask = (
        agent_mask[:, :, None]
        & agent_mask[:, None, :]
        & ~jnp.eye(N, dtype=bool)[None]
    )
    collide = (d < rsum[..., None] * 0.7) & pair_mask[..., None]
    crashed = collide.any(axis=(2, 3))  # [B, N]
    crash_rate = jnp.where(agent_mask, crashed, False).sum() / jnp.clip(
        agent_mask.sum(), 1, None
    )

    goal_d = jnp.linalg.norm(xy - goals_world[:, :, None], axis=-1).min(axis=-1)
    reached = goal_d < goal_radius
    goal_rate = jnp.where(agent_mask, reached, False).sum() / jnp.clip(
        agent_mask.sum(), 1, None
    )
    return {"crash_rate": crash_rate, "goal_reach_rate": goal_rate}
