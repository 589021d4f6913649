"""Padded, static-shape batch containers.

These replace the reference's device-movable ragged containers
(reference: prosim/dataset/format_utils.py:31-145) with fixed-shape pytrees:
every array is padded to config-declared capacities and carries a mask, so a
batch can be jit-compiled once and sharded over a device mesh.

Shape legend:
  B - scenes in batch            L - map polyline slots (PAD.NUM_LANES)
  P - points per polyline        A - all-agent obs slots (PAD.NUM_OBS_AGENTS)
  N - policy agent slots (PAD.NUM_AGENTS)
  Th - history steps             R - replan steps (rollout)
  T - io-pair time indices       S - predicted steps per chunk
  C - per-type condition slots
"""

from typing import Dict, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MapInputs:
    """init_map: local vectorized lanes in per-lane symmetric frames
    (reference layout: prosim/dataset/format_utils.py:153-263)."""

    vectors: jnp.ndarray  # [B, L, P, C_map] lane segment features (11-d in demo cfg)
    mask: jnp.ndarray     # [B, L, P] bool valid points
    pos: jnp.ndarray      # [B, L, 2] lane frame centers (scene frame)
    ori: jnp.ndarray      # [B, L] lane frame headings

    @property
    def token_mask(self):
        return self.mask.any(axis=-1)


@struct.dataclass
class ObsInputs:
    """Per-agent relative history observations
    (reference layout: prosim/dataset/format_utils.py:357-451)."""

    feat: jnp.ndarray  # [B, A, Th, C_obs] (24-d in demo cfg), zeros where invalid
    mask: jnp.ndarray  # [B, A, Th] bool - step fully valid
    pos: jnp.ndarray   # [B, A, 2] agent position at obs origin (scene frame)
    ori: jnp.ndarray   # [B, A] agent heading at obs origin

    @property
    def token_mask(self):
        return self.mask.any(axis=-1)


@struct.dataclass
class Prompt:
    """Per-policy-agent prompt = initial status
    (reference layout: prosim/dataset/prompt_utils.py:111-150)."""

    feat: jnp.ndarray        # [B, N, C_prompt] (7-d: vel2 + extent2 + type3)
    mask: jnp.ndarray        # [B, N] bool
    pos: jnp.ndarray         # [B, N, 2]
    ori: jnp.ndarray         # [B, N]
    agent_type: jnp.ndarray  # [B, N] int32 (1 vehicle / 2 pedestrian / 3 cyclist)
    obs_index: jnp.ndarray   # [B, N] int32 slot of this agent in ObsInputs (-1 pad)
    extent: jnp.ndarray      # [B, N, 2] length/width
    goal_point: jnp.ndarray  # [B, N, 2] last GT future position (scene frame)


@struct.dataclass
class IOPairs:
    """Supervision targets over (t, agent) pairs
    (reference layout: prosim/dataset/format_utils.py:498-638)."""

    tgt: jnp.ndarray        # [B, T, N, S, D_tgt] local-frame future chunks (0 where invalid)
    tgt_valid: jnp.ndarray  # [B, T, N, S, D_tgt] bool per-element validity
    goal: jnp.ndarray       # [B, T, N, 2]
    pos: jnp.ndarray        # [B, T, N, 2] agent position at t (scene frame)
    ori: jnp.ndarray        # [B, T, N]
    mask: jnp.ndarray       # [B, T, N] bool pair validity
    agent_type: jnp.ndarray # [B, T, N] int32
    init_vel: jnp.ndarray   # [B, T, N, 2] local-frame velocity at t
    extent: jnp.ndarray     # [B, T, N, 2]
    full_traj_xy: jnp.ndarray  # [B, N, T*S, 2] GT future in the t=0 local frame
    full_traj_valid: jnp.ndarray  # [B, N, T*S] bool
    t_indices: jnp.ndarray  # [T] int32 future-frame indices (0, 10, ...)


@struct.dataclass
class FutObs:
    """GT observations at each replan step for ALL agents: non-policy agents
    are replayed from logs while policy agents get overwritten with simulated
    state during the rollout (reference: prosim/models/traj_sam.py:223-272).

    Slot r=0 is unused (step 0 uses init obs)."""

    feat: jnp.ndarray  # [B, R, A, Th, C_obs]
    mask: jnp.ndarray  # [B, R, A, Th]
    pos: jnp.ndarray   # [B, R, A, 2]
    ori: jnp.ndarray   # [B, R, A]
    obs_index: jnp.ndarray  # [B, R, N] int32 - policy agent -> obs slot at step r


@struct.dataclass
class RoadEdges:
    """Oriented road-edge segments in the scene frame (drivable area on the
    LEFT of each segment direction). Sourced from dedicated Waymo road-edge
    data when available, else approximated from outermost lane-edge polylines
    (reference: prosim/loss/offroad_loss.py:55-203 consumes the same layout).
    """

    pts: jnp.ndarray    # [B, E, 2] segment starts
    nxt: jnp.ndarray    # [B, E, 2] segment ends
    valid: jnp.ndarray  # [B, E]


@struct.dataclass
class Condition:
    """One prompt-condition type, fixed-C padded
    (reference layout: prosim/dataset/condition_utils.py:126-447)."""

    feat: jnp.ndarray        # [B, C, F] type-specific features
    mask: jnp.ndarray        # [B, C] bool
    prompt_idx: jnp.ndarray  # [B, C, 1 or 2] int32 indices into prompt slots
    prompt_mask: jnp.ndarray # [B, N] bool - which agents this condition covers


@struct.dataclass
class SceneBatch:
    init_map: MapInputs
    init_obs: ObsInputs
    prompt: Prompt
    io_pairs: Optional[IOPairs] = None
    fut_obs: Optional[FutObs] = None
    road_edges: Optional["RoadEdges"] = None
    conditions: Dict[str, Condition] = struct.field(default_factory=dict)

    @property
    def batch_size(self):
        return self.init_obs.feat.shape[0]

    def map_batch_leaves(self, fn, other_fn=None):
        """Apply fn to every leaf whose dim 0 is the scene axis; apply
        other_fn (default: identity) to per-batch constants (io_pairs.t_indices
        is the only one)."""
        import jax

        other_fn = other_fn or (lambda x: x)
        t_idx = self.io_pairs.t_indices if self.io_pairs is not None else None
        src = self
        if t_idx is not None:
            # hold the per-batch constant out of the scene-axis map: fn may be
            # a device_put whose 'data' sharding is invalid for its shape
            src = src.replace(io_pairs=src.io_pairs.replace(t_indices=None))
        out = jax.tree.map(fn, src)
        if t_idx is not None:
            out = out.replace(io_pairs=out.io_pairs.replace(t_indices=other_fn(t_idx)))
        return out


@struct.dataclass
class SceneTokens:
    """Unified scene token set: map tokens followed by obs tokens.

    Replaces the reference's flat-cat + scene_batch_idx layout
    (reference: prosim/models/scene_encoder/attn_fusion.py:88-133) with a
    fixed [B, L + A] grid; `num_map` is static.
    """

    tokens: jnp.ndarray  # [B, L + A, D]
    pos: jnp.ndarray     # [B, L + A, 2]
    ori: jnp.ndarray     # [B, L + A]
    mask: jnp.ndarray    # [B, L + A] bool
    num_map: int = struct.field(pytree_node=False)

    @property
    def map_tokens(self):
        return self.tokens[:, : self.num_map]

    @property
    def obs_tokens(self):
        return self.tokens[:, self.num_map :]

    def split(self):
        m = self.num_map
        map_part = (self.tokens[:, :m], self.pos[:, :m], self.ori[:, :m], self.mask[:, :m])
        obs_part = (self.tokens[:, m:], self.pos[:, m:], self.ori[:, m:], self.mask[:, m:])
        return map_part, obs_part

    def replace_obs(self, obs_tokens, obs_pos, obs_ori, obs_mask):
        m = self.num_map
        return SceneTokens(
            tokens=jnp.concatenate([self.tokens[:, :m], obs_tokens], axis=1),
            pos=jnp.concatenate([self.pos[:, :m], obs_pos], axis=1),
            ori=jnp.concatenate([self.ori[:, :m], obs_ori], axis=1),
            mask=jnp.concatenate([self.mask[:, :m], obs_mask], axis=1),
            num_map=m,
        )
