"""Condition encoders: map each prompt-condition type to embedding tokens.

TPU-native equivalents of the reference condition encoders
(reference: prosim/models/condition_transformer/condition_encoders.py:8-194):

  goal        - xy MLP + temporal Fourier PE on the valid timestep
  v_action_tag- learned per-tag parameter vector + interval-time PE
  v2v_tag     - binary variant with 2D parameters (source/target halves)
  drag_point  - PointNet over route-sketch points

Unlike the reference, tag encoders don't regroup conditions per tag name into
ragged [B, T] blocks - every condition keeps its fixed slot and the tag
parameter is gathered by tag id, which is equivalent under the downstream
edge-matrix pooling and keeps shapes static.
"""

import flax.linen as nn
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import Condition
from prosim_tpu.ops.fourier import FourierEmbeddingFix
from prosim_tpu.ops.mlp import MLP
from prosim_tpu.ops.pointnet import PointNetPolylineEncoder


@registry.register_condition_encoder(name="goal")
class GoalConditionEncoder(nn.Module):
    hidden_dim: int
    use_temporal_pe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Condition):
        """cond.feat [B, C, 3] = (rel x, rel y, valid timestep) -> emd [B, C, D]."""
        emd = MLP(
            [2, self.hidden_dim, self.hidden_dim],
            ret_before_act=True, without_norm=True, dtype=self.dtype, name="goal_encoder",
        )(cond.feat[..., :2])
        if self.use_temporal_pe:
            pe = FourierEmbeddingFix(num_pos_feats=self.hidden_dim)(cond.feat[..., 2:3])
            emd = emd + pe.astype(self.dtype)  # keep the model dtype: a f32
            # result would make the downstream edge-matrix scatter a
            # mixed-dtype update (error in future jax)
        return emd


class _TagEncoder(nn.Module):
    hidden_dim: int
    num_tags: int
    binary: bool = False
    use_temporal_pe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Condition):
        """cond.feat [B, C, 3] = (tag id, start t, end t) -> emd [B, C, D or 2D]."""
        param_dim = self.hidden_dim * 2 if self.binary else self.hidden_dim
        bank = self.param(
            "tag_params", nn.initializers.normal(1.0), (self.num_tags, param_dim)
        )
        tag_id = jnp.clip(cond.feat[..., 0].astype(jnp.int32), 0, self.num_tags - 1)
        emd = bank[tag_id].astype(self.dtype)  # [B, C, param_dim]
        if self.use_temporal_pe:
            pe = FourierEmbeddingFix(num_pos_feats=self.hidden_dim // 2)(cond.feat[..., 1:3])
            if self.binary:
                pe = jnp.tile(pe, (1, 1, 2))
            emd = emd + pe.astype(self.dtype)
        return emd


@registry.register_condition_encoder(name="v_action_tag")
class VActionTagEncoder(_TagEncoder):
    binary: bool = False


@registry.register_condition_encoder(name="v2v_tag")
class V2VTagEncoder(_TagEncoder):
    binary: bool = True


@registry.register_condition_encoder(name="drag_point")
class DragPointEncoder(nn.Module):
    hidden_dim: int
    num_points: int = 8
    num_pre_layers: int = 1
    num_mlp_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Condition):
        """cond.feat [B, C, P*2] route-sketch points (NaN padded) -> [B, C, D]."""
        B, C = cond.feat.shape[:2]
        pts = cond.feat.reshape(B, C, self.num_points, 2)
        pt_mask = ~jnp.isnan(pts).any(axis=-1)
        return PointNetPolylineEncoder(
            in_dim=2,
            hidden_dim=self.hidden_dim,
            num_pre_layers=self.num_pre_layers,
            num_mlp_layers=self.num_mlp_layers,
            dtype=self.dtype,
            name="pointnet",
        )(jnp.nan_to_num(pts), pt_mask)
