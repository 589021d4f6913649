"""Masked PointNet polyline encoder (MTR-style).

Semantics match the reference exactly
(reference: prosim/models/scene_encoder/pointnet_encoder.py:13-62):
  pre-MLP on valid points (invalid points contribute zeros, NOT -inf, to the
  max-pool - this matters numerically), max-pool + concat, second MLP,
  max-pool, out-MLP on polylines with >=1 valid point.
"""

import functools

import flax.linen as nn
import jax.numpy as jnp

from prosim_tpu.ops.mlp import MLP


def _max_over_points(x):
    """max over axis -2. For small point counts, an unrolled elementwise
    maximum chain instead of a reduce op: identical math (inputs are
    NaN-free), and it sidesteps an XLA:TPU fusion-pass CHECK crash
    (fusion_util TransformWindow) hit by reduces over a tiny non-minor axis
    of [B, C, 8, D] drag-point tensors (v5e, 2026-08 libtpu)."""
    p = x.shape[-2]
    if p <= 16:
        return functools.reduce(
            jnp.maximum, [x[..., i, :] for i in range(p)])
    return x.max(axis=-2)


class PointNetPolylineEncoder(nn.Module):
    in_dim: int
    hidden_dim: int
    num_pre_layers: int = 1
    num_mlp_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, polylines, point_mask):
        """polylines [..., P, C], point_mask [..., P] bool -> [..., hidden_dim]."""
        h = self.hidden_dim
        x = jnp.where(point_mask[..., None], jnp.nan_to_num(polylines), 0.0)

        pre = MLP(
            [self.in_dim] + [h] * self.num_pre_layers,
            ret_before_act=False,
            dtype=self.dtype,
            name="pre_mlps",
        )(x)
        pre = jnp.where(point_mask[..., None], pre, 0.0)

        pooled = _max_over_points(pre)  # zeros of invalid slots participate, as in reference
        x = jnp.concatenate(
            [pre, jnp.broadcast_to(pooled[..., None, :], pre.shape)], axis=-1
        )

        mid = MLP(
            [h * 2] + [h] * (self.num_mlp_layers - self.num_pre_layers),
            ret_before_act=False,
            dtype=self.dtype,
            name="mlps",
        )(x)
        mid = jnp.where(point_mask[..., None], mid, 0.0)
        feat = _max_over_points(mid)  # [..., h]

        out = MLP([h, h, h], without_norm=True, ret_before_act=True, dtype=self.dtype, name="out_mlps")(feat)
        valid = point_mask.any(axis=-1)
        return jnp.where(valid[..., None], out, 0.0)
