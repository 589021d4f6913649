"""Gated neighborhood attention (QCNet semantics) over fixed-K neighbor grids.

This single op serves every sparse-attention site in the framework: scene
a2a/s2s, decoder p2p/s2p, policy a2p/m2p and the GNN condition attention -
replacing the reference's torch_geometric MessagePassing edge-list attention
(reference: prosim/models/layers/attention_layer.py:13-121) with a dense
[B, Q, K] formulation that XLA tiles onto the MXU.

Exact semantics preserved:
  * pre-LayerNorm on src/dst (shared when not bipartite) and on the rel-PE;
  * rel-PE projected and ADDED to gathered keys and values;
  * per-destination softmax over valid neighbors;
  * gated update  agg + sigmoid(W_g[agg, x_dst_n]) * (W_s x_dst_n - agg);
  * post-LN residual, then pre/post-LN FFN residual.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from prosim_tpu.ops.fourier import FourierEmbeddingFix, FourierEmbedding
from prosim_tpu.ops.neighbors import gather_neighbors
from prosim_tpu.utils.geometry import angle_between_2d_vectors, wrap_angle


def rel_pe_features(dst_pos, dst_ori, src_pos, src_ori, idx, learnable_pe: bool):
    """Relative PE input features for neighbor pairs.

    dst_pos [B,Q,2], dst_ori [B,Q], src_pos [B,S,2], src_ori [B,S], idx [B,Q,K].
    Returns [B,Q,K,3] (learnable) or [B,Q,K,4] (fixed; rel_ori_vec duplicated),
    matching reference feature construction
    (reference: prosim/models/scene_encoder/attn_fusion.py:44-76).
    """
    nbr_pos = gather_neighbors(src_pos, idx)  # [B,Q,K,2]
    nbr_ori = gather_neighbors(src_ori[..., None], idx)[..., 0]  # [B,Q,K]

    rel_pos = nbr_pos - dst_pos[:, :, None, :]
    dist = jnp.linalg.norm(rel_pos, axis=-1)
    rel_ori = wrap_angle(nbr_ori - dst_ori[:, :, None])
    ori_vec_dst = jnp.stack([jnp.cos(dst_ori), jnp.sin(dst_ori)], axis=-1)
    rel_ori_vec = angle_between_2d_vectors(ori_vec_dst[:, :, None, :], rel_pos)

    if learnable_pe:
        return jnp.stack([dist, rel_ori, rel_ori_vec], axis=-1)
    return jnp.stack([dist, rel_ori, rel_ori_vec, rel_ori_vec], axis=-1)


class RelPE(nn.Module):
    """Maps rel-PE input features to hidden_dim embeddings."""

    hidden_dim: int
    learnable_pe: bool = False
    num_freq_bands: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pe_input):
        if self.learnable_pe:
            return FourierEmbedding(
                input_dim=3,
                hidden_dim=self.hidden_dim,
                num_freq_bands=self.num_freq_bands,
                dtype=self.dtype,
                name="fourier",
            )(pe_input)
        # cast to the model dtype: under bf16 the [B, Q, K, D] PE tensors are
        # the largest HBM residents in the rollout/training graphs
        return FourierEmbeddingFix(
            num_pos_feats=self.hidden_dim // 4, name="fourier_fix"
        )(pe_input).astype(self.dtype)


class GatedNeighborAttention(nn.Module):
    hidden_dim: int
    num_heads: int
    head_dim: int
    bipartite: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_dst,
        x_src,
        idx,
        edge_valid,
        rel_pe,
        deterministic: bool = True,
    ):
        """x_dst [B,Q,D], x_src [B,S,D], idx [B,Q,K], edge_valid [B,Q,K],
        rel_pe [B,Q,K,D] -> [B,Q,D]."""
        H, hd = self.num_heads, self.head_dim
        inner = H * hd
        scale = hd ** -0.5

        ln_src = nn.LayerNorm(dtype=self.dtype, name="prenorm_src")
        if self.bipartite:
            ln_dst = nn.LayerNorm(dtype=self.dtype, name="prenorm_dst")
        else:
            ln_dst = ln_src
        x_src_n = ln_src(x_src)
        x_dst_n = ln_dst(x_dst)
        r_n = nn.LayerNorm(dtype=self.dtype, name="prenorm_r")(rel_pe)

        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(x_dst_n)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x_src_n)
        v = nn.Dense(inner, dtype=self.dtype, name="to_v")(x_src_n)

        k_g = gather_neighbors(k, idx) + nn.Dense(
            inner, use_bias=False, dtype=self.dtype, name="to_k_r"
        )(r_n)
        v_g = gather_neighbors(v, idx) + nn.Dense(inner, dtype=self.dtype, name="to_v_r")(r_n)

        B, Q, K = idx.shape
        qh = q.reshape(B, Q, H, hd)
        kh = k_g.reshape(B, Q, K, H, hd)
        vh = v_g.reshape(B, Q, K, H, hd)

        sim = jnp.einsum("bqhd,bqkhd->bqkh", qh, kh) * scale
        sim = jnp.where(edge_valid[..., None], sim, -jnp.inf)
        sim_max = jnp.max(sim, axis=2, keepdims=True)
        sim_max = jnp.where(jnp.isfinite(sim_max), sim_max, 0.0)
        expw = jnp.where(edge_valid[..., None], jnp.exp(sim - sim_max), 0.0)
        denom = expw.sum(axis=2, keepdims=True)
        attn = expw / jnp.maximum(denom, 1e-9)  # [B,Q,K,H]
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout, name="attn_drop")(
                attn, deterministic=deterministic
            )

        agg = jnp.einsum("bqkh,bqkhd->bqhd", attn, vh).reshape(B, Q, inner)

        g = nn.sigmoid(
            nn.Dense(inner, dtype=self.dtype, name="to_g")(
                jnp.concatenate([agg, x_dst_n], axis=-1)
            )
        )
        s = nn.Dense(inner, dtype=self.dtype, name="to_s")(x_dst_n)
        gated = agg + g * (s - agg)
        out = nn.Dense(self.hidden_dim, dtype=self.dtype, name="to_out")(gated)

        x = x_dst + nn.LayerNorm(dtype=self.dtype, name="postnorm")(out)

        ff_in = nn.LayerNorm(dtype=self.dtype, name="ff_prenorm")(x)
        ff = nn.Dense(self.hidden_dim * 4, dtype=self.dtype, name="ff_dense0")(ff_in)
        ff = nn.relu(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=self.dropout, name="ff_drop")(ff, deterministic=deterministic)
        ff = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ff_dense1")(ff)
        x = x + nn.LayerNorm(dtype=self.dtype, name="ff_postnorm")(ff)
        return x


class NeighborAttentionStack(nn.Module):
    """A stack of GatedNeighborAttention layers sharing one neighbor graph."""

    hidden_dim: int
    num_heads: int
    head_dim: int
    num_layers: int
    bipartite: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_dst, x_src, idx, edge_valid, rel_pe, deterministic: bool = True):
        for i in range(self.num_layers):
            x_dst = GatedNeighborAttention(
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                bipartite=self.bipartite,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x_dst, x_src, idx, edge_valid, rel_pe, deterministic=deterministic)
        return x_dst
