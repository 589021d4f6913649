"""GNN condition attention: inject condition embeddings into prompt tokens.

TPU-native equivalent of the reference GNNConditionAttn
(reference: prosim/models/condition_transformer/condition_attns.py:87-228):
condition embeddings are scattered into a dense [B, N, N] edge matrix keyed by
prompt indices (diagonal for unary conditions, src/tgt pairs for binary ones),
mean-pooled across condition types, summed with a relative PE between the two
agents, and used as edge features in gated attention over prompt tokens. The
result is residual-added onto the prompt embedding.

Dense [B, N, N] replaces the reference's valid-edge-list gather: with N <= 128
the full matrix is tiny and maps straight onto the MXU.
"""

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import Condition, Prompt
from prosim_tpu.ops.attention import GatedNeighborAttention, RelPE, rel_pe_features


@registry.register_condition_attn(name="gnn")
class GNNConditionAttn(nn.Module):
    hidden_dim: int
    num_layers: int
    num_heads: int
    head_dim: int
    pool: str = "mean"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        cond_embs: Dict[str, jnp.ndarray],  # type -> [B, C, D or 2D]
        conditions: Dict[str, Condition],
        prompt_emb,                          # [B, N, D]
        prompt: Prompt,
        deterministic: bool = True,
    ):
        B, N, D = prompt_emb.shape
        M = len(cond_embs)
        if M == 0:
            return prompt_emb

        edge_attr = jnp.zeros((B, N, N, M, D), self.dtype)
        edge_cnt = jnp.zeros((B, N, N, M), self.dtype)
        bidx = jnp.arange(B)[:, None]

        for m, (ctype, emb) in enumerate(sorted(cond_embs.items())):
            cond = conditions[ctype]
            valid = cond.mask  # [B, C]
            s_idx = jnp.where(valid, cond.prompt_idx[..., 0], N)  # invalid -> OOB drop
            if cond.prompt_idx.shape[-1] > 1:  # binary (v2v)
                t_idx = jnp.where(valid, cond.prompt_idx[..., 1], N)
                edge_attr = edge_attr.at[bidx, s_idx, t_idx, m].add(
                    emb[..., :D], mode="drop"
                )
                edge_attr = edge_attr.at[bidx, t_idx, s_idx, m].add(
                    emb[..., D:], mode="drop"
                )
                edge_cnt = edge_cnt.at[bidx, s_idx, t_idx, m].add(1.0, mode="drop")
                edge_cnt = edge_cnt.at[bidx, t_idx, s_idx, m].add(1.0, mode="drop")
            else:
                edge_attr = edge_attr.at[bidx, s_idx, s_idx, m].add(emb[..., :D], mode="drop")
                edge_cnt = edge_cnt.at[bidx, s_idx, s_idx, m].add(1.0, mode="drop")

        edge_mask_m = edge_cnt > 0  # [B, N, N, M]
        if self.pool == "mean":
            total = edge_attr.sum(axis=-2)
            cnt = jnp.clip(edge_mask_m.sum(axis=-1), 1, None)[..., None]
            pooled = total / cnt
        else:  # max
            pooled = jnp.where(edge_mask_m[..., None], edge_attr, -jnp.inf).max(axis=-2)
            pooled = jnp.where(edge_mask_m.any(-1)[..., None], pooled, 0.0)
        edge_mask = edge_mask_m.any(axis=-1)  # [B, N, N]
        edge_mask = edge_mask & prompt.mask[:, :, None] & prompt.mask[:, None, :]

        # relative PE between every prompt pair; edge feature = cond + pe
        all_idx = jnp.broadcast_to(jnp.arange(N)[None, None, :], (B, N, N)).astype(jnp.int32)
        pe_in = rel_pe_features(prompt.pos, prompt.ori, prompt.pos, prompt.ori, all_idx)
        rel_pe = RelPE(self.hidden_dim, learnable_pe=False, dtype=self.dtype, fold_dup=False, name="rel_pe")(pe_in)
        edge_feat = pooled + rel_pe  # [B, N, N, D]

        x = prompt_emb
        for i in range(self.num_layers):
            x = GatedNeighborAttention(
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                bipartite=False,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, x, all_idx, edge_mask, edge_feat, deterministic=deterministic)

        # residual add onto every valid prompt agent (reference adds the
        # attention stack's output for all masked nodes, condition_attns.py:220-226)
        return jnp.where(prompt.mask[..., None], prompt_emb + x, prompt_emb)
