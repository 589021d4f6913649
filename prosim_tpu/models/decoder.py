"""Policy-embedding decoder ("generator"): fuses prompt tokens with scene
tokens into per-agent policy embeddings.

TPU-native equivalent of the reference SymCoordDecoder
(reference: prosim/models/decoder/sym_coord.py:16-140, decoder/base.py:7-57):
per layer, prompts self-attend over neighboring prompts (p2p) then
cross-attend to nearby scene tokens (s2p), with relative PE; optional K-way
goal heads.
"""


import flax.linen as nn
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import Prompt, SceneTokens
from prosim_tpu.ops.attention import (
    GatedNeighborAttention,
    RelPE,
    rel_pe_features,
    rel_pe_input,
    site_gather,
)
from prosim_tpu.ops.mlp import MLP
from prosim_tpu.ops.neighbors import neighbor_topk


@registry.register_decoder(name="attn_fusion_relpe")
class SymCoordDecoder(nn.Module):
    hidden_dim: int
    num_layers: int
    num_heads: int
    head_dim: int
    max_neigh: int
    prompt_radius: float
    scene_radius: float
    edge_func: str  # 'radius' | 'knn'
    learnable_pe: bool
    pe_num_freq: int
    goal_pred: bool = False
    goal_k: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.p2p_pe = RelPE(self.hidden_dim, self.learnable_pe, self.pe_num_freq, dtype=self.dtype)
        self.s2p_pe = RelPE(self.hidden_dim, self.learnable_pe, self.pe_num_freq, dtype=self.dtype)
        self.p2p_layers = [
            GatedNeighborAttention(
                hidden_dim=self.hidden_dim, num_heads=self.num_heads, head_dim=self.head_dim,
                bipartite=False, dropout=self.dropout, dtype=self.dtype,
                pe_full_dim=0 if self.learnable_pe else self.hidden_dim, name=f"p2p_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.s2p_layers = [
            GatedNeighborAttention(
                hidden_dim=self.hidden_dim, num_heads=self.num_heads, head_dim=self.head_dim,
                bipartite=True, dropout=self.dropout, dtype=self.dtype,
                pe_full_dim=0 if self.learnable_pe else self.hidden_dim, name=f"s2p_{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.goal_pred:
            self.goal_prob_head = MLP(
                [self.hidden_dim, self.hidden_dim // 2, self.goal_k],
                ret_before_act=True, dtype=self.dtype,
            )
            self.goal_point_head = MLP(
                [self.hidden_dim, self.hidden_dim // 2, self.goal_k * 2],
                ret_before_act=True, dtype=self.dtype,
            )

    def __call__(
        self,
        scene: SceneTokens,
        prompt: Prompt,
        prompt_emb,
        deterministic: bool = True,
    ):
        """prompt_emb [B, N, D] -> dict with 'emd' [B, N, D] (+ goal heads)."""
        radius = self.edge_func == "radius"
        # NO self-loops: the reference builds p2p with radius_graph /
        # knn_graph at their loop=False default (reference: sym_coord.py:89-92)
        # - unlike the scene encoder's knn_graph(loop=True) graphs
        p2p_idx, p2p_valid = neighbor_topk(
            prompt.pos, prompt.pos, prompt.mask, prompt.mask,
            k=self.max_neigh,
            radius=self.prompt_radius if radius else None,
            exclude_self=True,
        )
        p2p_pe = self.p2p_pe(
            rel_pe_features(prompt.pos, prompt.ori, prompt.pos, prompt.ori, p2p_idx)
        )
        s2p_idx, s2p_valid = neighbor_topk(
            prompt.pos, scene.pos, prompt.mask, scene.mask,
            k=self.max_neigh,
            radius=self.scene_radius if radius else None,
        )
        # scene tokens are layer-constant here: one combined gather
        # (normalized features + pos + ori), shared across the s2p stack
        s2p_g, s2p_npos, s2p_nori = site_gather(
            scene.tokens, scene.pos, scene.ori, s2p_idx
        )
        s2p_pe = self.s2p_pe(
            rel_pe_input(prompt.pos, prompt.ori, s2p_npos, s2p_nori)
        )

        x_p = prompt_emb
        for i in range(self.num_layers):
            x_p = self.p2p_layers[i](x_p, x_p, p2p_idx, p2p_valid, p2p_pe, deterministic=deterministic)
            x_p = self.s2p_layers[i](
                x_p, scene.tokens, s2p_idx, s2p_valid, s2p_pe,
                deterministic=deterministic, src_gathered=s2p_g,
            )
        x_p = jnp.where(prompt.mask[..., None], x_p, 0.0)

        result = {"emd": x_p}
        if self.goal_pred:
            result["goal_prob"] = jnp.where(
                prompt.mask[..., None], self.goal_prob_head(x_p), 0.0
            )
            gp = self.goal_point_head(x_p).reshape(*x_p.shape[:-1], self.goal_k, 2)
            result["goal_point"] = jnp.where(prompt.mask[..., None, None], gp, 0.0)
        return result


def build_decoder(config, dtype=jnp.float32) -> SymCoordDecoder:
    mc = config.MODEL
    attn = mc.DECODER.ATTN
    return SymCoordDecoder(
        hidden_dim=mc.HIDDEN_DIM,
        num_layers=attn.NUM_LAYER,
        num_heads=attn.NUM_HEAD,
        head_dim=attn.FF_DIM,
        max_neigh=attn.MAX_NUM_NEIGH,
        prompt_radius=attn.PROMPT_RADIUS,
        scene_radius=attn.SCENE_RADIUS,
        edge_func=mc.REL_POS_EDGE_FUNC,
        learnable_pe=attn.LEARNABLE_PE,
        pe_num_freq=attn.PE_NUM_FREQ,
        goal_pred=mc.DECODER.GOAL_PRED.ENABLE,
        goal_k=mc.DECODER.GOAL_PRED.K,
        dropout=attn.DROPOUT,
        dtype=dtype,
    )
