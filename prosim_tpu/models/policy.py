"""Policy action decoder.

Produces K-mode delta-trajectory chunks for every policy agent from its
policy embedding and the current scene tokens. TPU-native equivalent of the
reference policy stack (reference: prosim/models/policy/{base,act_decoder,
temporal_ar}.py): queries sit at the agents' *current* rollout positions and
cross-attend to agent observation tokens (a2p) and map tokens (m2p) with
rel-PE, then an anchor-conditioned context-gating head emits
[K, steps, state_dim] action deltas which are cumsum-integrated within the
chunk (act_decoder.py:78-135).

The reference's string-keyed `pair_names` plumbing and `_plain_batch_to_temporal`
re-indexing (temporal_ar.py:8-39) disappear: the batch stays [B, N] padded.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import SceneTokens
from prosim_tpu.ops.attention import (
    GatedNeighborAttention,
    RelPE,
    rel_pe_input,
    site_gather,
)
from prosim_tpu.ops.fourier import FourierEmbeddingFix
from prosim_tpu.ops.mlp import MLP, ContextGating
from prosim_tpu.ops.neighbors import neighbor_topk
from prosim_tpu.utils.geometry import wrap_angle


@registry.register_policy(name="rel_pe_temporal")
class PolicyRelPE(nn.Module):
    hidden_dim: int
    num_layers: int
    num_heads: int
    head_dim: int
    max_neigh: int
    agent_radius: float
    map_radius: float
    edge_func: str
    learnable_pe: bool
    pe_num_freq: int
    motion_k: int
    pred_steps: int
    state_dim: int         # 3 (x,y,h) or 5 (+xd,yd); +3 if GMM
    pred_mode: str         # 'anchor' | 'mlp' | 'cluster'
    cluster_goals: tuple = ()  # K (x, y) goal anchors for 'cluster' mode
    pred_gmm: bool = False
    use_ped_cycl: bool = True
    context_goal: bool = False
    context_emd: bool = True
    context_pose_emb: bool = False
    mcg_layers: int = 3
    goal_recon_head: bool = False
    not_use_map: bool = False
    dropout: float = 0.0
    fused_stack: bool = True
    edge_kernel: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.context_goal:
            in_dim = self.hidden_dim if self.context_pose_emb else 2
            self.goal_encoder = MLP([in_dim, self.hidden_dim], dtype=self.dtype)
            if self.context_pose_emb:
                self.goal_pose_pe = FourierEmbeddingFix(
                    num_pos_feats=self.hidden_dim // 2
                )
            if self.context_emd:
                self.context_fuse = MLP([self.hidden_dim * 2, self.hidden_dim], dtype=self.dtype)

        self.a2p_pe = RelPE(self.hidden_dim, self.learnable_pe, self.pe_num_freq, dtype=self.dtype)
        self.m2p_pe = RelPE(self.hidden_dim, self.learnable_pe, self.pe_num_freq, dtype=self.dtype)
        self.a2p_layers = [
            GatedNeighborAttention(
                hidden_dim=self.hidden_dim, num_heads=self.num_heads, head_dim=self.head_dim,
                bipartite=True, dropout=self.dropout, dtype=self.dtype,
                edge_kernel=self.edge_kernel,
                pe_full_dim=0 if self.learnable_pe else self.hidden_dim, name=f"a2p_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.m2p_layers = [
            GatedNeighborAttention(
                hidden_dim=self.hidden_dim, num_heads=self.num_heads, head_dim=self.head_dim,
                bipartite=True, dropout=self.dropout, dtype=self.dtype,
                edge_kernel=self.edge_kernel,
                pe_full_dim=0 if self.learnable_pe else self.hidden_dim, name=f"m2p_{i}",
            )
            for i in range(self.num_layers)
        ]

        out_dim = self.pred_steps * self.state_dim
        if self.pred_mode == "vel_pred":
            # aux task head: initial velocity only (reference: act_decoder.py:51-52)
            self.vel_head = MLP(
                [self.hidden_dim, self.hidden_dim, self.hidden_dim // 2, 2],
                ret_before_act=True, dtype=self.dtype,
            )
        elif self.pred_mode == "goal_pred":
            # aux task head: goal xy + prob logit (reference: act_decoder.py:55-57)
            self.goal_head = MLP(
                [self.hidden_dim, 3], ret_before_act=True, dtype=self.dtype
            )
        elif self.pred_mode == "mlp":
            self.motion_head = MLP(
                [self.hidden_dim, self.hidden_dim, self.hidden_dim // 2, self.motion_k * out_dim],
                ret_before_act=True, dtype=self.dtype,
            )
        else:  # anchor / cluster (reference: act_decoder.py:65-74)
            if self.pred_mode == "cluster":
                self.cluster_mlp = MLP(
                    [self.hidden_dim, self.hidden_dim], dtype=self.dtype
                )
                self.cluster_goal_pe = FourierEmbeddingFix(
                    num_pos_feats=self.hidden_dim // 2
                )
            else:
                num_types = 3 if self.use_ped_cycl else 1
                self.motion_anchors = nn.Embed(
                    self.motion_k * num_types, self.hidden_dim, dtype=self.dtype
                )
            self.cg_decode = ContextGating(3, self.hidden_dim, dtype=self.dtype)
            self.motion_head = MLP(
                [self.hidden_dim, self.hidden_dim, self.hidden_dim // 2, out_dim],
                ret_before_act=True, dtype=self.dtype,
            )
        if self.goal_recon_head:
            self.pred_mlp = MLP(
                [self.hidden_dim, self.hidden_dim, self.hidden_dim // 2, 2],
                ret_before_act=True, dtype=self.dtype,
            )

    def _extract_context(self, policy_emd):
        ctx = []
        if self.context_goal and "goal" in policy_emd:
            goal = policy_emd["goal"]
            if self.context_pose_emb:
                goal = self.goal_pose_pe(goal)
            ctx.append(self.goal_encoder(goal))
        if self.context_emd:
            ctx.append(policy_emd["emd"])
        if len(ctx) > 1:
            return self.context_fuse(jnp.concatenate(ctx, axis=-1))
        return ctx[0]

    def __call__(
        self,
        policy_emd: dict,       # {'emd': [B,N,D], optional 'goal', 'agent_type'}
        scene: SceneTokens,
        agent_pos,              # [B, N, 2] current positions
        agent_ori,              # [B, N]
        agent_mask,             # [B, N]
        agent_type,             # [B, N] int32
        deterministic: bool = True,
    ):
        x_p = self._extract_context(policy_emd)
        x_p = self._attn_fuse(x_p, scene, agent_pos, agent_ori, agent_mask, deterministic)
        result = self._compute_traj(x_p, policy_emd, agent_type)
        return result

    def _attn_fuse(self, x_p, scene: SceneTokens, pos, ori, mask, deterministic):
        m = scene.num_map
        radius = self.edge_func == "radius"
        obs_pos, obs_ori, obs_mask = scene.pos[:, m:], scene.ori[:, m:], scene.mask[:, m:]
        map_pos, map_ori, map_mask = scene.pos[:, :m], scene.ori[:, :m], scene.mask[:, :m]

        a2p_idx, a2p_valid = neighbor_topk(
            pos, obs_pos, mask, obs_mask, k=self.max_neigh,
            radius=self.agent_radius if radius else None,
        )
        m2p_idx, m2p_valid = neighbor_topk(
            pos, map_pos, mask, map_mask, k=self.max_neigh,
            radius=self.map_radius if radius else None,
        )
        obs_tokens = scene.tokens[:, m:]
        map_tokens = scene.tokens[:, :m]
        # One combined per-edge gather per site (normalized src features +
        # pos + ori in a single wide row): XLA's TPU gather cost is per-row,
        # so the separate feature/pos/ori gathers here were the profiled hot
        # spot of the whole rollout (51-64 ms per [6.3M,*] gather per step).
        # The gathered features are layer-constant within a replan step and
        # shared across all attention layers.
        a2p_g, a2p_npos, a2p_nori = site_gather(obs_tokens, obs_pos, obs_ori, a2p_idx)
        m2p_g, m2p_npos, m2p_nori = site_gather(map_tokens, map_pos, map_ori, m2p_idx)
        a2p_feats = rel_pe_input(pos, ori, a2p_npos, a2p_nori)
        m2p_feats = rel_pe_input(pos, ori, m2p_npos, m2p_nori)

        # Fused Pallas path: the entire interleaved a2p/m2p stack runs in one
        # kernel with the per-edge tables VMEM-resident (one HBM pass per
        # step instead of two reads per layer); the fixed Fourier rel-PE is
        # expanded in-kernel from the 4 raw features, so the [B,N,K,D] PE
        # embeddings never exist in HBM. Forward/rollout only - the kernel
        # has no VJP, so training (deterministic=False) and CPU keep the XLA
        # loop below, which the kernel is parity-tested against.
        use_fused = (
            self.fused_stack
            and deterministic
            and not self.not_use_map
            and not self.learnable_pe
            and not self.is_initializing()
            and jax.default_backend() == "tpu"
        )
        if use_fused:
            from prosim_tpu.ops.fused_stack import (
                fused_two_site_stack,
                pack_site_weights,
            )

            p = self.variables["params"]
            wa = pack_site_weights(
                p, "a2p", self.num_layers, self.num_heads, self.head_dim, self.dtype
            )
            wm = pack_site_weights(
                p, "m2p", self.num_layers, self.num_heads, self.head_dim, self.dtype
            )
            # the fused kernel expands the reference's 4-feature fixed PE
            # in-kernel; re-append the duplicated rel_ori_vec feature
            # (rel_pe_input now emits only the 3 unique features)
            return fused_two_site_stack(
                x_p,
                (a2p_g, jnp.concatenate([a2p_feats, a2p_feats[..., 2:3]], -1), a2p_valid),
                (m2p_g, jnp.concatenate([m2p_feats, m2p_feats[..., 2:3]], -1), m2p_valid),
                wa,
                wm,
                num_layers=self.num_layers,
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                pe_dim=self.hidden_dim,
                q_tile=16,
            )

        a2p_pe = self.a2p_pe(a2p_feats)
        m2p_pe = self.m2p_pe(m2p_feats)
        for i in range(self.num_layers):
            x_p = self.a2p_layers[i](
                x_p, obs_tokens, a2p_idx, a2p_valid, a2p_pe,
                deterministic=deterministic, src_gathered=a2p_g,
            )
            x_m = self.m2p_layers[i](
                x_p, map_tokens, m2p_idx, m2p_valid, m2p_pe,
                deterministic=deterministic, src_gathered=m2p_g,
            )
            x_p = x_p if self.not_use_map else x_m
        return x_p

    def _compute_traj(self, pred_feat, policy_emd, agent_type):
        """pred_feat [B, N, D] -> motion_pred [B, N, K, S, state_dim]."""
        B, N, D = pred_feat.shape
        K, S = self.motion_k, self.pred_steps

        if self.pred_mode == "vel_pred":
            return {"init_vel_pred": self.vel_head(pred_feat)}
        if self.pred_mode == "goal_pred":
            return {"goal_pred": self.goal_head(pred_feat)}
        if self.pred_mode == "mlp":
            motion = self.motion_head(pred_feat).reshape(B, N, K, S, self.state_dim)
        else:
            if self.pred_mode == "cluster":
                # fixed Fourier PE of k-means goal anchors, shared across
                # agents (reference: act_decoder.py:69-73,104-106)
                goals = jnp.asarray(self.cluster_goals, dtype=self.dtype)
                goals_pe = self.cluster_goal_pe(goals)
                anchor_emb = jnp.broadcast_to(
                    self.cluster_mlp(goals_pe)[None, None],
                    (B, N, K, self.hidden_dim),
                )
            else:
                # per-type anchor bank: anchor id = (type - 1) * K + k
                type_base = (jnp.maximum(agent_type, 1) - 1) * K if self.use_ped_cycl else jnp.zeros_like(agent_type)
                anchor_ids = type_base[..., None] + jnp.arange(K)  # [B, N, K]
                anchor_emb = self.motion_anchors(anchor_ids)       # [B, N, K, D]
            ones = jnp.ones((B, N, K), bool)
            pred_emd, _ = self.cg_decode(anchor_emb, pred_feat, ones)
            motion = self.motion_head(pred_emd).reshape(B, N, K, S, self.state_dim)

        # integrate deltas within the chunk (reference: act_decoder.py:117-121)
        traj = jnp.cumsum(motion[..., :2], axis=-2)
        head = wrap_angle(jnp.cumsum(motion[..., 2:3], axis=-2))
        rest = motion[..., 3:]
        motion_pred = jnp.concatenate([traj, head, rest], axis=-1)
        motion_prob = jnp.ones((B, N, K), dtype=motion_pred.dtype)

        result = {"motion_pred": motion_pred, "motion_prob": motion_prob}
        if self.goal_recon_head:
            result["reconst_pred"] = self.pred_mlp(policy_emd["emd"])
        return result


def build_policy(config, dtype=jnp.float32) -> PolicyRelPE:
    mc = config.MODEL
    ad = mc.POLICY.ACT_DECODER
    attn = ad.ATTN
    state_dim = len(config.DATASET.FORMAT.TARGET.ELEMENTS.split(","))
    if ad.TRAJ.PRED_GMM:
        state_dim += 3
    cluster_goals = ()
    if ad.TRAJ.PRED_MODE == "cluster":
        import numpy as np

        goals = np.load(ad.TRAJ.CLUSTER_PATH).astype("float32")
        if goals.shape[0] != ad.TRAJ.K:
            raise ValueError(
                f"cluster file has {goals.shape[0]} goals but TRAJ.K={ad.TRAJ.K}"
            )
        cluster_goals = tuple(map(tuple, goals.tolist()))
    return PolicyRelPE(
        hidden_dim=mc.HIDDEN_DIM,
        num_layers=attn.NUM_LAYER,
        num_heads=attn.NUM_HEAD,
        head_dim=attn.FF_DIM,
        max_neigh=attn.MAX_NUM_NEIGH,
        agent_radius=attn.AGENT_RADIUS,
        map_radius=attn.MAP_RADIUS,
        edge_func=mc.REL_POS_EDGE_FUNC,
        learnable_pe=attn.LEARNABLE_PE,
        pe_num_freq=attn.PE_NUM_FREQ,
        motion_k=ad.TRAJ.K,
        pred_steps=config.DATASET.FORMAT.TARGET.STEPS,
        state_dim=state_dim,
        pred_mode=ad.TRAJ.PRED_MODE,
        cluster_goals=cluster_goals,
        pred_gmm=ad.TRAJ.PRED_GMM,
        use_ped_cycl=config.DATASET.USE_PED_CYCLIST,
        context_goal=ad.CONTEXT.GOAL,
        context_emd=ad.CONTEXT.EMD,
        context_pose_emb=ad.CONTEXT.USE_POSE_EMB,
        mcg_layers=ad.MCG.LAYER,
        goal_recon_head=config.LOSS.ROLLOUT_TRAJ.USE_GOAL_PRED_LOSS,
        not_use_map=attn.NOT_USE_MAP,
        dropout=attn.DROPOUT,
        fused_stack=attn.FUSED_STACK,
        edge_kernel=attn.EDGE_KERNEL,
        dtype=dtype,
    )
