"""Gated neighborhood attention (QCNet semantics) over fixed-K neighbor grids.

This single op serves every sparse-attention site in the framework: scene
a2a/s2s, decoder p2p/s2p, policy a2p/m2p and the GNN condition attention -
replacing the reference's torch_geometric MessagePassing edge-list attention
(reference: prosim/models/layers/attention_layer.py:13-121) with a dense
[B, Q, K] formulation that XLA tiles onto the MXU.

Exact semantics preserved (via the per-edge weight fold documented on
GatedNeighborAttention - the parameter tree matches the reference layer):
  * pre-LayerNorm on src/dst (shared when not bipartite) and on the rel-PE;
  * rel-PE projected and added to keys and values on every edge;
  * per-destination softmax over valid neighbors;
  * gated update  agg + sigmoid(W_g[agg, x_dst_n]) * (W_s x_dst_n - agg);
  * post-LN residual, then pre/post-LN FFN residual.
"""


import flax.linen as nn
import jax
import jax.numpy as jnp

from prosim_tpu.ops.edge_attn import edge_attn_core, edge_attn_supported
from prosim_tpu.ops.fourier import FourierEmbeddingFix, FourierEmbedding
from prosim_tpu.ops.neighbors import gather_neighbors
from prosim_tpu.utils.geometry import angle_between_2d_vectors, wrap_angle


def rel_pe_features(dst_pos, dst_ori, src_pos, src_ori, idx):
    """Relative PE input features for neighbor pairs.

    dst_pos [B,Q,2], dst_ori [B,Q], src_pos [B,S,2], src_ori [B,S], idx [B,Q,K].
    Returns the 3 UNIQUE features [B,Q,K,3] = (dist, rel_ori, rel_ori_vec).
    The reference's fixed-PE path feeds a 4th feature that is an exact
    duplicate of rel_ori_vec (reference: attn_fusion.py:44-76 stacks
    rel_ori_vec twice); consumers reconstruct/fold that duplication exactly
    (see RelPE.fold_dup and GatedNeighborAttention.pe_full_dim) instead of
    paying 4/3 of the per-edge PE traffic for identical lanes.
    """
    # one combined [B,S,3] gather instead of separate pos/ori gathers:
    # XLA's TPU gather cost is per-row, not per-byte
    table = jnp.concatenate(
        [src_pos.astype(jnp.float32), src_ori[..., None].astype(jnp.float32)],
        axis=-1,
    )
    g = gather_neighbors(table, idx)
    return rel_pe_input(dst_pos, dst_ori, g[..., :2], g[..., 2])


class RelPE(nn.Module):
    """Maps rel-PE input features to hidden_dim embeddings.

    Fixed path: the reference embeds 4 input features (rel_ori_vec twice) to
    hidden_dim, so the last hidden_dim//4 embedding dims are an exact copy of
    the block before them. With fold_dup=True (default) only the 3 unique
    features are embedded -> 3/4*hidden_dim dims; the consuming attention
    layer folds its duplicated parameter columns instead (pe_full_dim),
    which is exact math and drops 25% of the [B,Q,K,D] PE traffic and
    transcendentals. fold_dup=False re-appends the duplicate block for
    consumers that need the full-width embedding (condition GNN edge sum)."""

    hidden_dim: int
    learnable_pe: bool = False
    num_freq_bands: int = 64
    dtype: jnp.dtype = jnp.float32
    fold_dup: bool = True

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
        npf = self.hidden_dim // 4
        emb = FourierEmbeddingFix(
            num_pos_feats=npf, name="fourier_fix"
        )(pe_input).astype(self.dtype)
        if not self.fold_dup:
            # reference layout: [dist, rel_ori, rel_ori_vec, rel_ori_vec]
            emb = jnp.concatenate([emb, emb[..., 2 * npf :]], axis=-1)
        # materialize once: the downstream parameter-free LayerNorm makes
        # three passes (two reductions + normalize) over this tensor, and
        # without a barrier XLA rematerializes the whole transcendental
        # chain into every pass (profiled at ~64 ms/step on the rollout's
        # m2p PE); reading the materialized bf16 row back is far cheaper.
        return jax.lax.optimization_barrier(emb)


class _AffineParams(nn.Module):
    """scale/bias parameter pair with the same tree layout as nn.LayerNorm,
    for layers that fold the affine part of a LayerNorm into other tensors."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def _norm_stats(x, eps: float = 1e-5, dup_tail: int = 0):
    """Parameter-free part of LayerNorm (flax semantics: last-dim stats,
    fast variance), computed in f32. Shared/CSE'd when several layers
    normalize the same tensor.

    dup_tail > 0: the stats are those of the WIDER row in which the last
    dup_tail dims appear twice (the folded rel-PE duplication, see RelPE) —
    the normalized values of the duplicate block equal those of the tail,
    so only the unique dims are returned."""
    x32 = x.astype(jnp.float32)
    n = x.shape[-1] + dup_tail
    s = x32.sum(-1, keepdims=True)
    ss = (x32 * x32).sum(-1, keepdims=True)
    if dup_tail:
        t = x32[..., -dup_tail:]
        s = s + t.sum(-1, keepdims=True)
        ss = ss + (t * t).sum(-1, keepdims=True)
    mu = s / n
    var = jnp.maximum(ss / n - mu * mu, 0.0)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _fold_pe_tail(w, tail: int):
    """Fold the duplicated rel-PE parameter rows: w [P, ...] row-indexed by
    the full-width PE dim, where rows P-tail..P multiply the same normalized
    values as rows P-2*tail..P-tail. Returns [P-tail, ...] with the duplicate
    rows added onto their twins — exact math."""
    if tail == 0:
        return w
    return w[:-tail].at[-tail:].add(w[-tail:])


def gather_src_features(x_src, idx):
    """Precompute the gathered, parameter-free-normalized source features
    shared by every layer of a cross-attention stack whose source tokens do
    not evolve (s2p, a2p, m2p). [B,S,D], [B,Q,K] -> [B,Q,K,D]."""
    return gather_neighbors(_norm_stats(x_src), idx)


def site_gather(x_src, src_pos, src_ori, idx):
    """One combined per-edge gather for a cross-attention site.

    XLA's TPU gather cost is per-ROW per LANE-TILE (~6.5 ns/row measured on
    v5e for rows <= 128 lanes, 2x that once the row spills into a second
    128-lane tile): gathering pos [2], ori [1] and normalized features [D]
    separately costs 3x one combined gather, and a naive combined f32 row of
    D+3 = 131 floats costs 2x a single-tile row (this exact 2x was the
    biggest flat op of the whole rollout, 83 ms/step at the m2p shape).
    Under bf16 the D features are therefore BIT-PACKED two-per-f32-word so
    the combined row is D/2+3 = 67 floats - one lane tile. The pack/unpack
    is a bitcast round-trip: exactly the same feature values come out.

    Returns (x_g [B,Q,K,D] in x_src.dtype, nbr_pos [B,Q,K,2] f32,
    nbr_ori [B,Q,K] f32).
    """
    D = x_src.shape[-1]
    feats = _norm_stats(x_src)
    pack = feats.dtype == jnp.bfloat16 and D % 2 == 0
    if pack:
        B, S = feats.shape[:2]
        feat_cols = jax.lax.bitcast_convert_type(
            feats.reshape(B, S, D // 2, 2), jnp.float32
        )  # [B, S, D/2] f32 words carrying 2 bf16 each
    else:
        feat_cols = feats.astype(jnp.float32)
    table = jnp.concatenate(
        [
            feat_cols,
            src_pos.astype(jnp.float32),
            src_ori[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )
    g = gather_neighbors(table, idx)
    C = feat_cols.shape[-1]
    if pack:
        Bq, Q, K = idx.shape
        x_g = jax.lax.bitcast_convert_type(
            g[..., :C], jnp.bfloat16
        ).reshape(Bq, Q, K, D)
    else:
        x_g = g[..., :C].astype(x_src.dtype)
    # barrier: force the three slices to materialize as separate (smaller)
    # buffers so the wide f32 gather output can be freed - otherwise XLA
    # fuses the slices into downstream consumers and keeps the combined
    # [B,Q,K,C+3] f32 buffer (GBs at production shapes) live through the
    # whole PE pipeline
    return jax.lax.optimization_barrier(
        (x_g, g[..., C : C + 2], g[..., C + 2])
    )


def rel_pe_input(dst_pos, dst_ori, nbr_pos, nbr_ori):
    """rel_pe_features from already-gathered neighbor pos/ori
    (see site_gather). dst_pos [B,Q,2], nbr_pos [B,Q,K,2] -> [B,Q,K,3]."""
    rel_pos = nbr_pos - dst_pos[:, :, None, :]
    dist = jnp.linalg.norm(rel_pos, axis=-1)
    rel_ori = wrap_angle(nbr_ori - dst_ori[:, :, None])
    ori_vec_dst = jnp.stack([jnp.cos(dst_ori), jnp.sin(dst_ori)], axis=-1)
    rel_ori_vec = angle_between_2d_vectors(ori_vec_dst[:, :, None, :], rel_pos)
    return jnp.stack([dist, rel_ori, rel_ori_vec], axis=-1)


class GatedNeighborAttention(nn.Module):
    hidden_dim: int
    num_heads: int
    head_dim: int
    bipartite: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # single-pass Pallas attention core on TPU forward paths (auto-disabled
    # when shapes are unsupported or under training/autodiff)
    edge_kernel: bool = False
    # full reference width of the rel-PE embedding when the incoming rel_pe
    # carries only the unique dims (RelPE.fold_dup); 0 = rel_pe is full width
    pe_full_dim: int = 0

    @nn.compact
    def __call__(
        self,
        x_dst,
        x_src,
        idx,
        edge_valid,
        rel_pe,
        deterministic: bool = True,
        src_gathered=None,
    ):
        """x_dst [B,Q,D], x_src [B,S,D], idx [B,Q,K], edge_valid [B,Q,K],
        rel_pe [B,Q,K,D] -> [B,Q,D].

        src_gathered: optional [B,Q,K,D] from gather_src_features(x_src, idx),
        shared across a whole stack when x_src is layer-constant.

        Performance design (all exact math, identical parameter tree to the
        torch reference layer, reference: attention_layer.py:87-121):

        XLA's TPU gather runs at ~30 GB/s effective, so per-edge [B,Q,K,*]
        materializations dominate everything at production shapes (K=512-768).
        The reference formulation needs, per layer: gathered k, gathered v,
        and a per-edge LayerNorm+projection of the rel-PE - measured 51 ms
        per [6.3M,128] gather on v5e, 12 of them per rollout step. All of it
        folds out of the per-edge path, because LayerNorm splits into a
        parameter-free normalization z (shared across layers, CSE'd) and a
        per-layer affine, and the k/v/PE projections are linear:
          score:  q . W_k LN_s(x_j)  = ((W_k^T q) * g_s) . z_x[j] + q.(W_k b_s)
                  q . W_kr LN_r(r_j) = ((W_kr^T q) * g_r) . z_r[j] + q.(W_kr b_r)
          value:  sum_k a_k (W_v LN_s(x_k) + c_v + W_vr LN_r(r_k) + c_vr)
                = W_v (g_s * sum_k a_k z_x[k]) + W_vr (g_r * sum_k a_k z_r[k])
                  + (W_v b_s + c_v + W_vr b_r + c_vr) * sum_k a_k
        Per layer this leaves two [B,Q,K,D]-reading einsums (MXU-friendly,
        contraction over D) and zero gathers when src_gathered is supplied
        (one D-wide gather otherwise - half the reference's k+v traffic).
        prenorm_src/prenorm_dst/prenorm_r keep LayerNorm's scale/bias param
        names; W/c come from the unchanged Dense modules via identity probes.
        """
        H, hd = self.num_heads, self.head_dim
        inner = H * hd
        scale = hd ** -0.5
        B, Q, K = idx.shape

        # src-side LayerNorm affine (shared with dst when not bipartite)
        D_src = x_src.shape[-1]
        g_s, b_s = _AffineParams(D_src, name="prenorm_src")()
        g_s = g_s.astype(self.dtype)
        b_s = b_s.astype(self.dtype)
        if self.bipartite:
            g_d, b_d = _AffineParams(x_dst.shape[-1], name="prenorm_dst")()
            x_dst_n = _norm_stats(x_dst) * g_d.astype(self.dtype) + b_d.astype(self.dtype)
        else:
            x_dst_n = _norm_stats(x_dst) * g_s + b_s

        if src_gathered is None:
            # The gather depends only on (x_src, idx); in a stack of layers
            # XLA's scheduler hoists every layer's gathers ahead of the
            # sequential chain and keeps all of them live at once - measured
            # 24.8 G of 15.7 G HBM at production shapes on v5e. Tying idx to
            # this layer's own query input serializes them. No-op math-wise.
            idx_l, x_dst = jax.lax.optimization_barrier((idx, x_dst))
            x_g = gather_src_features(x_src, idx_l)
        else:
            x_g = src_gathered

        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(x_dst_n)
        qh = q.reshape(B, Q, H, hd)

        # identity probes: weights of the (unchanged) k/v/PE projections
        eye_s = jnp.eye(D_src, dtype=self.dtype)
        w_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(eye_s)
        to_v = nn.Dense(inner, dtype=self.dtype, name="to_v")
        c_v = to_v(jnp.zeros((D_src,), self.dtype))
        w_v = to_v(eye_s) - c_v[None, :]

        # PE parameters are sized to the FULL reference width P (so the
        # parameter tree matches the torch layer exactly); when the incoming
        # rel_pe is the folded unique-dims tensor (pe_full_dim > D_pe, see
        # RelPE.fold_dup) the duplicated parameter rows are folded onto
        # their twins at call time — exact math, 25% less per-edge traffic.
        D_pe = rel_pe.shape[-1]
        P = self.pe_full_dim or D_pe
        tail = P - D_pe
        z_r = _norm_stats(rel_pe, dup_tail=tail)
        g_r, b_r = _AffineParams(P, name="prenorm_r")()
        g_r = g_r.astype(self.dtype)
        b_r = b_r.astype(self.dtype)
        eye_r = jnp.eye(P, dtype=self.dtype)
        w_kr = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_r")(eye_r)
        to_v_r = nn.Dense(inner, dtype=self.dtype, name="to_v_r")
        c_vr = to_v_r(jnp.zeros((P,), self.dtype))
        w_vr = to_v_r(eye_r) - c_vr[None, :]
        w_kr_g = _fold_pe_tail(w_kr * g_r[:, None], tail).reshape(D_pe, H, hd)
        w_vr_g = _fold_pe_tail(w_vr * g_r[:, None], tail).reshape(D_pe, H, hd)

        # fold projections into the query side: [B,Q,H,D]
        q_k = jnp.einsum("bqhe,dhe->bqhd", qh, w_k.reshape(D_src, H, hd))
        q_pe = jnp.einsum("bqhe,dhe->bqhd", qh, w_kr_g)

        # bias needs the UNfolded, unscaled q.W_kr against b_r over all P
        # dims; contract the [P,inner] weight with b_r first ([H,hd]) so the
        # unfolded per-query tensor never materializes
        bias = jnp.einsum("bqhd,d->bqh", q_k, b_s) + jnp.einsum(
            "bqhe,he->bqh", qh, jnp.einsum("dhe,d->he", w_kr.reshape(P, H, hd), b_r)
        )
        use_kernel = (
            self.edge_kernel
            and deterministic
            and not self.is_initializing()
            and edge_attn_supported(Q, K, x_g.shape[-1])
            and jax.default_backend() == "tpu"
        )
        if use_kernel:
            # single-pass Pallas core: reads x_g/z_r ONCE instead of the
            # XLA path's four passes (see ops/edge_attn.py; the per-query
            # bias term cancels inside the softmax and is omitted there)
            agg_x, agg_z, attn_sum = edge_attn_core(
                x_g, z_r,
                q_k * g_s[None, None, None], q_pe,
                edge_valid, scale,
            )
        else:
            sim = (
                jnp.einsum("bqhd,bqkd->bqkh", q_k * g_s[None, None, None], x_g)
                + jnp.einsum("bqhd,bqkd->bqkh", q_pe, z_r)
                + bias[:, :, None]
            ) * scale
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

            agg_x = jnp.einsum("bqkh,bqkd->bqhd", attn, x_g)
            agg_z = jnp.einsum("bqkh,bqkd->bqhd", attn, z_r)
            attn_sum = attn.sum(axis=2)  # 1 with >=1 valid neighbor, else 0
        agg_v = jnp.einsum(
            "bqhd,dhe->bqhe", agg_x * g_s[None, None, None], w_v.reshape(D_src, H, hd)
        )
        agg_pe = jnp.einsum("bqhd,dhe->bqhe", agg_z, w_vr_g)
        const = (b_s @ w_v + c_v + b_r @ w_vr + c_vr).reshape(H, hd)
        agg = (
            agg_v + agg_pe + const[None, None] * attn_sum[..., None]
        ).reshape(B, Q, inner)

        g = nn.sigmoid(
            nn.Dense(inner, dtype=self.dtype, name="to_g")(
                jnp.concatenate([agg, x_dst_n], axis=-1)
            )
        )
        s = nn.Dense(inner, dtype=self.dtype, name="to_s")(x_dst_n)
        gated = agg + g * (s - agg)
        out = nn.Dense(self.hidden_dim, dtype=self.dtype, name="to_out")(gated)

        x = x_dst + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="postnorm")(out)

        ff_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ff_prenorm")(x)
        ff = nn.Dense(self.hidden_dim * 4, dtype=self.dtype, name="ff_dense0")(ff_in)
        ff = nn.relu(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=self.dropout, name="ff_drop")(ff, deterministic=deterministic)
        ff = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ff_dense1")(ff)
        x = x + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ff_postnorm")(ff)
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
