import numpy as np
import jax
import jax.numpy as jnp

from prosim_tpu.ops.fourier import FourierEmbeddingFix
from prosim_tpu.ops.mlp import MLP, ContextGating
from prosim_tpu.ops.pointnet import PointNetPolylineEncoder
from prosim_tpu.ops.attention import GatedNeighborAttention, rel_pe_features
from prosim_tpu.ops.neighbors import neighbor_topk


def test_fourier_fix_matches_formula():
    npf, temp = 32, 10000.0
    mod = FourierEmbeddingFix(num_pos_feats=npf, temperature=temp)
    x = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
    out = np.asarray(mod.apply({}, jnp.asarray(x)))
    assert out.shape == (5, 4 * npf)

    # independent numpy computation of the sinusoidal embedding
    pos = x * 2 * np.pi
    dim_t = temp ** (2 * (np.arange(npf) // 2) / npf)
    expect = []
    for d in range(4):
        scaled = pos[:, d, None] / dim_t
        inter = np.stack([np.sin(scaled[:, 0::2]), np.cos(scaled[:, 1::2])], axis=-1)
        expect.append(inter.reshape(5, -1))
    expect = np.concatenate(expect, axis=-1)
    np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-4)


def test_mlp_structure():
    mod = MLP([4, 8, 3], ret_before_act=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
    out = mod.apply(params, jnp.ones((2, 4)))
    assert out.shape == (2, 3)
    # ret_before_act leaves the output unbounded below
    mod2 = MLP([4, 8, 3], ret_before_act=False)
    params2 = mod2.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
    out2 = mod2.apply(params2, -100 * jnp.ones((2, 4)))
    assert np.all(np.asarray(out2) >= 0)


def _np_pointnet(params, poly, mask, pre_layers, mlp_layers, h):
    """Independent numpy re-derivation of the masked PointNet recipe."""

    def dense(p, x):
        return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    def layernorm(p, x, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * np.asarray(p["scale"]) + np.asarray(p["bias"])

    def mlp(p, x, n, final_relu):
        for i in range(n):
            x = dense(p[f"dense_{i}"], x)
            if i < n - 1:
                if f"norm_{i}" in p:
                    x = layernorm(p[f"norm_{i}"], x)
                x = np.maximum(x, 0)
        if final_relu:
            x = np.maximum(x, 0)
        return x

    x = np.where(mask[..., None], poly, 0.0)
    pre = mlp(params["pre_mlps"], x, pre_layers, final_relu=True)
    pre = np.where(mask[..., None], pre, 0.0)
    pooled = pre.max(axis=-2, keepdims=True)
    x = np.concatenate([pre, np.broadcast_to(pooled, pre.shape)], axis=-1)
    mid = mlp(params["mlps"], x, mlp_layers - pre_layers, final_relu=True)
    mid = np.where(mask[..., None], mid, 0.0)
    feat = mid.max(axis=-2)
    out = mlp(params["out_mlps"], feat, 2, final_relu=False)
    return np.where(mask.any(-1)[..., None], out, 0.0)


def test_pointnet_matches_numpy_reference():
    rng = np.random.default_rng(3)
    B, L, P, C, H = 2, 5, 7, 6, 16
    poly = rng.normal(size=(B, L, P, C)).astype(np.float32)
    mask = rng.random((B, L, P)) > 0.3
    mask[0, 0] = False  # a fully-invalid polyline must produce zeros

    mod = PointNetPolylineEncoder(in_dim=C, hidden_dim=H, num_pre_layers=1, num_mlp_layers=3)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(poly), jnp.asarray(mask))
    out = np.asarray(mod.apply(params, jnp.asarray(poly), jnp.asarray(mask)))

    ref = _np_pointnet(
        jax.tree.map(np.asarray, params["params"]), poly, mask, 1, 3, H
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    assert np.all(out[0, 0] == 0)


def _np_edge_attention(p, x_dst, x_src, edges, pe, H, hd, bipartite):
    """Edge-list (torch_geometric-style) gated attention in numpy.

    edges: list of (src_node, dst_node, pe_vector) triples.
    Verifies the dense fixed-K kernel against segment-softmax semantics.
    """

    def dense(name, x, bias=True):
        k = np.asarray(p[name]["kernel"])
        out = x @ k
        if bias and "bias" in p[name]:
            out = out + np.asarray(p[name]["bias"])
        return out

    def layernorm(name, x, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * np.asarray(p[name]["scale"]) + np.asarray(
            p[name]["bias"]
        )

    src_n = layernorm("prenorm_src", x_src)
    dst_n = layernorm("prenorm_dst" if bipartite else "prenorm_src", x_dst)

    q = dense("to_q", dst_n).reshape(-1, H, hd)
    k = dense("to_k", src_n, bias=False).reshape(-1, H, hd)
    v = dense("to_v", src_n).reshape(-1, H, hd)

    Qn = x_dst.shape[0]
    agg = np.zeros((Qn, H, hd), dtype=np.float64)
    # group edges by destination; per-dst softmax
    by_dst = {}
    for s, d, r in edges:
        by_dst.setdefault(d, []).append((s, r))
    for d, lst in by_dst.items():
        sims, vals = [], []
        for s, r in lst:
            r_n = layernorm("prenorm_r", r[None])[0]
            kj = k[s] + dense("to_k_r", r_n[None], bias=False)[0].reshape(H, hd)
            vj = v[s] + dense("to_v_r", r_n[None])[0].reshape(H, hd)
            sims.append((q[d] * kj).sum(-1) / np.sqrt(hd))
            vals.append(vj)
        sims = np.stack(sims)  # [E, H]
        w = np.exp(sims - sims.max(0, keepdims=True))
        w = w / w.sum(0, keepdims=True)
        agg[d] = (w[..., None] * np.stack(vals)).sum(0)

    agg = agg.reshape(Qn, H * hd)
    gate_in = np.concatenate([agg, dst_n], axis=-1)
    g = 1 / (1 + np.exp(-dense("to_g", gate_in)))
    s_term = dense("to_s", dst_n)
    gated = agg + g * (s_term - agg)
    out = dense("to_out", gated)
    x = x_dst + layernorm("postnorm", out)
    ff_in = layernorm("ff_prenorm", x)
    ff = np.maximum(dense("ff_dense0", ff_in), 0)
    ff = dense("ff_dense1", ff)
    return x + layernorm("ff_postnorm", ff)


def _check_gated_attention_parity(S: int):
    rng = np.random.default_rng(7)
    B, Q, K, D, H, hd = 1, 6, 3, 16, 4, 4
    x_dst = rng.normal(size=(B, Q, D)).astype(np.float32)
    x_src = rng.normal(size=(B, S, D)).astype(np.float32)
    idx = rng.integers(0, S, size=(B, Q, K)).astype(np.int32)
    valid = rng.random((B, Q, K)) > 0.25
    valid[0, 0] = [True, True, False]
    valid[0, 1] = [True, False, False]
    pe = rng.normal(size=(B, Q, K, D)).astype(np.float32)

    mod = GatedNeighborAttention(hidden_dim=D, num_heads=H, head_dim=hd, bipartite=True)
    params = mod.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x_dst),
        jnp.asarray(x_src),
        jnp.asarray(idx),
        jnp.asarray(valid),
        jnp.asarray(pe),
    )
    out = np.asarray(
        mod.apply(
            params,
            jnp.asarray(x_dst),
            jnp.asarray(x_src),
            jnp.asarray(idx),
            jnp.asarray(valid),
            jnp.asarray(pe),
        )
    )

    edges = [
        (int(idx[0, q, k]), q, pe[0, q, k])
        for q in range(Q)
        for k in range(K)
        if valid[0, q, k]
    ]
    ref = _np_edge_attention(
        jax.tree.map(np.asarray, params["params"]),
        x_dst[0].astype(np.float64),
        x_src[0].astype(np.float64),
        edges,
        pe[0].astype(np.float64),
        H,
        hd,
        bipartite=True,
    )
    dst_with_edges = sorted({d for _, d, _ in edges})
    np.testing.assert_allclose(out[0, dst_with_edges], ref[dst_with_edges], rtol=2e-3, atol=2e-3)


def test_gated_attention_matches_edge_list_reference():
    # neighborhoods cover most of the source set (K=3 of S=8)
    _check_gated_attention_parity(S=8)


def test_gated_attention_parity_sparse_neighborhood():
    # neighborhoods are a small fraction of the source set (K=3 of S=64)
    _check_gated_attention_parity(S=64)


def test_rel_pe_features_basic():
    # dst at origin facing +x; src directly ahead at distance 2 facing +y
    dst_pos = jnp.asarray([[[0.0, 0.0]]])
    dst_ori = jnp.asarray([[0.0]])
    src_pos = jnp.asarray([[[2.0, 0.0]]])
    src_ori = jnp.asarray([[np.pi / 2]])
    idx = jnp.zeros((1, 1, 1), jnp.int32)
    feats = np.asarray(rel_pe_features(dst_pos, dst_ori, src_pos, src_ori, idx))
    np.testing.assert_allclose(feats[0, 0, 0], [2.0, np.pi / 2, 0.0], atol=1e-6)


def test_context_gating_runs():
    mod = ContextGating(num_blocks=3, hidden_dim=8)
    tokens = jnp.ones((2, 5, 8))
    ctx = jnp.ones((2, 8))
    mask = jnp.ones((2, 5), bool)
    params = mod.init(jax.random.PRNGKey(0), tokens, ctx, mask)
    tok, c = mod.apply(params, tokens, ctx, mask)
    assert tok.shape == (2, 5, 8) and c.shape == (2, 8)
    assert np.isfinite(np.asarray(tok)).all()


def test_neighbor_attention_end_to_end_with_topk():
    """Smoke: realistic wiring of topk -> pe -> attention."""
    rng = np.random.default_rng(11)
    B, S, D = 2, 32, 16
    pos = jnp.asarray(rng.normal(size=(B, S, 2)) * 20, dtype=jnp.float32)
    ori = jnp.asarray(rng.normal(size=(B, S)), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, S, D)), dtype=jnp.float32)
    mask = jnp.asarray(rng.random((B, S)) > 0.2)

    idx, valid = neighbor_topk(pos, pos, mask, mask, k=8)
    pe_in = rel_pe_features(pos, ori, pos, ori, idx)

    from prosim_tpu.ops.attention import RelPE

    pe_mod = RelPE(hidden_dim=D)
    pe_params = pe_mod.init(jax.random.PRNGKey(1), pe_in)
    pe = pe_mod.apply(pe_params, pe_in)

    mod = GatedNeighborAttention(hidden_dim=D, num_heads=4, head_dim=4, pe_full_dim=D)
    params = mod.init(jax.random.PRNGKey(2), x, x, idx, valid, pe)
    out = mod.apply(params, x, x, idx, valid, pe)
    assert out.shape == (B, S, D)
    assert np.isfinite(np.asarray(out)).all()


def test_pe_fold_matches_full_width():
    """Folded rel-PE path (3 unique features + pe_full_dim) must be exact-math
    identical to the reference full-width path (duplicated rel_ori_vec)."""
    rng = np.random.default_rng(17)
    B, S, D, K = 2, 24, 32, 6
    pos = jnp.asarray(rng.normal(size=(B, S, 2)) * 20, dtype=jnp.float32)
    ori = jnp.asarray(rng.normal(size=(B, S)), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, S, D)), dtype=jnp.float32)
    mask = jnp.asarray(rng.random((B, S)) > 0.2)
    idx, valid = neighbor_topk(pos, pos, mask, mask, k=K)

    from prosim_tpu.ops.attention import RelPE

    feats = rel_pe_features(pos, ori, pos, ori, idx)  # [B,S,K,3]
    pe_full = RelPE(hidden_dim=D, fold_dup=False).apply({"params": {}}, feats)
    pe_fold = RelPE(hidden_dim=D, fold_dup=True).apply({"params": {}}, feats)
    assert pe_full.shape[-1] == D and pe_fold.shape[-1] == D * 3 // 4
    np.testing.assert_allclose(
        np.asarray(pe_full[..., : D * 3 // 4]), np.asarray(pe_fold), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(pe_full[..., D * 3 // 4 :]), np.asarray(pe_fold[..., D // 2 :]), atol=0
    )

    mod_full = GatedNeighborAttention(hidden_dim=D, num_heads=4, head_dim=8)
    mod_fold = GatedNeighborAttention(hidden_dim=D, num_heads=4, head_dim=8, pe_full_dim=D)
    params = mod_full.init(jax.random.PRNGKey(3), x, x, idx, valid, pe_full)
    # same parameter tree: prenorm_r/to_k_r/to_v_r stay full-width
    out_full = mod_full.apply(params, x, x, idx, valid, pe_full)
    out_fold = mod_fold.apply(params, x, x, idx, valid, pe_fold)
    np.testing.assert_allclose(
        np.asarray(out_fold), np.asarray(out_full), rtol=2e-5, atol=2e-5
    )
