"""Pallas TPU kernel: fused gated-attention stack over neighbor tables.

The policy's hot loop runs 12 sequential GatedNeighborAttention layers
(6x a2p + 6x m2p, interleaved) on every rollout step. In the XLA path each
layer's score/softmax/aggregate chain round-trips [B,N,K,*] tensors through
HBM, and the shared per-edge tables ([B,N,K,D] gathered source features and
normalized rel-PE) are re-read twice per layer - tens of GB of HBM traffic
per step at production shapes (B=64, N=128, K=768).

This kernel DMAs each (batch, query-tile) cell's table slices into VMEM once
and runs the entire interleaved stack there: one HBM pass over the tables
per step regardless of depth. In VMEM the per-edge k/v projections of the
reference math (attention_layer.py:87-121) are affordable as full-MXU
[qt*K, D] @ [D, I] matmuls, so no weight folding is needed in-kernel; the
per-head score/aggregate reductions use a constant 0/1 head-segment matrix
(head-blocked matmul) to stay in Mosaic-supported 2D shapes. Outputs match
the XLA path to numerical tolerance (tests/test_fused_stack.py).

Forward/rollout path only (no custom VJP): training keeps the XLA path,
selected whenever `deterministic=False`.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stacked-weight field order per site (all stacked over the L layers).
# The src/PE LayerNorm affines and k|v projections are pre-folded on the
# host into single wide matrices so the kernel's per-edge work is two
# [E,D] @ [D,2I] matmuls per layer (N=2I=256: full MXU utilization):
#   wkv  = [diag(g_s) W_k | diag(g_s) W_v]
#   wkvr = [diag(g_r) W_kr | diag(g_r) W_vr]
#   bkv  = [b_s W_k + b_r W_kr | b_s W_v + c_v + b_r W_vr + c_vr]
_FIELDS = (
    "gd", "bd",          # prenorm_dst affine            [L,D]
    "wq", "bq",          # to_q                          [L,D,I], [L,I]
    "wkv",               # folded k|v over src feats     [L,D,2I]
    "wkvr",              # folded k|v over rel-PE        [L,Dpe,2I]
    "bkv",               # folded k|v bias               [L,2I]
    "wg", "bg",          # to_g                          [L,I+D,I], [L,I]
    "ws", "bs2",         # to_s                          [L,D,I], [L,I]
    "wo", "bo",          # to_out                        [L,I,D], [L,D]
    "png", "pnb",        # postnorm affine               [L,D]
    "f1g", "f1b",        # ff_prenorm affine             [L,D]
    "w0", "b0",          # ff_dense0                     [L,D,4D], [L,4D]
    "w1", "b1",          # ff_dense1                     [L,4D,D], [L,D]
    "f2g", "f2b",        # ff_postnorm affine            [L,D]
)


def pack_site_weights(params, site: str, num_layers: int, num_heads: int,
                      head_dim: int, dtype):
    """Stack one site's per-layer GatedNeighborAttention params into the
    kernel's field order. `params` is the owning module's param dict with
    children named f"{site}_{i}"."""

    def stack(mod, leaf):
        return jnp.stack(
            [jnp.asarray(params[f"{site}_{i}"][mod][leaf], dtype)
             for i in range(num_layers)]
        )

    wk = stack("to_k", "kernel")
    wv = stack("to_v", "kernel")
    wkr = stack("to_k_r", "kernel")
    wvr = stack("to_v_r", "kernel")
    gs = stack("prenorm_src", "scale")
    bs = stack("prenorm_src", "bias")
    gr = stack("prenorm_r", "scale")
    br = stack("prenorm_r", "bias")
    cvb = stack("to_v", "bias") + stack("to_v_r", "bias")

    def fold(g, w):  # diag(g_l) @ w_l per layer
        return g[:, :, None] * w

    fields = {
        "gd": stack("prenorm_dst", "scale"),
        "bd": stack("prenorm_dst", "bias"),
        "wq": stack("to_q", "kernel"),
        "bq": stack("to_q", "bias"),
        "wkv": jnp.concatenate([fold(gs, wk), fold(gs, wv)], axis=-1),
        "wkvr": jnp.concatenate([fold(gr, wkr), fold(gr, wvr)], axis=-1),
        "bkv": jnp.concatenate(
            [
                jnp.einsum("ld,ldi->li", bs, wk) + jnp.einsum("ld,ldi->li", br, wkr),
                jnp.einsum("ld,ldi->li", bs, wv)
                + jnp.einsum("ld,ldi->li", br, wvr)
                + cvb,
            ],
            axis=-1,
        ),
        "wg": stack("to_g", "kernel"),
        "bg": stack("to_g", "bias"),
        "ws": stack("to_s", "kernel"),
        "bs2": stack("to_s", "bias"),
        "wo": stack("to_out", "kernel"),
        "bo": stack("to_out", "bias"),
        "png": stack("postnorm", "scale"),
        "pnb": stack("postnorm", "bias"),
        "f1g": stack("ff_prenorm", "scale"),
        "f1b": stack("ff_prenorm", "bias"),
        "w0": stack("ff_dense0", "kernel"),
        "b0": stack("ff_dense0", "bias"),
        "w1": stack("ff_dense1", "kernel"),
        "b1": stack("ff_dense1", "bias"),
        "f2g": stack("ff_postnorm", "scale"),
        "f2b": stack("ff_postnorm", "bias"),
    }
    return [fields[name] for name in _FIELDS]


def _norm(x, eps=1e-5):
    """Parameter-free LayerNorm core in f32, cast back (matches
    ops/attention._norm_stats)."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.maximum((x32 * x32).mean(-1, keepdims=True) - mu * mu, 0.0)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def fourier_consts(num_features: int, pe_dim: int, temperature: float = 10000.0):
    """Constants so the kernel can evaluate FourierEmbeddingFix as ONE
    sin(): emb = sin(feats @ m1 + phase), using cos(x) = sin(x + pi/2).
    Column layout matches ops/fourier.FourierEmbeddingFix exactly
    (per-feature blocks of interleaved sin/cos over the temperature ramp),
    so no weight permutation is needed. Returns m1 [F, F*npf] f32 and
    phase [1, F*npf] f32."""
    import numpy as np

    npf = pe_dim // num_features
    dim_t = temperature ** (2 * (np.arange(npf) // 2) / npf)
    m1 = np.zeros((num_features, num_features * npf), np.float32)
    phase = np.zeros((1, num_features * npf), np.float32)
    for j in range(num_features):
        for k in range(npf):
            # scaled[..., j, k] = feat_j * 2pi / dim_t[k]; original takes
            # sin of even k, cos of odd k, re-interleaved in place
            m1[j, j * npf + k] = 2.0 * np.pi / dim_t[k]
            phase[0, j * npf + k] = 0.0 if k % 2 == 0 else np.pi / 2
    return jnp.asarray(m1), jnp.asarray(phase)


def _z_from_feats(feats, m1, phase, dt):
    """FourierEmbeddingFix + model-dtype cast + parameter-free LayerNorm,
    matching RelPE(fixed) -> _norm_stats in the XLA path. feats [E,F] f32."""
    scaled = jnp.dot(feats, m1, preferred_element_type=jnp.float32) + phase
    return _norm(jnp.sin(scaled).astype(dt))


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _site_layer(x, w, l, xg, zr, valid, num_heads, head_dim, scale):
    """One GatedNeighborAttention layer on VMEM-resident values.

    x [qt,D]; xg/zr [qt,K,D']; valid [qt,K,H] (0/1, head-broadcast on the
    host side - Mosaic cannot insert trailing unit dims on bools)."""
    H, hd = num_heads, head_dim
    qt, K, Dp = xg.shape
    D = x.shape[-1]
    I = H * hd
    E = qt * K
    dt = x.dtype

    # head-segment matrices. S expands [.,H] -> [.,I] (column i of head h);
    # SS = S_sum @ S_expand is block-diagonal ones: prod @ SS computes the
    # per-head score AND broadcasts it to all of that head's I-columns in one
    # full-width MXU matmul. The softmax then runs on [.,I] tensors with all
    # 128 lanes live - the [.,H] layout left 8/128 lanes used and measured
    # lane-bound on v5e (round-1 negative result).
    colI = jax.lax.broadcasted_iota(jnp.int32, (I, I), 0) // hd
    rowI = jax.lax.broadcasted_iota(jnp.int32, (I, I), 1) // hd
    SS = (colI == rowI).astype(dt)                    # [I,I] block-diag ones
    colH = jax.lax.broadcasted_iota(jnp.int32, (H, I), 0)
    rowH = jax.lax.broadcasted_iota(jnp.int32, (H, I), 1) // hd
    S_exp = (colH == rowH).astype(jnp.float32)        # [H,I]

    xn = _norm(x) * w["gd"][l] + w["bd"][l]
    q = _dot(xn, w["wq"][l]).astype(dt) + w["bq"][l]  # [qt,I]

    xg_f = xg.reshape(E, Dp)
    z_f = zr.reshape(E, Dp)
    kv = (
        _dot(xg_f, w["wkv"][l]) + _dot(z_f, w["wkvr"][l])
        + w["bkv"][l].astype(jnp.float32)
    ).astype(dt)                                      # [E,2I]
    k_e = kv[:, :I]
    v_e = kv[:, I:]

    prod = (k_e.reshape(qt, K, I) * q[:, None, :]).reshape(E, I)
    sim = (_dot(prod, SS) * scale).reshape(qt, K, I)  # f32, lane-packed

    # compare in f32: bf16 comparisons are unsupported on the target.
    # valid arrives head-broadcast [qt,K,H]; expand to I lanes via matmul
    # (Mosaic cannot insert trailing unit dims for a broadcast)
    vmask = _dot(valid.astype(jnp.float32).reshape(E, H), S_exp)
    vmask = vmask.reshape(qt, K, I) > 0.5             # [qt,K,I]
    sim = jnp.where(vmask, sim, -jnp.inf)
    smax = jnp.max(sim, axis=1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    expw = jnp.where(vmask, jnp.exp(sim - smax), 0.0)
    denom = jnp.maximum(expw.sum(axis=1, keepdims=True), 1e-9)
    attn_e = (expw / denom).astype(dt)                # [qt,K,I] pre-expanded

    agg = (attn_e * v_e.reshape(qt, K, I)).sum(axis=1).astype(dt)  # [qt,I]

    # sigmoid computed in f32: Mosaic's bf16 logistic lowering trips an MLIR
    # 'vector.broadcast' element-type verification error
    g_in = _dot(jnp.concatenate([agg, xn], axis=-1), w["wg"][l]) + w["bg"][l].astype(
        jnp.float32
    )
    g = jax.nn.sigmoid(g_in).astype(dt)
    s = _dot(xn, w["ws"][l]).astype(dt) + w["bs2"][l]
    gated = agg + g * (s - agg)
    out = _dot(gated, w["wo"][l]).astype(dt) + w["bo"][l]

    x = x + _norm(out) * w["png"][l] + w["pnb"][l]
    ff_in = _norm(x) * w["f1g"][l] + w["f1b"][l]
    h0 = jnp.maximum(
        _dot(ff_in, w["w0"][l]) + w["b0"][l].astype(jnp.float32), 0.0
    ).astype(dt)
    ff = _dot(h0, w["w1"][l]).astype(dt) + w["b1"][l]
    return x + _norm(ff) * w["f2g"][l] + w["f2b"][l]


def _kernel(num_layers, num_heads, head_dim, *refs):
    nf = len(_FIELDS)
    (x_ref, xga_ref, fa_ref, va_ref, xgm_ref, fm_ref, vm_ref,
     m1_ref, phase_ref) = refs[:9]
    wa_refs = refs[9:9 + nf]
    wm_refs = refs[9 + nf:9 + 2 * nf]
    out_ref = refs[9 + 2 * nf]

    wa = {name: r[...] for name, r in zip(_FIELDS, wa_refs)}
    wm = {name: r[...] for name, r in zip(_FIELDS, wm_refs)}
    x = x_ref[0]
    xga, fa, va = xga_ref[0], fa_ref[0], va_ref[0]
    xgm, fm, vm = xgm_ref[0], fm_ref[0], vm_ref[0]
    m1, phase = m1_ref[...], phase_ref[...]
    dt = x.dtype
    Dpe = m1.shape[-1]
    scale = head_dim ** -0.5

    # rel-PE embeddings once per cell, VMEM-resident across all layers
    qa, Ka, F = fa.shape
    za = _z_from_feats(fa.reshape(qa * Ka, F), m1, phase, dt).reshape(qa, Ka, Dpe)
    qm, Km, _ = fm.shape
    zm = _z_from_feats(fm.reshape(qm * Km, F), m1, phase, dt).reshape(qm, Km, Dpe)

    for l in range(num_layers):
        x = _site_layer(x, wa, l, xga, za, va, num_heads, head_dim, scale)
        x = _site_layer(x, wm, l, xgm, zm, vm, num_heads, head_dim, scale)
    out_ref[0] = x


def fused_two_site_stack(
    x_p,                     # [B,N,D]
    a2p_tables,              # (xg [B,N,Ka,D], pe_feats [B,N,Ka,F] f32, valid [B,N,Ka])
    m2p_tables,              # (xg [B,N,Km,D], pe_feats [B,N,Km,F] f32, valid [B,N,Km])
    weights_a, weights_m,    # pack_site_weights outputs
    *,
    num_layers: int,
    num_heads: int,
    head_dim: int,
    pe_dim: int,
    q_tile: int = 8,
    interpret: bool = False,
):
    """Run the interleaved (a2p, m2p) x num_layers gated-attention stack.

    pe_feats are the RAW rel-PE input features (rel_pe_input output, fixed
    PE only); the FourierEmbeddingFix expansion + normalization runs inside
    the kernel, so the [B,N,K,pe_dim] embeddings never exist in HBM."""
    B, N, D = x_p.shape
    F = a2p_tables[1].shape[-1]
    m1, phase = fourier_consts(F, pe_dim)

    def expand_valid(tables):
        xg, z, valid = tables
        if valid.ndim == 3:
            # head-broadcast on the host side (Mosaic cannot insert trailing
            # unit dims); int8 to keep the HBM cost of the redundancy low
            valid = jnp.broadcast_to(
                valid[..., None], valid.shape + (num_heads,)
            ).astype(jnp.int8)
        return (xg, z, valid)

    a2p_tables = expand_valid(a2p_tables)
    m2p_tables = expand_valid(m2p_tables)
    pad = (-N) % q_tile
    if pad:
        x_p = jnp.pad(x_p, ((0, 0), (0, pad), (0, 0)))
        a2p_tables = tuple(
            jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
            for t in a2p_tables
        )
        m2p_tables = tuple(
            jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
            for t in m2p_tables
        )
    Np = N + pad
    grid = (B, Np // q_tile)

    def tile3(t):  # [B,N,K] or [B,N,K,D]
        blk = (1, q_tile) + t.shape[2:]
        nd = t.ndim
        return pl.BlockSpec(blk, lambda b, n, _nd=nd: (b, n) + (0,) * (_nd - 2))

    def const_spec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, lambda b, n, _nd=nd: (0,) * _nd)

    inputs = [x_p, *a2p_tables, *m2p_tables, m1, phase, *weights_a, *weights_m]
    in_specs = (
        [tile3(x_p)]
        + [tile3(t) for t in a2p_tables]
        + [tile3(t) for t in m2p_tables]
        + [const_spec(m1), const_spec(phase)]
        + [const_spec(t) for t in weights_a]
        + [const_spec(t) for t in weights_m]
    )
    out = pl.pallas_call(
        partial(_kernel, num_layers, num_heads, head_dim),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q_tile, D), lambda b, n: (b, n, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, D), x_p.dtype),
        # tables + both sites' stacked weights + per-edge temporaries exceed
        # the default 16 MB scoped-VMEM limit; the chip has far more
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out[:, :N]
