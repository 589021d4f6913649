"""Pallas TPU kernel: single-pass score/softmax/aggregate over per-edge tables.

In the XLA path of GatedNeighborAttention (ops/attention.py), each layer's
score stage reads the gathered source table ``x_g`` [B,Q,K,D] and the
normalized rel-PE table ``z_r`` [B,Q,K,D] once each, and the aggregate stage
reads both again: four HBM passes over ~1.6 GB tensors per layer at the
policy's m2p shape (B=64, Q=128, K=768, D=128), measured at ~6 ms per einsum
(~280 GB/s effective - the [*,H=8] contractions lower to MXU-poor dilated
convolutions). This kernel keeps a query tile's slices of both tables
VMEM-resident and emits the softmax-aggregated moments in ONE pass: per-layer
edge-table traffic drops 4x -> 1x.

Scope: the attention *core* only. The surrounding math (query/k/v weight
folds, gated update, FFN) stays in XLA where the [B*Q, D] matmuls are
MXU-shaped - this is the opposite split from ops/fused_stack.py (whole-stack
in VMEM), whose in-kernel FFN/gate matmuls made it a measured net loss.

Math identical to the XLA path (reference semantics:
prosim/models/layers/attention_layer.py:87-121) up to bf16 rounding:
    sim  = (x_g . qx + z_r . qp) * scale            (f32 accum, bf16 round)
    attn = softmax_K(where(valid, sim, -inf))       (denom clamp)
    agg_x = sum_k attn * x_g ; agg_z = sum_k attn * z_r
Two deliberate exact-math simplifications vs the XLA chain:
  * the per-(b,q,h) score bias (q_k.b_s + q_pe.b_r) is constant across K, so
    it cancels inside the softmax and is omitted;
  * attn_sum = sum_k attn is 1 whenever a valid edge exists (the max score
    exponent is exp(0)=1, so denom >= 1) and 0 otherwise - the caller uses
    any(valid) instead of an in-kernel reduction.

Forward-only (no VJP): training keeps the XLA einsum path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def edge_attn_supported(q: int, k: int, d: int, q_tile: int = 8) -> bool:
    """Kernel constraints: D = lane width, K a sublane multiple, Q divisible
    into tiles - and K in the measured win window. On v5e (B=64, Q=128) the
    XLA chain costs ~12 ms/layer nearly independent of K, while the kernel's
    per-query MXU dots stream ~K rows: kernel 10.0 ms vs XLA 12.4 at K=160,
    but 16.2 vs 12.7 at K=768 and 13.2 vs 10.2 at K=512. Crossover ~K=384
    (scripts/tpu_edge_attn_bench.py)."""
    return d == 128 and 128 <= k <= 384 and k % 8 == 0 and q % q_tile == 0


def _edge_attn_kernel(xg_ref, zr_ref, qx_ref, qp_ref, valid_ref,
                      aggx_ref, aggz_ref, *, q_tile, scale, out_dtype):
    def row(r, _):
        xg = xg_ref[0, r]          # [K, D] (untiled leading dims: r is free)
        zr = zr_ref[0, r]          # [K, D]
        qx = qx_ref[0, r]          # [H, D]
        qp = qp_ref[0, r]          # [H, D]
        valid = valid_ref[0, r]    # [K, 1] f32 (1.0 valid / 0.0 invalid)

        dn = (((1,), (1,)), ((), ()))  # contract D -> [K, H]
        sim = jax.lax.dot_general(xg, qx, dn, preferred_element_type=jnp.float32)
        sim = sim + jax.lax.dot_general(zr, qp, dn, preferred_element_type=jnp.float32)
        sim = sim * scale
        # round through the XLA path's score dtype for bit-level closeness
        sim = sim.astype(out_dtype).astype(jnp.float32)
        ok = valid > 0.5           # [K, 1]
        sim = jnp.where(ok, sim, -jnp.inf)

        m = jnp.max(sim, axis=0)                         # [H]
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        e = jnp.where(ok, jnp.exp(sim - m[None, :]), 0.0)
        e = e.astype(out_dtype).astype(jnp.float32)
        denom = jnp.sum(e, axis=0)                       # [H]
        attn = (e / jnp.maximum(denom, 1e-9)[None, :]).astype(out_dtype)

        kn = (((0,), (0,)), ((), ()))  # contract K -> [H, D]
        aggx_ref[0, r] = jax.lax.dot_general(
            attn, xg, kn, preferred_element_type=jnp.float32).astype(out_dtype)
        aggz_ref[0, r] = jax.lax.dot_general(
            attn, zr, kn, preferred_element_type=jnp.float32).astype(out_dtype)
        return 0

    # unrolled: the per-row dot chains are independent, and v5e has four
    # MXUs - a fori_loop serializes them, an unrolled body exposes the ILP
    for r in range(q_tile):
        row(r, 0)


@functools.partial(
    jax.jit, static_argnames=("scale", "q_tile", "interpret"))
def edge_attn_core(x_g, z_r, qx, qp, edge_valid, scale,
                   q_tile=8, interpret=False):
    """One-pass attention core over per-edge tables.

    x_g, z_r: [B, Q, K, D] source / rel-PE tables (model dtype).
    qx, qp:   [B, Q, H, D] folded queries (q_k * g_s, q_pe * g_r).
    edge_valid: [B, Q, K] bool.
    Returns (agg_x [B,Q,H,D], agg_z [B,Q,H,D], attn_sum [B,Q,H]) in x_g.dtype.
    """
    B, Q, K, D = x_g.shape
    Dp = z_r.shape[-1]  # rel-PE width; may be the folded 3/4 width (see RelPE)
    H = qx.shape[2]
    dt = x_g.dtype
    grid = (B, Q // q_tile)
    kernel = functools.partial(
        _edge_attn_kernel, q_tile=q_tile, scale=float(scale), out_dtype=dt)

    def spec_edge(d):
        return pl.BlockSpec((1, q_tile, K, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec_q(d):
        return pl.BlockSpec((1, q_tile, H, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    spec_k = pl.BlockSpec((1, q_tile, K, 1), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)

    agg_x, agg_z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_edge(D), spec_edge(Dp), spec_q(D), spec_q(Dp), spec_k],
        out_specs=[spec_q(D), spec_q(Dp)],
        out_shape=[
            jax.ShapeDtypeStruct((B, Q, H, D), dt),
            jax.ShapeDtypeStruct((B, Q, H, Dp), dt),
        ],
        interpret=interpret,
    )(x_g.astype(dt), z_r.astype(dt), qx.astype(dt), qp.astype(dt),
      edge_valid.astype(jnp.float32)[..., None])
    attn_sum = jnp.broadcast_to(
        edge_valid.any(-1).astype(dt)[..., None], (B, Q, H))
    return agg_x, agg_z, attn_sum
