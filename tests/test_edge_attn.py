"""Parity tests for the single-pass Pallas edge-attention core
(ops/edge_attn.py) against the XLA einsum path it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosim_tpu.ops.edge_attn import edge_attn_core, edge_attn_supported


def _xla_reference(x_g, z_r, qx, qp, bias, edge_valid, scale):
    """The exact einsum chain from GatedNeighborAttention's XLA branch."""
    sim = (
        jnp.einsum("bqhd,bqkd->bqkh", qx, x_g)
        + jnp.einsum("bqhd,bqkd->bqkh", qp, z_r)
        + bias[:, :, None]
    ) * scale
    sim = jnp.where(edge_valid[..., None], sim, -jnp.inf)
    sim_max = jnp.max(sim, axis=2, keepdims=True)
    sim_max = jnp.where(jnp.isfinite(sim_max), sim_max, 0.0)
    expw = jnp.where(edge_valid[..., None], jnp.exp(sim - sim_max), 0.0)
    denom = expw.sum(axis=2, keepdims=True)
    attn = expw / jnp.maximum(denom, 1e-9)
    agg_x = jnp.einsum("bqkh,bqkd->bqhd", attn, x_g)
    agg_z = jnp.einsum("bqkh,bqkd->bqhd", attn, z_r)
    return agg_x, agg_z, attn.sum(axis=2)


def _make(B=2, Q=16, K=128, D=128, H=8, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x_g = jnp.asarray(rng.normal(size=(B, Q, K, D)), dtype)
    z_r = jnp.asarray(rng.normal(size=(B, Q, K, D)), dtype)
    qx = jnp.asarray(rng.normal(size=(B, Q, H, D)) * 0.1, dtype)
    qp = jnp.asarray(rng.normal(size=(B, Q, H, D)) * 0.1, dtype)
    bias = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.float32)
    valid = jnp.asarray(rng.random((B, Q, K)) > 0.3)
    return x_g, z_r, qx, qp, bias, valid


def test_supported_shapes():
    assert edge_attn_supported(128, 160, 128)       # a2p shape: kernel wins
    assert edge_attn_supported(128, 128, 128)       # p2p shape
    assert not edge_attn_supported(128, 768, 128)   # m2p: XLA faster (measured)
    assert not edge_attn_supported(128, 512, 128)   # s2p: XLA faster
    assert not edge_attn_supported(128, 100, 128)   # K % 8 != 0
    assert not edge_attn_supported(128, 32, 128)    # K too small
    assert not edge_attn_supported(130, 160, 128)   # Q % q_tile != 0
    assert not edge_attn_supported(128, 160, 64)    # D != lane width


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_interpret_parity(dtype):
    args = _make(dtype=dtype)
    scale = 16.0 ** -0.5
    ref = _xla_reference(*args, scale)
    x_g, z_r, qx, qp, bias, valid = args
    out = edge_attn_core(x_g, z_r, qx, qp, valid, scale, interpret=True)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    for a, b in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=tol, rtol=tol)


def test_interpret_parity_empty_rows():
    """Queries whose every edge is invalid must aggregate to exactly zero."""
    x_g, z_r, qx, qp, bias, valid = _make(B=1, Q=8, K=128)
    valid = valid.at[0, 3].set(False)
    scale = 0.25
    agg_x, agg_z, asum = edge_attn_core(
        x_g, z_r, qx, qp, valid, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(agg_x)[0, 3], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(asum)[0, 3], 0.0, atol=1e-7)
    ref = _xla_reference(x_g, z_r, qx, qp, bias, valid, scale)
    np.testing.assert_allclose(np.asarray(agg_x), np.asarray(ref[0]),
                               atol=1e-5, rtol=1e-5)


def test_layer_level_parity_kernel_vs_xla():
    """GatedNeighborAttention with edge_kernel forced off vs the module-level
    default: on CPU both take the XLA path, so outputs must be identical -
    this guards the wiring (same params, same results)."""
    from prosim_tpu.ops.attention import GatedNeighborAttention

    B, Q, S, K, D = 2, 16, 64, 128, 128
    rng = np.random.default_rng(1)
    x_dst = jnp.asarray(rng.normal(size=(B, Q, D)), jnp.float32)
    x_src = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, size=(B, Q, K)), jnp.int32)
    valid = jnp.asarray(rng.random((B, Q, K)) > 0.2)
    rel_pe = jnp.asarray(rng.normal(size=(B, Q, K, D)), jnp.float32)

    mod_on = GatedNeighborAttention(
        hidden_dim=D, num_heads=8, head_dim=16, bipartite=True)
    mod_off = GatedNeighborAttention(
        hidden_dim=D, num_heads=8, head_dim=16, bipartite=True,
        edge_kernel=False)
    params = mod_on.init(jax.random.PRNGKey(0), x_dst, x_src, idx, valid, rel_pe)
    out_on = mod_on.apply(params, x_dst, x_src, idx, valid, rel_pe)
    out_off = mod_off.apply(params, x_dst, x_src, idx, valid, rel_pe)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               atol=1e-6, rtol=1e-6)
