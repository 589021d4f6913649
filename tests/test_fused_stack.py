"""Parity: fused Pallas attention-stack kernel vs the XLA layer loop."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from prosim_tpu.ops.attention import (
    GatedNeighborAttention,
    RelPE,
    gather_src_features,
)
from prosim_tpu.ops.fused_stack import fused_two_site_stack, pack_site_weights

L, H, HD, D = 2, 4, 8, 32
I = H * HD


class TwoSiteStack(nn.Module):
    """Mirror of the policy's interleaved a2p/m2p loop."""

    @nn.compact
    def __call__(self, x, src_a, idx_a, val_a, pe_a, src_m, idx_m, val_m, pe_m):
        ga = gather_src_features(src_a, idx_a)
        gm = gather_src_features(src_m, idx_m)
        for i in range(L):
            x = GatedNeighborAttention(
                hidden_dim=D, num_heads=H, head_dim=HD, bipartite=True,
                name=f"a2p_{i}",
            )(x, src_a, idx_a, val_a, pe_a, src_gathered=ga)
            x = GatedNeighborAttention(
                hidden_dim=D, num_heads=H, head_dim=HD, bipartite=True,
                name=f"m2p_{i}",
            )(x, src_m, idx_m, val_m, pe_m, src_gathered=gm)
        return x


def test_fused_stack_matches_xla_loop():
    rng = np.random.default_rng(3)
    B, N, Sa, Ka, Sm, Km = 2, 8, 12, 5, 24, 7
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    src_a = jnp.asarray(rng.normal(size=(B, Sa, D)), jnp.float32)
    src_m = jnp.asarray(rng.normal(size=(B, Sm, D)), jnp.float32)
    idx_a = jnp.asarray(rng.integers(0, Sa, (B, N, Ka)), jnp.int32)
    idx_m = jnp.asarray(rng.integers(0, Sm, (B, N, Km)), jnp.int32)
    val_a = jnp.asarray(rng.random((B, N, Ka)) > 0.2)
    val_m = jnp.asarray(rng.random((B, N, Km)) > 0.2)
    # raw rel-PE input features: (dist, rel_ori, rel_ori_vec, rel_ori_vec)
    feats_a = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 50, (B, N, Ka)),
                rng.uniform(-np.pi, np.pi, (B, N, Ka)),
            ]
            + [v := rng.uniform(-np.pi, np.pi, (B, N, Ka)), v],
            axis=-1,
        ),
        jnp.float32,
    )
    v2 = rng.uniform(-np.pi, np.pi, (B, N, Km))
    feats_m = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 50, (B, N, Km)),
                rng.uniform(-np.pi, np.pi, (B, N, Km)),
                v2,
                v2,
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    # fixed Fourier PE (parameter-free), as the XLA path computes it
    relpe = RelPE(hidden_dim=D)
    pe_a = relpe.apply({"params": {}}, feats_a)
    pe_m = relpe.apply({"params": {}}, feats_m)

    mod = TwoSiteStack()
    params = mod.init(jax.random.PRNGKey(0), x, src_a, idx_a, val_a, pe_a,
                      src_m, idx_m, val_m, pe_m)
    ref = mod.apply(params, x, src_a, idx_a, val_a, pe_a,
                    src_m, idx_m, val_m, pe_m)

    p = params["params"]
    wa = pack_site_weights(p, "a2p", L, H, HD, jnp.float32)
    wm = pack_site_weights(p, "m2p", L, H, HD, jnp.float32)
    out = fused_two_site_stack(
        x,
        (gather_src_features(src_a, idx_a), feats_a, val_a.astype(jnp.float32)),
        (gather_src_features(src_m, idx_m), feats_m, val_m.astype(jnp.float32)),
        wa, wm,
        num_layers=L, num_heads=H, head_dim=HD, pe_dim=D,
        q_tile=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)
