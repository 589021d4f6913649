"""Fourier positional embeddings.

`FourierEmbeddingFix` reproduces the fixed sinusoidal embedding used by the
demo checkpoint architecture (reference: prosim/models/layers/fourier_embedding.py:56-79):
each input dim is scaled by 2*pi, divided by a temperature ramp, and mapped to
interleaved (sin of even slots, cos of odd slots) features.

`FourierEmbedding` is the QCNet learnable variant
(reference: prosim/models/layers/fourier_embedding.py:11-54).
"""

import math

import flax.linen as nn
import jax.numpy as jnp


class FourierEmbeddingFix(nn.Module):
    num_pos_feats: int = 128  # features PER input dim (may be fractional*4 in configs)
    temperature: float = 10000.0

    @nn.compact
    def __call__(self, x):
        # x [..., D] -> [..., D * num_pos_feats]
        #
        # The straightforward form (stride-2 slices of a [..., D, npf]
        # tensor, stack, interleave-reshape) leaves only npf/2 = 16 of 128
        # VPU lanes live and lowers the strided slices to gathers - profiled
        # at ~40 ms/step on the rollout's m2p PE ([B,N,K,4,32] at B=64).
        # Same math on the flattened [..., D*npf] row: position j = d*npf + i
        # holds sin(scaled[d,i]) for even i and cos(scaled[d,i]) for odd i;
        # with cos(t) = sin(t + pi/2) the whole row is ONE full-width sin
        # with a per-lane phase - no strided slices, a single transcendental
        # pass. (Phase addition and 2pi/t prescaling associate differently
        # from the textbook form: ~1 ulp, well inside the 1e-4 parity tol.)
        npf = int(self.num_pos_feats)
        d = x.shape[-1]
        dim_t = jnp.arange(npf, dtype=jnp.float32)
        inv_t = (2 * math.pi) / self.temperature ** (2 * (dim_t // 2) / npf)
        phase = jnp.where(jnp.arange(npf) % 2 == 0, 0.0, 0.5 * math.pi)
        flat = (x[..., None] * inv_t + phase).reshape(*x.shape[:-1], d * npf)
        return jnp.sin(flat)


class FourierEmbedding(nn.Module):
    input_dim: int
    hidden_dim: int
    num_freq_bands: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x [..., input_dim] -> [..., hidden_dim]
        freqs = self.param(
            "freqs",
            nn.initializers.normal(1.0),
            (self.input_dim, self.num_freq_bands),
        )
        proj = x[..., None] * freqs * (2 * math.pi)  # [..., D, F]
        feats = jnp.concatenate([jnp.cos(proj), jnp.sin(proj), x[..., None]], axis=-1)
        out = None
        for i in range(self.input_dim):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"mlp_{i}_dense0")(feats[..., i, :])
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"mlp_{i}_norm")(h)
            h = nn.relu(h)
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"mlp_{i}_dense1")(h)
            out = h if out is None else out + h
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(out)
        out = nn.relu(out)
        out = nn.Dense(self.hidden_dim, dtype=self.dtype, name="out_dense")(out)
        return out
