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
        npf = int(self.num_pos_feats)
        pos = x * (2 * math.pi)
        dim_t = jnp.arange(npf, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / npf)
        scaled = pos[..., None] / dim_t  # [..., D, npf]
        sin = jnp.sin(scaled[..., 0::2])
        cos = jnp.cos(scaled[..., 1::2])
        # interleave (sin, cos) pairs back together, then flatten input dims
        emb = jnp.stack([sin, cos], axis=-1).reshape(*scaled.shape[:-1], -1)
        return emb.reshape(*x.shape[:-1], -1)


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
