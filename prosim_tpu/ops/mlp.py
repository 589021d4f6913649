"""MLP and context-gating blocks matching the reference's layer recipes.

MLP semantics (reference: prosim/models/layers/mlp.py:475-494): Linear stacks
with LayerNorm + ReLU between hidden layers; `ret_before_act=False` appends a
final ReLU; `without_norm=True` drops the LayerNorms.

Context gating semantics (reference: prosim/models/layers/mlp.py:207-241):
MCG_block maps tokens through Linear+LN+ReLU, gates with a broadcast context
vector, masks invalid tokens to -1e9 and max-pools a new context; CG_stacked
chains blocks with running-average skip connections.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    dims: Sequence[int]  # (in, hidden..., out); first entry is the input dim
    ret_before_act: bool = False
    without_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dims = list(self.dims)
        n = len(dims) - 1
        for i in range(n):
            x = nn.Dense(dims[i + 1], dtype=self.dtype, name=f"dense_{i}")(x)
            if i < n - 1:
                if not self.without_norm:
                    x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_{i}")(x)
                x = nn.relu(x)
        if not self.ret_before_act:
            x = nn.relu(x)
        return x


class MCGBlock(nn.Module):
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, context, mask):
        # tokens [..., S, D], context [..., D], mask [..., S] bool
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="dense")(tokens)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.relu(x)
        x = x * context[..., None, :]
        x = jnp.where(mask[..., None], x, -1e9)
        new_context = x.max(axis=-2)
        return x, new_context


class ContextGating(nn.Module):
    """CG_stacked-equivalent: chained MCG blocks with running-average skips."""

    num_blocks: int
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, context, mask):
        blocks = [
            MCGBlock(self.hidden_dim, dtype=self.dtype, name=f"block_{i}")
            for i in range(self.num_blocks)
        ]
        tok_acc, ctx_acc = blocks[0](tokens, context, mask)
        for i in range(1, self.num_blocks):
            tok, ctx = blocks[i](tok_acc, ctx_acc, mask)
            tok_acc = (tok_acc * i + tok) / (i + 1)
            ctx_acc = (ctx_acc * i + ctx) / (i + 1)
        return tok_acc, ctx_acc
