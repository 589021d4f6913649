"""Text (LLM) condition attention.

The reference routes natural-language prompts through Llama3-8B-Instruct with
LoRA adapters and agent-token replacement
(reference: prosim/models/condition_transformer/text_attns.py:78-543). The
full JAX Llama path lives in prosim_tpu/models/llm/; this module defines the
interface every text attention must satisfy plus a lightweight stand-in used
when no LLM weights are configured:

  __call__(text_cond, prompt_cond_emb, prompt) -> (emb', aux_losses | None)

`text_cond` carries pre-tokenized text (host-side tokenization keeps the
device path static-shape): token ids [B, X, Ltok], per-text masks, and the
positions of agent tokens <Ai> within each text.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import Prompt
from prosim_tpu.ops.mlp import MLP


@registry.register_text_attn(name="none")
class NoTextAttn(nn.Module):
    """Identity: used when text conditions are configured but no LLM is."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_cond, prompt_cond_emb, prompt: Prompt, deterministic=True):
        return prompt_cond_emb, None


@registry.register_text_attn(name="bow")
class BagOfTokensTextAttn(nn.Module):
    """Cheap text conditioner: mean token embedding -> per-covered-agent
    residual. A functional (non-LLM) text path so the text-condition API can
    be exercised end-to-end before the Llama3 integration; it consumes the
    same pre-tokenized inputs as the Llama path."""

    hidden_dim: int
    vocab_size: int = 128256  # Llama3 vocabulary
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_cond, prompt_cond_emb, prompt: Prompt, deterministic=True):
        ids = text_cond["input_ids"]          # [B, X, L] int32
        tok_mask = text_cond["token_mask"]    # [B, X, L] bool
        agent_cover = text_cond["prompt_mask"]  # [B, N] bool - agents addressed
        emb = nn.Embed(self.vocab_size, self.hidden_dim, dtype=self.dtype, name="tok_embed")(
            jnp.clip(ids, 0, self.vocab_size - 1)
        )
        emb = jnp.where(tok_mask[..., None], emb, 0.0)
        denom = jnp.clip(tok_mask.sum(-1, keepdims=True), 1, None)
        text_vec = emb.sum(axis=-2) / denom   # [B, X, D]
        # pool texts (demo uses OneText: X == 1)
        text_mask = tok_mask.any(-1)
        tv = jnp.where(text_mask[..., None], text_vec, 0.0).sum(1) / jnp.clip(
            text_mask.sum(-1, keepdims=True), 1, None
        )  # [B, D]
        res = MLP([self.hidden_dim, self.hidden_dim, self.hidden_dim],
                  ret_before_act=True, dtype=self.dtype, name="to_cond")(tv)
        out = jnp.where(
            (agent_cover & prompt.mask)[..., None], prompt_cond_emb + res[:, None], prompt_cond_emb
        )
        return out, None
