"""Llama text conditioning: natural-language prompts -> per-agent residuals.

JAX equivalent of the reference LlamaTextAttn
(reference: prosim/models/condition_transformer/text_attns.py:78-543):

  1. project prompt/policy embeddings D -> hidden via `prompt_to_llm` + LN
     (text_attns.py:63-64);
  2. build token embeddings, replacing each <A{i}> special token with the
     corresponding agent's projected embedding (REPLACE_AGENT_TOKEN,
     text_attns.py:395-422);
  3. one decoder forward over the batch of texts;
  4. gather the last hidden state at every agent-token position, project back
     via `llm_to_cond` 4096 -> D, residual-add onto the prompt condition
     embedding (text_attns.py:424-543);
  5. aux BCE `prompt_mask_pred` head predicting which agents the text
     addresses (text_attns.py:467-496).

Tokenization happens host-side (prosim_tpu.models.llm.tokenizer) so the
device path keeps static [B, X, L] shapes.
"""

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import Prompt
from prosim_tpu.models.llm.llama import LlamaConfig, LlamaModel, embed_with_agent_tokens
from prosim_tpu.ops.mlp import MLP


@registry.register_text_attn(name="llama")
class LlamaTextAttn(nn.Module):
    hidden_dim: int               # policy embedding dim D
    llm_config: LlamaConfig
    replace_agent_token: bool = True
    agent_token_mode: str = "none"  # 'add' sums name+agent embeddings
    use_prompt_token: bool = True   # False zeroes the injected embeddings
    prompt_mask_pred: bool = True
    detach_prompt_token: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.llm = LlamaModel(self.llm_config)
        H = self.llm_config.hidden_size
        # 2-layer projection MLPs matching the reference layout so converted
        # checkpoints load leaf-for-leaf (text_attns.py:63-67,74)
        self.prompt_to_llm = MLP(
            [self.hidden_dim, self.hidden_dim, H], ret_before_act=True, dtype=self.dtype
        )
        self.ln_prompt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.llm_to_cond = MLP(
            [H, self.hidden_dim, self.hidden_dim], ret_before_act=True, dtype=self.dtype
        )
        if self.prompt_mask_pred:
            self.mask_pred_head = MLP(
                [self.hidden_dim, 1], ret_before_act=True, without_norm=True,
                dtype=self.dtype,
            )

    def __call__(self, text_cond: Dict, prompt_cond_emb, prompt: Prompt,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, Optional[Dict]]:
        """text_cond:
          input_ids      [B, L] int32  (OneText: one concatenated text/scene)
          token_mask     [B, L] bool
          agent_slot_ids [B, L] int32  agent index at <A{i}> positions else -1
          prompt_mask    [B, N] bool   agents the text addresses
        """
        ids = text_cond["input_ids"]
        tok_mask = text_cond["token_mask"]
        slot_ids = text_cond["agent_slot_ids"]

        agent_in = prompt_cond_emb
        if self.detach_prompt_token:
            agent_in = jax.lax.stop_gradient(agent_in)
        agent_llm = self.ln_prompt(self.prompt_to_llm(agent_in))  # [B, N, H]
        if not self.use_prompt_token:
            # ablation: keep the block structure but zero the injected
            # embeddings (reference: text_attns.py:197-199)
            agent_llm = agent_llm * 0.0

        if self.replace_agent_token or self.agent_token_mode == "add":
            hidden = self.llm(
                ids, None, tok_mask, agent_embs=agent_llm, agent_slot_ids=slot_ids,
                agent_add_mode=self.agent_token_mode == "add",
            )  # [B, L, H]
        else:
            hidden = self.llm(ids, None, tok_mask)

        N = prompt_cond_emb.shape[1]
        read_pos = text_cond.get("read_positions")
        if read_pos is not None:
            # USE_PROMPT_TOKEN block: read each agent's hidden state at its
            # slot in the appended prompt block (text_attns.py:459-465)
            safe = jnp.clip(read_pos, 0, hidden.shape[1] - 1)
            gathered = jnp.take_along_axis(
                hidden.astype(jnp.float32), safe[..., None], axis=1
            )  # [B, N, H]
            addressed = read_pos >= 0
        else:
            # scatter-back: mean of hidden states at each agent's <A{i}>
            # positions inside the text
            onehot = jax.nn.one_hot(
                jnp.where(slot_ids >= 0, slot_ids, N), N + 1, dtype=hidden.dtype
            )[..., :N]  # [B, L, N]
            onehot = onehot * tok_mask[..., None]
            counts = onehot.sum(axis=1)  # [B, N]
            gathered = jnp.einsum("blh,bln->bnh", hidden.astype(jnp.float32), onehot)
            gathered = gathered / jnp.clip(counts[..., None], 1, None)
            addressed = counts > 0  # [B, N]

        res = self.llm_to_cond(gathered.astype(self.dtype))  # [B, N, D]
        out = jnp.where(
            (addressed & prompt.mask)[..., None], prompt_cond_emb + res, prompt_cond_emb
        )

        aux = None
        if self.prompt_mask_pred:
            logits = self.mask_pred_head(res)[..., 0]  # [B, N]
            target = text_cond["prompt_mask"].astype(jnp.float32)
            bce = -(
                target * jax.nn.log_sigmoid(logits)
                + (1 - target) * jax.nn.log_sigmoid(-logits)
            )
            valid = prompt.mask
            aux = {
                "prompt_mask_pred_loss": jnp.where(valid, bce, 0.0).sum()
                / jnp.clip(valid.sum(), 1, None)
            }
        return out, aux


@registry.register_text_attn(name="llama_qa")
class LlamaTextAttnQA(nn.Module):
    """QA probing variant (reference: text_attns.py:545-687): ask the LLM a
    question about one agent's ground-truth attribute with the agent's policy
    embedding injected at its <A{i}> token, and train with token-level
    cross-entropy on the answer span. Returns the prompt condition embedding
    unchanged plus {'qa_loss': ...}."""

    hidden_dim: int
    llm_config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.llm = LlamaModel(self.llm_config)
        H = self.llm_config.hidden_size
        self.prompt_to_llm = MLP(
            [self.hidden_dim, self.hidden_dim, H], ret_before_act=True, dtype=self.dtype
        )
        self.ln_prompt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(self, qa_cond: Dict, prompt_cond_emb, prompt: Prompt,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, Optional[Dict]]:
        """qa_cond: input_ids/token_mask/agent_slot_ids [B, L] plus
        labels [B, L] int32 (-100 outside the answer span)."""
        agent_llm = self.ln_prompt(self.prompt_to_llm(prompt_cond_emb))
        _, logits = self.llm(
            qa_cond["input_ids"], None, qa_cond["token_mask"],
            agent_embs=agent_llm, agent_slot_ids=qa_cond["agent_slot_ids"],
            return_logits=True,
        )  # logits [B, L, V]
        # next-token prediction: logits at t predict labels at t+1
        labels = qa_cond["labels"][:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = jnp.clip(labels, 0, None)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        on = labels >= 0
        qa_loss = jnp.where(on, nll, 0.0).sum() / jnp.clip(on.sum(), 1, None)
        return prompt_cond_emb, {"qa_loss": qa_loss}
