"""Condition transformer: dispatcher over condition types.

Splits configured condition types into non-text vs text ('*OneText') groups,
encodes each, fuses non-text conditions into prompt tokens via GNN attention
and then applies the text attention
(reference: prosim/models/condition_transformer/base.py:6-61).
"""

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import Condition, Prompt
from prosim_tpu.models.condition.attn import GNNConditionAttn
from prosim_tpu.models.condition.encoders import (
    DragPointEncoder,
    GoalConditionEncoder,
    V2VTagEncoder,
    VActionTagEncoder,
)
from prosim_tpu.models.condition.text import BagOfTokensTextAttn, NoTextAttn


class ConditionTransformer(nn.Module):
    hidden_dim: int
    cond_types: tuple      # non-text types
    text_types: tuple      # '*OneText' types
    num_layers: int
    num_heads: int
    head_dim: int
    num_tags: int = 0  # unused; tag banks are sized by the tag enums
    pool: str = "mean"
    use_temporal_pe: bool = True
    text_attn_type: str = "none"
    llm_arch: str = "auto"
    llm_weights_path: str = ""
    lora_rank: int = 16
    text_prompt_mask_pred: bool = True
    replace_agent_token: bool = True
    agent_token_mode: str = "none"
    use_prompt_token: bool = True
    drag_num_points: int = 8
    drag_pre_layers: int = 1
    drag_mlp_layers: int = 3
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        encs = {}
        for t in self.cond_types:
            if t == "goal":
                encs[t] = GoalConditionEncoder(
                    self.hidden_dim, self.use_temporal_pe, dtype=self.dtype
                )
            elif t == "v_action_tag":
                # bank indexed by full-enum tag VALUE (not USED_TAGS order):
                # data-side rows carry VActionTag[t].value, so the id space
                # must be stable under USED_TAGS subsets
                from prosim_tpu.data.motion_tags import VActionTag

                encs[t] = VActionTagEncoder(
                    self.hidden_dim, len(VActionTag),
                    use_temporal_pe=self.use_temporal_pe, dtype=self.dtype,
                )
            elif t == "v2v_tag":
                from prosim_tpu.data.motion_tags import V2VTag

                encs[t] = V2VTagEncoder(
                    self.hidden_dim, len(V2VTag), binary=True,
                    use_temporal_pe=self.use_temporal_pe, dtype=self.dtype,
                )
            elif t == "drag_point":
                encs[t] = DragPointEncoder(
                    self.hidden_dim, self.drag_num_points,
                    self.drag_pre_layers, self.drag_mlp_layers, dtype=self.dtype,
                )
            else:
                raise KeyError(f"unknown condition type '{t}'")
        self.encoders = encs
        if self.cond_types:
            self.cond_attn = GNNConditionAttn(
                hidden_dim=self.hidden_dim,
                num_layers=self.num_layers,
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                pool=self.pool,
                dropout=self.dropout,
                dtype=self.dtype,
            )
        if self.text_types:
            if self.text_attn_type == "llama":
                from prosim_tpu.models.llm.llama import LlamaConfig
                from prosim_tpu.models.llm.text_attn import LlamaTextAttn

                llm_cfg = _resolve_llm_config(
                    self.llm_arch, self.llm_weights_path, self.lora_rank
                )
                self.text_attn = LlamaTextAttn(
                    hidden_dim=self.hidden_dim,
                    llm_config=llm_cfg,
                    replace_agent_token=self.replace_agent_token,
                    agent_token_mode=self.agent_token_mode,
                    use_prompt_token=self.use_prompt_token,
                    prompt_mask_pred=self.text_prompt_mask_pred,
                    dtype=self.dtype,
                )
            elif self.text_attn_type == "bow":
                self.text_attn = BagOfTokensTextAttn(self.hidden_dim, dtype=self.dtype)
            else:
                self.text_attn = NoTextAttn(self.hidden_dim, dtype=self.dtype)

    def __call__(
        self,
        conditions: Dict[str, Condition],
        prompt_emb,
        prompt: Prompt,
        scene=None,
        deterministic: bool = True,
    ):
        cond_embs = {}
        for t in self.cond_types:
            if t in conditions:
                cond_embs[t] = self.encoders[t](conditions[t])
        if cond_embs:
            prompt_emb = self.cond_attn(
                cond_embs, conditions, prompt_emb, prompt, deterministic
            )

        aux = None
        if self.text_types:
            t = self.text_types[0]
            if t in conditions and isinstance(conditions[t], dict):
                prompt_emb, aux = self.text_attn(
                    conditions[t], prompt_emb, prompt, deterministic
                )
        return prompt_emb, aux


def build_condition_transformer(config, dtype=jnp.float32) -> ConditionTransformer:
    ct = config.MODEL.CONDITION_TRANSFORMER
    types = list(config.PROMPT.CONDITION.TYPES)
    cond_types = tuple(t for t in types if "OneText" not in t)
    text_types = tuple(t for t in types if "OneText" in t)
    return ConditionTransformer(
        hidden_dim=config.MODEL.HIDDEN_DIM,
        cond_types=cond_types,
        text_types=text_types,
        num_layers=ct.NLAYER,
        num_heads=ct.NHEAD,
        head_dim=ct.FF_DIM,
        pool=ct.COND_POOL_FUNC,
        use_temporal_pe=ct.USE_TEMPORAL_ENCODING,
        text_attn_type=ct.TEXT_ATTN.TYPE if text_types else "none",
        llm_arch=ct.CONDITION_ENCODER.TEXT.LLM.ARCH,
        llm_weights_path=ct.CONDITION_ENCODER.TEXT.LLM.WEIGHTS_PATH,
        lora_rank=ct.TEXT_ATTN.LORA.R if ct.TEXT_ATTN.LORA.ENABLE else 0,
        text_prompt_mask_pred=ct.CONDITION_ENCODER.TEXT.LLM.PROMPT_LOSS.PROMPT_MASK_PRED,
        replace_agent_token=ct.CONDITION_ENCODER.TEXT.LLM.REPLACE_AGENT_TOKEN,
        agent_token_mode=ct.CONDITION_ENCODER.TEXT.LLM.AGENT_TOKEN_MODE,
        use_prompt_token=ct.CONDITION_ENCODER.TEXT.LLM.USE_PROMPT_TOKEN,
        drag_num_points=config.PROMPT.CONDITION.DRAG_POINT.MAX_POINTS,
        drag_pre_layers=ct.CONDITION_ENCODER.DRAG_POINTS.NUM_PRE_LAYERS,
        drag_mlp_layers=ct.CONDITION_ENCODER.DRAG_POINTS.NUM_MLP_LAYERS,
        dropout=ct.DROPOUT,
        dtype=dtype,
    )

def _resolve_llm_config(arch: str, weights_path: str, lora_rank: int):
    from prosim_tpu.models.llm.llama import LlamaConfig

    if arch == "tiny" or (arch == "auto" and not weights_path):
        return LlamaConfig.tiny(lora_rank=lora_rank)
    return LlamaConfig.llama3_8b(lora_rank=lora_rank)


def load_text_llm_weights(config, params):
    """When TEXT.LLM.WEIGHTS_PATH is set, load the HF Llama weights into every
    condition transformer's text_attn.llm subtree (frozen body; LoRA leaves
    fresh). Preserves flax Partitioned sharding boxes. Returns params."""
    import jax
    import jax.numpy as jnp

    ct_cfg = config.MODEL.CONDITION_TRANSFORMER
    path = ct_cfg.CONDITION_ENCODER.TEXT.LLM.WEIGHTS_PATH
    if not path:
        return params
    from prosim_tpu.models.llm.llama import load_hf_llama_params

    lora = ct_cfg.TEXT_ATTN.LORA
    llm_cfg = _resolve_llm_config(
        ct_cfg.CONDITION_ENCODER.TEXT.LLM.ARCH, path,
        lora.R if lora.ENABLE else 0,
    )
    loaded = load_hf_llama_params(path, llm_cfg)

    def merge(init_leaf, new_leaf):
        if hasattr(init_leaf, "replace_boxed"):
            return init_leaf.replace_boxed(
                jnp.asarray(new_leaf, init_leaf.value.dtype)
            )
        return jnp.asarray(new_leaf, init_leaf.dtype)

    out = dict(params)
    for key in list(params):
        if not key.startswith("condition_transformer_"):
            continue
        sub = params[key]
        if "text_attn" not in sub or "llm" not in sub["text_attn"]:
            continue
        merged = jax.tree.map(
            merge, sub["text_attn"]["llm"], loaded,
            is_leaf=lambda x: hasattr(x, "replace_boxed"),
        )
        out[key] = {**sub, "text_attn": {**sub["text_attn"], "llm": merged}}
    return out
