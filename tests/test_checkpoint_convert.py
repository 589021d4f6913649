"""Torch state_dict -> flax params converter tests.

The released reference checkpoint is not bundled, so these tests verify the
mapping contract on synthetic state dicts shaped exactly like the reference
module tree (reference: prosim/models/traj_sam.py:49-52 `condition_transformers`
ModuleDict, condition_transformer/text_attns.py:63-74 projections, peft LoRA
key layout kept by on_save_checkpoint, models/base.py:134-139).
"""

import numpy as np
import jax
import jax.numpy as jnp

from prosim_tpu.models.llm.llama import LlamaConfig
from prosim_tpu.models.llm.text_attn import LlamaTextAttn
from prosim_tpu.utils.checkpoint_convert import convert_state_dict


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_text_attn_and_lora_key_mapping():
    cfg = LlamaConfig.tiny(lora_rank=4)
    D = 16
    attn = LlamaTextAttn(hidden_dim=D, llm_config=cfg)
    B, L, N = 1, 12, 3
    variables = attn.init(
        jax.random.PRNGKey(0),
        {
            "input_ids": jnp.zeros((B, L), jnp.int32),
            "token_mask": jnp.ones((B, L), bool),
            "agent_slot_ids": -jnp.ones((B, L), jnp.int32),
            "prompt_mask": jnp.ones((B, N), bool),
        },
        jnp.zeros((B, N, D)),
        __import__("prosim_tpu.data.batch", fromlist=["Prompt"]).Prompt(
            feat=jnp.zeros((B, N, 7)), mask=jnp.ones((B, N), bool),
            pos=jnp.zeros((B, N, 2)), ori=jnp.zeros((B, N)),
            agent_type=jnp.ones((B, N), jnp.int32),
            obs_index=jnp.zeros((B, N), jnp.int32),
            extent=jnp.zeros((B, N, 2)), goal_point=jnp.zeros((B, N, 2)),
        ),
    )
    flax_leaves = _paths(jax.tree.map(np.asarray, variables["params"]))

    H, r = cfg.hidden_size, cfg.lora_rank
    rng = np.random.default_rng(1)
    pre = "condition_transformers.policy_decoder.text_attn"
    llm = f"{pre}.llm_model.base_model.model.model"
    sd = {
        # 2-layer projection MLPs (torch Linear weight is [out, in])
        f"{pre}.prompt_to_llm.mlp.0.weight": rng.normal(size=(D, D)),
        f"{pre}.prompt_to_llm.mlp.0.bias": rng.normal(size=(D,)),
        f"{pre}.prompt_to_llm.mlp.1.weight": rng.normal(size=(D,)),
        f"{pre}.prompt_to_llm.mlp.1.bias": rng.normal(size=(D,)),
        f"{pre}.prompt_to_llm.mlp.3.weight": rng.normal(size=(H, D)),
        f"{pre}.prompt_to_llm.mlp.3.bias": rng.normal(size=(H,)),
        f"{pre}.ln_prompt.weight": rng.normal(size=(H,)),
        f"{pre}.ln_prompt.bias": rng.normal(size=(H,)),
        f"{pre}.llm_to_cond.mlp.0.weight": rng.normal(size=(D, H)),
        f"{pre}.llm_to_cond.mlp.0.bias": rng.normal(size=(D,)),
        f"{pre}.llm_to_cond.mlp.1.weight": rng.normal(size=(D,)),
        f"{pre}.llm_to_cond.mlp.1.bias": rng.normal(size=(D,)),
        f"{pre}.llm_to_cond.mlp.3.weight": rng.normal(size=(D, D)),
        f"{pre}.llm_to_cond.mlp.3.bias": rng.normal(size=(D,)),
        f"{pre}.prompt_mask_pred.mlp.0.weight": rng.normal(size=(1, D)),
        f"{pre}.prompt_mask_pred.mlp.0.bias": rng.normal(size=(1,)),
        # peft LoRA on q/k/v of layer 0 (lora_A [r, in], lora_B [out, r])
        f"{llm}.layers.0.self_attn.q_proj.lora_A.default.weight": rng.normal(size=(r, H)),
        f"{llm}.layers.0.self_attn.q_proj.lora_B.default.weight": rng.normal(size=(H, r)),
        # peft embedding LoRA (A [r, V], B [H, r])
        f"{llm}.embed_tokens.lora_embedding_A.default": rng.normal(size=(r, cfg.total_vocab)),
        f"{llm}.embed_tokens.lora_embedding_B.default": rng.normal(size=(H, r)),
    }
    params, unmapped = convert_state_dict({k: v.astype(np.float32) for k, v in sd.items()})
    assert not unmapped, unmapped

    got = _paths(params["condition_transformer_policy_decoder"]["text_attn"])
    # every converted leaf must exist in the flax-initialized tree with the
    # same shape
    for path, val in got.items():
        assert path in flax_leaves, path
        assert flax_leaves[path].shape == val.shape, (path, flax_leaves[path].shape, val.shape)

    # numerics: torch Linear weight [out,in] -> flax kernel [in,out]
    np.testing.assert_allclose(
        got[("prompt_to_llm", "dense_1", "kernel")],
        sd[f"{pre}.prompt_to_llm.mlp.3.weight"].T.astype(np.float32),
    )
    np.testing.assert_allclose(
        got[("llm", "layer_0", "q_proj", "lora_a")],
        sd[f"{llm}.layers.0.self_attn.q_proj.lora_A.default.weight"].T.astype(np.float32),
    )
    np.testing.assert_allclose(
        got[("llm", "lora_embed_a")],
        sd[f"{llm}.embed_tokens.lora_embedding_A.default"].T.astype(np.float32),
    )


def test_attention_stack_and_pointnet_mapping():
    rng = np.random.default_rng(2)
    D = 8
    sd = {
        "scene_encoder.a2a_attn_layers.0.to_q.weight": rng.normal(size=(D, D)).astype(np.float32),
        "scene_encoder.a2a_attn_layers.0.to_q.bias": rng.normal(size=(D,)).astype(np.float32),
        "policy.act_decoder.motion_anchors.weight": rng.normal(size=(3, D)).astype(np.float32),
    }
    params, unmapped = convert_state_dict(sd)
    assert not unmapped
    k = params["scene_encoder"]["a2a_0"]["to_q"]["kernel"]
    np.testing.assert_allclose(k, sd["scene_encoder.a2a_attn_layers.0.to_q.weight"].T)
    emb = params["policy"]["motion_anchors"]["embedding"]
    assert emb.shape == (3, D)
