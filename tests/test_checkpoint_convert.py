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


def _ref_mlp_sd(prefix, dims, rng, without_norm=False):
    """Synthesize reference-MLP state_dict keys (mlp.py:475-494): per layer
    Linear [,LayerNorm] ReLU; torch Linear weight [out, in]."""
    sd, pos = {}, 0
    n = len(dims) - 1
    for i in range(n):
        sd[f"{prefix}.mlp.{pos}.weight"] = rng.normal(size=(dims[i + 1], dims[i]))
        sd[f"{prefix}.mlp.{pos}.bias"] = rng.normal(size=(dims[i + 1],))
        pos += 1
        if i < n - 1:
            if not without_norm:
                sd[f"{prefix}.mlp.{pos}.weight"] = rng.normal(size=(dims[i + 1],))
                sd[f"{prefix}.mlp.{pos}.bias"] = rng.normal(size=(dims[i + 1],))
                pos += 1
            pos += 1  # ReLU
    return sd


def _ref_attn_sd(prefix, H, heads, hd, rng, bipartite):
    """Synthesize reference AttentionLayer keys (attention_layer.py:13-55).
    Non-bipartite layers share src/dst prenorm but state_dict still emits
    both names."""
    inner = heads * hd
    sd = {}
    lin = {"to_q": (inner, H, True), "to_k": (inner, H, False),
           "to_v": (inner, H, True), "to_k_r": (inner, H, False),
           "to_v_r": (inner, H, True), "to_s": (inner, H, True),
           "to_g": (inner, inner + H, True), "to_out": (H, inner, True)}
    for name, (o, i, bias) in lin.items():
        sd[f"{prefix}.{name}.weight"] = rng.normal(size=(o, i))
        if bias:
            sd[f"{prefix}.{name}.bias"] = rng.normal(size=(o,))
    sd[f"{prefix}.ff_mlp.0.weight"] = rng.normal(size=(4 * H, H))
    sd[f"{prefix}.ff_mlp.0.bias"] = rng.normal(size=(4 * H,))
    sd[f"{prefix}.ff_mlp.3.weight"] = rng.normal(size=(H, 4 * H))
    sd[f"{prefix}.ff_mlp.3.bias"] = rng.normal(size=(H,))
    norms = ["attn_prenorm_x_src", "attn_prenorm_x_dst", "attn_prenorm_r",
             "attn_postnorm", "ff_prenorm", "ff_postnorm"]
    for n in norms:
        sd[f"{prefix}.{n}.weight"] = rng.normal(size=(H,))
        sd[f"{prefix}.{n}.bias"] = rng.normal(size=(H,))
    return sd


def _ref_pointnet_sd(prefix, in_dim, H, rng, npre=1, nmlp=3):
    sd = {}
    sd.update(_ref_mlp_sd(f"{prefix}.pre_mlps", [in_dim] + [H] * npre, rng))
    sd.update(_ref_mlp_sd(f"{prefix}.mlps", [2 * H] + [H] * (nmlp - npre), rng))
    sd.update(_ref_mlp_sd(f"{prefix}.out_mlps", [H, H, H], rng, without_norm=True))
    return sd


def test_full_demo_architecture_strict_zero_unmapped():
    """Synthesize the COMPLETE reference demo-style architecture state_dict
    (every module family: scene/obs/map encoders, attention stacks, K-goal
    heads, policy heads + context, obs-update fusion MLP, all condition
    encoders, GNN cond-attn, text projections + LoRA) and require:
      1. strict conversion - ZERO unmapped keys;
      2. every converted leaf exists in the ProSim.init tree, shape-exact;
      3. the converted params drive a working forward."""
    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.prosim import ProSim
    from prosim_tpu.models.llm.llama import LlamaConfig

    H, heads, hd = 16, 2, 4
    opts = [
        "MODEL.HIDDEN_DIM", str(H),
        "MODEL.SCENE_ENCODER.ATTN.NUM_LAYER", "1",
        "MODEL.DECODER.ATTN.NUM_LAYER", "1",
        "MODEL.POLICY.ACT_DECODER.ATTN.NUM_LAYER", "1",
        "MODEL.CONDITION_TRANSFORMER.NLAYER", "1",
        "MODEL.SCENE_ENCODER.ATTN.NUM_HEAD", str(heads),
        "MODEL.DECODER.ATTN.NUM_HEAD", str(heads),
        "MODEL.POLICY.ACT_DECODER.ATTN.NUM_HEAD", str(heads),
        "MODEL.CONDITION_TRANSFORMER.NHEAD", str(heads),
        "MODEL.SCENE_ENCODER.ATTN.FF_DIM", str(hd),
        "MODEL.DECODER.ATTN.FF_DIM", str(hd),
        "MODEL.POLICY.ACT_DECODER.ATTN.FF_DIM", str(hd),
        "MODEL.CONDITION_TRANSFORMER.FF_DIM", str(hd),
        "MODEL.SCENE_ENCODER.ATTN.MAX_NUM_NEIGH", "4",
        "MODEL.DECODER.ATTN.MAX_NUM_NEIGH", "4",
        "MODEL.POLICY.ACT_DECODER.ATTN.MAX_NUM_NEIGH", "4",
        "PROMPT.CONDITION.TYPES",
        "['goal','v_action_tag','v2v_tag','drag_point','llm_text_OneText']",
        "MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM.MAX_TEXT_TOKENS", "16",
        "MODEL.DECODER.GOAL_PRED.ENABLE", "True",
        "MODEL.OBS_UPDATE.FUSION", "mlp",
        "LOSS.ROLLOUT_TRAJ.USE_GOAL_PRED_LOSS", "True",
        "MODEL.POLICY.ACT_DECODER.CONTEXT.GOAL", "True",
    ]
    cfg = get_config(opts=opts)
    rng = np.random.default_rng(3)

    # --- synthesize the reference state_dict ---
    sd = {}
    map_in = 6 + 3 * cfg.DATASET.FORMAT.MAP.WITH_TYPE_EMB + 2 * cfg.DATASET.FORMAT.MAP.WITH_DIR
    obs_in = len(cfg.DATASET.FORMAT.HISTORY.ELEMENTS.split(","))
    obs_in += 2 * cfg.DATASET.FORMAT.HISTORY.WITH_EXTEND
    obs_in += 3 * cfg.DATASET.FORMAT.HISTORY.WITH_AGENT_TYPE
    obs_in += cfg.DATASET.FORMAT.HISTORY.STEPS * cfg.DATASET.FORMAT.HISTORY.WITH_TIME_EMB
    sd.update(_ref_pointnet_sd("scene_encoder.map_encoder", map_in, H, rng))
    sd.update(_ref_pointnet_sd("scene_encoder.obs_encoder", obs_in, H, rng))
    for stack in ("scene_encoder.a2a_attn_layers", "scene_encoder.s2s_attn_layers",
                  "decoder.p2p_attn_layers"):
        sd.update(_ref_attn_sd(f"{stack}.0", H, heads, hd, rng, bipartite=False))
    for stack in ("decoder.s2p_attn_layers", "policy.act_decoder.a2p_attn_layers",
                  "policy.act_decoder.m2p_attn_layers"):
        sd.update(_ref_attn_sd(f"{stack}.0", H, heads, hd, rng, bipartite=True))
    sd.update(_ref_mlp_sd("scene_encoder.obs_update_mlp", [2 * H, H, H], rng))

    K = cfg.MODEL.DECODER.GOAL_PRED.K
    sd.update(_ref_mlp_sd("decoder.goal_prob_head", [H, H // 2, K], rng))
    sd.update(_ref_mlp_sd("decoder.goal_point_head", [H, H // 2, K * 2], rng))

    sd.update(_ref_mlp_sd("prompt_encoder.motion_pred.state_encoder", [7, H, H], rng))

    state_dim = len(cfg.DATASET.FORMAT.TARGET.ELEMENTS.split(","))
    out_dim = cfg.DATASET.FORMAT.TARGET.STEPS * state_dim
    sd.update(_ref_mlp_sd("policy.act_decoder.motion_head", [H, H, H // 2, out_dim], rng))
    sd.update(_ref_mlp_sd("policy.act_decoder.pred_mlp", [H, H, H // 2, 2], rng))
    sd.update(_ref_mlp_sd("policy.act_decoder.goal_encoder", [2, H], rng))
    sd.update(_ref_mlp_sd("policy.act_decoder.context_fuse", [2 * H, H], rng))
    mk = cfg.MODEL.POLICY.ACT_DECODER.TRAJ.K
    sd["policy.act_decoder.motion_anchors.weight"] = rng.normal(size=(mk * 3, H))
    for i in range(3):
        sd[f"policy.act_decoder.CG_decode.CGs.{i}.MLP.0.weight"] = rng.normal(size=(H, H))
        sd[f"policy.act_decoder.CG_decode.CGs.{i}.MLP.0.bias"] = rng.normal(size=(H,))
        sd[f"policy.act_decoder.CG_decode.CGs.{i}.MLP.1.weight"] = rng.normal(size=(H,))
        sd[f"policy.act_decoder.CG_decode.CGs.{i}.MLP.1.bias"] = rng.normal(size=(H,))

    ct = "condition_transformers.policy_decoder"
    sd.update(_ref_mlp_sd(f"{ct}.condition_encoders.goal.goal_encoder",
                          [2, H, H], rng, without_norm=True))
    sd.update(_ref_pointnet_sd(f"{ct}.condition_encoders.drag_point.pointnet_encoder",
                               2, H, rng))
    for tag in cfg.PROMPT.CONDITION.MOTION_TAG.USED_TAGS:
        sd[f"{ct}.condition_encoders.v_action_tag.tag_encoder.{tag}"] = rng.normal(size=(H,))
    for tag in ("Following", "Merging", "ByPassing"):
        sd[f"{ct}.condition_encoders.v2v_tag.tag_encoder.{tag}"] = rng.normal(size=(2 * H,))
    sd.update(_ref_attn_sd(f"{ct}.condition_attn.attn_layers.0", H, heads, hd, rng,
                           bipartite=False))
    sd[f"{ct}.condition_attn.cond_type_emds.weight"] = rng.normal(size=(5, H))

    llm = LlamaConfig.tiny(lora_rank=16)
    LH = llm.hidden_size
    sd.update(_ref_mlp_sd(f"{ct}.text_attn.prompt_to_llm", [H, H, LH], rng))
    sd.update(_ref_mlp_sd(f"{ct}.text_attn.llm_to_cond", [LH, H, H], rng))
    sd[f"{ct}.text_attn.ln_prompt.weight"] = rng.normal(size=(LH,))
    sd[f"{ct}.text_attn.ln_prompt.bias"] = rng.normal(size=(LH,))
    sd.update(_ref_mlp_sd(f"{ct}.text_attn.prompt_mask_pred", [H, 1], rng,
                          without_norm=True))
    lp = f"{ct}.text_attn.llm_model.base_model.model.model"
    for layer in range(llm.num_layers):
        for proj, od in (("q_proj", LH), ("k_proj", llm.num_kv_heads * llm.head_dim),
                         ("v_proj", llm.num_kv_heads * llm.head_dim)):
            sd[f"{lp}.layers.{layer}.self_attn.{proj}.lora_A.default.weight"] = (
                rng.normal(size=(16, LH)))
            sd[f"{lp}.layers.{layer}.self_attn.{proj}.lora_B.default.weight"] = (
                rng.normal(size=(od, 16)))
    sd[f"{lp}.embed_tokens.lora_embedding_A.default"] = rng.normal(size=(16, llm.total_vocab))
    sd[f"{lp}.embed_tokens.lora_embedding_B.default"] = rng.normal(size=(LH, 16))

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    # 1. strict conversion: zero unmapped keys
    params, unmapped = convert_state_dict(sd, strict=True)
    assert not unmapped

    # 2. every converted leaf sits in the init tree with the exact shape
    model = ProSim(cfg)
    batch = make_synthetic_batch(
        cfg, batch_size=1, num_lanes=8, num_obs_agents=5, num_agents=4, num_replan=2
    )
    init_params = model.init(jax.random.PRNGKey(0), batch)
    init_leaves = _paths(jax.tree.map(
        lambda x: np.asarray(getattr(x, "value", x)), init_params))
    conv_leaves = _paths(params)
    missing = [p for p in conv_leaves if p not in init_leaves]
    assert not missing, f"converted keys not in init tree: {missing[:8]}"
    bad = [
        (p, conv_leaves[p].shape, init_leaves[p].shape)
        for p in conv_leaves if conv_leaves[p].shape != init_leaves[p].shape
    ]
    assert not bad, f"shape mismatches: {bad[:8]}"

    # 3. merged params run a forward
    def merge(cur, new):
        if not isinstance(cur, dict):
            return new
        return {k: merge(v, new[k]) if k in new else v for k, v in cur.items()}

    def unbox_merge(cur, new):
        import jax.numpy as jnp
        if hasattr(cur, "replace_boxed"):
            return cur.replace_boxed(jnp.asarray(new, cur.value.dtype))
        return jnp.asarray(new, np.float32)

    merged = jax.tree.map(
        lambda c: c, init_params)
    import jax.tree_util as jtu

    def walk(cur, new):
        out = {}
        for k, v in cur.items():
            if k in new and isinstance(v, dict) and isinstance(new[k], dict):
                out[k] = walk(v, new[k])
            elif k in new and not isinstance(new[k], dict):
                out[k] = unbox_merge(v, new[k])
            else:
                out[k] = v
        return out

    merged = walk(init_params, params)
    out = model.forward(merged, batch, "val", jax.random.PRNGKey(1))
    mask = np.asarray(batch.prompt.mask)
    assert np.isfinite(np.asarray(out["rollout_traj"])[mask]).all()
