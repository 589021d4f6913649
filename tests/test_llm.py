import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prosim_tpu.models.llm.llama import LlamaConfig, LlamaModel
from prosim_tpu.models.llm.text_attn import LlamaTextAttn
from prosim_tpu.models.llm.tokenizer import (
    ByteTokenizer,
    build_text_prompt,
    tokenize_batch,
)


@pytest.fixture(scope="module")
def tiny_llm():
    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 10)))
    mask = jnp.asarray(np.arange(10)[None] < np.array([[10], [6]]))
    params = model.init(jax.random.PRNGKey(0), ids, None, mask)
    return cfg, model, params, ids, mask


def test_llama_forward_finite(tiny_llm):
    cfg, model, params, ids, mask = tiny_llm
    out = model.apply(params, ids, None, mask)
    assert out.shape == (2, 10, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_llama_causality(tiny_llm):
    """Changing a future token must not change past hidden states."""
    cfg, model, params, ids, mask = tiny_llm
    out1 = model.apply(params, ids, None, mask)
    ids2 = ids.at[0, 7].set((int(ids[0, 7]) + 1) % cfg.vocab_size)
    out2 = model.apply(params, ids2, None, mask)
    np.testing.assert_allclose(
        np.asarray(out1[0, :7]), np.asarray(out2[0, :7]), atol=1e-5
    )
    assert np.abs(np.asarray(out1[0, 7:10]) - np.asarray(out2[0, 7:10])).max() > 1e-4


def test_llama_padding_invariance(tiny_llm):
    cfg, model, params, ids, mask = tiny_llm
    out1 = model.apply(params, ids, None, mask)
    ids2 = ids.at[1, 6:].set(3)  # mutate only padded positions of row 1
    out2 = model.apply(params, ids2, None, mask)
    np.testing.assert_allclose(
        np.asarray(out1[1, :6]), np.asarray(out2[1, :6]), atol=1e-5
    )


def test_lora_params_exist(tiny_llm):
    cfg, model, params, *_ = tiny_llm
    paths = ["/".join(str(getattr(k, "key", k)) for k in p)
             for p, _ in jax.tree_util.tree_leaves_with_path(params)]
    assert any("lora_a" in p for p in paths)
    assert any("q_proj" in p for p in paths)


def test_byte_tokenizer_agent_tokens():
    tok = ByteTokenizer(base_vocab=512, num_agent_tokens=16)
    text = build_text_prompt({3: "stop moving", 7: "turn left"})
    assert "<A3>" in text and "<A7>" in text
    enc = tok.encode(text)
    assert tok.agent_token_id(3) in enc and tok.agent_token_id(7) in enc

    batch = tokenize_batch(tok, [text, ""], max_len=64, num_agents=16)
    assert batch["input_ids"].shape == (2, 64)
    # slots mark the agent positions
    s = batch["agent_slot_ids"][0]
    assert 3 in s and 7 in s
    assert batch["prompt_mask"][0, 3] and batch["prompt_mask"][0, 7]
    assert not batch["token_mask"][1].any()


def test_text_attn_end_to_end():
    """Tokenize -> LlamaTextAttn -> only addressed agents' embeddings move."""
    from prosim_tpu.data.batch import Prompt

    cfg = LlamaConfig.tiny()
    D, N, B = 16, 8, 1
    tok = ByteTokenizer(base_vocab=cfg.vocab_size, num_agent_tokens=cfg.num_agent_tokens)
    text = build_text_prompt({2: "stop moving", 5: "accelerate"})
    tc = tokenize_batch(tok, [text], max_len=48, num_agents=N)
    tc = {k: jnp.asarray(v) for k, v in tc.items()}

    rng = np.random.default_rng(0)
    prompt = Prompt(
        feat=jnp.zeros((B, N, 7)),
        mask=jnp.ones((B, N), bool),
        pos=jnp.asarray(rng.normal(size=(B, N, 2)), jnp.float32),
        ori=jnp.zeros((B, N)),
        agent_type=jnp.ones((B, N), jnp.int32),
        obs_index=jnp.arange(N, dtype=jnp.int32)[None],
        extent=jnp.ones((B, N, 2)),
        goal_point=jnp.zeros((B, N, 2)),
    )
    emb = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)

    mod = LlamaTextAttn(hidden_dim=D, llm_config=cfg)
    params = mod.init(jax.random.PRNGKey(0), tc, emb, prompt)
    out, aux = mod.apply(params, tc, emb, prompt)

    delta = np.abs(np.asarray(out - emb)).max(axis=-1)[0]  # [N]
    assert delta[2] > 1e-6 and delta[5] > 1e-6  # addressed agents move
    untouched = [i for i in range(8) if i not in (2, 5)]
    assert delta[untouched].max() == 0.0  # others unchanged
    assert aux is not None and np.isfinite(float(aux["prompt_mask_pred_loss"]))


def test_condition_transformer_with_llama_text():
    """Full dispatcher: goal conditions + OneText through the tiny Llama."""
    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.condition.transformer import build_condition_transformer

    cfg = get_config(opts=[
        "PROMPT.CONDITION.TYPES", "['goal', 'llm_text_OneText']",
        "MODEL.HIDDEN_DIM", "32",
        "MODEL.CONDITION_TRANSFORMER.NLAYER", "1",
        "MODEL.CONDITION_TRANSFORMER.FF_DIM", "4",
    ])
    batch = make_synthetic_batch(cfg, batch_size=1, num_lanes=8, num_obs_agents=8,
                                 num_agents=6, num_replan=2)
    llm_cfg_tiny = LlamaConfig.tiny()
    tok = ByteTokenizer(base_vocab=llm_cfg_tiny.vocab_size,
                        num_agent_tokens=llm_cfg_tiny.num_agent_tokens)
    tc = tokenize_batch(tok, [build_text_prompt({1: "slow down"})], 32, 6)
    conditions = dict(batch.conditions)
    conditions["llm_text_OneText"] = {k: jnp.asarray(v) for k, v in tc.items()}

    ct = build_condition_transformer(cfg)
    emb = jnp.zeros((1, 6, 32))
    params = ct.init(jax.random.PRNGKey(0), conditions, emb, batch.prompt)
    out, aux = ct.apply(params, conditions, emb, batch.prompt)
    assert out.shape == (1, 6, 32)
    assert np.isfinite(np.asarray(out)).all()
    assert aux is not None


def test_qa_text_attn():
    """QA probing variant (reference: text_attns.py:545-687): answer-span CE
    with agent-embedding injection."""
    from prosim_tpu.data.batch import Prompt
    from prosim_tpu.models.llm.text_attn import LlamaTextAttnQA
    from prosim_tpu.models.llm.tokenizer import build_qa_batch

    cfg = LlamaConfig.tiny()
    D, B, N, L = 8, 2, 3, 128
    tok = ByteTokenizer()
    rng = np.random.default_rng(0)
    gt = rng.normal(scale=10, size=(B, N, 2)).astype(np.float32)
    valid = np.ones((B, N), bool)
    qa = build_qa_batch(tok, gt, valid, L, rng)
    assert (qa["labels"] >= 0).any() and (qa["labels"] == -100).any()
    # the question must mention the queried agent's token
    assert all(
        (qa["agent_slot_ids"][b] == qa["query_agent"][b]).any() for b in range(B)
    )

    attn = LlamaTextAttnQA(hidden_dim=D, llm_config=cfg)
    prompt = Prompt(
        feat=jnp.zeros((B, N, 7)), mask=jnp.ones((B, N), bool),
        pos=jnp.zeros((B, N, 2)), ori=jnp.zeros((B, N)),
        agent_type=jnp.ones((B, N), jnp.int32),
        obs_index=jnp.zeros((B, N), jnp.int32),
        extent=jnp.zeros((B, N, 2)), goal_point=jnp.zeros((B, N, 2)),
    )
    emb = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    qa_j = {k: jnp.asarray(v) for k, v in qa.items()}
    params = attn.init(jax.random.PRNGKey(0), qa_j, emb, prompt)
    out, aux = attn.apply(params, qa_j, emb, prompt)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(emb))
    assert np.isfinite(float(aux["qa_loss"])) and float(aux["qa_loss"]) > 0

    # gradient flows into the agent embedding through the injected tokens
    def loss_fn(e):
        _, a = attn.apply(params, qa_j, e, prompt)
        return a["qa_loss"]

    g = jax.grad(loss_fn)(emb)
    assert np.abs(np.asarray(g)).max() > 0


def test_prompt_token_block_modes():
    """USE_PROMPT_TOKEN block layouts (reference: text_attns.py:261-345) and
    read-at-position output gathering."""
    from prosim_tpu.data.batch import Prompt
    from prosim_tpu.models.llm.text_attn import LlamaTextAttn
    from prosim_tpu.models.llm.tokenizer import append_prompt_block, tokenize_batch

    tok = ByteTokenizer()
    B, N, L = 1, 4, 24
    pm = np.zeros((B, N), bool)
    pm[0, [1, 3]] = True
    base = tokenize_batch(tok, ["go <A1> now"], L, N, pm)

    widths = {"none": 1, "add": 1, "concat": 2, "concat_repeat": 3,
              "concat_sep": 4, "concat_semantic": 4}
    for mode, w in widths.items():
        ext = append_prompt_block(base, tok, mode)
        assert ext["input_ids"].shape == (B, L + w * N)
        rp = ext["read_positions"]
        assert (rp[0, [1, 3]] >= 0).all() and (rp[0, [0, 2]] == -1).all()
        # the read position carries the agent's slot id
        for n in (1, 3):
            assert ext["agent_slot_ids"][0, rp[0, n]] == n
        assert ext["token_mask"][0, L:L + w].sum() == 0  # agent 0 absent

    cfg = LlamaConfig.tiny()
    D = 8
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    prompt = Prompt(
        feat=jnp.zeros((B, N, 7)), mask=jnp.ones((B, N), bool),
        pos=jnp.zeros((B, N, 2)), ori=jnp.zeros((B, N)),
        agent_type=jnp.ones((B, N), jnp.int32),
        obs_index=jnp.zeros((B, N), jnp.int32),
        extent=jnp.zeros((B, N, 2)), goal_point=jnp.zeros((B, N, 2)),
    )
    for mode in ("none", "add"):
        ext = append_prompt_block(base, tok, mode)
        cond = {k: jnp.asarray(v) for k, v in ext.items()}
        attn = LlamaTextAttn(hidden_dim=D, llm_config=cfg, agent_token_mode=mode)
        params = attn.init(jax.random.PRNGKey(0), cond, emb, prompt)
        out, aux = attn.apply(params, cond, emb, prompt)
        out = np.asarray(out)
        ref = np.asarray(emb)
        # addressed agents get a residual; unaddressed stay untouched
        assert np.abs(out[0, [1, 3]] - ref[0, [1, 3]]).max() > 1e-6, mode
        np.testing.assert_array_equal(out[0, [0, 2]], ref[0, [0, 2]])


def test_hf_llama_weight_loader(tmp_path):
    """HF safetensors -> LlamaModel params (reference loads via HF
    AutoModelForCausalLM and resizes embeddings, text_attns.py:78-138)."""
    from safetensors.numpy import save_file

    from prosim_tpu.models.llm.llama import load_hf_llama_params

    cfg = LlamaConfig.tiny(lora_rank=2)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    rng = np.random.default_rng(0)
    hf = {"model.embed_tokens.weight": rng.normal(size=(V, H)).astype(np.float32),
          "model.norm.weight": rng.normal(size=(H,)).astype(np.float32)}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        hf[f"{p}.input_layernorm.weight"] = rng.normal(size=(H,)).astype(np.float32)
        hf[f"{p}.post_attention_layernorm.weight"] = rng.normal(size=(H,)).astype(np.float32)
        hf[f"{p}.self_attn.q_proj.weight"] = rng.normal(size=(cfg.num_heads * cfg.head_dim, H)).astype(np.float32)
        hf[f"{p}.self_attn.k_proj.weight"] = rng.normal(size=(cfg.num_kv_heads * cfg.head_dim, H)).astype(np.float32)
        hf[f"{p}.self_attn.v_proj.weight"] = rng.normal(size=(cfg.num_kv_heads * cfg.head_dim, H)).astype(np.float32)
        hf[f"{p}.self_attn.o_proj.weight"] = rng.normal(size=(H, H)).astype(np.float32)
        hf[f"{p}.mlp.gate_proj.weight"] = rng.normal(size=(I, H)).astype(np.float32)
        hf[f"{p}.mlp.up_proj.weight"] = rng.normal(size=(I, H)).astype(np.float32)
        hf[f"{p}.mlp.down_proj.weight"] = rng.normal(size=(H, I)).astype(np.float32)
    save_file(hf, str(tmp_path / "model-00001-of-00001.safetensors"))

    params = load_hf_llama_params(str(tmp_path), cfg)
    # transposition + vocab extension
    np.testing.assert_allclose(
        params["layer_0"]["q_proj"]["kernel"],
        hf["model.layers.0.self_attn.q_proj.weight"].T,
    )
    emb = params["embed_tokens"]
    assert emb.shape == (cfg.total_vocab, H)
    np.testing.assert_allclose(emb[V:], np.broadcast_to(emb[:V].mean(0), (cfg.num_agent_tokens, H)), rtol=1e-5)
    assert params["layer_0"]["q_proj"]["lora_b"].max() == 0.0

    # structural match with a flax init tree and a working forward
    model = LlamaModel(cfg)
    ids = jnp.asarray(np.arange(12)[None] % V)
    init = jax.tree.map(
        lambda x: np.asarray(getattr(x, "value", x)),
        model.init(jax.random.PRNGKey(0), ids)["params"],
        is_leaf=lambda x: hasattr(x, "value"),
    )
    got = {k: jax.tree.map(np.asarray, v) for k, v in params.items()}
    assert jax.tree.map(np.shape, got) == jax.tree.map(np.shape, init)
    out = model.apply({"params": params}, ids)
    assert np.isfinite(np.asarray(out)).all()


def test_weights_path_loads_into_model(tmp_path):
    """WEIGHTS_PATH end-to-end: ProSim.init pulls the HF weights into the
    condition transformer's llm subtree (reference: text_attns.py:78-94)."""
    from safetensors.numpy import save_file

    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.prosim import ProSim

    cfg_tiny = LlamaConfig.tiny(lora_rank=16)
    H, I, V = cfg_tiny.hidden_size, cfg_tiny.intermediate_size, cfg_tiny.vocab_size
    rng = np.random.default_rng(0)
    hf = {"model.embed_tokens.weight": rng.normal(size=(V, H)).astype(np.float32),
          "model.norm.weight": rng.normal(size=(H,)).astype(np.float32)}
    for i in range(cfg_tiny.num_layers):
        p = f"model.layers.{i}"
        hf[f"{p}.input_layernorm.weight"] = rng.normal(size=(H,)).astype(np.float32)
        hf[f"{p}.post_attention_layernorm.weight"] = rng.normal(size=(H,)).astype(np.float32)
        hf[f"{p}.self_attn.q_proj.weight"] = rng.normal(size=(H, H)).astype(np.float32)
        hf[f"{p}.self_attn.k_proj.weight"] = rng.normal(size=(cfg_tiny.num_kv_heads * cfg_tiny.head_dim, H)).astype(np.float32)
        hf[f"{p}.self_attn.v_proj.weight"] = rng.normal(size=(cfg_tiny.num_kv_heads * cfg_tiny.head_dim, H)).astype(np.float32)
        hf[f"{p}.self_attn.o_proj.weight"] = rng.normal(size=(H, H)).astype(np.float32)
        hf[f"{p}.mlp.gate_proj.weight"] = rng.normal(size=(I, H)).astype(np.float32)
        hf[f"{p}.mlp.up_proj.weight"] = rng.normal(size=(I, H)).astype(np.float32)
        hf[f"{p}.mlp.down_proj.weight"] = rng.normal(size=(H, I)).astype(np.float32)
    save_file(hf, str(tmp_path / "model.safetensors"))

    cfg = get_config(opts=[
        "MODEL.SCENE_ENCODER.ATTN.NUM_LAYER", "1",
        "MODEL.DECODER.ATTN.NUM_LAYER", "1",
        "MODEL.POLICY.ACT_DECODER.ATTN.NUM_LAYER", "1",
        "MODEL.HIDDEN_DIM", "16",
        "MODEL.SCENE_ENCODER.ATTN.FF_DIM", "2",
        "MODEL.DECODER.ATTN.FF_DIM", "2",
        "MODEL.POLICY.ACT_DECODER.ATTN.FF_DIM", "2",
        "MODEL.SCENE_ENCODER.ATTN.MAX_NUM_NEIGH", "4",
        "MODEL.DECODER.ATTN.MAX_NUM_NEIGH", "4",
        "MODEL.POLICY.ACT_DECODER.ATTN.MAX_NUM_NEIGH", "4",
        "PROMPT.CONDITION.TYPES", "['llm_text_OneText']",
        "MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM.MAX_TEXT_TOKENS", "32",
        "MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM.ARCH", "tiny",
        "MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM.WEIGHTS_PATH", str(tmp_path),
    ])
    model = ProSim(cfg)
    batch = make_synthetic_batch(cfg, batch_size=1, num_lanes=8,
                                 num_obs_agents=6, num_agents=4, num_replan=2)
    params = model.init(jax.random.PRNGKey(0), batch)
    llm = params["condition_transformer_policy_decoder"]["text_attn"]["llm"]
    emb = llm["embed_tokens"]
    emb = np.asarray(getattr(emb, "value", emb))
    np.testing.assert_allclose(emb[:V], hf["model.embed_tokens.weight"], atol=1e-6)
    out = model.forward(params, batch, "val", jax.random.PRNGKey(1))
    mask = np.asarray(batch.prompt.mask)
    assert np.isfinite(np.asarray(out["rollout_traj"])[mask]).all()


def test_block_covers_all_valid_agents_by_default():
    """USE_TEXT_PROMPT_MASK=False (reference default): the prompt block holds
    every valid agent, not just the text-addressed set
    (reference: text_attns.py:166-170)."""
    from prosim_tpu.data.text_conditions import build_one_text_condition

    tok = ByteTokenizer()
    N = 5
    pm = np.zeros((1, N), bool)
    pm[0, 1] = True  # text addresses only agent 1
    valid = np.ones((1, N), bool)
    valid[0, 4] = False

    cond = build_one_text_condition(
        tok, ["go <A1>"], pm, 24, use_text_prompt_mask=False, agent_valid=valid
    )
    rp = cond["read_positions"][0]
    assert (rp[:4] >= 0).all() and rp[4] == -1
    # BCE target stays the addressed set
    np.testing.assert_array_equal(cond["prompt_mask"], pm)

    cond2 = build_one_text_condition(
        tok, ["go <A1>"], pm, 24, use_text_prompt_mask=True, agent_valid=valid
    )
    rp2 = cond2["read_positions"][0]
    assert rp2[1] >= 0 and (rp2[[0, 2, 3, 4]] == -1).all()


def test_hf_llama_numerics_parity(tmp_path):
    """JAX Llama vs HuggingFace transformers on identical tiny-config weights
    (VERDICT item 7): hidden-state parity is where RoPE convention, GQA
    repeat order, and RMSNorm placement silently diverge. Weights flow
    through the real `load_hf_llama_params` safetensors path
    (reference contract: text_attns.py:78-138)."""
    import numpy as np
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlamaForCausalLM

    from prosim_tpu.models.llm.llama import LlamaConfig, LlamaModel, load_hf_llama_params

    cfg = LlamaConfig.tiny(lora_rank=0)
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf_lm = HFLlamaForCausalLM(hf_cfg).eval().float()
    hf = hf_lm.model  # the decoder stack ("model.*" keys in the checkpoint)
    hf_lm.save_pretrained(tmp_path, safe_serialization=True)

    params = load_hf_llama_params(str(tmp_path), cfg)
    model = LlamaModel(cfg)

    rng = np.random.default_rng(0)
    B, T = 2, 24
    ids = rng.integers(0, cfg.vocab_size, size=(B, T))
    # right padding on the second row
    mask = np.ones((B, T), bool)
    mask[1, -6:] = False

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    got = np.asarray(model.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    ))

    valid = mask
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-4, rtol=2e-4)


def test_hf_tokenizer_fixture_reference_semantics():
    """The real HF branch (PreTrainedTokenizerFast BPE) on the committed
    tiny fixture, asserting the reference tokenizer contract
    (reference: text_attns.py:122-155): 128 <A{i}> specials appended with
    contiguous ids base_vocab + i, no BOS/EOS, right padding, LEFT
    truncation."""
    import os
    from prosim_tpu.models.llm.tokenizer import HFTokenizer

    path = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_tokenizer")
    tok = HFTokenizer(path)
    assert tok.base_vocab == 384
    # contiguous agent ids, matching the reference's
    # agent_token_id_to_nidx = {base + i: i}
    for i in (0, 1, 11, 127):
        assert tok.agent_token_id(i) == tok.base_vocab + i

    text = build_text_prompt({11: "stop moving", 12: "turn left"})
    ids = tok.encode(text)
    # no BOS/EOS wrapping: all ids are in-vocab text tokens except exactly
    # the two agent specials, which stay single tokens
    agent_ids = [t for t in ids if t >= tok.base_vocab]
    assert agent_ids == [tok.base_vocab + 11, tok.base_vocab + 12]
    assert ids[0] == tok.base_vocab + 11  # nothing prepended before <A11>

    # right padding + mask via tokenize_batch
    tc = tokenize_batch(tok, [text], max_len=64, num_agents=16)
    n = len(ids)
    assert tc["token_mask"][0, :n].all() and not tc["token_mask"][0, n:].any()
    assert (tc["input_ids"][0, n:] == 0).all()
    # agent slots point at the special positions
    assert tc["agent_slot_ids"][0, 0] == 11
    assert (tc["agent_slot_ids"][0] == 12).sum() == 1
    assert tc["prompt_mask"][0, 11] and tc["prompt_mask"][0, 12]

    # LEFT truncation keeps the tail (reference truncation_side='left')
    short = tokenize_batch(tok, [text], max_len=4, num_agents=16)
    np.testing.assert_array_equal(short["input_ids"][0], ids[-4:])


def test_hf_tokenizer_through_text_attn():
    """HF-branch tokens drive LlamaTextAttn end-to-end: agent embedding
    substitution at <A{i}> positions, only addressed agents move."""
    import dataclasses
    import os
    from prosim_tpu.data.batch import Prompt
    from prosim_tpu.models.llm.tokenizer import HFTokenizer

    path = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_tokenizer")
    tok = HFTokenizer(path)
    cfg = dataclasses.replace(LlamaConfig.tiny(), vocab_size=tok.base_vocab)
    assert cfg.total_vocab == tok.vocab_size

    D, N, B = 16, 8, 1
    text = build_text_prompt({2: "stop moving", 5: "accelerate"})
    tc = tokenize_batch(tok, [text], max_len=48, num_agents=N)
    tc = {k: jnp.asarray(v) for k, v in tc.items()}

    rng = np.random.default_rng(0)
    prompt = Prompt(
        feat=jnp.zeros((B, N, 7)),
        mask=jnp.ones((B, N), bool),
        pos=jnp.asarray(rng.normal(size=(B, N, 2)), jnp.float32),
        ori=jnp.zeros((B, N)),
        agent_type=jnp.ones((B, N), jnp.int32),
        obs_index=jnp.arange(N, dtype=jnp.int32)[None],
        extent=jnp.ones((B, N, 2)),
        goal_point=jnp.zeros((B, N, 2)),
    )
    emb = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)

    mod = LlamaTextAttn(hidden_dim=D, llm_config=cfg)
    params = mod.init(jax.random.PRNGKey(0), tc, emb, prompt)
    out, aux = mod.apply(params, tc, emb, prompt)

    delta = np.abs(np.asarray(out - emb)).max(axis=-1)[0]
    assert delta[2] > 1e-6 and delta[5] > 1e-6
    untouched = [i for i in range(N) if i not in (2, 5)]
    assert delta[untouched].max() == 0.0
