"""Llama3 decoder in JAX with tensor-parallel sharding and LoRA.

TPU-native replacement for the reference's HF torch Llama3-8B-Instruct text
encoder (reference: prosim/models/condition_transformer/text_attns.py:78-543).
The reference shards layers across GPUs with HF device_map='auto' (naive
pipeline); here attention/MLP weights carry Megatron-style logical shardings
over the mesh 'model' axis (qkv/gate/up column-split, o/down row-split) so an
8B model runs tensor-parallel over ICI on a v5e-8.

Architecture: RMSNorm, rotary embeddings, grouped-query attention, SwiGLU.
`LlamaConfig.llama3_8b()` matches the released checkpoint; `tiny()` is for
tests. LoRA adapters (q/k/v + embedding) follow the reference's PEFT setup
(text_attns.py:96-120); base weights can be loaded frozen from converted
checkpoints while only LoRA/adapter params train.
"""

import dataclasses
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp



@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    num_agent_tokens: int = 128  # extra <A{i}> tokens appended to the vocab
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    lora_rank: int = 0
    lora_alpha: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    # rematerialize each block on the backward pass: activation memory drops
    # from every-layer-saved to one-layer-live + per-layer residuals, the
    # difference between Llama3-8B LoRA training fitting a 16 GB chip or not
    # (see scripts/llm_memory_audit.py); forward-only use is unaffected
    remat: bool = False

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def total_vocab(self):
        return self.vocab_size + self.num_agent_tokens

    @classmethod
    def llama3_8b(cls, lora_rank=16):
        return cls(lora_rank=lora_rank, remat=True)

    @classmethod
    def tiny(cls, lora_rank=4):
        return cls(
            vocab_size=512,
            num_agent_tokens=128,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            lora_rank=lora_rank,
            dtype=jnp.float32,
        )


def _rope(x, positions, theta):
    """Rotary embedding, HF half-split (`rotate_half`) convention - the
    layout HF-format checkpoints assume (their conversion permutes q/k rows
    from Meta's interleaved layout). x [B, T, H, D]; positions [B, T].
    Verified bit-parity vs transformers in tests/test_llm.py."""
    d = x.shape[-1]
    freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions[..., None].astype(jnp.float32) * freq  # [B, T, D/2]
    cos, sin = jnp.cos(ang)[:, :, None, :], jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(self.dtype) * scale


class LoraDense(nn.Module):
    """Dense with optional LoRA: y = x W + (alpha/r) x A B; W frozen-able."""

    features: int
    lora_rank: int = 0
    lora_alpha: float = 0.1
    use_bias: bool = False
    kernel_axes: tuple = (None, None)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.with_partitioning(
                nn.initializers.lecun_normal(), self.kernel_axes
            ),
            (in_dim, self.features),
        )
        y = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        if self.lora_rank > 0:
            a = self.param(
                "lora_a", nn.initializers.normal(0.02), (in_dim, self.lora_rank)
            )
            b = self.param("lora_b", nn.initializers.zeros, (self.lora_rank, self.features))
            y = y + jnp.dot(jnp.dot(x, a.astype(self.dtype)), b.astype(self.dtype)) * (
                self.lora_alpha / self.lora_rank
            )
        return y


def _causal_attention(q, k, v, token_mask, cfg: LlamaConfig, initializing: bool):
    """Causal self-attention over [B, T, H, D] with a [B, T] validity mask.

    On TPU with production head_dim the Pallas flash-attention kernel runs
    (no [B, H, T, T] materialization - the reference's dense f32 softmax was
    the long-prompt memory wall, text_attns.py runs HF's fused kernels); the
    dense path is the fallback for CPU/tests and the parity oracle."""
    B, T, H, D = q.shape
    use_flash = (
        not initializing
        and jax.default_backend() == "tpu"
        and D % 128 == 0
        and T >= 128
    )
    scale = 1.0 / float(D) ** 0.5
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        pad = (-T) % 128
        qf = jnp.swapaxes(q, 1, 2)  # [B, H, T, D]
        kf = jnp.swapaxes(k, 1, 2)
        vf = jnp.swapaxes(v, 1, 2)
        seg = token_mask.astype(jnp.int32)  # pads -> segment 0, valid -> 1
        if pad:
            zpad = ((0, 0), (0, 0), (0, pad), (0, 0))
            qf = jnp.pad(qf, zpad)
            kf = jnp.pad(kf, zpad)
            vf = jnp.pad(vf, zpad)
            seg = jnp.pad(seg, ((0, 0), (0, pad)))
        out = flash_attention(
            qf, kf, vf, segment_ids=SegmentIds(q=seg, kv=seg),
            causal=True, sm_scale=scale,
        )
        return jnp.swapaxes(out[:, :, :T], 1, 2)

    causal = jnp.tril(jnp.ones((T, T), bool))
    mask = causal[None] & token_mask[:, None, :]
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    att = jnp.where(mask[:, None], att, -1e30)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", att, v)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, attn_mask):
        """attn_mask [B, T] bool token validity; causal masking is applied
        internally (flash kernel or dense fallback)."""
        c = self.cfg
        h = RMSNorm(c.rms_eps, c.dtype, name="input_norm")(x)

        lora = dict(lora_rank=c.lora_rank, lora_alpha=c.lora_alpha, dtype=c.dtype)
        q = LoraDense(c.num_heads * c.head_dim, kernel_axes=(None, "model"),
                      name="q_proj", **lora)(h)
        k = LoraDense(c.num_kv_heads * c.head_dim, kernel_axes=(None, "model"),
                      name="k_proj", **lora)(h)
        v = LoraDense(c.num_kv_heads * c.head_dim, kernel_axes=(None, "model"),
                      name="v_proj", **lora)(h)
        B, T = h.shape[:2]
        q = _rope(q.reshape(B, T, c.num_heads, c.head_dim), positions, c.rope_theta)
        k = _rope(k.reshape(B, T, c.num_kv_heads, c.head_dim), positions, c.rope_theta)
        v = v.reshape(B, T, c.num_kv_heads, c.head_dim)

        rep = c.num_heads // c.num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

        out = _causal_attention(q, k, v, attn_mask, c, self.is_initializing())
        out = out.reshape(B, T, -1)
        out = LoraDense(c.hidden_size, kernel_axes=("model", None),
                        lora_rank=0, dtype=c.dtype, name="o_proj")(out)
        x = x + out

        h = RMSNorm(c.rms_eps, c.dtype, name="post_attn_norm")(x)
        gate = LoraDense(c.intermediate_size, kernel_axes=(None, "model"),
                         lora_rank=0, dtype=c.dtype, name="gate_proj")(h)
        up = LoraDense(c.intermediate_size, kernel_axes=(None, "model"),
                       lora_rank=0, dtype=c.dtype, name="up_proj")(h)
        down = LoraDense(c.hidden_size, kernel_axes=("model", None),
                         lora_rank=0, dtype=c.dtype, name="down_proj")(
            nn.silu(gate) * up
        )
        return x + down


class LlamaModel(nn.Module):
    """Decoder stack returning final hidden states (no LM head needed for the
    text-conditioning use)."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, input_ids=None, inputs_embeds=None, attention_mask=None,
                 agent_embs=None, agent_slot_ids=None, return_logits=False,
                 extra_embeds=None, extra_mask=None, agent_add_mode=False):
        """Either input_ids or inputs_embeds. When (agent_embs [B,N,H],
        agent_slot_ids [B,T]) are given, <A{i}> token embeddings are replaced
        by the per-agent vectors (REPLACE_AGENT_TOKEN semantics). When
        extra_embeds [B, P, H] (+extra_mask [B, P]) is given, it is appended
        after the token sequence (the reference's USE_PROMPT_TOKEN block,
        text_attns.py:261-345); returned hidden states cover T + P positions."""
        c = self.cfg
        embed = self.param(
            "embed_tokens",
            nn.with_partitioning(nn.initializers.normal(0.02), ("model", None)),
            (c.total_vocab, c.hidden_size),
        )
        if c.lora_rank > 0:
            # LoRA on the embedding table (reference LoRA targets
            # q/k/v/embed_tokens, text_attns.py:96-120): W + (a/r) A @ B.
            # The delta is applied per GATHERED row (take(A) @ B), never as a
            # materialized [V, H] dense table: at Llama3-8B that intermediate
            # alone is total_vocab x hidden x 4B = 2.1 GB of HBM per forward.
            la = self.param(
                "lora_embed_a", nn.initializers.normal(0.02),
                (c.total_vocab, c.lora_rank),
            )
            lb = self.param(
                "lora_embed_b", nn.initializers.zeros,
                (c.lora_rank, c.hidden_size),
            )

            def lookup(ids):
                base = jnp.take(embed, ids, axis=0)
                delta = jnp.take(la, ids, axis=0) @ lb
                return (base + (c.lora_alpha / c.lora_rank) * delta).astype(
                    c.dtype)
        else:
            def lookup(ids):
                return jnp.take(embed.astype(c.dtype), ids, axis=0)
        if inputs_embeds is None:
            base_embeds = lookup(input_ids)
            if agent_embs is not None and agent_slot_ids is not None:
                inputs_embeds = embed_with_agent_tokens(
                    base_embeds, None,
                    agent_embs.astype(c.dtype), agent_slot_ids,
                    add_mode=agent_add_mode,
                )
            else:
                inputs_embeds = base_embeds
        x = inputs_embeds.astype(c.dtype)
        if attention_mask is None:
            attention_mask = jnp.ones(x.shape[:2], bool)
        if extra_embeds is not None:
            x = jnp.concatenate([x, extra_embeds.astype(c.dtype)], axis=1)
            if extra_mask is None:
                extra_mask = jnp.ones(extra_embeds.shape[:2], bool)
            attention_mask = jnp.concatenate([attention_mask, extra_mask], axis=1)
        B, T = x.shape[:2]
        positions = jnp.cumsum(attention_mask, axis=-1) - 1

        block_cls = nn.remat(LlamaBlock) if c.remat else LlamaBlock
        for i in range(c.num_layers):
            x = block_cls(c, name=f"layer_{i}")(x, positions, attention_mask)
        x = RMSNorm(c.rms_eps, c.dtype, name="final_norm")(x)
        if return_logits:
            # untied LM head (Llama3 convention); sharded like the embedding
            lm_head = self.param(
                "lm_head",
                nn.with_partitioning(nn.initializers.normal(0.02), (None, "model")),
                (c.hidden_size, c.total_vocab),
            )
            return x, jnp.dot(x, lm_head.astype(c.dtype))
        return x


def embed_with_agent_tokens(base_or_table, input_ids, agent_embs,
                            agent_slot_ids, add_mode=False):
    """Token embeddings with <A{i}> rows replaced by per-agent vectors.

    base_or_table: gathered base embeddings [B, T, H] (pass input_ids=None),
    or an embedding table [V, H] with input_ids [B, T] to gather here.
    agent_embs [B, N, H] projected policy embeddings; agent_slot_ids [B, T] =
    agent index at each position or -1 (reference REPLACE_AGENT_TOKEN,
    text_attns.py:395-422). With add_mode the agent vector is added onto the
    token embedding instead of replacing it (AGENT_TOKEN_MODE='add',
    text_attns.py:266-270)."""
    if input_ids is None:
        base = base_or_table                              # [B, T, H]
    else:
        base = jnp.take(base_or_table, input_ids, axis=0)  # [B, T, H]
    safe = jnp.clip(agent_slot_ids, 0, agent_embs.shape[1] - 1)
    repl = jnp.take_along_axis(agent_embs, safe[..., None], axis=1)
    if add_mode:
        repl = base + repl
    return jnp.where((agent_slot_ids >= 0)[..., None], repl, base)

def load_hf_llama_params(path, cfg: LlamaConfig, rng_seed: int = 0,
                         with_lm_head: bool = False) -> dict:
    """Load HF-format Llama weights (safetensors shards) into the LlamaModel
    params layout (reference loads via AutoModelForCausalLM + resizes the
    embedding for the 128 agent tokens, text_attns.py:78-138).

    `path` is a directory containing *.safetensors (HF hub layout). The
    embedding/LM head rows for the agent tokens are initialized from the
    mean embedding (HF resize_token_embeddings convention). LoRA leaves, when
    cfg.lora_rank > 0, are freshly initialized (A ~ N(0, 0.02), B = 0).
    """
    import glob as _glob
    import os

    import numpy as np
    from safetensors import safe_open

    shards = sorted(_glob.glob(os.path.join(path, "*.safetensors")))
    if not shards:
        raise FileNotFoundError(f"no .safetensors under {path}")

    tensors = {}
    for shard in shards:
        with safe_open(shard, framework="numpy") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)

    def t(key):
        if key not in tensors:
            raise KeyError(f"missing weight '{key}' in {path}")
        return np.asarray(tensors[key])

    def extend_vocab(w):
        # [V, H] -> [V + num_agent_tokens, H]; new rows = mean row
        mean = w.mean(axis=0, keepdims=True)
        extra = np.repeat(mean, cfg.num_agent_tokens, axis=0)
        return np.concatenate([w.astype(np.float32), extra.astype(np.float32)], 0)

    rng = np.random.default_rng(rng_seed)
    params = {"embed_tokens": extend_vocab(t("model.embed_tokens.weight")),
              "final_norm": {"scale": t("model.norm.weight")}}
    if cfg.lora_rank > 0:
        params["lora_embed_a"] = rng.normal(
            0, 0.02, (cfg.total_vocab, cfg.lora_rank)).astype(np.float32)
        params["lora_embed_b"] = np.zeros(
            (cfg.lora_rank, cfg.hidden_size), np.float32)

    for i in range(cfg.num_layers):
        hf = f"model.layers.{i}"
        layer = {
            "input_norm": {"scale": t(f"{hf}.input_layernorm.weight")},
            "post_attn_norm": {"scale": t(f"{hf}.post_attention_layernorm.weight")},
        }
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            layer[proj] = {"kernel": t(f"{hf}.self_attn.{proj}.weight").T}
        for proj in ("gate_proj", "up_proj", "down_proj"):
            layer[proj] = {"kernel": t(f"{hf}.mlp.{proj}.weight").T}
        if cfg.lora_rank > 0:
            for proj in ("q_proj", "k_proj", "v_proj"):
                in_dim = layer[proj]["kernel"].shape[0]
                out_dim = layer[proj]["kernel"].shape[1]
                layer[proj]["lora_a"] = rng.normal(
                    0, 0.02, (in_dim, cfg.lora_rank)).astype(np.float32)
                layer[proj]["lora_b"] = np.zeros(
                    (cfg.lora_rank, out_dim), np.float32)
        params[f"layer_{i}"] = layer

    if with_lm_head:
        lm = tensors.get("lm_head.weight")
        if lm is None:  # tied embeddings
            lm = t("model.embed_tokens.weight")
        params["lm_head"] = extend_vocab(np.asarray(lm)).T
    return params
