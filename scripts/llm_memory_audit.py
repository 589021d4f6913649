"""Llama3-8B-on-v5e feasibility audit (VERDICT r2 task 8).

Accounts, byte-for-byte, for whether Llama3-8B text conditioning + the
ProSim policy model fit a 16 GB v5e chip at the demo batch under the
shipped TP shardings — without materializing any weights: parameter shapes
come from `jax.eval_shape` over the real `LlamaModel.init`, and the per-chip
split is read from each leaf's `nn.with_partitioning` metadata (the same
annotations `parallel/mesh.py` turns into NamedShardings at run time).

Writes docs/evidence/llm_memory_audit.json and prints a human table.

Usage: python scripts/llm_memory_audit.py [--tp 8] [--batch 64] [--tokens 256]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from prosim_tpu.models.llm.llama import LlamaConfig, LlamaModel

GB = 1024 ** 3


def _leaf_bytes(leaf, tp):
    """(total_bytes, per_chip_bytes, trainable) for one abstract param leaf.

    Frozen LLM body weights live in bf16 (as `load_hf_llama_params` delivers
    them); trainable LoRA leaves stay fp32 and pay 2 Adam moments each."""
    if isinstance(leaf, nn.Partitioned):
        axes = leaf.names
        val = leaf.value
    else:
        axes = (None,) * getattr(leaf, "ndim", 0)
        val = leaf
    n = int(np.prod(val.shape)) if val.shape else 1
    shard = tp if "model" in axes else 1
    return n, n // shard, axes


def audit(tp=8, batch=64, tokens=256, prompt_slots=128, lora_rank=16):
    cfg = LlamaConfig.llama3_8b(lora_rank=lora_rank)
    model = LlamaModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids)

    rows = []
    tot_frozen = tot_frozen_chip = tot_train = tot_train_chip = 0
    flat = nn.traverse_util = None  # placeholder to appease linters
    from flax.traverse_util import flatten_dict

    for path, leaf in flatten_dict(abstract["params"]).items():
        name = "/".join(path)
        n, n_chip, axes = _leaf_bytes(leaf, tp)
        trainable = "lora" in name
        if trainable:
            # fp32 master + Adam m/v (only LoRA trains; the body is frozen
            # and stripped from opt_state, train/trainer.py LLM-body strip)
            tot_train += n * 4 * 3
            tot_train_chip += n_chip * 4 * 3
        else:
            tot_frozen += n * 2
            tot_frozen_chip += n_chip * 2
        rows.append((name, n, axes, trainable))

    c = cfg
    T = tokens + prompt_slots          # text tokens + appended prompt tokens
    B = batch

    # ---- activations, bf16, per chip (hidden replicated, intermediate and
    # per-head tensors split over TP)
    x_bytes = B * T * c.hidden_size * 2                     # one residual
    qkv = B * T * (c.num_heads + 2 * c.num_kv_heads) * c.head_dim * 2 // tp
    mlp = 2 * B * T * c.intermediate_size * 2 // tp         # gate + up
    # flash attention: no [B, H, T, T] score tensor is ever materialized
    per_layer_live = x_bytes + qkv + mlp

    fwd_only = x_bytes + per_layer_live          # streaming: ~2 layers live
    # backward WITHOUT remat: XLA keeps every layer's residual + qkv + mlp
    bwd_no_remat = c.num_layers * per_layer_live
    # backward WITH remat (cfg.remat=True for llama3_8b): one saved residual
    # per layer + one layer recomputed live
    bwd_remat = c.num_layers * x_bytes + per_layer_live

    # ---- the policy model riding along (demo arch, fp32 + Adam)
    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.prosim import ProSim

    pcfg = get_config(opts=["PROMPT.CONDITION.TYPES", "[]"])
    pmodel = ProSim(pcfg)
    tiny = make_synthetic_batch(pcfg, batch_size=1, num_lanes=64,
                                num_obs_agents=8, num_agents=8, num_replan=2)
    p_abs = jax.eval_shape(pmodel.init, jax.random.PRNGKey(0), tiny)
    p_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p_abs))
    policy_bytes = p_params * 4 * 3                       # fp32 + Adam m/v

    report = {
        "config": "llama3_8b lora_rank=%d" % lora_rank,
        "tp": tp, "batch": B, "text_tokens": tokens,
        "prompt_slots": prompt_slots,
        "frozen_params": tot_frozen // 2,
        "trainable_params": tot_train // 12,
        "gb_per_chip": {
            "llm_weights_bf16": round(tot_frozen_chip / GB, 3),
            "lora_fp32_plus_adam": round(tot_train_chip / GB, 3),
            "policy_model_fp32_plus_adam": round(policy_bytes / GB, 3),
            "activations_forward_only": round(fwd_only / GB, 3),
            "activations_backward_no_remat": round(bwd_no_remat / GB, 3),
            "activations_backward_remat": round(bwd_remat / GB, 3),
        },
    }
    g = report["gb_per_chip"]
    report["total_train_remat_gb_per_chip"] = round(
        g["llm_weights_bf16"] + g["lora_fp32_plus_adam"]
        + g["policy_model_fp32_plus_adam"]
        + g["activations_backward_remat"], 3)
    report["total_rollout_gb_per_chip"] = round(
        g["llm_weights_bf16"] + g["policy_model_fp32_plus_adam"] / 3
        + g["activations_forward_only"], 3)
    report["chip_hbm_gb"] = 16.0
    report["fits_training"] = report["total_train_remat_gb_per_chip"] < 16.0
    report["fits_rollout"] = report["total_rollout_gb_per_chip"] < 16.0

    # sanity: every big matmul weight actually carries the TP axis
    unsharded_big = [
        (name, n) for name, n, axes, _ in rows
        if n * 2 > 64 * 1024 * 1024 and "model" not in axes
    ]
    report["unsharded_leaves_over_64mb"] = [n for n, _ in unsharded_big]
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tokens", type=int, default=256)
    args = ap.parse_args()
    report = audit(tp=args.tp, batch=args.batch, tokens=args.tokens)

    out = Path(__file__).parent.parent / "docs" / "evidence"
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "llm_memory_audit.json", "w") as f:
        json.dump(report, f, indent=2)

    print(f"Llama3-8B TP={args.tp} on v5e (16 GB/chip), "
          f"B={args.batch}, T={args.tokens}+{report['prompt_slots']}")
    for k, v in report["gb_per_chip"].items():
        print(f"  {k:36s} {v:8.3f} GB")
    print(f"  {'TOTAL train (remat)':36s} "
          f"{report['total_train_remat_gb_per_chip']:8.3f} GB  "
          f"fits={report['fits_training']}")
    print(f"  {'TOTAL rollout (fwd only)':36s} "
          f"{report['total_rollout_gb_per_chip']:8.3f} GB  "
          f"fits={report['fits_rollout']}")
    if report["unsharded_leaves_over_64mb"]:
        print("  WARNING unsharded >64MB leaves:",
              report["unsharded_leaves_over_64mb"])


if __name__ == "__main__":
    main()
