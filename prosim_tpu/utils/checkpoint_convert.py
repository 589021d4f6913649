"""Torch-Lightning checkpoint -> prosim_tpu params converter.

The reference releases Lightning checkpoints whose state_dict keys follow its
module tree (reference: prosim/models/base.py:134-147 strips the frozen
llm_model while keeping LoRA). This module maps those keys onto the flax
param pytree built by prosim_tpu.models.prosim.ProSim so released weights can
drive the TPU engine.

Key mapping rules (torch -> flax):
  Linear  weight [out, in] -> kernel [in, out] (transposed), bias -> bias
  LayerNorm weight/bias    -> scale/bias
  Embedding weight         -> embedding
  MLP(nn.Sequential) index -> dense_i / norm_i by position
  scene_encoder.{a2a,s2s}_attn_layers.N.X -> scene_encoder/{a2a,s2s}_N/X
  AttentionLayer fields    -> prenorm_src/prenorm_dst/prenorm_r/to_q/.../ff_*
"""

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _mlp_index(seq_idx: int, without_norm: bool) -> Tuple[str, int]:
    """Sequential position -> (kind, layer index) for the reference MLP
    (reference: prosim/models/layers/mlp.py:475-494): pattern per hidden layer
    is Linear, [LayerNorm,] ReLU; final Linear [, ReLU]."""
    period = 2 if without_norm else 3
    layer, rem = divmod(seq_idx, period)
    if rem == 0:
        return "dense", layer
    if rem == 1 and not without_norm:
        return "norm", layer
    raise KeyError(f"sequential index {seq_idx} is an activation")


_ATTN_FIELD = {
    "attn_prenorm_x_src": "prenorm_src",
    "attn_prenorm_x_dst": "prenorm_dst",
    "attn_prenorm_r": "prenorm_r",
    "attn_postnorm": "postnorm",
    "ff_prenorm": "ff_prenorm",
    "ff_postnorm": "ff_postnorm",
    "to_q": "to_q",
    "to_k": "to_k",
    "to_v": "to_v",
    "to_k_r": "to_k_r",
    "to_v_r": "to_v_r",
    "to_s": "to_s",
    "to_g": "to_g",
    "to_out": "to_out",
    "ff_mlp.0": "ff_dense0",
    "ff_mlp.3": "ff_dense1",
}

_ATTN_STACKS = {
    "scene_encoder.a2a_attn_layers": ("scene_encoder", "a2a"),
    "scene_encoder.s2s_attn_layers": ("scene_encoder", "s2s"),
    "decoder.p2p_attn_layers": ("decoder", "p2p"),
    "decoder.s2p_attn_layers": ("decoder", "s2p"),
    "policy.act_decoder.a2p_attn_layers": ("policy", "a2p"),
    "policy.act_decoder.m2p_attn_layers": ("policy", "m2p"),
}

_POINTNETS = {
    "scene_encoder.map_encoder": ("scene_encoder", "map_encoder", "pointnet"),
    "scene_encoder.obs_encoder": ("scene_encoder", "obs_encoder", "pointnet"),
}


def _convert_tensor(name: str, value: np.ndarray, is_linear: bool):
    if name == "weight":
        if is_linear and value.ndim == 2:
            return "kernel", value.T
        return "scale", value  # LayerNorm
    if name == "bias":
        return "bias", value
    if name == "weight_embedding":
        return "embedding", value
    return name, value


def _put(tree: dict, path: Tuple[str, ...], leaf_name: str, value: np.ndarray,
         kind: str):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    new_name, new_val = _convert_tensor(leaf_name, value, is_linear=(kind == "linear"))
    node[new_name] = np.asarray(new_val)


def _map_mlp_key(rest: str, without_norm: bool = False) -> Optional[Tuple[str, str]]:
    """'mlp.3.weight' -> ('dense_1', 'weight')."""
    m = re.match(r"mlp\.(\d+)\.(weight|bias)$", rest)
    if not m:
        return None
    kind, layer = _mlp_index(int(m.group(1)), without_norm)
    return f"{kind}_{layer}", m.group(2)


def convert_state_dict(sd: Dict[str, np.ndarray],
                       strict: bool = False) -> Tuple[dict, list]:
    """Map a reference ProSim state_dict into the flax params tree layout.

    Returns (params, unmapped_keys). Keys under the frozen LLM body are
    expected to be absent (on_save_checkpoint strips them); LoRA keys map to
    the JAX Llama LoRA leaves.
    """
    params: dict = {}
    unmapped = []

    for key, value in sd.items():
        value = np.asarray(value)
        mapped = False

        # attention stacks
        for prefix, (top, short) in _ATTN_STACKS.items():
            m = re.match(rf"{re.escape(prefix)}\.(\d+)\.(.+)\.(weight|bias)$", key)
            if not m:
                continue
            idx, field, leaf = m.group(1), m.group(2), m.group(3)
            if field not in _ATTN_FIELD:
                break
            flax_field = _ATTN_FIELD[field]
            is_linear = flax_field.startswith(("to_", "ff_dense"))
            _put(
                params,
                (top, f"{short}_{idx}", flax_field),
                leaf,
                value,
                "linear" if is_linear else "norm",
            )
            mapped = True
            break
        if mapped:
            continue

        # pointnet encoders
        for prefix, path in _POINTNETS.items():
            m = re.match(
                rf"{re.escape(prefix)}\.(pre_mlps|mlps|out_mlps)\.(.+)$", key
            )
            if not m:
                continue
            block, rest = m.group(1), m.group(2)
            hit = _map_mlp_key(rest, without_norm=(block == "out_mlps"))
            if hit is None:
                break
            sub, leaf = hit
            _put(params, path + (block, sub), leaf, value, "linear" if leaf == "weight" and "dense" in sub else ("linear" if "dense" in sub else "norm"))
            mapped = True
            break
        if mapped:
            continue

        # prompt encoder state MLP
        m = re.match(r"prompt_encoder\.motion_pred\.state_encoder\.(.+)$", key)
        if m:
            hit = _map_mlp_key(m.group(1))
            if hit:
                sub, leaf = hit
                _put(params, ("prompt_encoder", "state_encoder", sub), leaf, value,
                     "linear" if "dense" in sub else "norm")
                continue

        # policy heads
        m = re.match(r"policy\.act_decoder\.motion_head\.(.+)$", key)
        if m:
            hit = _map_mlp_key(m.group(1))
            if hit:
                sub, leaf = hit
                _put(params, ("policy", "motion_head", sub), leaf, value,
                     "linear" if "dense" in sub else "norm")
                continue
        if key == "policy.act_decoder.motion_anchors.weight":
            _put(params, ("policy", "motion_anchors"), "weight_embedding", value, "embed")
            continue
        m = re.match(r"policy\.act_decoder\.pred_mlp\.(.+)$", key)
        if m:
            hit = _map_mlp_key(m.group(1))
            if hit:
                sub, leaf = hit
                _put(params, ("policy", "pred_mlp", sub), leaf, value,
                     "linear" if "dense" in sub else "norm")
                continue
        m = re.match(r"policy\.act_decoder\.CG_decode\.CGs\.(\d+)\.MLP\.(0|1)\.(weight|bias)$", key)
        if m:
            idx, pos, leaf = m.groups()
            sub = "dense" if pos == "0" else "norm"
            _put(params, ("policy", "cg_decode", f"block_{idx}", sub), leaf, value,
                 "linear" if sub == "dense" else "norm")
            continue

        # --- text/LLM subsystem (text_attns.py:63-74 projections; peft LoRA
        # keys kept by on_save_checkpoint, models/base.py:134-139) ---
        m = re.match(
            r"condition_transformers\.(\w+)\.text_attn\.(.+)$", key
        )
        if m:
            loc, rest = m.group(1), m.group(2)
            base = (f"condition_transformer_{loc}", "text_attn")
            hit = None
            for torch_name, flax_name, wn in (
                ("prompt_to_llm", "prompt_to_llm", False),
                ("llm_to_cond", "llm_to_cond", False),
                ("prompt_mask_pred", "mask_pred_head", True),
            ):
                mm = re.match(rf"{torch_name}\.(.+)$", rest)
                if mm:
                    hit = _map_mlp_key(mm.group(1), without_norm=wn)
                    if hit:
                        sub, leaf = hit
                        _put(params, base + (flax_name, sub), leaf, value,
                             "linear" if "dense" in sub else "norm")
                    break
            if hit:
                continue
            mm = re.match(r"ln_prompt\.(weight|bias)$", rest)
            if mm:
                _put(params, base + ("ln_prompt",), mm.group(1), value, "norm")
                continue
            # peft LoRA: lora_A [r, in] / lora_B [out, r] -> lora_a [in, r] /
            # lora_b [r, out]
            mm = re.match(
                r"llm_model\.(?:base_model\.model\.)?model\.layers\.(\d+)\."
                r"self_attn\.([qkv]_proj)\.lora_(A|B)\.(?:default\.)?weight$",
                rest,
            )
            if mm:
                layer, proj, ab = mm.groups()
                leaf = "lora_a" if ab == "A" else "lora_b"
                _put(params, base + ("llm", f"layer_{layer}", proj),
                     leaf, value.T, "raw")
                continue
            mm = re.match(
                r"llm_model\.(?:base_model\.model\.)?model\.embed_tokens\."
                r"lora_embedding_(A|B)(?:\.default)?$",
                rest,
            )
            if mm:
                # peft embedding LoRA: A [r, V], B [H, r] -> [V, r] / [r, H]
                leaf = "lora_embed_a" if mm.group(1) == "A" else "lora_embed_b"
                _put(params, base + ("llm",), leaf, value.T, "raw")
                continue

        unmapped.append(key)

    if strict and unmapped:
        raise KeyError(f"unmapped checkpoint keys: {unmapped[:10]} (+{len(unmapped)-10 if len(unmapped)>10 else 0})")
    return params, unmapped


def load_reference_checkpoint(path: str, strict: bool = False):
    """Load a torch Lightning .ckpt and convert its state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    np_sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    return convert_state_dict(np_sd, strict=strict)
