"""Text conditioning must be LIVE end-to-end: a sampled llm_text_OneText
condition must (a) change the model's forward output, (b) pass training
gradient into the text-attention subtree (prompt_to_llm / llm_to_cond / LoRA),
and (c) the gradient into llm_to_cond must depend on WHICH agents the text
addresses.

Round-3 verdict found the trained text row produced zero behavioral effect
(docs/evidence/prompt_ade.json text_1.0 = -0.13% vs the reference's +26.96%,
reference live path prosim/models/condition_transformer/text_attns.py:424-543).
These tests pin down that the wiring itself is live, so a flat trained result
can only mean undertraining, not a dead path.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from prosim_tpu.config import get_config  # noqa: E402
from prosim_tpu.data.dataset import ProSimImitationDataset  # noqa: E402
from prosim_tpu.models.prosim import ProSim  # noqa: E402
from prosim_tpu.train.losses import loss_func_dict  # noqa: E402

CACHE = "/root/reference/demo_dataset/trajdata_cache"

pytestmark = pytest.mark.skipif(not os.path.isdir(CACHE),
                                reason="demo trajdata cache absent")

SMALL = [
    "DATASET.SOURCE.TRAIN", "['waymo_train']",
    "PROMPT.CONDITION.TYPES", "['llm_text_OneText']",
    "PROMPT.CONDITION.SAMPLE_MODE.TRAIN", "fix",
    "PROMPT.CONDITION.RANDOM_SAMPLE.TRAIN", "True",
    "PROMPT.CONDITION.SAMPLE_RATE", "1.0",
    "DATASET.FORMAT.MAP.MAX_POINTS", "128",
    "DATASET.FORMAT.PAD.NUM_LANES", "128",
    "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", "24",
    "DATASET.FORMAT.PAD.NUM_AGENTS", "16",
    "DATASET.AGENT.SCENE_MAX_AGENT", "16",
    "MODEL.HIDDEN_DIM", "32",
    "MODEL.SCENE_ENCODER.ATTN.NUM_LAYER", "1",
    "MODEL.DECODER.ATTN.NUM_LAYER", "1",
    "MODEL.POLICY.ACT_DECODER.ATTN.NUM_LAYER", "1",
    "MODEL.SCENE_ENCODER.ATTN.MAX_NUM_NEIGH", "8",
    "MODEL.DECODER.ATTN.MAX_NUM_NEIGH", "8",
    "MODEL.POLICY.ACT_DECODER.ATTN.MAX_NUM_NEIGH", "8",
]


@pytest.fixture(scope="module")
def setup():
    config = get_config(opts=SMALL)
    ds = ProSimImitationDataset(config, "train", CACHE)
    # find a scene+seed whose sampled text addresses >= 1 agent
    for idx in range(min(len(ds), 8)):
        batch = ds.get_scene_batch(idx, seed=idx, device=False)
        tc = batch.conditions.get("llm_text_OneText")
        if isinstance(tc, dict) and bool(np.asarray(tc["prompt_mask"]).any()):
            break
    else:
        pytest.fail("no demo scene sampled a text condition")
    batch = jax.tree.map(jnp.asarray, batch)
    model = ProSim(config)
    params = model.init(jax.random.PRNGKey(0), batch)
    return config, model, params, batch


def _text_subtree(params):
    for k, v in params.items():
        if k.startswith("condition_transformer") and "text_attn" in v:
            return k, v["text_attn"]
    raise AssertionError("no text_attn params found")


def test_text_changes_forward_output(setup):
    config, model, params, batch = setup
    out_with = model.forward(params, batch, "val", jax.random.PRNGKey(1))
    no_text = batch.replace(
        conditions={k: v for k, v in batch.conditions.items()
                    if k != "llm_text_OneText"})
    out_without = model.forward(params, no_text, "val", jax.random.PRNGKey(1))
    delta = float(jnp.abs(
        out_with["rollout_traj"] - out_without["rollout_traj"]).max())
    assert delta > 1e-4, f"text condition has no effect on rollout ({delta})"


def test_gradient_reaches_text_attn(setup):
    config, model, params, batch = setup

    loss_impl = loss_func_dict[config.TASK.MOTION_PRED.LOSS]

    def loss_fn(p):
        out = model.forward(p, batch, "train", jax.random.PRNGKey(2))
        return loss_impl(batch, out, config)["full_loss"]

    g = jax.grad(loss_fn)(params)
    key, gsub = _text_subtree(g)

    def norms(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(norms(v, prefix + k + "/"))
            else:
                if hasattr(v, "value"):  # flax Partitioned sharding box
                    v = v.value
                out[prefix + k] = float(jnp.linalg.norm(v))
        return out

    n = norms(gsub)
    p2l = {k: v for k, v in n.items() if "prompt_to_llm" in k}
    l2c = {k: v for k, v in n.items() if "llm_to_cond" in k}
    lora = {k: v for k, v in n.items() if "lora" in k.lower()}
    assert p2l and max(p2l.values()) > 0, f"prompt_to_llm grad dead: {p2l}"
    assert l2c and max(l2c.values()) > 0, f"llm_to_cond grad dead: {l2c}"
    assert lora and max(lora.values()) > 0, f"LoRA grads dead: {lora}"

    # the optimizer must FREEZE the LLM body (reference excludes it from all
    # param groups via requires_grad=False, base.py:94) while moving LoRA +
    # adapter leaves — checked at the UPDATE level, raw grads are nonzero
    from prosim_tpu.train.optim import build_optimizer

    import optax

    opt = build_optimizer(config, params)
    # two updates: the warmup schedule's LR at count 0 is exactly 0 (linear
    # ramp), so a single step moves nothing and would pass the frozen-body
    # check vacuously
    state = opt.init(params)
    updates, state = opt.update(g, state, params)
    new_params = optax.apply_updates(params, updates)
    updates, state = opt.update(g, state, new_params)
    new_params = optax.apply_updates(new_params, updates)
    _, old_t = _text_subtree(params)
    _, new_t = _text_subtree(new_params)

    def flat(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + "/"))
            else:
                out[prefix + k] = v.value if hasattr(v, "value") else v
        return out

    fo, fn = flat(old_t), flat(new_t)
    body_moved = [k for k in fo
                  if k.startswith("llm/") and "lora" not in k.lower()
                  and not np.array_equal(np.asarray(fo[k]), np.asarray(fn[k]))]
    assert not body_moved, f"frozen LLM body moved: {body_moved[:5]}"
    lora_moved = [k for k in fo if "lora_b" in k
                  and not np.array_equal(np.asarray(fo[k]), np.asarray(fn[k]))]
    assert lora_moved, "no LoRA leaf moved under the optimizer"


def test_addressed_agents_drive_the_residual(setup):
    """Zeroing the text's agent coverage (prompt_mask + slot ids) must change
    the conditioned output — i.e. the residual really keys on <Ai> positions,
    not on some batch-global leak."""
    config, model, params, batch = setup
    tc = dict(batch.conditions["llm_text_OneText"])
    tc2 = dict(tc)
    tc2["agent_slot_ids"] = jnp.full_like(tc["agent_slot_ids"], -1)
    if "read_positions" in tc2 and tc2["read_positions"] is not None:
        tc2["read_positions"] = jnp.full_like(tc2["read_positions"], -1)
    tc2["prompt_mask"] = jnp.zeros_like(tc["prompt_mask"])
    b2 = batch.replace(
        conditions={**batch.conditions, "llm_text_OneText": tc2})
    out1 = model.forward(params, batch, "val", jax.random.PRNGKey(3))
    out2 = model.forward(params, b2, "val", jax.random.PRNGKey(3))
    delta = float(jnp.abs(
        out1["rollout_traj"] - out2["rollout_traj"]).max())
    assert delta > 1e-4, "agent addressing does not reach the rollout"
