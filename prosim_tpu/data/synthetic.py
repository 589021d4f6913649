"""Synthetic SceneBatch generator.

Produces structurally-valid random batches with the exact layouts the real
trajdata-cache loader emits. Used by unit tests, the graft entry point, and
benchmarking before/without real data.
"""

import numpy as np
import jax.numpy as jnp

from prosim_tpu.data.batch import (
    Condition,
    FutObs,
    IOPairs,
    MapInputs,
    ObsInputs,
    Prompt,
    SceneBatch,
)


def obs_feature_dim(config) -> int:
    d = len(config.DATASET.FORMAT.HISTORY.ELEMENTS.split(","))
    if config.DATASET.FORMAT.HISTORY.WITH_EXTEND:
        d += 2
    if config.DATASET.FORMAT.HISTORY.WITH_AGENT_TYPE:
        d += 3
    if config.DATASET.FORMAT.HISTORY.WITH_TIME_EMB:
        d += config.DATASET.FORMAT.HISTORY.STEPS
    return d


def map_feature_dim(config) -> int:
    d = 6
    if config.DATASET.FORMAT.MAP.WITH_TYPE_EMB:
        d += 3
    if config.DATASET.FORMAT.MAP.WITH_DIR:
        d += 2
    return d


def make_synthetic_batch(
    config,
    batch_size: int = 1,
    num_lanes: int = 64,
    num_obs_agents: int = 24,
    num_agents: int = 16,
    seed: int = 0,
    with_io_pairs: bool = True,
    num_replan: int = None,
) -> SceneBatch:
    rng = np.random.default_rng(seed)
    B = batch_size
    L = num_lanes
    P = config.DATASET.MAP.MAX_LANE_POINTS - 1
    A = num_obs_agents
    N = num_agents
    Th = config.DATASET.FORMAT.HISTORY.STEPS
    S = config.DATASET.FORMAT.TARGET.STEPS
    Cm = map_feature_dim(config)
    Co = obs_feature_dim(config)
    R = num_replan if num_replan is not None else (
        config.ROLLOUT.POLICY.MAX_STEPS // config.ROLLOUT.POLICY.REPLAN_FREQ
    )
    T = R
    tgt_dim = len(config.DATASET.FORMAT.TARGET.ELEMENTS.split(","))

    f32 = lambda *shape: rng.normal(size=shape).astype(np.float32)

    init_map = MapInputs(
        vectors=jnp.asarray(f32(B, L, P, Cm)),
        mask=jnp.asarray(rng.random((B, L, P)) > 0.2),
        pos=jnp.asarray(f32(B, L, 2) * 50),
        ori=jnp.asarray(f32(B, L)),
    )
    obs_mask = np.ones((B, A, Th), bool)
    obs_mask &= rng.random((B, A, 1)) > 0.1  # a few fully-invalid agents
    init_obs = ObsInputs(
        feat=jnp.asarray(f32(B, A, Th, Co) * 0.5),
        mask=jnp.asarray(obs_mask),
        pos=jnp.asarray(f32(B, A, 2) * 30),
        ori=jnp.asarray(f32(B, A)),
    )
    # each policy agent maps to a distinct obs slot
    obs_index = np.tile(np.arange(N, dtype=np.int32)[None], (B, 1))
    prompt_mask = np.asarray(obs_mask[:, :N].any(-1))
    prompt = Prompt(
        feat=jnp.asarray(f32(B, N, 7)),
        mask=jnp.asarray(prompt_mask),
        pos=init_obs.pos[:, :N],
        ori=init_obs.ori[:, :N],
        agent_type=jnp.asarray(rng.integers(1, 4, size=(B, N)), jnp.int32),
        obs_index=jnp.asarray(obs_index),
        extent=jnp.asarray(np.abs(f32(B, N, 2)) + 1.0),
        goal_point=jnp.asarray(f32(B, N, 2) * 40),
    )

    io_pairs = None
    if with_io_pairs:
        t_idx = np.arange(T, dtype=np.int32) * config.ROLLOUT.POLICY.REPLAN_FREQ
        mask = rng.random((B, T, N)) > 0.1
        tv = np.broadcast_to(mask[..., None, None], (B, T, N, S, tgt_dim)).copy()
        io_pairs = IOPairs(
            tgt=jnp.asarray(f32(B, T, N, S, tgt_dim)),
            tgt_valid=jnp.asarray(tv),
            goal=jnp.asarray(f32(B, T, N, 2) * 40),
            pos=jnp.asarray(f32(B, T, N, 2) * 30),
            ori=jnp.asarray(f32(B, T, N)),
            mask=jnp.asarray(mask),
            agent_type=jnp.asarray(rng.integers(1, 4, size=(B, T, N)), jnp.int32),
            init_vel=jnp.asarray(f32(B, T, N, 2)),
            extent=jnp.asarray(np.abs(f32(B, T, N, 2)) + 1.0),
            full_traj_xy=jnp.asarray(f32(B, N, T * S, 2) * 30),
            full_traj_valid=jnp.ones((B, N, T * S), bool),
            t_indices=jnp.asarray(t_idx),
        )

    fut_obs = FutObs(
        feat=jnp.asarray(f32(B, R, A, Th, Co) * 0.5),
        mask=jnp.asarray(np.broadcast_to(obs_mask[:, None], (B, R, A, Th)).copy()),
        pos=jnp.asarray(f32(B, R, A, 2) * 30),
        ori=jnp.asarray(f32(B, R, A)),
        obs_index=jnp.asarray(np.broadcast_to(obs_index[:, None], (B, R, N)).copy()),
    )

    conditions = {}
    for cond_type in config.PROMPT.CONDITION.TYPES:
        if "OneText" in cond_type:
            from prosim_tpu.data.text_conditions import build_one_text_condition
            from prosim_tpu.models.llm.tokenizer import AGENT_TEMPLATE, ByteTokenizer

            llm_cfg = config.MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM
            pm = np.zeros((B, N), bool)
            pm[:, : min(2, N)] = True
            texts = [
                f"{AGENT_TEMPLATE.format(0)} slows down. "
                f"{AGENT_TEMPLATE.format(min(1, N - 1))} turns left."
            ] * B
            tc = build_one_text_condition(
                ByteTokenizer(), texts, pm,
                max_len=llm_cfg.MAX_TEXT_TOKENS,
                use_prompt_token=llm_cfg.USE_PROMPT_TOKEN,
                agent_token_mode=llm_cfg.AGENT_TOKEN_MODE,
            )
            conditions[cond_type] = {k: jnp.asarray(v) for k, v in tc.items()}
            continue
        C = config.DATASET.FORMAT.PAD.NUM_CONDS
        fdim = {"goal": 3, "v_action_tag": 3, "v2v_tag": 3, "drag_point": 16}.get(cond_type, 3)
        pidx_dim = 2 if cond_type == "v2v_tag" else 1
        cmask = rng.random((B, C)) > 0.5
        pidx = rng.integers(0, N, size=(B, C, pidx_dim)).astype(np.int32)
        pmask = np.zeros((B, N), bool)
        for b in range(B):
            pmask[b, pidx[b, cmask[b]].ravel()] = True
        if cond_type == "drag_point":
            feat = f32(B, C, 8, 2).reshape(B, C, 16)
        else:
            feat = f32(B, C, fdim)
        conditions[cond_type] = Condition(
            feat=jnp.asarray(feat),
            mask=jnp.asarray(cmask),
            prompt_idx=jnp.asarray(pidx),
            prompt_mask=jnp.asarray(pmask & prompt_mask),
        )

    return SceneBatch(
        init_map=init_map,
        init_obs=init_obs,
        prompt=prompt,
        io_pairs=io_pairs,
        fut_obs=fut_obs,
        conditions=conditions,
    )
