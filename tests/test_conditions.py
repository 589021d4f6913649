import numpy as np
import pytest

from prosim_tpu.config import get_config
from prosim_tpu.data.motion_tags import (
    MotionTag,
    derive_motion_tags,
    integrate_tags,
    process_tags,
    remove_short_tags,
    resolve_conflicts,
)
from prosim_tpu.data.text_conditions import (
    BUILTIN_TEMPLATES,
    concat_one_text,
    goal_texts,
    motion_tag_texts,
)


def test_integrate_tags_merges_within_tolerance():
    tags = [
        MotionTag("Accelerate", ("a",), (0, 10)),
        MotionTag("Accelerate", ("a",), (15, 30)),
        MotionTag("Accelerate", ("a",), (60, 70)),
    ]
    out = integrate_tags(tags, tolerance=10)
    intervals = sorted(t.interval for t in out)
    assert intervals == [(0, 30), (60, 70)]


def test_remove_short_tags():
    tags = [MotionTag("LeftTurn", ("a",), (0, 5)), MotionTag("LeftTurn", ("a",), (0, 20))]
    out = remove_short_tags(tags, min_duration=10)
    assert len(out) == 1 and out[0].interval == (0, 20)


def test_resolve_conflicts_priority():
    # Parked outranks KeepSpeed inside the speed exclusion group
    tags = [
        MotionTag("KeepSpeed", ("a",), (0, 50)),
        MotionTag("Parked", ("a",), (10, 30)),
    ]
    out = resolve_conflicts(tags)
    parked = [t for t in out if t.tag == "Parked"]
    keep = [t for t in out if t.tag == "KeepSpeed"]
    assert parked[0].interval == (10, 30)
    # KeepSpeed trimmed around the Parked interval
    for t in keep:
        s, e = t.interval
        assert e <= 10 or s >= 30


def test_derive_tags_on_synthetic_trajectories():
    from prosim_tpu.data.trajdata_cache import STATE_DIM, VX, H

    T = 60
    dt = 0.1
    states = np.zeros((3, T, STATE_DIM))
    valid = np.ones((3, T), bool)
    # agent 0: accelerating from 0 to 12 m/s
    states[0, :, VX] = np.linspace(0.5, 12, T)
    # agent 1: parked
    states[1, :, VX] = 0.0
    # agent 2: constant speed left turn
    states[2, :, VX] = 8.0
    states[2, :, H] = np.linspace(0, np.pi / 2, T)

    tags = process_tags(
        derive_motion_tags(states, valid, ["a0", "a1", "a2"], dt=dt),
        tolerance=10, min_duration=10,
    )
    by_agent = {}
    for t in tags:
        by_agent.setdefault(t.agents[0], set()).add(t.tag)
    assert "Accelerate" in by_agent["a0"]
    assert by_agent["a1"] == {"Parked"}
    assert "LeftTurn" in by_agent["a2"]
    assert "RightTurn" not in by_agent.get("a2", set())


def test_motion_tag_texts_and_one_text():
    tags = [
        MotionTag("LeftTurn", ("veh1",), (0, 20)),
        MotionTag("Stopping", ("veh2",), (10, 40)),
        MotionTag("Straight", ("ghost",), (0, 10)),  # not a target agent
    ]
    twv = motion_tag_texts(tags, ["veh1", "veh2"])
    assert len(twv) == 2
    assert any("<A0>" in t for t, _ in twv)
    assert any("<A1>" in t for t, _ in twv)

    text, pmask = concat_one_text(twv, num_agents=4)
    assert pmask[0] and pmask[1] and not pmask[2]
    assert "\n" in text


def test_goal_texts_format():
    goals = np.asarray([[10.5, -3.25], [0.0, 0.0]])
    valid = np.asarray([True, False])
    out = goal_texts(goals, valid)
    assert len(out) == 1
    assert "<A0>" in out[0][0] and "10.50" in out[0][0]


def test_generator_builds_text_conditions():
    import os

    CACHE = "/root/reference/demo_dataset/trajdata_cache"
    if not os.path.isdir(CACHE):
        pytest.skip("demo cache absent")
    from prosim_tpu.data.dataset import ProSimImitationDataset

    cfg = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", "128",
        "DATASET.FORMAT.MAP.MAX_POINTS", "128",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "PROMPT.CONDITION.TYPES",
        "['goal', 'v_action_tag', 'drag_point', 'llm_text_OneText']",
    ])
    ds = ProSimImitationDataset(cfg, "val", CACHE)
    b = ds.get_scene_batch(0)
    assert "llm_text_OneText" in b.conditions
    tc = b.conditions["llm_text_OneText"]
    assert tc["input_ids"].shape[0] == 1
    assert bool(np.asarray(tc["token_mask"]).any())
    # agent slots referenced in the text are inside the prompt set
    slots = np.asarray(tc["agent_slot_ids"])
    named = slots[slots >= 0]
    assert (named < b.prompt.mask.shape[1]).all()
    assert bool(np.asarray(tc["prompt_mask"]).any())


def test_caption_funcs():
    """Caption strings (reference: condition_utils.py:545-643)."""
    import jax.numpy as jnp

    from prosim_tpu.data.batch import Condition
    from prosim_tpu.data.captions import batch_caption

    v_tag = Condition(
        feat=jnp.asarray([[[1.0, 10, 40], [0.0, 0, 80]]]),   # Accelerate, Stopping
        mask=jnp.asarray([[True, True]]),
        prompt_idx=jnp.asarray([[[2], [5]]], jnp.int32),
        prompt_mask=jnp.ones((1, 8), bool),
    )
    v2v = Condition(
        feat=jnp.asarray([[[1.0, 0, 30]]]),                  # ParallelDriving
        mask=jnp.asarray([[True]]),
        prompt_idx=jnp.asarray([[[1, 4]]], jnp.int32),
        prompt_mask=jnp.ones((1, 8), bool),
    )
    text = Condition(
        feat=jnp.zeros((1, 4)), mask=jnp.asarray([True]),
        prompt_idx=jnp.zeros((1, 1, 1), jnp.int32),
        prompt_mask=jnp.ones((1, 8), bool),
    )
    cap = batch_caption(
        {"v_action_tag": v_tag, "v2v_tag": v2v, "llm_text_OneText": text},
        texts=["Let <A2> speed up."],
    )
    assert "Accelerate(<A2>: 10-40)" in cap
    assert "Stopping(<A5>: 0-80)" in cap
    assert "ParallelDriving(<A1>, <A4>: 0-30)" in cap
    assert "Let <A2> speed up." in cap


def test_520k_llm_text_loader(tmp_path):
    """Released-texts lookup: ego-(x,y)@t0 pickle -> scene id -> text file;
    <name5> -> <A{slot}> rewrite (reference: data_utils.py:626-642,
    condition_utils.py:245-282)."""
    import os
    import pickle

    CACHE = "/root/reference/demo_dataset/trajdata_cache"
    if not os.path.isdir(CACHE):
        pytest.skip("demo cache absent")
    from prosim_tpu.data.dataset import ProSimImitationDataset
    from prosim_tpu.data.formatter import format_scene

    # fabricate a 520k release for demo scene 0
    folder = tmp_path / "texts"
    ids_pkl = tmp_path / "waymo_val_IDs.pkl"

    cfg = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", "128",
        "DATASET.FORMAT.MAP.MAX_POINTS", "128",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "PROMPT.CONDITION.TYPES", "['llm_text_OneText']",
        "PROMPT.CONDITION.LLM_TEXT.FOLDER.VAL", str(folder),
        "PROMPT.CONDITION.LLM_TEXT.IDS_PKL.VAL", str(ids_pkl),
    ])
    ds = ProSimImitationDataset(cfg, "val", CACHE)
    env, scene_name, ts = ds.index[0]
    scene = ds._load(env, scene_name)
    meta = {}
    format_scene(scene, cfg, ts, "val", out_meta=meta)
    names = meta["target_names"]
    assert len(names) >= 2

    ego = scene.states[scene.ego_index, 0]
    sid = "scene_00042"
    with open(ids_pkl, "wb") as f:
        pickle.dump({(float(ego[0]), float(ego[1])): [sid]}, f)
    sub = folder / str(42 % 100)
    sub.mkdir(parents=True)
    n0, n1 = names[0][:5], names[1][:5]
    (sub / f"{sid}_10_90_output.txt").write_text(
        f'1. "<{n0}> drives toward the intersection."\n'
        f'2. <{n1}> slows down behind <{n0}>.\n'
        "3. <zzzzz> does something (unknown agent).\n"
    )

    b = ds.get_scene_batch(0)
    tc = b.conditions["llm_text_OneText"]
    pm = np.asarray(tc["prompt_mask"])[0]
    assert pm[0] and pm[1]  # both named agents addressed
    # decode the byte-tokenized text back to check the rewrite
    ids = np.asarray(tc["input_ids"])[0]
    toks = np.asarray(tc["agent_slot_ids"])[0]
    assert (toks == 0).any() and (toks == 1).any()
    text_bytes = bytes(int(t) for t, m in zip(ids, np.asarray(tc["token_mask"])[0])
                       if m and t < 512 and 9 < t < 127)
    s = text_bytes.decode("utf-8", "replace")
    assert "drives toward the intersection" in s
    assert "unknown agent" not in s  # line with no prompt agents dropped


def test_one_text_placeholder_ablation():
    """OneText.USE_PLACEHOLDER strips semantics but keeps agent reference
    (reference: condition_utils.py:275-279)."""
    import os

    CACHE = "/root/reference/demo_dataset/trajdata_cache"
    if not os.path.isdir(CACHE):
        pytest.skip("demo cache absent")
    from prosim_tpu.data.dataset import ProSimImitationDataset

    cfg = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", "64",
        "DATASET.FORMAT.MAP.MAX_POINTS", "64",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "PROMPT.CONDITION.TYPES", "['llm_text_OneText']",
        "PROMPT.CONDITION.OneText.USE_PLACEHOLDER", "True",
    ])
    ds = ProSimImitationDataset(cfg, "val", CACHE)
    b = ds.get_scene_batch(0)
    tc = b.conditions["llm_text_OneText"]
    ids = np.asarray(tc["input_ids"])[0]
    mask_t = np.asarray(tc["token_mask"])[0]
    text = bytes(int(t) for t, m in zip(ids, mask_t) if m and 9 < t < 127)
    s = text.decode("utf-8", "replace")
    assert "is there." in s


def test_derive_v2v_tags_synthetic():
    """Binary pair tags from pairwise geometry (reference vocab:
    motion_tag_utils.py:17-22)."""
    from prosim_tpu.data.motion_tags import derive_v2v_tags
    from prosim_tpu.data.trajdata_cache import STATE_DIM, X, Y, VX, H

    T, dt = 60, 0.1
    t = np.arange(T) * dt
    states = np.zeros((5, T, STATE_DIM))
    valid = np.ones((5, T), bool)
    # a0 leader: +x at 8 m/s
    states[0, :, X] = 8.0 * t
    states[0, :, VX] = 8.0
    # a1 follower: 10 m behind, same speed
    states[1, :, X] = 8.0 * t - 10.0
    states[1, :, VX] = 8.0
    # a2 parallel: one lane left of a0
    states[2, :, X] = 8.0 * t
    states[2, :, Y] = 4.0
    states[2, :, VX] = 8.0
    # a3 overtaker: starts 15 m behind at 14 m/s, half a lane left
    states[3, :, X] = 14.0 * t - 15.0
    states[3, :, Y] = 2.0
    states[3, :, VX] = 14.0
    # a4 stopped on the shoulder near a0's path
    states[4, :, X] = 20.0
    states[4, :, Y] = 2.0

    names = [f"a{i}" for i in range(5)]
    tags = derive_v2v_tags(states, valid, names, dt=dt)
    pairs = {(tg.tag, tg.agents) for tg in tags}

    assert ("Following", ("a1", "a0")) in pairs
    assert ("ParallelDriving", ("a2", "a0")) in pairs
    assert ("ParallelDriving", ("a0", "a2")) in pairs
    assert ("Overtaking", ("a3", "a0")) in pairs
    assert any(tg == "ByPassing" and ag[1] == "a4" for tg, ag in pairs)
    # the leader is not following its follower
    assert ("Following", ("a0", "a1")) not in pairs
    for tg in tags:
        assert tg.type == "binary"
        s, e = tg.interval
        assert 0 <= s <= e < T


def test_v2v_generator_builds_pair_conditions():
    """ConditionGenerator emits 2-wide prompt_idx rows for pair tags
    (reference: condition_utils.py:317-364)."""
    import os

    CACHE = "/root/reference/demo_dataset/trajdata_cache"
    if not os.path.isdir(CACHE):
        pytest.skip("demo cache absent")
    from prosim_tpu.data.dataset import ProSimImitationDataset

    cfg = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", "128",
        "DATASET.FORMAT.MAP.MAX_POINTS", "128",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "PROMPT.CONDITION.TYPES", "['v2v_tag']",
    ])
    ds = ProSimImitationDataset(cfg, "val", CACHE)
    b = ds.get_scene_batch(0)
    assert "v2v_tag" in b.conditions
    c = b.conditions["v2v_tag"]
    assert c.prompt_idx.shape[-1] == 2
    assert c.feat.shape[-1] == 3
    m = np.asarray(c.mask)[0]
    assert m.any(), "demo scene should produce at least one pair tag"
    pidx = np.asarray(c.prompt_idx)[0][m]
    N = b.prompt.mask.shape[1]
    assert (pidx >= 0).all() and (pidx < N).all()
    assert (pidx[:, 0] != pidx[:, 1]).all()
    # prompt_mask covers exactly the pair members
    pm = np.asarray(c.prompt_mask)[0]
    assert pm[pidx.ravel()].all()


def test_v2v_condition_changes_tagged_pair_rollout():
    """Closed loop: changing a pair tag's id changes the tagged agents'
    rollout - the condition actually flows through the GNN edge matrix into
    the policy (reference: condition_attns.py:87-228)."""
    import jax
    import jax.numpy as jnp

    from prosim_tpu.data.batch import Condition
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.prosim import ProSim

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
        "PROMPT.CONDITION.TYPES", "['v2v_tag']",
    ])
    model = ProSim(cfg)
    batch = make_synthetic_batch(
        cfg, batch_size=1, num_lanes=8, num_obs_agents=6, num_agents=4,
        num_replan=2,
    )
    C = cfg.DATASET.FORMAT.PAD.NUM_CONDS
    # one Following tag on the pair (0, 1)
    feat = np.zeros((1, C, 3), np.float32)
    feat[0, 0] = [0, 0, 10]  # Following, frames 0-10
    mask = np.zeros((1, C), bool)
    mask[0, 0] = True
    pidx = -np.ones((1, C, 2), np.int32)
    pidx[0, 0] = [0, 1]
    pmask = np.zeros((1, batch.prompt.mask.shape[1]), bool)
    pmask[0, [0, 1]] = True
    cond = Condition(
        feat=jnp.asarray(feat), mask=jnp.asarray(mask),
        prompt_idx=jnp.asarray(pidx), prompt_mask=jnp.asarray(pmask),
    )
    batch = batch.replace(conditions={"v2v_tag": cond})
    params = model.init(jax.random.PRNGKey(0), batch)
    out_follow = model.forward(params, batch, "val", jax.random.PRNGKey(1))

    # same pair, different tag id (ByPassing)
    feat2 = feat.copy()
    feat2[0, 0, 0] = 3
    batch2 = batch.replace(conditions={"v2v_tag": cond.replace(feat=jnp.asarray(feat2))})
    out_bypass = model.forward(params, batch2, "val", jax.random.PRNGKey(1))

    t1 = np.asarray(out_follow["rollout_traj"])
    t2 = np.asarray(out_bypass["rollout_traj"])
    diff = np.abs(t1 - t2).sum(axis=(-1, -2))  # [M?, B, N] -> per-agent
    pm = np.asarray(batch.prompt.mask)
    assert np.isfinite(t1[pm]).all() and np.isfinite(t2[pm]).all()
    # the tagged pair's rollout must move
    assert diff[..., 0, 0].max() > 1e-6
    assert diff[..., 0, 1].max() > 1e-6


def _rows(mask, pidx):
    return {
        "input": np.zeros((len(mask), 3), np.float32),
        "mask": np.asarray(mask, bool),
        "prompt_idx": np.asarray(pidx, np.int32),
    }


def test_hard_priority_mask_single_and_pair():
    from prosim_tpu.data.conditions import mask_priority_condition

    # goal on agents 0,1,2; v2v pair (1,3); tag on agent 3
    all_cond = {
        "goal": _rows([1, 1, 1], [[0], [1], [2]]),
        "v2v_tag": _rows([1], [[1, 3]]),
        "v_action_tag": _rows([1], [[3]]),
    }
    order = ["v2v_tag", "v_action_tag", "goal", "drag_point"]
    out = mask_priority_condition(all_cond, order)
    # agent 1's best is v2v -> its goal row dies; pair row survives only if
    # BOTH agents (1 and 3) have v2v as their best priority -> yes
    assert out["v2v_tag"]["mask"].tolist() == [True]
    assert out["goal"]["mask"].tolist() == [True, False, True]
    # agent 3 best is v2v, so the lower-priority unary tag dies
    assert out["v_action_tag"]["mask"].tolist() == [False]
    # masked rows have prompt_idx invalidated (reference behavior)
    assert out["goal"]["prompt_idx"][1, 0] == -1


def test_hard_priority_pair_dies_when_one_agent_outranked():
    from prosim_tpu.data.conditions import mask_priority_condition

    all_cond = {
        "goal": _rows([1], [[1]]),
        "v2v_tag": _rows([1], [[1, 3]]),
    }
    # goal outranks v2v here: agent 1's best is goal, so the pair row must die
    out = mask_priority_condition(all_cond, ["goal", "v2v_tag"])
    assert out["goal"]["mask"].tolist() == [True]
    assert out["v2v_tag"]["mask"].tolist() == [False]


def test_soft_priority_mask_statistics():
    from prosim_tpu.data.conditions import mask_soft_priority_condition

    rng = np.random.default_rng(0)
    keep_goal = 0
    for _ in range(200):
        all_cond = {
            "goal": _rows([1], [[0]]),
            "drag_point": _rows([1], [[0]]),
        }
        out = mask_soft_priority_condition(
            all_cond, {"goal": 5.0, "drag_point": 1.0}, rng)
        # exactly one of the two survives
        alive = out["goal"]["mask"][0] + out["drag_point"]["mask"][0]
        assert alive == 1
        keep_goal += int(out["goal"]["mask"][0])
    # goal should win ~5/6 of the time
    assert 140 <= keep_goal <= 190


def test_generator_text_outranks_goal_with_priority_mask():
    """With USE_PRIORITY_MASK, text conditions (highest default priority)
    strip their agents out of the goal condition (reference default
    PRIORITY_ORDER, config/default.py:344)."""
    import os

    CACHE = "/root/reference/demo_dataset/trajdata_cache"
    if not os.path.isdir(CACHE):
        pytest.skip("demo cache absent")
    from prosim_tpu.data.dataset import ProSimImitationDataset

    cfg = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", "128",
        "DATASET.FORMAT.MAP.MAX_POINTS", "128",
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "PROMPT.CONDITION.TYPES", "['goal', 'motion_tag_OneText']",
        "PROMPT.CONDITION.USE_PRIORITY_MASK", "True",
    ])
    ds = ProSimImitationDataset(cfg, "val", CACHE)
    b = ds.get_scene_batch(0)
    assert "goal" in b.conditions and "motion_tag_OneText" in b.conditions
    text_pm = np.asarray(b.conditions["motion_tag_OneText"]["prompt_mask"][0],
                         bool)
    goal_pm = np.asarray(b.conditions["goal"].prompt_mask[0], bool)
    assert text_pm.any(), "demo scene should produce tag texts"
    # no overlap: an agent addressed by text is not goal-conditioned
    assert not (text_pm & goal_pm).any()
    # goal still covers the non-text agents (priority masks, not erases)
    assert goal_pm.any()
