import os

import numpy as np
import pytest

from prosim_tpu.config import get_config
from prosim_tpu.data.trajdata_cache import load_scene, list_scenes
from prosim_tpu.data.formatter import format_scene, collate
from prosim_tpu.data.dataset import ProSimImitationDataset

CACHE = "/root/reference/demo_dataset/trajdata_cache"
HAS_DEMO = os.path.isdir(CACHE)

pytestmark = pytest.mark.skipif(not HAS_DEMO, reason="demo trajdata cache absent")

SMALL = [
    "DATASET.FORMAT.PAD.NUM_LANES", "256",
    "DATASET.FORMAT.MAP.MAX_POINTS", "256",
    "DATASET.DATA_PATHS.CACHE_DIR", CACHE,
    "DATASET.SOURCE.VAL", "['waymo_train']",
]


@pytest.fixture(scope="module")
def scene0():
    return load_scene(CACHE, "waymo_train", "scene_0")


def test_scene_loads(scene0):
    assert scene0.length == 91
    assert len(scene0.agent_names) == 55
    assert scene0.agent_names[scene0.ego_index] == "ego"
    assert scene0.map is not None and len(scene0.map.lanes) > 1000
    # valid states are finite
    assert np.isfinite(scene0.states[scene0.valid]).all()
    # extents positive for all agents seen in the data
    seen = scene0.valid.any(-1)
    assert (scene0.extents[seen] > 0).all()


def test_map_world_alignment(scene0):
    """Lane points must lie in the same world region as the agents."""
    ax = scene0.states[scene0.valid][:, 0]
    lane_x = scene0.map.lane_centers[:, 0]
    assert lane_x.min() - 300 < ax.min() and ax.max() < lane_x.max() + 300


def test_format_scene_invariants(scene0):
    cfg = get_config(opts=SMALL)
    b = format_scene(scene0, cfg, scene_ts=10, split="val")
    feat = np.asarray(b.init_obs.feat)[0]
    mask = np.asarray(b.init_obs.mask)[0]
    ok = mask[:, -1]
    assert ok.sum() > 10
    # each agent's own frame: last history step sits at the origin with
    # heading zero (reference format_utils.py:398-414 semantics)
    np.testing.assert_allclose(feat[ok, -1, :2], 0.0, atol=1e-5)
    np.testing.assert_allclose(feat[ok, -1, 2], 0.0, atol=1e-5)  # sin
    np.testing.assert_allclose(feat[ok, -1, 3], 1.0, atol=1e-5)  # cos
    # time one-hot occupies the last Th channels
    np.testing.assert_allclose(feat[ok][:, :, 13:], np.broadcast_to(
        np.eye(11, dtype=np.float32), (int(ok.sum()), 11, 11)), atol=0)

    # map: every valid point within the crop range, sym-frame features bounded
    mm = np.asarray(b.init_map.mask)[0]
    mv = np.asarray(b.init_map.vectors)[0]
    assert np.abs(mv[mm][:, :4]).max() < 100  # lane chunks are short
    # type one-hot is consistent with the type channel
    tvals = mv[mm][:, 4]
    onehot = mv[mm][:, 6:9]
    for tid in (1, 2, 3):
        np.testing.assert_array_equal(onehot[:, tid - 1] == 1, tvals == tid)

    # io pairs: targets at t=0 exist, nonzero valid
    io_mask = np.asarray(b.io_pairs.mask)[0]
    assert io_mask[0].sum() > 10
    assert b.io_pairs.tgt.shape[3:] == (10, 5)  # 10-step chunks, x,y,h,xd,yd

    # prompt: unit-consistency of velocity (agents rarely exceed 40 m/s)
    pf = np.asarray(b.prompt.feat)[0][np.asarray(b.prompt.mask)[0]]
    assert np.abs(pf[:, :2]).max() < 50


def test_io_pair_first_step_consistency(scene0):
    """tgt chunk at t=0 must equal the future states transformed into each
    agent's frame at scene_ts - cross-check against raw cache states."""
    cfg = get_config(opts=SMALL)
    b = format_scene(scene0, cfg, scene_ts=10, split="val")
    io_tgt = np.asarray(b.io_pairs.tgt)[0, 0]      # [N, 10, 5]
    io_mask = np.asarray(b.io_pairs.mask)[0, 0]
    pos = np.asarray(b.io_pairs.pos)[0, 0]
    # positions at t=0 equal the prompt positions (same agents, same frame)
    ppos = np.asarray(b.prompt.pos)[0]
    np.testing.assert_allclose(pos[io_mask], ppos[io_mask], atol=1e-5)
    # first delta of each chunk is bounded by ~0.1s * max speed
    step0 = io_tgt[io_mask][:, 0, :2]
    assert np.abs(step0).max() < 6.0


def test_dataset_with_conditions():
    cfg = get_config(opts=SMALL + [
        "PROMPT.CONDITION.TYPES", "['goal', 'v_action_tag', 'drag_point']",
    ])
    ds = ProSimImitationDataset(cfg, split="val", cache_dir=CACHE)
    assert len(ds) == 16
    b = ds.get_scene_batch(0)
    assert set(b.conditions) == {"goal", "v_action_tag", "drag_point"}
    g = b.conditions["goal"]
    assert bool(np.asarray(g.mask).any())
    # goal condition inputs match io goal at t=0 for covered agents
    gm = np.asarray(g.mask)[0]
    gi = np.asarray(g.feat)[0][gm]
    pidx = np.asarray(g.prompt_idx)[0][gm][:, 0]
    io_goal = np.asarray(b.io_pairs.goal)[0, 0]
    np.testing.assert_allclose(gi[:, :2], io_goal[pidx], atol=1e-5)
    # prompt_mask covers exactly the agents indexed by valid conditions
    pm = np.asarray(g.prompt_mask)[0]
    assert pm[pidx].all()

    tags = b.conditions["v_action_tag"]
    tm = np.asarray(tags.mask)[0]
    if tm.any():
        ti = np.asarray(tags.feat)[0][tm]
        assert (ti[:, 0] >= 0).all() and (ti[:, 2] >= ti[:, 1]).all()

    d = b.conditions["drag_point"]
    dm = np.asarray(d.mask)[0]
    assert dm.any()


def test_collate_two_scenes():
    cfg = get_config(opts=SMALL)
    ds = ProSimImitationDataset(cfg, split="val", cache_dir=CACHE)
    batch = collate([ds.get_scene_batch(0), ds.get_scene_batch(1)])
    assert batch.init_obs.feat.shape[0] == 2
    assert batch.io_pairs.t_indices.shape == (8,)


def test_native_lane_vectorization_parity(scene0):
    """The C++ data-engine path must match the numpy path bit-for-bit."""
    from prosim_tpu import native
    from prosim_tpu.data import formatter as F

    if not native.available():
        pytest.skip("native toolchain unavailable")
    cfg = get_config(opts=SMALL)
    ego = scene0.states[scene0.ego_index, 10]
    out_native = F.vectorize_lanes(scene0, ego[:2], ego[7], 10, cfg)
    saved = (native._build_failed, native._lib)
    try:
        native._build_failed, native._lib = True, None
        out_py = F.vectorize_lanes(scene0, ego[:2], ego[7], 10, cfg)
    finally:
        native._build_failed, native._lib = saved
    assert out_native.shape == out_py.shape
    np.testing.assert_array_equal(out_native, out_py)


def test_prefetch_batches_match_sync():
    """The threaded prefetching loader yields the same batches as the sync
    path (reference DataLoader NUM_WORKERS semantics, trainer.py:182-196)."""
    import jax
    import numpy as np

    from prosim_tpu.config import get_config
    from prosim_tpu.data.dataset import ProSimImitationDataset

    cfg = get_config(opts=SMALL)
    ds = ProSimImitationDataset(cfg, "val", CACHE)
    sync = list(ds.batches(1, num_workers=0))
    pre = list(ds.batches(1, num_workers=2, prefetch=2))
    assert len(sync) == len(pre) >= 1
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(
            np.asarray(a.prompt.pos), np.asarray(b.prompt.pos)
        )
        np.testing.assert_array_equal(
            np.asarray(a.init_map.vectors), np.asarray(b.init_map.vectors)
        )


def test_tfrecord_roundtrip_and_tf_interop(tmp_path):
    """Pure-python TFRecord IO (reference TFRecord use: waymo_utils.py:38-57),
    cross-checked against tensorflow's writer/reader when available."""
    from prosim_tpu.data.tfrecord import (
        read_tfrecords, write_tfrecords, index_waymo_scenarios,
    )

    payloads = [b"hello", b"", bytes(range(256)) * 10]
    p = str(tmp_path / "own.tfrecord")
    assert write_tfrecords(p, payloads) == 3
    assert list(read_tfrecords(p)) == payloads

    # corrupt a byte -> crc error
    blob = bytearray(open(p, "rb").read())
    blob[14] ^= 0xFF
    bad = str(tmp_path / "bad.tfrecord")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(IOError):
        list(read_tfrecords(bad))

    try:
        import tensorflow as tf
    except Exception:
        return
    # tf reads ours
    got = [r.numpy() for r in tf.data.TFRecordDataset(p)]
    assert got == payloads
    # we read tf's
    q = str(tmp_path / "tf.tfrecord")
    with tf.io.TFRecordWriter(q) as w:
        for x in payloads:
            w.write(x)
    assert list(read_tfrecords(q)) == payloads

    # scenario_id indexing: field 5 length-delimited = tag byte 0x2a
    sid = b"abc123"
    proto = b"\x0a\x02\x08\x01" + b"\x2a" + bytes([len(sid)]) + sid
    r = str(tmp_path / "scn.tfrecord")
    write_tfrecords(r, [proto])
    assert index_waymo_scenarios(r) == {"abc123": proto}
