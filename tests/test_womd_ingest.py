"""Raw-WOMD ingestion: TFRecord Scenario shard -> trajdata cache -> batch.

Round-trips a hand-built Scenario proto (vendored minimal schema,
prosim_tpu/data/protos/waymo_scenario.proto) through
  write_tfrecords -> womd_ingest -> trajdata_cache.load_scene ->
  ProSimImitationDataset.get_scene_batch
and asserts every stage against the ground-truth arrays the scenario was
built from (reference pipeline: prosim/dataset/basic.py:430-564 via
trajdata's waymo loader; the cache layout is the interface, SURVEY.md §2).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from prosim_tpu.data.tfrecord import (index_waymo_scenarios,  # noqa: E402
                                      write_tfrecords)
from prosim_tpu.data import womd_ingest  # noqa: E402
from prosim_tpu.data.trajdata_cache import load_scene  # noqa: E402

pb = womd_ingest._sc_pb

DT = 0.1
T = 91  # WOMD standard horizon: 11 history + 80 future steps


def _build_scenario(sid="tfixture01"):
    """Two vehicles + one pedestrian, a curved lane with left/right road
    lines, a road edge, a crosswalk and a 3-phase traffic light."""
    s = pb.Scenario()
    s.scenario_id = sid
    s.timestamps_seconds.extend([i * DT for i in range(T)])
    s.current_time_index = 10
    s.sdc_track_index = 1  # deliberately NOT track 0: ordering must fix it

    rng = np.random.default_rng(0)
    truth = {}

    def add_track(tid, otype, x0, y0, vx, vy, heading, first, last, lwh):
        tr = s.tracks.add(id=tid, object_type=otype)
        xs = np.zeros((T, 2))
        val = np.zeros(T, bool)
        for t in range(T):
            st = tr.states.add()
            if first <= t <= last:
                x = x0 + vx * t * DT
                y = y0 + vy * t * DT
                st.center_x, st.center_y, st.center_z = x, y, 1.5
                st.velocity_x, st.velocity_y = vx, vy
                st.heading = heading
                st.length, st.width, st.height = lwh
                st.valid = True
                xs[t] = (x, y)
                val[t] = True
            else:
                st.valid = False
        truth[str(tid)] = dict(xy=xs, valid=val, vel=(vx, vy),
                               heading=heading, lwh=lwh)

    add_track(101, pb.Track.TYPE_VEHICLE, 10.0, 5.0, 3.0, 0.0, 0.0,
              0, T - 1, (4.5, 2.0, 1.6))
    add_track(202, pb.Track.TYPE_VEHICLE, 40.0, 8.0, -2.0, 0.5, np.pi / 2,
              5, 24, (5.1, 2.2, 1.9))
    add_track(303, pb.Track.TYPE_PEDESTRIAN, 20.0, -3.0, 0.5, 1.0, 1.0,
              0, T - 1, (0.8, 0.8, 1.7))

    # map: lane 900 with boundary road lines 901 (left) / 902 (right),
    # a road edge 903, a crosswalk 910
    xs = np.linspace(0.0, 60.0, 25)
    center = np.stack([xs, 5.0 + 0.01 * xs**2 / 10], axis=-1)
    lane = s.map_features.add(id=900).lane
    for p in center:
        lane.polyline.add(x=p[0], y=p[1], z=0.0)
    lane.type = pb.LaneCenter.TYPE_SURFACE_STREET
    lane.speed_limit_mph = 35.0
    lane.entry_lanes.append(899)
    lane.exit_lanes.append(901)

    left = center + np.array([0.0, 1.8])
    right = center + np.array([0.0, -1.8])
    rl = s.map_features.add(id=901).road_line
    rl.type = pb.RoadLine.TYPE_SOLID_SINGLE_YELLOW
    for p in left:
        rl.polyline.add(x=p[0], y=p[1])
    rr = s.map_features.add(id=902).road_line
    rr.type = pb.RoadLine.TYPE_BROKEN_SINGLE_WHITE
    for p in right:
        rr.polyline.add(x=p[0], y=p[1])
    seg = lane.left_boundaries.add()
    seg.lane_start_index, seg.lane_end_index = 0, 24
    seg.boundary_feature_id = 901
    seg = lane.right_boundaries.add()
    seg.lane_start_index, seg.lane_end_index = 0, 24
    seg.boundary_feature_id = 902

    re = s.map_features.add(id=903).road_edge
    re.type = pb.RoadEdge.TYPE_ROAD_EDGE_BOUNDARY
    for p in right + np.array([0.0, -2.5]):
        re.polyline.add(x=p[0], y=p[1])
    cw = s.map_features.add(id=910).crosswalk
    for p in [(18, -5), (22, -5), (22, 9), (18, 9)]:
        cw.polygon.add(x=p[0], y=p[1])

    # TLS: lane 900 red for t<10, green after
    for t in range(T):
        dms = s.dynamic_map_states.add()
        ls = dms.lane_states.add(lane=900)
        ls.state = (pb.TrafficSignalLaneState.LANE_STATE_STOP if t < 10
                    else pb.TrafficSignalLaneState.LANE_STATE_GO)

    tp = s.tracks_to_predict.add()
    tp.track_index, tp.difficulty = 0, pb.RequiredPrediction.LEVEL_1
    truth["center"] = center
    truth["left"] = left
    truth["right"] = right
    return s, truth


@pytest.fixture(scope="module")
def ingested(tmp_path_factory):
    root = tmp_path_factory.mktemp("womd")
    shard = str(root / "training.tfrecord-00000-of-00001")
    cache = str(root / "cache")
    scenario, truth = _build_scenario()
    write_tfrecords(shard, [scenario.SerializeToString()])
    summaries = womd_ingest.ingest_shards([shard], cache, "waymo_ingest")
    return shard, cache, truth, summaries


def test_shard_indexable_by_independent_parser(ingested):
    shard, _, _, _ = ingested
    idx = index_waymo_scenarios(shard)
    assert list(idx.keys()) == ["tfixture01"]


def test_summary(ingested):
    _, _, _, summaries = ingested
    assert len(summaries) == 1
    s = summaries[0]
    assert s["agents"] == 3 and s["timesteps"] == T and s["lanes"] == 1


def test_cache_layout_matches_demo(ingested):
    _, cache, _, _ = ingested
    d = os.path.join(cache, "waymo_ingest")
    assert os.path.exists(os.path.join(d, "scene_0", "agent_data_dt0.10.feather"))
    assert os.path.exists(os.path.join(d, "scene_0", "tls_data_dt0.10.feather"))
    assert os.path.exists(os.path.join(d, "scene_0", "scene_metadata_dt0.10.dill"))
    assert os.path.exists(os.path.join(d, "maps", "waymo_ingest_0.pb"))
    assert os.path.exists(os.path.join(d, "scenes_list.dill"))


def test_scene_roundtrip_exact(ingested):
    _, cache, truth, _ = ingested
    scene = load_scene(cache, "waymo_ingest", "scene_0")
    assert scene.length == T
    # SDC (track 202) must be agent 0 AND named 'ego' — the trajdata
    # convention the rest of the loader (ego-first reorder, ego_index) keys on
    assert scene.agent_names[0] == "ego"
    assert set(scene.agent_names) == {"101", "ego", "303"}
    # the rename must not discard the SDC's WOMD object id: WOSAC packaging
    # remaps 'ego' back to it (reference: gpu_utils.py:286-288)
    assert scene.ego_object_id == 202
    assert scene.agent_types[scene.agent_names.index("303")] == 2

    for name in ("101", "ego", "303"):
        i = scene.agent_names.index(name)
        tr = truth["202" if name == "ego" else name]
        np.testing.assert_array_equal(scene.valid[i], tr["valid"])
        v = tr["valid"]
        np.testing.assert_allclose(scene.states[i, v, :2], tr["xy"][v],
                                   atol=1e-9)
        np.testing.assert_allclose(scene.states[i, v, 3], tr["vel"][0])
        np.testing.assert_allclose(scene.states[i, v, 4], tr["vel"][1])
        np.testing.assert_allclose(scene.states[i, v, 7], tr["heading"],
                                   atol=1e-6)
        # constant velocity => derived accelerations are ~0
        np.testing.assert_allclose(scene.states[i, v, 5:7], 0.0, atol=1e-9)
        np.testing.assert_allclose(scene.extents[i], tr["lwh"][:2], atol=1e-6)


def test_map_roundtrip(ingested):
    _, cache, truth, _ = ingested
    scene = load_scene(cache, "waymo_ingest", "scene_0")
    assert len(scene.map.lanes) == 1
    lane = scene.map.lanes[0]
    assert lane.lane_id == "900"
    # mm quantization: exact to 0.5 mm + accumulated rounding
    np.testing.assert_allclose(lane.center, truth["center"], atol=0.05)
    np.testing.assert_allclose(lane.left_edge, truth["left"], atol=0.05)
    np.testing.assert_allclose(lane.right_edge, truth["right"], atol=0.05)
    # TLS: red (2) before t=10, green (1) after
    assert scene.map.traffic_light_status("900", 5) == 2.0
    assert scene.map.traffic_light_status("900", 15) == 1.0


def test_formats_to_batch(ingested):
    """The ingested cache drives the full host pipeline to a SceneBatch."""
    _, cache, _, _ = ingested
    from prosim_tpu.config import get_config
    from prosim_tpu.data.dataset import ProSimImitationDataset

    config = get_config(opts=[
        "DATASET.SOURCE.TRAIN", "['waymo_ingest']",
        "PROMPT.CONDITION.TYPES", "['goal']",
        "DATASET.FORMAT.PAD.NUM_LANES", "32",
        "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", "8",
        "DATASET.FORMAT.PAD.NUM_AGENTS", "8",
        "DATASET.AGENT.SCENE_MAX_AGENT", "8",
        "ROLLOUT.POLICY.POLICY_START_FRAME", "10",
    ])
    ds = ProSimImitationDataset(config, "train", cache)
    assert len(ds) == 1
    batch = ds.get_scene_batch(0, device=False)
    assert np.asarray(batch.prompt.mask).sum() >= 2  # vehicles present
    feat = np.asarray(batch.init_obs.feat)
    assert np.isfinite(feat[np.asarray(batch.init_obs.mask) > 0]).all()
