"""Golden formatter tensors: the REFERENCE ImitationBatchFormat runs in place
on real demo-cache scenes (via the stub SceneBatch in ref_bridge.py) and its
output tensors are compared element-wise against prosim_tpu's formatter.

Covers init_map / init_obs / prompt / io_pairs / fut_obs including NaN and
mask conventions (reference: prosim/dataset/format_utils.py:153-815).
Rows are aligned by agent NAME, so slot-ordering differences between the two
pipelines (both sort targets by future length, stably) cannot hide errors.
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))

import reference_oracle  # noqa: E402
import ref_bridge  # noqa: E402

from prosim_tpu.config import get_config  # noqa: E402
from prosim_tpu.data.formatter import format_scene  # noqa: E402
from prosim_tpu.data.trajdata_cache import load_scene  # noqa: E402

CACHE = "/root/reference/demo_dataset/trajdata_cache"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(CACHE), reason="demo trajdata cache absent")

SCENE_TS = 10


@pytest.fixture(scope="module")
def ref():
    return reference_oracle.load_model()


@pytest.fixture(scope="module")
def my_cfg():
    # MAX_POINTS=4096 keeps every in-range polyline (scene_0 has 3170): under
    # truncation the reference's unstable distance sort permutes equal-distance
    # duplicate edge polylines unpredictably; the truncated path is covered by
    # test_map_truncation_quirk below
    return get_config(opts=[
        "DATASET.DATA_PATHS.CACHE_DIR", CACHE,
        "DATASET.SOURCE.VAL", "['waymo_train']",
        "DATASET.FORMAT.MAP.MAX_POINTS", "4096",
    ])


@pytest.fixture(scope="module")
def ref_cfg(ref):
    return ref.config.get_config(
        "/root/reference/prosim_demo/cfg/no_text.yaml",
        opts=["PROMPT.CONDITION.TYPES", "['goal']",
              "DATASET.FORMAT.MAP.MAX_POINTS", "4096"],
    )


def _golden_pair(ref, my_cfg, ref_cfg, scene_name):
    scene = load_scene(CACHE, "waymo_train", scene_name)
    rbatch = ref_bridge.build_stub_scene_batch(scene, SCENE_TS, my_cfg)
    rbatch = ref_bridge.run_reference_formatter(ref, rbatch, ref_cfg, "val")
    meta = {}
    mine = format_scene(scene, my_cfg, SCENE_TS, split="val", out_meta=meta)
    return rbatch, mine, meta


@pytest.fixture(scope="module", params=["scene_0", "scene_1"])
def pair(request, ref, my_cfg, ref_cfg):
    return _golden_pair(ref, my_cfg, ref_cfg, request.param)


def _name_perm(ref_names, my_names):
    """my-row index for each reference row, aligned by agent name."""
    lookup = {n: i for i, n in enumerate(my_names)}
    assert set(ref_names) <= set(my_names), (
        f"reference rows missing on our side: {set(ref_names) - set(my_names)}")
    return np.asarray([lookup[n] for n in ref_names])


def test_target_sets_match(pair):
    rbatch, mine, meta = pair
    ref_tgts = rbatch.extras["prompt"]["motion_pred"]["agent_ids"][0]
    assert sorted(ref_tgts) == sorted(meta["target_names"])


def test_init_obs_golden(pair):
    rbatch, mine, meta = pair
    ro = rbatch.extras["init_obs"]
    perm = _name_perm(ro["agent_ids"][0], meta["universe_names"])

    ref_in = ro["input"][0].numpy()          # [Nr, 11, 24]
    ref_mask = ro["mask"][0].numpy()          # [Nr, 11, 24] per-element
    my_in = np.asarray(mine.init_obs.feat)[0][perm]
    my_step = np.asarray(mine.init_obs.mask)[0][perm]   # [Nr, 11]

    # reference mask is per-element; the model consumes mask.all(-1)
    # (obs_encoder.py:86); our step mask must equal that reduction
    np.testing.assert_array_equal(my_step, ref_mask.all(-1))
    ok = ref_mask.all(-1)
    np.testing.assert_allclose(
        my_in[ok], np.nan_to_num(ref_in[ok]), atol=2e-4, rtol=1e-4)

    np.testing.assert_allclose(
        np.asarray(mine.init_obs.pos)[0][perm], ro["position"][0].numpy(),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mine.init_obs.ori)[0][perm], ro["heading"][0].numpy(),
        atol=1e-4)


def test_init_map_golden(pair):
    rbatch, mine, _ = pair
    rm = rbatch.extras["init_map"]
    ref_in = rm["input"][0].numpy()      # [2048, 19, 11]
    ref_mask = rm["mask"][0].numpy()     # [2048, 19]
    my_in = np.asarray(mine.init_map.vectors)[0]
    my_mask = np.asarray(mine.init_map.mask)[0]

    L = min(ref_in.shape[0], my_in.shape[0])
    np.testing.assert_array_equal(my_mask[:L], ref_mask[:L])
    np.testing.assert_allclose(
        my_in[:L][my_mask[:L]], ref_in[:L][ref_mask[:L]], atol=2e-4, rtol=1e-4)
    # any rows beyond the common range must be padding on both sides
    assert not ref_mask[L:].any() and not my_mask[L:].any()

    np.testing.assert_allclose(
        np.asarray(mine.init_map.pos)[0][:L],
        rm["position"][0].numpy().reshape(-1, 2)[:L], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(mine.init_map.ori)[0][:L],
        rm["heading"][0].numpy().reshape(-1)[:L], atol=2e-4)


def test_map_truncation_quirk(ref, ref_cfg):
    """Truncated crop (scene_0: 3170 in-range > 2048): the reference returns
    a STALE mask in pre-sort chunk order (format_utils.py:170-178). With
    REFERENCE_UNSORTED_MASK_QUIRK our mask must match it exactly, and the
    sorted vectors must match as a multiset (the reference's unstable
    distance sort permutes equal-distance duplicate polylines)."""
    my_cfg = get_config(opts=[
        "DATASET.DATA_PATHS.CACHE_DIR", CACHE,
        "DATASET.FORMAT.MAP.REFERENCE_UNSORTED_MASK_QUIRK", "True",
    ])
    rcfg = ref.config.get_config(
        "/root/reference/prosim_demo/cfg/no_text.yaml",
        opts=["PROMPT.CONDITION.TYPES", "['goal']"])
    scene = load_scene(CACHE, "waymo_train", "scene_0")
    rbatch = ref_bridge.build_stub_scene_batch(scene, SCENE_TS, my_cfg)
    rbatch = ref_bridge.run_reference_formatter(ref, rbatch, rcfg, "val")
    mine = format_scene(scene, my_cfg, SCENE_TS, split="val")

    rm = rbatch.extras["init_map"]
    ref_mask = rm["mask"][0].numpy()
    my_mask = np.asarray(mine.init_map.mask)[0]
    np.testing.assert_array_equal(my_mask, ref_mask)

    # rows whose crop distance ties AT the truncation boundary are selected
    # arbitrarily by the reference's unstable sort - exclude that distance
    # shell, compare the rest as multisets
    from prosim_tpu.data.formatter import vectorize_lanes
    from prosim_tpu.data.trajdata_cache import X, Y, H
    ego = scene.states[scene.ego_index, SCENE_TS]
    lv = vectorize_lanes(scene, ego[[X, Y]], ego[H], SCENE_TS, my_cfg)
    pvalid = lv[..., 4] > 0
    cnt = np.clip(pvalid.sum(-1), 1, None)
    dist = np.linalg.norm(
        (lv[..., :2] * pvalid[..., None]).sum(1) / cnt[:, None], axis=-1)
    in_range = np.sort(dist[dist < my_cfg.DATASET.FORMAT.MAP.LOCAL_RANGE])
    L = my_cfg.DATASET.FORMAT.MAP.MAX_POINTS
    d_star = in_range[L - 1]

    # canonical 11-d content for every in-range chunk (untruncated build, in
    # crop order) gives us the boundary-shell rows to exclude on both sides
    from prosim_tpu.data.formatter import build_init_map
    big_cfg = my_cfg.clone()
    big_cfg.DATASET.FORMAT.MAP.MAX_POINTS = len(in_range) + 8
    all_rows = np.asarray(build_init_map(lv, big_cfg).vectors)[0]
    keep_order = np.nonzero(dist < my_cfg.DATASET.FORMAT.MAP.LOCAL_RANGE)[0]
    tied = np.abs(dist[keep_order] - d_star) <= 1e-6
    tied_forms = {
        np.round(r, 4).tobytes()
        for r in all_rows[:len(keep_order)][tied].reshape(tied.sum(), -1)
    }

    def canon(rows):
        flat = np.round(rows.reshape(rows.shape[0], -1), 4)
        keepers = np.asarray(
            [r.tobytes() not in tied_forms for r in flat])
        flat = flat[keepers]
        return flat[np.lexsort(flat.T[::-1])]

    np.testing.assert_allclose(
        canon(np.nan_to_num(rm["input"][0].numpy())),
        canon(np.asarray(mine.init_map.vectors)[0]), atol=2e-4)


def test_prompt_golden(pair):
    rbatch, mine, meta = pair
    rp = rbatch.extras["prompt"]["motion_pred"]
    perm = _name_perm(rp["agent_ids"][0], meta["target_names"])
    n = len(rp["agent_ids"][0])

    np.testing.assert_allclose(
        np.asarray(mine.prompt.feat)[0][perm], rp["prompt"][0, :n].numpy(),
        atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mine.prompt.pos)[0][perm], rp["position"][0, :n].numpy(),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mine.prompt.ori)[0][perm],
        rp["heading"][0, :n, 0].numpy(), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(mine.prompt.agent_type)[0][perm],
        rp["agent_type"][0, :n].numpy())
    assert np.asarray(mine.prompt.mask)[0][perm].all()


def test_io_pairs_golden(pair):
    rbatch, mine, meta = pair
    io = rbatch.extras["io_pairs_batch"]
    ref_tgts = io["agent_names"][0]
    perm = _name_perm(ref_tgts, meta["target_names"])
    n = len(ref_tgts)

    assert list(io["T_indices"]) == list(np.asarray(mine.io_pairs.t_indices))

    ref_mask = io["mask"][0, :, :n].numpy()            # [T, n]
    my_mask = np.asarray(mine.io_pairs.mask)[0][:, perm]
    np.testing.assert_array_equal(my_mask, ref_mask)

    ref_tgt = io["tgt"][0, :, :n].numpy()              # [T, n, S, 5]
    my_tgt = np.asarray(mine.io_pairs.tgt)[0][:, perm]
    my_tv = np.asarray(mine.io_pairs.tgt_valid)[0][:, perm]
    # the reference keeps NaN at padded tail steps; our valid mask must
    # match that NaN pattern exactly on rows that are active
    np.testing.assert_array_equal(
        my_tv[ref_mask], ~np.isnan(ref_tgt[ref_mask]))
    np.testing.assert_allclose(
        my_tgt[ref_mask][my_tv[ref_mask]],
        ref_tgt[ref_mask][~np.isnan(ref_tgt[ref_mask])],
        atol=2e-4, rtol=1e-4)

    for rkey, mval in [
        ("position", mine.io_pairs.pos), ("heading", mine.io_pairs.ori),
        ("goal", mine.io_pairs.goal), ("init_vel", mine.io_pairs.init_vel),
    ]:
        ref_v = io[rkey][0, :, :n].numpy()
        if rkey == "heading":
            ref_v = ref_v[..., 0]
        my_v = np.asarray(mval)[0][:, perm]
        np.testing.assert_allclose(
            my_v[ref_mask], ref_v[ref_mask], atol=2e-4, rtol=1e-4,
            err_msg=rkey)

    if "extend" in io.keys():
        ref_ext = io["extend"][0, :, :n].numpy()       # [T, n, 2]
        my_ext = np.asarray(mine.io_pairs.extent)[0][:, perm]
        np.testing.assert_allclose(
            my_ext[ref_mask], ref_ext[ref_mask], atol=1e-4)

    # full future trajectory in the frame of the last history step
    ref_full = io["full_traj_xy"][0, :n].numpy()       # [n, T*S, 2]
    my_full = np.asarray(mine.io_pairs.full_traj_xy)[0][perm]
    my_fv = np.asarray(mine.io_pairs.full_traj_valid)[0][perm]
    S = ref_full.shape[1]
    np.testing.assert_array_equal(my_fv[:, :S], ~np.isnan(ref_full[..., 0]))
    np.testing.assert_allclose(
        my_full[:, :S][my_fv[:, :S]], ref_full[~np.isnan(ref_full[..., 0])],
        atol=2e-4, rtol=1e-4)


def test_fut_obs_golden(pair):
    rbatch, mine, meta = pair
    fo = rbatch.extras["fut_obs"]
    t_indices = np.asarray(mine.io_pairs.t_indices).tolist()
    for t in fo.keys():
        ri = t_indices.index(int(t))
        r = fo[t]
        perm = _name_perm(r["agent_ids"][0], meta["universe_names"])
        ref_in = r["input"][0].numpy()
        ref_mask = r["mask"][0].numpy().all(-1)
        my_in = np.asarray(mine.fut_obs.feat)[0, ri][perm]
        my_mask = np.asarray(mine.fut_obs.mask)[0, ri][perm]
        np.testing.assert_array_equal(my_mask, ref_mask, err_msg=f"t={t}")
        np.testing.assert_allclose(
            my_in[ref_mask], np.nan_to_num(ref_in[ref_mask]),
            atol=2e-4, rtol=1e-4, err_msg=f"t={t}")
        np.testing.assert_allclose(
            np.asarray(mine.fut_obs.pos)[0, ri][perm][ref_mask.any(-1)],
            r["position"][0].numpy()[ref_mask.any(-1)], atol=1e-4)
        # rows we keep (mask False) that the reference drops entirely must
        # carry no live steps
        extra = set(meta["universe_names"]) - set(r["agent_ids"][0])
        if extra:
            idxs = [meta["universe_names"].index(nm) for nm in extra]
            assert not np.asarray(mine.fut_obs.mask)[0, ri][idxs].any()


def test_all_t_indices_golden(pair):
    rbatch, mine, _ = pair
    np.testing.assert_array_equal(
        np.asarray(mine.io_pairs.t_indices),
        rbatch.extras["all_t_indices"].numpy())
