"""Bridge between prosim_tpu's data structures and the reference torch
implementation running in place as an oracle (see reference_oracle.load_model).

Builds a trajdata-shaped stub SceneBatch (ref_shims.SceneBatch with
StateTensor fields) from prosim_tpu's SceneData so the reference
ImitationBatchFormat / ProSim can consume real demo-cache scenes.

Field semantics follow the trajdata scene-centric batch the reference
consumes (reference: prosim/dataset/basic.py:68-146 td config,
dataset/data_utils.py:29-55 state/obs formats, format_utils.py:222-636
attribute usage): all coordinates in the ego frame at scene_ts, agent_hist /
agent_fut in obs format 'x,y,z,xd,yd,xdd,ydd,s,c' with NaN where absent.
"""

import numpy as np
import torch

import ref_shims
from prosim_tpu.data.formatter import to_frame, vectorize_lanes
from prosim_tpu.data.trajdata_cache import SceneData, X, Y, Z, VX, VY, AX, AY, H

OBS_FORMAT = "x,y,z,xd,yd,xdd,ydd,s,c"


def _obs_state(states8):
    """[..., 8] x,y,z,xd,yd,xdd,ydd,h -> [..., 9] obs format with s,c."""
    s = np.sin(states8[..., H])
    c = np.cos(states8[..., H])
    return np.concatenate(
        [states8[..., [X, Y, Z, VX, VY, AX, AY]], s[..., None], c[..., None]],
        axis=-1,
    ).astype(np.float32)


def build_stub_scene_batch(scene: SceneData, scene_ts: int, config,
                           tgt_names=None):
    """SceneData -> reference-shaped stub SceneBatch (B=1).

    tgt_names: optionally restrict the predictable-agent set to these names
    (after the usual valid-at-ts + type filter); None keeps all.
    """
    ST = ref_shims.StateTensor
    Th = config.DATASET.FORMAT.HISTORY.STEPS
    dt = config.DATASET.MOTION.DT
    fut_len_max = int(round(config.DATASET.MOTION.FUTURE_SEC.TRAIN / dt))

    ego = scene.states[scene.ego_index, scene_ts]
    center_xy, center_h = ego[[X, Y]], ego[H]
    sstates = to_frame(scene.states, center_xy, center_h)  # [A, T, 8]

    valid_now = scene.valid[:, scene_ts]
    typed = np.isin(scene.agent_types, (1, 2, 3))
    keep = np.nonzero(valid_now & typed)[0].tolist()
    # trajdata scene-centric ordering: centered (ego) agent first
    if scene.ego_index in keep:
        keep.remove(scene.ego_index)
        keep.insert(0, scene.ego_index)

    names = [scene.agent_names[i] for i in keep]
    A = len(keep)

    t0h = scene_ts - Th + 1
    hist8 = np.full((A, Th, 8), np.nan, np.float64)
    lo = max(t0h, 0)
    hist8[:, lo - t0h:] = sstates[keep, lo:scene_ts + 1]

    fut8 = np.full((A, fut_len_max, 8), np.nan, np.float64)
    f_end = min(scene_ts + 1 + fut_len_max, scene.length)
    F = f_end - (scene_ts + 1)
    fut8[:, :F] = sstates[keep, scene_ts + 1:f_end]

    fut_valid = scene.valid[keep, scene_ts + 1:f_end]
    fut_valid = np.concatenate(
        [fut_valid, np.zeros((A, fut_len_max - F), bool)], axis=1)
    fut_len = np.where(
        fut_valid.any(-1),
        fut_len_max - np.argmax(fut_valid[:, ::-1], axis=-1),
        0,
    )

    def extent_steps(valid_slice):
        # trajdata carries per-step extents; NaN where the agent is absent
        ext = np.broadcast_to(
            scene.extents[keep][:, None, :], valid_slice.shape + (2,)).copy()
        ext = np.concatenate([ext, np.zeros_like(ext[..., :1])], axis=-1)
        ext[~valid_slice] = np.nan
        return ext.astype(np.float32)

    hist_valid = np.zeros((A, Th), bool)
    hist_valid[:, lo - t0h:] = scene.valid[keep, lo:scene_ts + 1]

    tgt = list(range(A))
    if tgt_names is not None:
        tgt = [i for i in tgt if names[i] in tgt_names]

    batch = ref_shims.SceneBatch(
        scene_ids=[scene.name],
        scene_ts=torch.tensor([scene_ts]),
        agent_names=[names],
        agent_hist=ST.from_array(_obs_state(hist8)[None], OBS_FORMAT),
        agent_fut=ST.from_array(_obs_state(fut8)[None], OBS_FORMAT),
        agent_fut_len=torch.tensor(fut_len[None], dtype=torch.long),
        agent_hist_extent=torch.tensor(extent_steps(hist_valid)[None]),
        agent_fut_extent=torch.tensor(extent_steps(fut_valid)[None]),
        agent_type=torch.tensor(scene.agent_types[keep][None],
                                dtype=torch.long),
        tgt_agent_idxs=[list(tgt)],
        extras={},
    )

    lane_vecs = vectorize_lanes(scene, center_xy, center_h, scene_ts, config)
    batch.extras["vector_lane"] = [torch.tensor(np.asarray(lane_vecs))]
    return batch


def run_reference_formatter(ref, batch, config, split="val"):
    """Drive the reference ImitationBatchFormat.apply_scene in place
    (reference: prosim/dataset/format_utils.py:689-815)."""
    fmt = ref.format_utils.ImitationBatchFormat(config, split)
    fmt.apply_scene(batch)
    return batch
