"""Rollout evaluation runner: the WOSAC farm, TPU-native.

The reference runs one process per scene with touch-file locking on a shared
filesystem (reference: prosim/rollout/distributed_utils.py:95-226). Here the
farm is deterministic index sharding: worker w of W handles scenes
w, w+W, w+2W, ...; each device batch packs several scenes x M replicas into
one compiled rollout. No locks, no IPC - re-running a worker is idempotent
(it overwrites its own npz outputs).
"""

import os
import time
from typing import Optional

import jax
import numpy as np

from prosim_tpu.data.dataset import ProSimImitationDataset
from prosim_tpu.models.prosim import ProSim
from prosim_tpu.rollout.rollout import (
    parallel_rollout, parallel_rollout_with_sampler, rollout_to_world)
from prosim_tpu.rollout.wosac import (
    ScenarioRollouts,
    joint_scenes_from_rollout,
    save_rollouts_npz,
    validate_scenario_rollouts,
)
from prosim_tpu.rollout.wosac_metrics import aggregate_scenarios, scenario_metrics


def run_rollout_eval(
    config,
    cache_dir: Optional[str] = None,
    out_dir: Optional[str] = None,
    worker_id: int = 0,
    num_workers: int = 1,
    m: Optional[int] = None,
    params=None,
    model: Optional[ProSim] = None,
    max_scenes: Optional[int] = None,
    compute_metrics: bool = True,
    skip_existing: bool = False,
    max_failures: Optional[int] = None,
    goal_sampler: str = "auto",
    sampler_params=None,
    sampler_top_k: int = 3,
    stop_smooth: float = 5.0,
):
    """Roll out M joint futures for every assigned scene and save world-frame
    trajectories (npz per scene; see wosac.package_submission).

    goal_sampler: 'auto' | 'on' | 'off'. The reference's WOSAC protocol gives
    the M replicas behavioral diversity by sampling each replica's goal
    condition from a goal-predictor's top-K heads (gpu_utils.py:179-216,
    top_K=3, smooth_dist=5.0); without it every replica is the argmax rollout,
    the per-object feature histograms are deltas, and the kinematic
    likelihoods sit on the smoothing floor. 'auto' uses the sampler whenever
    m > 1 and the model has goal heads (DECODER.GOAL_PRED.ENABLE), with the
    eval params doubling as the sampler (pass sampler_params for a separate
    sampler checkpoint like the reference's)."""
    m = m or config.ROLLOUT.SAMPLE_NUM
    out_dir = out_dir or os.path.join(
        config.EXPERIMENT_DIR, config.EXPERIMENT_NAME, "rollouts"
    )
    os.makedirs(out_dir, exist_ok=True)

    ds = ProSimImitationDataset(config, "rollout", cache_dir)
    model = model or ProSim(config)

    rng = jax.random.PRNGKey(config.SEED)
    if params is None:
        params = model.init(rng, ds.get_scene_batch(0))

    has_goal_heads = bool(config.MODEL.DECODER.GOAL_PRED.ENABLE)
    use_sampler = (goal_sampler == "on"
                   or (goal_sampler == "auto" and m > 1 and has_goal_heads))
    if goal_sampler == "on" and not has_goal_heads:
        raise ValueError("goal_sampler='on' requires DECODER.GOAL_PRED.ENABLE")
    if use_sampler:
        s_params = sampler_params if sampler_params is not None else params
        roll = jax.jit(
            lambda p, b, k: parallel_rollout_with_sampler(
                model, p, b, m, k, model, s_params,
                top_k=sampler_top_k, stop_smooth=stop_smooth),
        )
    else:
        roll = jax.jit(
            lambda p, b, k: parallel_rollout(model, p, b, m, k),
            static_argnames=(),
        )

    assigned = list(range(worker_id, len(ds), num_workers))
    if max_scenes:
        assigned = assigned[:max_scenes]
    all_metrics = []
    failures = 0

    for count, idx in enumerate(assigned):
        t0 = time.time()
        env, scene_name, ts = ds.index[idx]
        out_npz = os.path.join(out_dir, f"{env}__{scene_name}.npz")
        if skip_existing and os.path.exists(out_npz):
            # resume: outputs are idempotent, a finished scene needs no rework
            # (the reference resumes via its touch-file locks,
            # distributed_utils.py:151-158). Reload its metrics so the final
            # aggregate still covers previously-completed scenes.
            if compute_metrics:
                mpath = os.path.join(
                    out_dir, f"{env}__{scene_name}.metrics.json"
                )
                if os.path.exists(mpath):
                    import json

                    with open(mpath) as f:
                        all_metrics.append(json.load(f))
            continue
        try:
            _rollout_one_scene(
                ds, idx, env, scene_name, ts, roll, params, m,
                jax.random.fold_in(rng, idx), out_dir, compute_metrics,
                all_metrics, config,
            )
        except Exception as e:  # per-scene skip-and-continue
            # (reference: distributed_utils.py:175-226 try/except per scene)
            failures += 1
            print(f"[worker {worker_id}] scene {scene_name} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)
            if max_failures is not None and failures > max_failures:
                raise
            continue
        print(
            f"[worker {worker_id}] scene {scene_name}: done in "
            f"{time.time()-t0:.2f}s ({count+1}/{len(assigned)})",
            flush=True,
        )

    if compute_metrics and all_metrics:
        import json

        agg = aggregate_scenarios(all_metrics)
        with open(os.path.join(out_dir, "wosac_metrics.json"), "w") as f:
            json.dump(agg, f, indent=2)
        print("aggregate realism:", {k: round(v, 3) for k, v in agg.items()
                                     if "/" not in k}, flush=True)
    if failures:
        print(f"[worker {worker_id}] {failures} scene(s) failed and were "
              "skipped", flush=True)
    return out_dir


def restore_eval_params(config, ckpt_path: str, cache_dir: Optional[str] = None,
                        model: Optional[ProSim] = None, ds=None):
    """Load a Trainer checkpoint's params for farm-side evaluation:
    non-strict merge into a fresh init tree (absent leaves - the stripped
    frozen LLM body - keep init values)."""
    import orbax.checkpoint as ocp

    ds = ds or ProSimImitationDataset(config, "rollout", cache_dir)
    model = model or ProSim(config)
    init = model.init(jax.random.PRNGKey(config.SEED), ds.get_scene_batch(0))
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))

    def merge(cur, res):
        if not isinstance(cur, dict):
            return res
        return {k: merge(v, res[k]) if k in res else v for k, v in cur.items()}

    return merge(init, restored["params"]), model, ds


def serve_rollout_requests(
    config,
    cache_dir: Optional[str] = None,
    poll_s: float = 30.0,
    max_requests: Optional[int] = None,
    once: bool = False,
    worker_id: int = 0,
    num_workers: int = 1,
    **eval_kwargs,
):
    """Farm-side consumer of Trainer.submit_rollout_request files.

    Watches ROLLOUT_REQUEST_PATH for request JSONs (checkpoint path + epoch),
    claims each atomically by rename (the lock-free analogue of the
    reference farm's touch files, distributed_utils.py:151-158; the
    reference's external farm reads the same request contract,
    callbacks.py:373-399), loads the checkpoint, and runs the rollout eval
    into <exp_folder>/rollouts_ep<N>."""
    import glob as _glob
    import json

    req_dir = config.ROLLOUT_REQUEST_PATH
    assert req_dir, "config.ROLLOUT_REQUEST_PATH is not set"
    done = 0
    while True:
        for fp in sorted(_glob.glob(os.path.join(req_dir, "*.json"))):
            claim = f"{fp}.claimed_w{worker_id}"
            try:
                os.rename(fp, claim)
            except OSError:
                continue  # another worker claimed it
            with open(claim) as f:
                req = json.load(f)
            out_dir = os.path.join(req["exp_folder"], f"rollouts_ep{req['epoch']}")
            params, model, ds = restore_eval_params(
                config, req["ckpt_path"], cache_dir
            )
            run_rollout_eval(
                config, cache_dir, out_dir=out_dir, m=req.get("m"),
                params=params, model=model, worker_id=worker_id,
                num_workers=num_workers, **eval_kwargs,
            )
            done += 1
            if max_requests is not None and done >= max_requests:
                return done
        if once:
            return done
        time.sleep(poll_s)


def _world_lane_segments(scene, max_segments: int = 8192):
    """World-frame lane-center segments for the map-based metric fallback
    (official metrics use true road edges; the trajdata cache carries lane
    centerlines)."""
    if scene.map is None or not scene.map.lanes:
        return None
    starts, ends = [], []
    for lane in scene.map.lanes:
        c = np.asarray(lane.center)
        if len(c) >= 2:
            starts.append(c[:-1])
            ends.append(c[1:])
    if not starts:
        return None
    a = np.concatenate(starts).astype(np.float32)
    b = np.concatenate(ends).astype(np.float32)
    if len(a) > max_segments:
        stride = int(np.ceil(len(a) / max_segments))
        a, b = a[::stride], b[::stride]
    return a, b


def _rollout_one_scene(ds, idx, env, scene_name, ts, roll, params, m, sub,
                   out_dir, compute_metrics, all_metrics, config):
    scene = ds._load(env, scene_name)
    batch = ds.get_scene_batch(idx)
    out = roll(params, batch, sub)

    ego = scene.states[scene.ego_index, ts]
    center_xy = np.asarray(ego[:2], np.float32)[None]
    center_h = np.asarray([ego[7]], np.float32)
    world = rollout_to_world(
        out,
        batch,
        np.repeat(center_xy, m, axis=0),
        np.repeat(center_h, m, axis=0),
    )  # [M, N, T, 3]

    mask = np.asarray(batch.prompt.mask)[0]
    world_np = np.asarray(world)[:, mask]

    # agent z from the frame at scene_ts (planar policy)
    meta = {}
    from prosim_tpu.data.formatter import format_scene  # names

    format_scene(scene, config, ts, "rollout", out_meta=meta)
    names = meta["target_names"][: mask.sum()]
    name_to_row = {n: i for i, n in enumerate(scene.agent_names)}
    z = [float(np.nan_to_num(scene.states[name_to_row[n], ts, 2])) for n in names]
    # 'ego' is the renamed SDC track: remap it to its recorded WOMD object id
    # so the packaged submission carries the real sim-agent id (reference:
    # gpu_utils.py:286-288); -1 only when the cache never recorded one
    ego_oid = getattr(scene, "ego_object_id", None)
    oid = [int(n) if n.isdigit()
           else (ego_oid if n == "ego" and ego_oid is not None else -1)
           for n in names]

    sr = ScenarioRollouts(
        scenario_id=f"{env}/{scene_name}",
        joint_scenes=joint_scenes_from_rollout(world_np, oid, z),
    )
    validate_scenario_rollouts(
        sr, num_rollouts=m, steps=world_np.shape[2]
    )
    save_rollouts_npz(sr, os.path.join(out_dir, f"{env}__{scene_name}.npz"))

    if compute_metrics:
        # native realism metrics vs the logged future (reference farm
        # computes official WOSAC metrics per scene, distributed_utils.py:205-223)
        rows = [name_to_row[n] for n in names]
        fut = scene.states[rows, ts + 1 : ts + 1 + world_np.shape[2]]
        log_xyh = np.stack(
            [np.nan_to_num(fut[..., 0]), np.nan_to_num(fut[..., 1]),
             np.nan_to_num(fut[..., 7])], axis=-1,
        )
        extents = np.nan_to_num(scene.extents[rows])
        valid = scene.valid[rows, ts + 1 : ts + 1 + world_np.shape[2]]
        metrics = scenario_metrics(
            world_np, log_xyh, extents,
            road_segments=_world_lane_segments(scene), valid=valid,
        )
        import json

        with open(os.path.join(out_dir, f"{env}__{scene_name}.metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        all_metrics.append(metrics)
