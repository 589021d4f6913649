"""WOSAC realism metrics, official metametric structure, dependency-free.

The reference computes Waymo Sim Agents Challenge metrics through the
waymo-open-dataset TF/C++ ops (reference: prosim/rollout/distributed_utils.py:205-223,
callbacks.py:234-239 loads `challenge_config.textproto`, waymo_utils.py:59-103).
This module reproduces the challenge's metric STRUCTURE faithfully in numpy
(Montali et al., "The Waymo Open Sim Agents Challenge", NeurIPS 2023):

  * per evaluated object, the distribution of each feature is estimated from
    the M simulated joint futures - a histogram with additive smoothing, or a
    Bernoulli (2-bin) estimate for indicator features;
  * with `independent_timesteps` the per-timestep simulated samples are
    pooled into one distribution and every valid logged timestep is scored;
    indicator features aggregate per-rollout (was the object EVER in
    collision / offroad in this rollout) and score the single logged outcome;
  * the feature score is exp(mean log-likelihood of the logged future);
  * the metametric is the weighted sum of feature scores; kinematic /
    interactive / map-based group means are reported alongside.

Feature definitions follow the official `sim_agents_metrics` package:
  linear speed/accel, angular speed/accel     one-step finite differences
  distance to nearest object                  exact oriented-box distance
  collision indication                        any box overlap per rollout
  time-to-collision                           corridor leader, gap / closing
  distance to road edge + offroad             signed distance when oriented
                                              road edges exist; lane-center
                                              margin fallback otherwise

`CHALLENGE_CONFIG` carries a best-effort transcription of the published
challenge config (ranges from the WOSAC paper; weights kinematic 4 x 0.05,
distance/TTC/road-distance 0.11, collision/offroad 0.22, normalized). For
leaderboard-exact constants, point `load_challenge_config_textproto` at the
official `challenge_config.textproto` (waymo-open-dataset package) - the
parser needs no protobuf dependency.
"""

import dataclasses
import math
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

DT = 0.1
MAX_TTC = 5.0


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    estimator: str                 # 'histogram' | 'bernoulli'
    min_val: float = 0.0
    max_val: float = 1.0
    num_bins: int = 10
    additive_smoothing_pseudocount: float = 0.001
    independent_timesteps: bool = True
    metametric_weight: float = 0.0


CHALLENGE_CONFIG: Dict[str, FeatureConfig] = {
    "linear_speed": FeatureConfig(
        "histogram", 0.0, 30.0, 60, independent_timesteps=True,
        metametric_weight=0.05),
    # symmetric ranges use ODD bin counts so 0 is a bin CENTER, not an edge:
    # stationary agents concentrate sim mass at exactly 0, and a knife-edge
    # bin boundary there would split the logged noise across two bins and
    # halve the likelihood for every parked car
    "linear_acceleration": FeatureConfig(
        "histogram", -10.0, 10.0, 41, independent_timesteps=True,
        metametric_weight=0.05),
    "angular_speed": FeatureConfig(
        "histogram", -math.pi, math.pi, 61, independent_timesteps=True,
        metametric_weight=0.05),
    "angular_acceleration": FeatureConfig(
        "histogram", -4 * math.pi, 4 * math.pi, 61, independent_timesteps=True,
        metametric_weight=0.05),
    "distance_to_nearest_object": FeatureConfig(
        "histogram", -10.0, 80.0, 90, independent_timesteps=True,
        metametric_weight=0.11),
    "collision_indication": FeatureConfig(
        "bernoulli", independent_timesteps=False, metametric_weight=0.22),
    "time_to_collision": FeatureConfig(
        "histogram", 0.0, MAX_TTC, 25, independent_timesteps=True,
        metametric_weight=0.11),
    "distance_to_road_edge": FeatureConfig(
        "histogram", -20.0, 20.0, 80, independent_timesteps=True,
        metametric_weight=0.11),
    "offroad_indication": FeatureConfig(
        "bernoulli", independent_timesteps=False, metametric_weight=0.22),
}

GROUPS = {
    "kinematic": ["linear_speed", "linear_acceleration", "angular_speed",
                  "angular_acceleration"],
    "interactive": ["distance_to_nearest_object", "collision_indication",
                    "time_to_collision"],
    "map_based": ["distance_to_road_edge", "offroad_indication"],
}


def load_challenge_config_textproto(path: str) -> Dict[str, FeatureConfig]:
    """Parse the official `challenge_config.textproto` (SimAgentMetricsConfig)
    into FeatureConfig entries. Text-level parse - no protobuf dependency."""
    with open(path) as f:
        text = f.read()

    out = {}
    for name in CHALLENGE_CONFIG:
        m = re.search(rf"{name}\s*{{(.*?)\n}}", text, re.S)
        if not m:
            continue
        block = m.group(1)

        def num(field, default):
            mm = re.search(rf"{field}\s*:\s*([-0-9.eE]+)", block)
            return float(mm.group(1)) if mm else default

        est = "bernoulli" if "bernoulli" in block else "histogram"
        out[name] = FeatureConfig(
            estimator=est,
            min_val=num("min_val", 0.0),
            max_val=num("max_val", 1.0),
            num_bins=int(num("num_bins", 10)),
            additive_smoothing_pseudocount=num(
                "additive_smoothing_pseudocount", 0.001),
            independent_timesteps="independent_timesteps: true" in block,
            metametric_weight=num("metametric_weight", 0.0),
        )
    return out


# The vendored constants file is the source of truth when present (drop the
# official waymo-open-dataset `challenge_config.textproto` in its place for
# leaderboard-exact values); the in-code table above is the fallback and is
# asserted equal to the vendored file by tests/test_wosac_golden.py.
_VENDORED_CONFIG = os.path.join(os.path.dirname(__file__),
                                "challenge_config.textproto")
if os.path.exists(_VENDORED_CONFIG):
    CHALLENGE_CONFIG.update(load_challenge_config_textproto(_VENDORED_CONFIG))


# ------------------------------------------------------------------ features

def _central_diff(x: np.ndarray) -> np.ndarray:
    """(x[t+1] - x[t-1]) / (2 dt) along the last axis, NaN at both ends
    (official trajectory_features.central_diff convention)."""
    nan = np.full(x.shape[:-1] + (1,), np.nan)
    d = (x[..., 2:] - x[..., :-2]) / (2 * DT)
    return np.concatenate([nan, d, nan], axis=-1)


def _kinematics(xyh: np.ndarray) -> Dict[str, np.ndarray]:
    """xyh [..., T, 3] -> per-step features [..., T].

    Central differences with NaN at both boundary steps, matching the
    official `sim_agents_metrics/trajectory_features.py` kinematics: central
    differencing halves the per-step perception noise that one-step diffs
    inject into the logged features (which otherwise lands logged samples in
    zero-mass histogram bins and collapses the kinematic likelihoods)."""
    xy, h = xyh[..., :2], xyh[..., 2]

    vx = _central_diff(xy[..., 0])
    vy = _central_diff(xy[..., 1])
    lin_speed = np.hypot(vx, vy)
    lin_acc = _central_diff(lin_speed)

    ang_speed = _central_diff(np.unwrap(h, axis=-1))
    ang_acc = _central_diff(ang_speed)
    return {
        "linear_speed": lin_speed,
        "linear_acceleration": lin_acc,
        "angular_speed": ang_speed,
        "angular_acceleration": ang_acc,
    }


def _box_corners(xy, h, extents):
    """xy [..., 2], h [...], extents [..., 2] -> [..., 4, 2]."""
    l, w = extents[..., 0] / 2, extents[..., 1] / 2
    lx = np.stack([l, l, -l, -l], -1)
    wy = np.stack([w, -w, -w, w], -1)
    c, s = np.cos(h)[..., None], np.sin(h)[..., None]
    return np.stack(
        [xy[..., 0:1] + lx * c - wy * s, xy[..., 1:2] + lx * s + wy * c], -1
    )


def _point_segment_dist(p, a, b):
    """p [..., P, 2] points, a/b [..., E, 2] segments -> [..., P] min dist."""
    ab = b - a
    L2 = np.clip((ab * ab).sum(-1), 1e-9, None)
    q = p[..., :, None, :]
    t = np.clip(((q - a[..., None, :, :]) * ab[..., None, :, :]).sum(-1) / L2[..., None, :], 0, 1)
    proj = a[..., None, :, :] + t[..., None] * ab[..., None, :, :]
    return np.linalg.norm(q - proj, axis=-1).min(-1)


def _pair_box_distance(xy, h, extents):
    """Exact signed distance between every agent pair's oriented boxes.

    xy [N, T, 2], h [N, T], extents [N, 2] -> [N, N, T]; negative =
    penetration (SAT depth, exact for convex boxes), positive = separation
    (min corner-to-edge distance, exact for convex polygons)."""
    N, T = h.shape
    corners = _box_corners(xy, h, extents[:, None, :])  # [N, T, 4, 2]

    # SAT over the 4 face axes of each pair
    axes_c = np.stack([np.cos(h), np.sin(h)], -1)       # [N, T, 2]
    axes_s = np.stack([-np.sin(h), np.cos(h)], -1)
    d = xy[None, :] - xy[:, None]                       # [N, N, T, 2]
    seps = []
    for ax_owner in (0, 1):
        for ax in (axes_c, axes_s):
            a = ax[:, None] if ax_owner == 0 else ax[None, :]  # [N, N(b), T, 2]
            a = np.broadcast_to(a, d.shape)
            center = np.abs((d * a).sum(-1))
            ra = (
                np.abs((axes_c[:, None] * a).sum(-1)) * extents[:, None, None, 0] / 2
                + np.abs((axes_s[:, None] * a).sum(-1)) * extents[:, None, None, 1] / 2
            )
            rb = (
                np.abs((axes_c[None, :] * a).sum(-1)) * extents[None, :, None, 0] / 2
                + np.abs((axes_s[None, :] * a).sum(-1)) * extents[None, :, None, 1] / 2
            )
            seps.append(center - ra - rb)
    sat = np.stack(seps, -1).max(-1)  # [N, N, T]; >0 => separated

    # exact separation distance: min corner(A)-edge(B) / corner(B)-edge(A)
    # computed only pairwise-cheaply: corners [N, T, 4, 2]
    full = (N, N, T, 4, 2)
    ca = np.broadcast_to(corners[:, None], full)         # A corners per pair
    cb = np.broadcast_to(corners[None, :], full)
    eb_a = cb                                            # B edge starts
    eb_b = np.roll(cb, -1, axis=-2)
    d_ab = _point_segment_dist(
        ca.reshape(-1, 4, 2), eb_a.reshape(-1, 4, 2), eb_b.reshape(-1, 4, 2)
    ).reshape(N, N, T, 4).min(-1)
    ea_a = ca
    ea_b = np.roll(ca, -1, axis=-2)
    d_ba = _point_segment_dist(
        cb.reshape(-1, 4, 2), ea_a.reshape(-1, 4, 2), ea_b.reshape(-1, 4, 2)
    ).reshape(N, N, T, 4).min(-1)
    sep = np.minimum(d_ab, d_ba)

    return np.where(sat > 0, sep, sat)


def _time_to_collision(xy, h, extents, speed):
    """Corridor-leader TTC (official interaction_features semantics): for
    each agent, the nearest object ahead within a lateral corridor; TTC =
    longitudinal gap / closing speed when closing, else MAX_TTC.

    xy [N, T, 2], h [N, T], extents [N, 2], speed [N, T] -> [N, T]."""
    N, T = h.shape
    c, s = np.cos(h), np.sin(h)
    rel = xy[None, :] - xy[:, None]                     # [ego, other, T, 2]
    lon = rel[..., 0] * c[:, None] + rel[..., 1] * s[:, None]
    lat = -rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]

    half_len = extents[:, 0] / 2
    corridor = (extents[:, None, 1] + extents[None, :, 1]) / 2  # [ego, other]
    ahead = (lon > 0) & (np.abs(lat) < corridor[..., None])
    eye = np.eye(N, dtype=bool)[..., None]
    ahead &= ~eye

    gap = lon - half_len[:, None, None] - half_len[None, :, None]
    closing = speed[:, None] - speed[None, :]           # [ego, other, T]
    ttc = np.where(
        ahead & (closing > 0.1) & (gap > 0), gap / np.clip(closing, 0.1, None),
        np.inf,
    )
    ttc = np.where(ahead & (gap <= 0), 0.0, ttc)
    return np.clip(ttc.min(axis=1), 0.0, MAX_TTC)


def extract_features(
    xyh: np.ndarray,               # [N, T, 3] one joint future (world frame)
    extents: np.ndarray,           # [N, 2]
    road_edges: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    road_edges_oriented: bool = False,
    offroad_margin: float = 3.0,
    valid: Optional[np.ndarray] = None,   # [N, T] per-step validity
) -> Dict[str, np.ndarray]:
    """Per-object features; [N, T] arrays (NaN where undefined), indicator
    features [N, 1] per-rollout booleans.

    `valid` marks logged-trajectory steps where the object actually exists;
    without it, zero-filled padding at absent steps would inject phantom
    boxes at the origin into every pairwise/TTC/road feature and corrupt the
    finite-difference kinematics across validity gaps (the official
    sim_agents_metrics evaluates only valid steps)."""
    N, T = xyh.shape[:2]
    feats = _kinematics(xyh)

    if valid is not None:
        # central differences touching an absent step are undefined
        v = valid.astype(bool)

        def shrink(m):  # m[t] -> m[t-1] & m[t] & m[t+1]
            z = np.zeros((N, 1), bool)
            return (np.concatenate([z, m[:, :-1]], 1) & m
                    & np.concatenate([m[:, 1:], z], 1))

        v1 = shrink(v)        # speed / angular speed
        v2 = shrink(v1)       # accelerations (central diff of speeds)
        for name, vk in (("linear_speed", v1), ("linear_acceleration", v2),
                         ("angular_speed", v1), ("angular_acceleration", v2)):
            feats[name] = np.where(vk, feats[name], np.nan)
        # park absent objects far apart so they never interact with real ones
        sentinel = 1e7 * (1.0 + np.arange(N))[:, None, None]
        xyh = np.where(valid[..., None], xyh,
                       np.concatenate([sentinel, sentinel, sentinel], -1))

    speed = np.nan_to_num(feats["linear_speed"])

    pd = _pair_box_distance(xyh[..., :2], xyh[..., 2], extents)
    pd[np.eye(N, dtype=bool)] = np.inf
    nearest = pd.min(axis=1)                            # [N, T]
    ttc = _time_to_collision(xyh[..., :2], xyh[..., 2], extents, speed)
    if valid is not None:
        nearest = np.where(valid, nearest, np.nan)
        ttc = np.where(valid, ttc, np.nan)
    feats["distance_to_nearest_object"] = nearest
    feats["collision_indication"] = (
        np.nan_to_num(nearest, nan=np.inf) < 0
    ).any(-1, keepdims=True).astype(float)

    feats["time_to_collision"] = ttc

    if road_edges is not None:
        a, b = road_edges
        xy = xyh[..., :2]
        if road_edges_oriented:
            # signed distance to oriented road edges: positive = offroad
            # (right of the edge direction, Waymo convention)
            ab = b - a
            L2 = np.clip((ab * ab).sum(-1), 1e-9, None)
            q = xy.reshape(-1, 1, 2)
            t = np.clip(((q - a) * ab).sum(-1) / L2, 0, 1)
            proj = a + t[..., None] * ab
            dist = np.linalg.norm(q - proj, axis=-1)
            nearest_e = dist.argmin(-1)
            dmin = dist[np.arange(len(dist)), nearest_e]
            an, abn = a[nearest_e], ab[nearest_e]
            off = q[:, 0] - an
            cross = abn[:, 0] * off[:, 1] - abn[:, 1] * off[:, 0]
            signed = np.where(cross < 0, dmin, -dmin).reshape(N, T)
        else:
            # lane-center fallback: distance to the nearest centerline minus
            # the margin plays the signed road-edge role (positive = offroad)
            dmin = _point_segment_dist(xy.reshape(1, -1, 2), a[None], b[None])
            signed = dmin.reshape(N, T) - offroad_margin
        if valid is not None:
            # absent steps sit at the far-away sentinel -> spuriously offroad
            signed = np.where(valid, signed, np.nan)
        feats["distance_to_road_edge"] = signed
        feats["offroad_indication"] = (
            np.nan_to_num(signed, nan=-np.inf) > 0
        ).any(-1, keepdims=True).astype(float)
    return feats


# ---------------------------------------------------------------- likelihood

def _histogram_logliks(sim: np.ndarray, log_vals: np.ndarray,
                       cfg: FeatureConfig) -> np.ndarray:
    """Log-likelihood of each logged value under the histogram estimated from
    the simulated samples (additive smoothing, official estimator)."""
    edges = np.linspace(cfg.min_val, cfg.max_val, cfg.num_bins + 1)
    counts, _ = np.histogram(np.clip(sim, cfg.min_val, cfg.max_val), bins=edges)
    pc = cfg.additive_smoothing_pseudocount
    probs = (counts + pc) / (counts.sum() + pc * cfg.num_bins)
    idx = np.clip(
        np.searchsorted(edges, np.clip(log_vals, cfg.min_val, cfg.max_val),
                        side="right") - 1,
        0, cfg.num_bins - 1,
    )
    return np.log(probs[idx])


def _bernoulli_logliks(sim: np.ndarray, log_vals: np.ndarray,
                      cfg: FeatureConfig) -> np.ndarray:
    """Bernoulli = 2-bin histogram with additive smoothing."""
    pc = cfg.additive_smoothing_pseudocount
    n = sim.size
    p_true = (float((sim > 0.5).sum()) + pc) / (n + 2 * pc)
    p = np.where(log_vals > 0.5, p_true, 1.0 - p_true)
    return np.log(p)


def scenario_metrics(
    sim_xyh: np.ndarray,      # [M, N, T, 3] simulated joint futures (world)
    log_xyh: np.ndarray,      # [N, T, 3] logged future (world)
    extents: np.ndarray,      # [N, 2]
    road_segments=None,       # optional ([E, 2], [E, 2]) world segments
    road_edges_oriented: bool = False,
    valid: Optional[np.ndarray] = None,   # [N, T] logged validity
    config: Optional[Dict[str, FeatureConfig]] = None,
) -> Dict[str, float]:
    """Official-structure realism metrics for one scenario.

    Returns feature scores (exp mean log-likelihood), group means, and the
    weighted `metametric` composite."""
    cfgs = config or CHALLENGE_CONFIG
    M, N, T, _ = sim_xyh.shape

    kw = dict(road_edges=road_segments,
              road_edges_oriented=road_edges_oriented)
    obj_valid = valid.any(-1) if valid is not None else np.ones(N, bool)
    # simulated objects exist for the whole horizon, but objects that never
    # appear in the log are padding and must not interact in sim either
    sim_valid = (np.broadcast_to(obj_valid[:, None], (N, T))
                 if valid is not None else None)
    sim_feats = [extract_features(sim_xyh[m], extents, valid=sim_valid, **kw)
                 for m in range(M)]
    log_feats = extract_features(log_xyh, extents, valid=valid, **kw)

    scores: Dict[str, float] = {}
    for name, cfg in cfgs.items():
        if name not in log_feats:
            continue
        logliks = []
        for n in range(N):
            if not obj_valid[n]:
                continue
            sim_vals = np.concatenate([sf[name][n] for sf in sim_feats])
            sim_vals = sim_vals[np.isfinite(sim_vals)]
            if sim_vals.size == 0:
                continue
            lv = log_feats[name][n]
            if cfg.independent_timesteps and valid is not None and lv.shape[0] == T:
                lv = lv[valid[n]]
            lv = lv[np.isfinite(lv)]
            if lv.size == 0:
                continue
            if cfg.estimator == "bernoulli":
                logliks.append(_bernoulli_logliks(sim_vals, lv, cfg))
            else:
                logliks.append(_histogram_logliks(sim_vals, lv, cfg))
        if logliks:
            scores[name] = float(np.exp(np.mean(np.concatenate(logliks))))

    out = {f"feature/{k}": v for k, v in scores.items()}
    for group, names in GROUPS.items():
        vals = [scores[n] for n in names if n in scores]
        if vals:
            out[group] = float(np.mean(vals))

    wsum = sum(cfgs[n].metametric_weight for n in scores)
    if wsum > 0:
        out["metametric"] = float(
            sum(cfgs[n].metametric_weight * s for n, s in scores.items()) / wsum
        )
        out["composite"] = out["metametric"]  # back-compat alias
    return out


def aggregate_scenarios(per_scene: List[Dict[str, float]]) -> Dict[str, float]:
    keys = set().union(*per_scene) if per_scene else set()
    return {k: float(np.mean([s[k] for s in per_scene if k in s])) for k in keys}
