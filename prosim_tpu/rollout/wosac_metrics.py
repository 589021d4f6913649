"""Native WOSAC-style realism metrics.

The reference computes Waymo Sim Agents Challenge metrics through the
waymo-open-dataset TF/C++ ops (reference: prosim/rollout/distributed_utils.py:205-223,
waymo_utils.py:59-103). This module is a self-contained numpy implementation
of the same metric *structure* (Montali et al., "The Waymo Open Sim Agents
Challenge", 2023): per-feature histogram likelihood of the LOGGED future
under the distribution induced by the M simulated joint futures, aggregated
into kinematic / interactive / map-based groups and a weighted composite.

Use the official package for leaderboard numbers; this implementation gives
fast, dependency-free, directionally-consistent scores for training-time
eval and ablation (validated to rank logged-replay >> noise rollouts).

Feature set (per object, per simulated step):
  kinematic    linear speed, linear accel, angular speed, angular accel
  interactive  distance to nearest object, collision indicator, TTC
  map-based    distance to road edge (centerline fallback), offroad indicator
"""

import dataclasses
from typing import Dict, List, Optional

import numpy as np

DT = 0.1

# histogram configs: (min, max, bins); mirror the published value ranges
FEATURE_CONFIG = {
    "linear_speed": (0.0, 30.0, 30),
    "linear_acceleration": (-10.0, 10.0, 40),
    "angular_speed": (-3.0, 3.0, 30),
    "angular_acceleration": (-10.0, 10.0, 40),
    "distance_to_nearest_object": (0.0, 80.0, 40),
    "collision_indication": None,   # bernoulli
    "time_to_collision": (0.0, 10.0, 20),
    "distance_to_road_edge": (0.0, 20.0, 20),
    "offroad_indication": None,     # bernoulli
}

GROUPS = {
    "kinematic": ["linear_speed", "linear_acceleration", "angular_speed",
                  "angular_acceleration"],
    "interactive": ["distance_to_nearest_object", "collision_indication",
                    "time_to_collision"],
    "map_based": ["distance_to_road_edge", "offroad_indication"],
}

# composite weights follow the challenge metametric proportions
GROUP_WEIGHTS = {"kinematic": 0.2, "interactive": 0.5, "map_based": 0.3}


def _speed(xy):
    v = np.diff(xy, axis=-2) / DT
    return np.linalg.norm(v, axis=-1)  # [.., T-1]


def _heading_rate(h):
    dh = np.diff(np.unwrap(h, axis=-1), axis=-1) / DT
    return dh


def extract_features(xyh, extents, road_segments=None) -> Dict[str, np.ndarray]:
    """xyh [N, T, 3] one joint future; extents [N, 2].

    Returns feature arrays [N, T'] (per object per step)."""
    xy, h = xyh[..., :2], xyh[..., 2]
    N, T = h.shape

    feats = {}
    sp = _speed(xy)
    feats["linear_speed"] = sp
    feats["linear_acceleration"] = np.diff(sp, axis=-1) / DT
    w = _heading_rate(h)
    feats["angular_speed"] = w
    feats["angular_acceleration"] = np.diff(w, axis=-1) / DT

    # pairwise distances (center-to-center minus radii approximation)
    d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)  # [N, N, T]
    radii = np.linalg.norm(extents, axis=-1) / 2
    rsum = radii[:, None] + radii[None, :]
    gap = d - rsum[..., None]
    eye = np.eye(N, dtype=bool)
    gap[eye] = np.inf
    nearest = gap.min(axis=1)  # [N, T]
    feats["distance_to_nearest_object"] = np.clip(nearest, 0.0, None)
    feats["collision_indication"] = (nearest < 0).any(axis=-1, keepdims=True).astype(float)

    # time-to-collision: gap / closing speed along the pair line (simplified:
    # nearest gap / own speed)
    own_sp = np.concatenate([sp, sp[:, -1:]], axis=-1)
    feats["time_to_collision"] = np.clip(
        nearest / np.clip(own_sp, 0.3, None), 0.0, 10.0
    )

    if road_segments is not None:
        a, b = road_segments  # [E, 2], [E, 2]
        ab = b - a
        L2 = np.clip((ab * ab).sum(-1), 1e-9, None)
        q = xy.reshape(-1, 1, 2)
        t = np.clip(((q - a) * ab).sum(-1) / L2, 0, 1)
        proj = a + t[..., None] * ab
        dmin = np.linalg.norm(q - proj, axis=-1).min(-1).reshape(N, T)
        feats["distance_to_road_edge"] = dmin
        feats["offroad_indication"] = (dmin > 3.0).any(axis=-1, keepdims=True).astype(float)
    return feats


def _histogram_loglik(sim_samples: np.ndarray, log_value: float, cfg) -> float:
    """Log-likelihood of the logged value under a histogram fit to the
    simulated samples (additive smoothing over the support)."""
    lo, hi, bins = cfg
    edges = np.linspace(lo, hi, bins + 1)
    counts, _ = np.histogram(np.clip(sim_samples, lo, hi), bins=edges)
    probs = (counts + 0.1) / (counts.sum() + 0.1 * bins)
    idx = np.clip(np.searchsorted(edges, np.clip(log_value, lo, hi)) - 1, 0, bins - 1)
    return float(np.log(probs[idx]))


def _bernoulli_loglik(sim_samples: np.ndarray, log_value: float) -> float:
    p = float(np.clip(sim_samples.mean(), 0.02, 0.98))
    return float(np.log(p if log_value > 0.5 else 1 - p))


def scenario_metrics(
    sim_xyh: np.ndarray,      # [M, N, T, 3] simulated joint futures (world)
    log_xyh: np.ndarray,      # [N, T, 3] logged future (world)
    extents: np.ndarray,      # [N, 2]
    road_segments=None,       # optional ([E,2], [E,2]) world road segments
    valid: Optional[np.ndarray] = None,  # [N, T] logged validity
) -> Dict[str, float]:
    """Composite realism score for one scenario (higher = more realistic)."""
    M, N, T, _ = sim_xyh.shape
    sim_feats = [extract_features(sim_xyh[m], extents, road_segments) for m in range(M)]
    log_feats = extract_features(log_xyh, extents, road_segments)

    scores: Dict[str, float] = {}
    for name, cfg in FEATURE_CONFIG.items():
        if name not in log_feats:
            continue
        logliks = []
        lf = log_feats[name]
        Tn = lf.shape[-1]
        for n in range(N):
            if valid is not None and not valid[n].any():
                continue
            sim_vals = np.concatenate([sf[name][n] for sf in sim_feats])
            sim_vals = sim_vals[np.isfinite(sim_vals)]
            if sim_vals.size == 0:
                continue
            log_vals = lf[n][np.isfinite(lf[n])]
            for v in log_vals[:: max(1, Tn // 8)]:  # subsample time
                if cfg is None:
                    logliks.append(_bernoulli_loglik(sim_vals, v))
                else:
                    logliks.append(_histogram_loglik(sim_vals, v, cfg))
        if logliks:
            # map mean log-likelihood into (0, 1]; normalize by the uniform
            # baseline so 'uninformative' sims score near exp(-1)-ish
            scores[name] = float(min(1.0, np.exp(np.mean(logliks) - _max_loglik(cfg))))

    out = {}
    comp = 0.0
    wsum = 0.0
    for group, names in GROUPS.items():
        vals = [scores[n] for n in names if n in scores]
        if not vals:
            continue
        g = float(np.mean(vals))
        out[group] = g
        comp += GROUP_WEIGHTS[group] * g
        wsum += GROUP_WEIGHTS[group]
    out["composite"] = comp / wsum if wsum else 0.0
    out.update({f"feature/{k}": v for k, v in scores.items()})
    return out


def _max_loglik(cfg) -> float:
    """Log-likelihood of a perfectly-concentrated histogram (normalizer)."""
    if cfg is None:
        return float(np.log(0.98))
    _, _, bins = cfg
    return float(np.log((1.0 + 0.1) / (1.0 + 0.1 * bins)))


def aggregate_scenarios(per_scene: List[Dict[str, float]]) -> Dict[str, float]:
    keys = set().union(*per_scene) if per_scene else set()
    return {k: float(np.mean([s[k] for s in per_scene if k in s])) for k in keys}
