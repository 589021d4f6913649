"""Offroad and collision losses.

JAX-native equivalents of the reference's safety losses
(reference: prosim/loss/loss_func.py:617-1383, loss/offroad_loss.py:55-203):

  offroad   - signed distance from rollout bounding-box corners to road-edge
              polylines (positive = outside the drivable area, using the
              Waymo convention that road edges are oriented with the road on
              their left); hinge on positive distances.
  collision - separating-axis signed distance between oriented boxes of
              top-K nearest agent pairs (the reference ports Waymo's
              Minkowski-sum distance; SAT penetration depth is exact for
              overlaps, which is the regime the hinge penalizes).

Everything is dense padded tensors - no shapely/GEOS.
"""

from functools import partial

import jax
import jax.numpy as jnp

from prosim_tpu.utils.geometry import rotate_2d


def signed_distance_to_edges(points, edge_pts, edge_next, edge_valid):
    """Signed distance from points to oriented edge segments.

    points [*, 2]; edge_pts/edge_next [E, 2] segment start/end;
    edge_valid [E]. Positive = right of the edge direction (off-road for
    Waymo-oriented edges). Distance is to the nearest valid segment.
    """
    p = points[..., None, :]            # [*, E(bcast), 2]
    a = edge_pts                        # [E, 2]
    b = edge_next
    ab = b - a
    ab_len2 = jnp.maximum((ab * ab).sum(-1), 1e-9)
    t = jnp.clip(((p - a) * ab).sum(-1) / ab_len2, 0.0, 1.0)  # [*, E]
    proj = a + t[..., None] * ab
    diff = p - proj
    dist = jnp.linalg.norm(diff, axis=-1)                      # [*, E]
    dist = jnp.where(edge_valid, dist, jnp.inf)
    nearest = jnp.argmin(dist, axis=-1)                        # [*]

    d_min = jnp.take_along_axis(dist, nearest[..., None], axis=-1)[..., 0]
    a_n = a[nearest]
    ab_n = ab[nearest]
    p_off = points - a_n
    cross = ab_n[..., 0] * p_off[..., 1] - ab_n[..., 1] * p_off[..., 0]
    sign = jnp.where(cross < 0, 1.0, -1.0)  # right of edge -> positive (offroad)
    return jnp.where(jnp.isfinite(d_min), sign * d_min, 0.0)


def box_corners(xy, heading, extent):
    """xy [*, 2], heading [*], extent [*, 2] -> corners [*, 4, 2]."""
    l, w = extent[..., 0] / 2, extent[..., 1] / 2
    local = jnp.stack(
        [
            jnp.stack([l, w], -1),
            jnp.stack([l, -w], -1),
            jnp.stack([-l, -w], -1),
            jnp.stack([-l, w], -1),
        ],
        axis=-2,
    )  # [*, 4, 2]
    return rotate_2d(local, heading[..., None]) + xy[..., None, :]


def offroad_loss_centerline(
    traj_xyh,      # [B, N, T, 3] scene frame
    extents,       # [B, N, 2]
    agent_mask,    # [B, N]
    seg_pts,       # [B, E, 2] lane CENTER segment starts
    seg_next,      # [B, E, 2]
    seg_valid,     # [B, E]
    t_sample: int = 10,
    margin: float = 3.0,
    gt_traj_xyh=None,  # [B, N, T, 3] logged trajectory for GT-offroad masking
):
    """Fallback offroad penalty when dedicated road-edge data is absent:
    hinge on (distance to the nearest lane centerline - margin). GT traffic
    stays within ~half a lane of some centerline, so this is zero on logged
    trajectories while penalizing rollouts that leave the road network."""
    xy = traj_xyh[..., ::t_sample, :2]

    def per_scene(p, a, b, v):
        q = p[..., None, :]
        ab = b - a
        ab_len2 = jnp.maximum((ab * ab).sum(-1), 1e-9)
        t = jnp.clip(((q - a) * ab).sum(-1) / ab_len2, 0.0, 1.0)
        proj = a + t[..., None] * ab
        d = jnp.linalg.norm(q - proj, axis=-1)
        d = jnp.where(v, d, jnp.inf)
        return d.min(-1)

    dmin = jax.vmap(per_scene)(xy, seg_pts, seg_next, seg_valid)  # [B, N, Ts]
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
    pen = jax.nn.relu(dmin - margin)
    valid = agent_mask[..., None] & jnp.ones_like(pen, bool)
    if gt_traj_xyh is not None:
        # skip agents whose LOGGED trajectory already leaves the mapped road
        # network (parking lots etc.) - reference OFFROAD_TGT_MODE semantics
        gt_xy = gt_traj_xyh[..., ::t_sample, :2]
        gt_d = jax.vmap(per_scene)(gt_xy, seg_pts, seg_next, seg_valid)
        gt_d = jnp.where(jnp.isfinite(gt_d), gt_d, 0.0)
        gt_on_road = (gt_d <= margin).all(axis=-1)  # [B, N]
        valid = valid & gt_on_road[..., None]
    return jnp.where(valid, pen, 0.0).sum() / jnp.clip(valid.sum(), 1, None)


def offroad_loss(
    traj_xyh,        # [B, N, T, 3] scene-frame rollout (x, y, heading)
    extents,         # [B, N, 2]
    agent_mask,      # [B, N]
    edge_pts,        # [B, E, 2] road-edge segment starts (scene frame)
    edge_next,       # [B, E, 2] segment ends
    edge_valid,      # [B, E]
    gt_offroad=None, # [B, N] optional: skip agents whose GT is already offroad
    t_sample: int = 10,
    margin: float = 0.0,
):
    """Hinge on max corner signed distance (reference: loss_func.py:788-1010)."""
    xy = traj_xyh[..., ::t_sample, :2]
    h = traj_xyh[..., ::t_sample, 2]
    corners = box_corners(xy, h, extents[..., None, :])  # [B, N, Ts, 4, 2]

    def per_scene(c, ep, en, ev):
        return signed_distance_to_edges(c, ep, en, ev)

    sd = jax.vmap(per_scene)(corners, edge_pts, edge_next, edge_valid)  # [B,N,Ts,4]
    worst = sd.max(axis=-1)  # [B, N, Ts] most-offroad corner
    pen = jax.nn.relu(worst + margin)
    valid = agent_mask[..., None] & jnp.ones_like(pen, bool)
    if gt_offroad is not None:
        valid = valid & ~gt_offroad[..., None]
    return jnp.where(valid, pen, 0.0).sum() / jnp.clip(valid.sum(), 1, None)


def _sat_signed_distance(xy_a, h_a, ext_a, xy_b, h_b, ext_b):
    """Separating-axis signed distance between two oriented boxes.

    Negative = penetration (exact depth); positive = lower bound on the true
    separation. Shapes broadcast over leading dims.
    """
    axes = []
    for hh in (h_a, h_b):
        c, s = jnp.cos(hh), jnp.sin(hh)
        axes.append(jnp.stack([c, s], -1))
        axes.append(jnp.stack([-s, c], -1))
    d = xy_b - xy_a

    seps = []
    for ax in axes:
        center = jnp.abs((d * ax).sum(-1))
        ra = (
            jnp.abs((jnp.stack([jnp.cos(h_a), jnp.sin(h_a)], -1) * ax).sum(-1)) * ext_a[..., 0] / 2
            + jnp.abs((jnp.stack([-jnp.sin(h_a), jnp.cos(h_a)], -1) * ax).sum(-1)) * ext_a[..., 1] / 2
        )
        rb = (
            jnp.abs((jnp.stack([jnp.cos(h_b), jnp.sin(h_b)], -1) * ax).sum(-1)) * ext_b[..., 0] / 2
            + jnp.abs((jnp.stack([-jnp.sin(h_b), jnp.cos(h_b)], -1) * ax).sum(-1)) * ext_b[..., 1] / 2
        )
        seps.append(center - ra - rb)
    return jnp.stack(seps, -1).max(-1)


def collision_loss(
    traj_xyh,       # [B, N, T, 3] scene frame
    extents,        # [B, N, 2]
    agent_mask,     # [B, N]
    agent_types=None,
    k: int = 4,
    t_sample: int = 10,
    threshold: float = 0.0,
    vehicle_only: bool = True,
    gt_traj_xyh=None,  # [B, N, T, 3] logged trajectories for GT masking
):
    """Hinge on SAT distance to the K nearest neighbors at sampled steps
    (reference: loss_func.py:1012-1383). Pairs that collide in the LOGGED
    data (parked cars measured as overlapping, annotation noise) are skipped
    when gt_traj_xyh is given."""
    xy = traj_xyh[..., ::t_sample, :2]   # [B, N, Ts, 2]
    h = traj_xyh[..., ::t_sample, 2]
    B, N, Ts, _ = xy.shape

    mask = agent_mask
    if vehicle_only and agent_types is not None:
        mask = mask & (agent_types == 1)

    # K nearest by first-step distance (static K)
    d0 = jnp.linalg.norm(xy[:, :, None, 0] - xy[:, None, :, 0], axis=-1)  # [B,N,N]
    pair_ok = mask[:, :, None] & mask[:, None, :] & ~jnp.eye(N, dtype=bool)[None]
    d0 = jnp.where(pair_ok, d0, jnp.inf)
    k_eff = min(k, N - 1) if N > 1 else 1
    neg, nbr = jax.lax.top_k(-d0, k_eff)  # [B, N, K]
    nbr_ok = neg > -jnp.inf

    # gather neighbor trajectories/extents/headings
    def gather(arr, idx):
        # arr [B, N, ...], idx [B, N, K] -> [B, N, K, ...]
        return jnp.take_along_axis(
            arr[:, None], idx[(...,) + (None,) * (arr.ndim - 2)], axis=2
        )

    xy_n = gather(xy, nbr)       # [B, N, K, Ts, 2]
    h_n = gather(h, nbr)         # [B, N, K, Ts]
    ext_n = gather(extents, nbr) # [B, N, K, 2]

    sd = _sat_signed_distance(
        xy[:, :, None], h[:, :, None], extents[:, :, None, None, :],
        xy_n, h_n, ext_n[:, :, :, None, :],
    )  # [B, N, K, Ts]

    pen = jax.nn.relu(threshold - sd)
    valid = (mask[:, :, None] & nbr_ok)[..., None] & jnp.ones_like(pen, bool)
    if gt_traj_xyh is not None:
        gxy = gt_traj_xyh[..., ::t_sample, :2]
        gh = gt_traj_xyh[..., ::t_sample, 2]
        gxy_n = gather(gxy, nbr)
        gh_n = gather(gh, nbr)
        gsd = _sat_signed_distance(
            gxy[:, :, None], gh[:, :, None], extents[:, :, None, None, :],
            gxy_n, gh_n, ext_n[:, :, :, None, :],
        )
        valid = valid & ~((threshold - gsd) > 0).any(axis=-1, keepdims=True)
    return jnp.where(valid, pen, 0.0).sum() / jnp.clip(valid.sum(), 1, None)
