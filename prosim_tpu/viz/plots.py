"""Scene / rollout visualization.

Matplotlib plotting equivalent to the reference demo API
(reference: prosim/demo/vis.py:19-569, models/utils/visualization.py:31-301):
scene map + agent boxes + GT futures + rollout trajectories + prompt markers
(goals, drag points), all in the scene frame of a formatted SceneBatch.
"""

from typing import Dict, Optional

import numpy as np

from prosim_tpu.data.batch import SceneBatch

AGENT_COLORS = {1: "#1f77b4", 2: "#2ca02c", 3: "#ff7f0e"}  # veh / ped / cyc


def _box_corners(xy, heading, extent):
    l, w = extent[0] / 2, extent[1] / 2
    local = np.array([[l, w], [l, -w], [-l, -w], [-l, w]])
    c, s = np.cos(heading), np.sin(heading)
    R = np.array([[c, -s], [s, c]])
    return local @ R.T + xy


def plot_scene(
    batch: SceneBatch,
    bidx: int = 0,
    output: Optional[Dict] = None,
    show_gt: bool = True,
    show_goals: bool = False,
    ax=None,
    xlim=(-120, 120),
    ylim=(-120, 120),
):
    """Plot one scene (map + agents) with optional rollout overlay.

    Returns the matplotlib figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        fig, ax = plt.subplots(figsize=(9, 9))
    else:
        fig = ax.figure

    # map: plot lane segments in the scene frame (undo per-lane sym frames)
    mv = np.asarray(batch.init_map.vectors[bidx])
    mm = np.asarray(batch.init_map.mask[bidx])
    mp = np.asarray(batch.init_map.pos[bidx])
    mo = np.asarray(batch.init_map.ori[bidx])
    for li in np.nonzero(mm.any(-1))[0]:
        seg = mv[li][mm[li]]
        c, s = np.cos(mo[li]), np.sin(mo[li])
        R = np.array([[c, -s], [s, c]])
        start = seg[:, 0:2] @ R.T + mp[li]
        end = seg[:, 2:4] @ R.T + mp[li]
        is_center = seg[:, 4] == 1
        color = "#cccccc" if is_center.any() else "#999999"
        for a, b in zip(start, end):
            ax.plot([a[0], b[0]], [a[1], b[1]], color=color, lw=0.5, zorder=0)

    pmask = np.asarray(batch.prompt.mask[bidx])
    pos = np.asarray(batch.prompt.pos[bidx])
    ori = np.asarray(batch.prompt.ori[bidx])
    ext = np.asarray(batch.prompt.extent[bidx])
    types = np.asarray(batch.prompt.agent_type[bidx])

    for n in np.nonzero(pmask)[0]:
        corners = _box_corners(pos[n], ori[n], ext[n])
        ax.fill(
            corners[:, 0], corners[:, 1],
            color=AGENT_COLORS.get(int(types[n]), "#555"), alpha=0.8, zorder=3,
        )

    if show_gt and batch.io_pairs is not None:
        gt = np.asarray(batch.io_pairs.full_traj_xy[bidx])
        gv = np.asarray(batch.io_pairs.full_traj_valid[bidx])
        for n in np.nonzero(pmask)[0]:
            if not gv[n].any():
                continue
            # GT is in each agent's local frame; rotate out
            c, s = np.cos(ori[n]), np.sin(ori[n])
            R = np.array([[c, -s], [s, c]])
            world = gt[n][gv[n]] @ R.T + pos[n]
            ax.plot(world[:, 0], world[:, 1], color="#aaaaaa", lw=1.0, zorder=1)

    if output is not None:
        traj = np.asarray(output["rollout_traj"][bidx])
        init_pos = np.asarray(output["init_pos"][bidx])
        init_h = np.asarray(output["init_heading"][bidx])
        for n in np.nonzero(pmask)[0]:
            c, s = np.cos(init_h[n]), np.sin(init_h[n])
            R = np.array([[c, -s], [s, c]])
            world = traj[n, :, :2] @ R.T + init_pos[n]
            ax.plot(world[:, 0], world[:, 1],
                    color=AGENT_COLORS.get(int(types[n]), "#555"), lw=1.5, zorder=2)

    if show_goals:
        goals = np.asarray(batch.prompt.goal_point[bidx])
        ax.scatter(goals[pmask, 0], goals[pmask, 1], marker="*", s=80,
                   color="#d62728", zorder=4)

    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect("equal")
    ax.set_axis_off()
    return fig


def save_scene_png(batch, path, **kwargs):
    fig = plot_scene(batch, **kwargs)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path

def save_rollout_gif(batch, output, path, bidx=0, stride=2, fps=10, **kwargs):
    """Animate a closed-loop rollout as a GIF (reference wandb gif logging,
    models/utils/visualization.py:303-329): map + GT futures stay static,
    agent boxes move along the rolled-out trajectory."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig = plot_scene(batch, bidx=bidx, output=None, **kwargs)
    ax = fig.axes[0]

    pmask = np.asarray(batch.prompt.mask[bidx])
    types = np.asarray(batch.prompt.agent_type[bidx])
    ext = np.asarray(batch.prompt.extent[bidx])
    traj = np.asarray(output["rollout_traj"][bidx])      # [N, T, 4]
    init_pos = np.asarray(output["init_pos"][bidx])
    init_h = np.asarray(output["init_heading"][bidx])

    agents = np.nonzero(pmask)[0]
    world, heading = {}, {}
    for n in agents:
        c, s = np.cos(init_h[n]), np.sin(init_h[n])
        R = np.array([[c, -s], [s, c]])
        world[n] = traj[n, :, :2] @ R.T + init_pos[n]
        heading[n] = init_h[n] + np.arctan2(traj[n, :, 2], traj[n, :, 3])

    patches = {
        n: ax.fill(
            [], [], color=AGENT_COLORS.get(int(types[n]), "#555"),
            alpha=0.9, zorder=5,
        )[0]
        for n in agents
    }
    frames = range(0, traj.shape[1], stride)

    def update(t):
        for n in agents:
            corners = _box_corners(world[n][t], heading[n][t], ext[n])
            patches[n].set_xy(corners)
        return list(patches.values())

    anim = FuncAnimation(fig, update, frames=frames, blit=True)
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return path

def plot_goal_heatmap(batch, goal_point, goal_prob, path, bidx=0, agent=0,
                      sigma=8.0, bins=200, **kwargs):
    """Heatmap of an agent's predicted K-goal distribution over the scene
    (reference: models/utils/visualization.py:22-115
    vis_scene_goal_pred_heatmap). goal_point [B, N, K, 2] in the agent frame,
    goal_prob [B, N, K]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.ndimage import gaussian_filter

    fig = plot_scene(batch, bidx=bidx, **kwargs)
    ax = fig.axes[0]

    ori = float(np.asarray(batch.prompt.ori[bidx, agent]))
    pos = np.asarray(batch.prompt.pos[bidx, agent])
    c, s = np.cos(ori), np.sin(ori)
    R = np.array([[c, -s], [s, c]])
    pts = np.asarray(goal_point[bidx, agent]) @ R.T + pos  # [K, 2] scene frame
    prob = np.asarray(goal_prob[bidx, agent])
    prob = np.exp(prob - prob.max())
    prob = prob / prob.sum()

    lim = ax.get_xlim()
    hm, xe, ye = np.histogram2d(
        pts[:, 0], pts[:, 1], bins=bins,
        range=[ax.get_xlim(), ax.get_ylim()], weights=prob,
    )
    hm = gaussian_filter(hm.T, sigma=sigma)
    ax.imshow(
        hm, extent=(*ax.get_xlim(), *ax.get_ylim()), origin="lower",
        cmap="jet", alpha=0.5, zorder=6,
    )
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
