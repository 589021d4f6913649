import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prosim_tpu.config import get_config
from prosim_tpu.train.losses import (
    rollout_traj,
    compute_rollout_loss,
    paired_mse_k,
    huber,
)


def _np_rollout_loop(traj, rollout_steps):
    """Explicit sequential re-integration: walk chunk by chunk, rotating each
    chunk's deltas into the frame reached by the previous chunks."""
    B, N, T, S, D = traj.shape
    out = np.zeros((B, N, T * rollout_steps, D), np.float64)
    for b in range(B):
        for n in range(N):
            x = np.zeros(2)
            th = 0.0
            k = 0
            for t in range(T):
                chunk = traj[b, n, t]  # cumulative offsets in chunk frame
                prev = np.zeros(3)
                for s in range(rollout_steps):
                    d_xy = chunk[s, :2] - prev[:2]
                    c, si = np.cos(th), np.sin(th)
                    R = np.array([[c, -si], [si, c]])
                    x = x + R @ d_xy
                    glob_th = th + chunk[s, 2]
                    out[b, n, k, :2] = x
                    out[b, n, k, 2] = np.arctan2(np.sin(glob_th), np.cos(glob_th))
                    if D == 5:
                        out[b, n, k, 3:] = R @ chunk[s, 3:5]
                    prev = chunk[s]
                    k += 1
                # next chunk is anchored at the pose reached after this chunk
                th = th + chunk[rollout_steps - 1, 2]
    return out


def test_rollout_traj_matches_sequential_integration():
    rng = np.random.default_rng(0)
    B, N, T, S = 2, 3, 4, 5
    rollout_steps = 5
    deltas = rng.normal(scale=0.5, size=(B, N, T, S, 5)).astype(np.float32)
    # build cumulative chunks the way the policy head does (cumsum of deltas)
    traj = deltas.copy()
    traj[..., :2] = np.cumsum(deltas[..., :2], axis=-2)
    traj[..., 2] = np.cumsum(deltas[..., 2], axis=-2)

    got = np.asarray(rollout_traj(jnp.asarray(traj), rollout_steps))
    want = _np_rollout_loop(traj, rollout_steps)
    np.testing.assert_allclose(got[..., :2], want[..., :2], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.sin(got[..., 2]), np.sin(want[..., 2]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(got[..., 3:], want[..., 3:], rtol=1e-4, atol=1e-4)


def test_huber():
    x = jnp.asarray([0.0, 0.5, 2.0])
    y = jnp.zeros(3)
    out = np.asarray(huber(x, y, 1.0))
    np.testing.assert_allclose(out, [0.0, 0.125, 1.5], atol=1e-6)


def test_rollout_loss_zero_when_equal():
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=(2, 3, 20, 5)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 3, 20)) > 0.3)
    cfg = get_config()
    loss, per_agent = compute_rollout_loss(t, t, mask, cfg)
    assert float(loss["pos"]) == 0.0
    assert float(loss["heading"]) == 0.0
    assert float(loss["vel"]) == 0.0


def test_rollout_loss_masks_invalid_steps():
    cfg = get_config()
    t = jnp.zeros((1, 1, 10, 5))
    p = t.at[0, 0, 5:, 0].set(100.0)  # large error only at steps 5+
    mask_valid_first = jnp.asarray(np.arange(10) < 5)[None, None]
    loss, _ = compute_rollout_loss(t, p, mask_valid_first, cfg)
    assert float(loss["pos"]) == 0.0  # errors only on masked-out steps


def test_paired_mse_k_perfect_prediction_is_zero():
    """Build a model output whose chunks equal the targets: rollout loss must
    vanish (goal/prompt aux terms disabled)."""
    cfg = get_config(opts=[
        "LOSS.ROLLOUT_TRAJ.USE_GOAL_PRED_LOSS", "False",
        "LOSS.ROLLOUT_TRAJ.USE_PROMPT_LOSS", "False",
    ])
    from prosim_tpu.data.synthetic import make_synthetic_batch

    batch = make_synthetic_batch(cfg, batch_size=2, num_lanes=8, num_obs_agents=8,
                                 num_agents=4, num_replan=3)
    io = batch.io_pairs
    B, T, N, S, D = io.tgt.shape
    # output layout [R=T, B, N, K=1, S, D] from the target
    pred = jnp.transpose(io.tgt, (1, 0, 2, 3, 4))[:, :, :, None]
    prob = jnp.ones((T, B, N, 1))
    output = {"motion_pred": pred, "motion_prob": prob}
    losses = paired_mse_k(batch, output, cfg)
    assert float(losses["rollout_pos_loss"]) < 1e-8
    assert float(losses["rollout_head_loss"]) < 1e-5
    assert float(losses["full_loss"]) < 1e-3


def test_paired_mse_k_nonzero_for_wrong_prediction():
    cfg = get_config(opts=[
        "LOSS.ROLLOUT_TRAJ.USE_GOAL_PRED_LOSS", "False",
        "LOSS.ROLLOUT_TRAJ.USE_PROMPT_LOSS", "False",
    ])
    from prosim_tpu.data.synthetic import make_synthetic_batch

    batch = make_synthetic_batch(cfg, batch_size=1, num_lanes=8, num_obs_agents=8,
                                 num_agents=4, num_replan=3)
    io = batch.io_pairs
    T, B, N = io.tgt.shape[1], io.tgt.shape[0], io.tgt.shape[2]
    pred = jnp.transpose(io.tgt, (1, 0, 2, 3, 4))[:, :, :, None] + 1.0
    prob = jnp.ones((T, B, N, 1))
    losses = paired_mse_k(batch, {"motion_pred": pred, "motion_prob": prob}, cfg)
    assert float(losses["full_loss"]) > 0.1
