import numpy as np
import jax.numpy as jnp

from prosim_tpu.train.safety_losses import (
    signed_distance_to_edges,
    box_corners,
    offroad_loss,
    collision_loss,
    _sat_signed_distance,
)


def test_signed_distance_sign_convention():
    # edge along +x: road on the LEFT (y > 0), offroad on the right (y < 0)
    edge_a = jnp.asarray([[0.0, 0.0], [10.0, 0.0]])
    edge_b = jnp.asarray([[10.0, 0.0], [20.0, 0.0]])
    valid = jnp.ones(2, bool)
    pts = jnp.asarray([[5.0, 2.0], [5.0, -3.0], [15.0, 1.0]])
    sd = np.asarray(signed_distance_to_edges(pts, edge_a, edge_b, valid))
    assert sd[0] < 0  # on-road (left)
    np.testing.assert_allclose(sd[0], -2.0, atol=1e-5)
    assert sd[1] > 0  # off-road (right)
    np.testing.assert_allclose(sd[1], 3.0, atol=1e-5)
    np.testing.assert_allclose(sd[2], -1.0, atol=1e-5)


def test_box_corners():
    c = np.asarray(box_corners(jnp.zeros(2), jnp.asarray(0.0), jnp.asarray([4.0, 2.0])))
    assert c.shape == (4, 2)
    np.testing.assert_allclose(np.abs(c[:, 0]).max(), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.abs(c[:, 1]).max(), 1.0, atol=1e-6)


def test_sat_distance_overlap_and_separation():
    # two axis-aligned 4x2 boxes, centers 3 m apart along x -> overlap 1 m
    sd = float(_sat_signed_distance(
        jnp.asarray([0.0, 0.0]), jnp.asarray(0.0), jnp.asarray([4.0, 2.0]),
        jnp.asarray([3.0, 0.0]), jnp.asarray(0.0), jnp.asarray([4.0, 2.0]),
    ))
    np.testing.assert_allclose(sd, -1.0, atol=1e-5)
    # 6 m apart -> 2 m gap
    sd2 = float(_sat_signed_distance(
        jnp.asarray([0.0, 0.0]), jnp.asarray(0.0), jnp.asarray([4.0, 2.0]),
        jnp.asarray([6.0, 0.0]), jnp.asarray(0.0), jnp.asarray([4.0, 2.0]),
    ))
    np.testing.assert_allclose(sd2, 2.0, atol=1e-5)


def test_offroad_loss_zero_inside():
    # straight road: right edge at y=-4 (road above), left edge at y=+4
    # oriented so road is left of each edge direction
    E = 10
    xs = np.linspace(0, 50, E + 1)
    right_a = np.stack([xs[:-1], np.full(E, -4.0)], -1)   # +x direction, road above (left)
    right_b = np.stack([xs[1:], np.full(E, -4.0)], -1)
    left_a = np.stack([xs[1:], np.full(E, 4.0)], -1)      # -x direction, road below (left)
    left_b = np.stack([xs[:-1], np.full(E, 4.0)], -1)
    ea = jnp.asarray(np.concatenate([right_a, left_a]))[None]
    eb = jnp.asarray(np.concatenate([right_b, left_b]))[None]
    ev = jnp.ones((1, 2 * E), bool)

    # agent driving down the middle
    T = 20
    traj = np.zeros((1, 1, T, 3), np.float32)
    traj[0, 0, :, 0] = np.linspace(5, 45, T)
    loss_in = float(offroad_loss(
        jnp.asarray(traj), jnp.asarray([[[4.0, 2.0]]]), jnp.ones((1, 1), bool),
        ea, eb, ev, t_sample=1,
    ))
    assert loss_in == 0.0

    # agent off the road (y = -8)
    traj_out = traj.copy()
    traj_out[0, 0, :, 1] = -8.0
    loss_out = float(offroad_loss(
        jnp.asarray(traj_out), jnp.asarray([[[4.0, 2.0]]]), jnp.ones((1, 1), bool),
        ea, eb, ev, t_sample=1,
    ))
    assert loss_out > 2.0  # ~3 m beyond the edge + half width


def test_collision_loss_behaviour():
    # two vehicles side by side 10 m apart: no collision
    T = 5
    traj = np.zeros((1, 2, T, 3), np.float32)
    traj[0, 1, :, 1] = 10.0
    ext = jnp.asarray([[[4.0, 2.0], [4.0, 2.0]]])
    mask = jnp.ones((1, 2), bool)
    types = jnp.ones((1, 2), jnp.int32)
    l0 = float(collision_loss(jnp.asarray(traj), ext, mask, types, t_sample=1))
    assert l0 == 0.0
    # overlapping
    traj[0, 1, :, 1] = 1.0
    l1 = float(collision_loss(jnp.asarray(traj), ext, mask, types, t_sample=1))
    assert l1 > 0.5
