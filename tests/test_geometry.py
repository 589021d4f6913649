import numpy as np
import jax.numpy as jnp

from prosim_tpu.utils import geometry as geo


def test_wrap_angle():
    angles = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi, 0.1])
    out = np.asarray(geo.wrap_angle(jnp.asarray(angles)))
    assert np.all(out >= -np.pi) and np.all(out < np.pi)
    np.testing.assert_allclose(np.sin(out), np.sin(angles), atol=1e-6)
    np.testing.assert_allclose(np.cos(out), np.cos(angles), atol=1e-6)


def test_rotate_2d_matches_rotation_matrix():
    rng = np.random.default_rng(0)
    xy = rng.normal(size=(5, 2)).astype(np.float32)
    theta = rng.normal(size=(5,)).astype(np.float32)
    out = np.asarray(geo.rotate_2d(jnp.asarray(xy), jnp.asarray(theta)))
    for i in range(5):
        c, s = np.cos(theta[i]), np.sin(theta[i])
        R = np.array([[c, -s], [s, c]])
        np.testing.assert_allclose(out[i], R @ xy[i], rtol=1e-5, atol=1e-5)


def test_angle_between_2d_vectors():
    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    assert np.asarray(geo.angle_between_2d_vectors(a, b))[0] == np.float32(np.pi / 2)


def test_rel_traj_to_last_step():
    rng = np.random.default_rng(1)
    T = 7
    theta = np.cumsum(rng.normal(scale=0.2, size=(T,)))
    xy = np.cumsum(rng.normal(scale=1.0, size=(T, 2)), axis=0)
    traj = np.concatenate([xy, np.sin(theta)[:, None], np.cos(theta)[:, None]], axis=-1)

    rel = np.asarray(geo.rel_traj_to_last_step(jnp.asarray(traj, dtype=jnp.float32)))

    # last step must be exactly the origin pose
    np.testing.assert_allclose(rel[-1, :2], 0.0, atol=1e-5)
    np.testing.assert_allclose(rel[-1, 2], 0.0, atol=1e-5)
    np.testing.assert_allclose(rel[-1, 3], 1.0, atol=1e-5)

    # independent numpy computation
    th_last = theta[-1]
    R = np.array(
        [[np.cos(-th_last), -np.sin(-th_last)], [np.sin(-th_last), np.cos(-th_last)]]
    )
    expect_xy = (xy - xy[-1]) @ R.T
    np.testing.assert_allclose(rel[:, :2], expect_xy, rtol=1e-4, atol=1e-4)
    expect_th = theta - th_last
    np.testing.assert_allclose(rel[:, 2], np.sin(expect_th), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(rel[:, 3], np.cos(expect_th), rtol=1e-4, atol=1e-4)


def test_frame_transform_roundtrip():
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(10, 2)), dtype=jnp.float32)
    frame_xy = jnp.asarray([3.0, -2.0])
    frame_th = jnp.asarray(0.7)
    local = geo.transform_to_frame(pts, frame_xy, frame_th)
    back = geo.transform_from_frame(local, frame_xy, frame_th)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-5, atol=1e-5)
