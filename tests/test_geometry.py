import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.geometry import (
    se2_compose,
    se2_inverse,
    se2_between,
    se2_expmap,
    se2_logmap,
    se2_matrix,
    se2_from_matrix,
    se2_transform_points,
    se2_retract,
    se2_local_coordinates,
    wrap_angle,
    rot3_ypr,
    rot3_to_ypr,
    pose3_compose,
    pose3_inverse,
    pose3_between,
    pose3_to_pose2,
    pose2_to_pose3,
    pose3_transform_points,
)

rng = np.random.default_rng(0)


def rand_pose(n=()):
    p = rng.normal(size=n + (3,)).astype(np.float32)
    p[..., 2] = rng.uniform(-np.pi, np.pi, size=n)
    return jnp.asarray(p)


def test_compose_inverse_identity():
    a = rand_pose((32,))
    ident = se2_compose(a, se2_inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)


def test_compose_matches_matrix_product():
    a, b = rand_pose((16,)), rand_pose((16,))
    T = se2_matrix(a) @ se2_matrix(b)
    np.testing.assert_allclose(
        np.asarray(se2_matrix(se2_compose(a, b))), np.asarray(T), atol=1e-5
    )


def test_between_roundtrip():
    a, b = rand_pose((8,)), rand_pose((8,))
    d = se2_between(a, b)
    np.testing.assert_allclose(
        np.asarray(se2_compose(a, d)), np.asarray(b), atol=1e-5
    )


def test_exp_log_roundtrip():
    xi = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    xi = xi.at[:, 2].set(jnp.clip(xi[:, 2], -3.0, 3.0))
    back = se2_logmap(se2_expmap(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)


def test_expmap_small_angle():
    xi = jnp.array([1.0, 2.0, 1e-12])
    p = se2_expmap(xi)
    np.testing.assert_allclose(np.asarray(p), [1.0, 2.0, 0.0], atol=1e-6)


def test_expmap_exact_quarter_turn():
    # Exp([v, pi/2]) should trace a quarter circle: t = V(w) v
    xi = jnp.array([1.0, 0.0, np.pi / 2])
    p = np.asarray(se2_expmap(xi))
    w = np.pi / 2
    np.testing.assert_allclose(p, [np.sin(w) / w, (1 - np.cos(w)) / w, w], atol=1e-6)


def test_retract_local_coordinates_inverse():
    a = rand_pose((8,))
    xi = 0.1 * jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    b = se2_retract(a, xi)
    np.testing.assert_allclose(
        np.asarray(se2_local_coordinates(a, b)), np.asarray(xi), atol=1e-5
    )


def test_matrix_roundtrip():
    a = rand_pose((8,))
    np.testing.assert_allclose(
        np.asarray(se2_from_matrix(se2_matrix(a))), np.asarray(a), atol=1e-5
    )


def test_transform_points_matches_manual():
    pose = jnp.array([1.0, -2.0, 0.7])
    pts = jnp.asarray(rng.normal(size=(10, 2)).astype(np.float32))
    out = np.asarray(se2_transform_points(pts, pose))
    c, s = np.cos(0.7), np.sin(0.7)
    R = np.array([[c, -s], [s, c]], np.float32)
    expected = np.asarray(pts) @ R.T + np.array([1.0, -2.0])
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_wrap_angle():
    # odd multiples of pi wrap to +/-pi (sign depends on fp rounding of sin)
    np.testing.assert_allclose(abs(float(wrap_angle(jnp.asarray(3 * np.pi)))), np.pi, atol=1e-5)
    np.testing.assert_allclose(float(wrap_angle(jnp.asarray(2 * np.pi + 0.5))), 0.5, atol=1e-5)
    np.testing.assert_allclose(float(wrap_angle(jnp.asarray(-2 * np.pi - 0.5))), -0.5, atol=1e-5)


# --- SE(3) ---


def test_rot3_ypr_roundtrip():
    y, p, r = 0.5, 0.3, -0.8
    R = rot3_ypr(jnp.asarray(y), jnp.asarray(p), jnp.asarray(r))
    rpy = np.asarray(rot3_to_ypr(R))
    np.testing.assert_allclose(rpy, [r, p, y], atol=1e-6)


def test_rot3_ypr_is_zyx():
    # Rz(yaw) @ Ry(pitch) @ Rx(roll), gtsam convention
    y = rot3_ypr(jnp.asarray(np.pi / 2), jnp.asarray(0.0), jnp.asarray(0.0))
    np.testing.assert_allclose(
        np.asarray(y), [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
    )


def rand_pose3(n=()):
    p = rng.normal(size=n + (6,)).astype(np.float32)
    p[..., 3:] = rng.uniform(-1.2, 1.2, size=n + (3,))
    return jnp.asarray(p)


def test_pose3_compose_inverse():
    a = rand_pose3((8,))
    ident = pose3_compose(a, pose3_inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-4)


def test_pose3_between_roundtrip():
    a, b = rand_pose3((4,)), rand_pose3((4,))
    d = pose3_between(a, b)
    back = np.asarray(pose3_compose(a, d))
    np.testing.assert_allclose(back, np.asarray(b), atol=1e-4)


def test_pose3_pose2_projection():
    p3 = jnp.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.5])
    p2 = np.asarray(pose3_to_pose2(p3))
    np.testing.assert_allclose(p2, [1.0, 2.0, 0.5], atol=1e-6)
    lifted = np.asarray(pose2_to_pose3(jnp.asarray(p2), z=3.0, roll=0.1, pitch=0.2))
    np.testing.assert_allclose(lifted, np.asarray(p3), atol=1e-6)


def test_pose3_transform_points_yaw_only():
    p3 = pose2_to_pose3(jnp.array([1.0, 0.0, np.pi / 2]))
    pts = jnp.array([[1.0, 0.0, 0.0]])
    out = np.asarray(pose3_transform_points(pts, p3))
    np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_vmap_and_jit_compose():
    a, b = rand_pose((128,)), rand_pose((128,))
    f = jax.jit(jax.vmap(se2_compose))
    np.testing.assert_allclose(
        np.asarray(f(a, b)), np.asarray(se2_compose(a, b)), atol=1e-6
    )
