"""SE(3)-lite pose algebra in JAX.

The reference is a 3-DOF (SE(2)) SLAM system at measured depth; gtsam.Pose3 is
used only as a carrier for (x, y, depth, roll, pitch, yaw) dead-reckoning state
(`/root/reference/bruce_slam/src/bruce_slam/dead_reckoning.py:236-242`,
`slam_objects.py:89-93,147-157`). We therefore represent a "pose3" as an array
``[..., 6] = (x, y, z, roll, pitch, yaw)`` — the same layout the reference's
``g2n(Pose3)`` produces (`utils/conversions.py:101-146`) — and route all group
operations through rotation matrices.

Rotation conventions match gtsam: ``Rot3.Ypr(y, p, r) = Rz(y) @ Ry(p) @ Rx(r)``
with ``roll/pitch/yaw`` the intrinsic x/y/z Euler extraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .se2 import wrap_angle

# all rotation-matrix products pin HIGHEST: the TPU default bf16 MXU pass
# rounds matrix entries to ~3 decimal digits, i.e. ~1e-3 rad per compose —
# catastrophic for the per-tick dead-reckoning heading chain (CLAUDE.md rule)
_HP = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HP)


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def rot3_ypr(yaw: jax.Array, pitch: jax.Array, roll: jax.Array) -> jax.Array:
    """gtsam.Rot3.Ypr: Rz(yaw) @ Ry(pitch) @ Rx(roll) -> [..., 3, 3]."""
    return _mm(_mm(_rz(yaw), _ry(pitch)), _rx(roll))


def rot3_to_ypr(R: jax.Array) -> jax.Array:
    """Extract (roll, pitch, yaw) [..., 3] from a rotation matrix (gtsam rpy)."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rot3_compose(Ra: jax.Array, Rb: jax.Array) -> jax.Array:
    return _mm(Ra, Rb)


def rot3_inverse(R: jax.Array) -> jax.Array:
    return jnp.swapaxes(R, -1, -2)


def pose3_make(t: jax.Array, rpy: jax.Array) -> jax.Array:
    """Build a pose3 6-vector from translation [..., 3] and (roll,pitch,yaw)."""
    return jnp.concatenate([t, rpy], axis=-1)


def _split(p):
    return p[..., :3], p[..., 3:]


def pose3_rotmat(p: jax.Array) -> jax.Array:
    rpy = p[..., 3:]
    return rot3_ypr(rpy[..., 2], rpy[..., 1], rpy[..., 0])


def pose3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a ∘ b for pose3 6-vectors."""
    ta, _ = _split(a)
    tb, _ = _split(b)
    Ra, Rb = pose3_rotmat(a), pose3_rotmat(b)
    t = ta + jnp.einsum("...ij,...j->...i", Ra, tb, precision=_HP)
    rpy = rot3_to_ypr(_mm(Ra, Rb))
    return pose3_make(t, rpy)


def pose3_inverse(a: jax.Array) -> jax.Array:
    ta, _ = _split(a)
    Ra = pose3_rotmat(a)
    RaT = rot3_inverse(Ra)
    t = -jnp.einsum("...ij,...j->...i", RaT, ta, precision=_HP)
    return pose3_make(t, rot3_to_ypr(RaT))


def pose3_between(a: jax.Array, b: jax.Array) -> jax.Array:
    return pose3_compose(pose3_inverse(a), b)


def pose3_to_pose2(p: jax.Array) -> jax.Array:
    """Project pose3 -> (x, y, yaw), the reference's ``pose322``
    (`/root/reference/bruce_slam/src/bruce_slam/utils/conversions.py:30-41`)."""
    return jnp.stack([p[..., 0], p[..., 1], wrap_angle(p[..., 5])], axis=-1)


def pose2_to_pose3(p2: jax.Array, z=0.0, roll=0.0, pitch=0.0) -> jax.Array:
    """Lift (x, y, yaw) -> pose3 carrying given z/roll/pitch (``pose223``
    analog, `utils/conversions.py:43-55`; the SLAM update keeps the DR z/roll/
    pitch — `slam_objects.py:147-157`)."""
    z = jnp.broadcast_to(jnp.asarray(z, p2.dtype), p2[..., 0].shape)
    roll = jnp.broadcast_to(jnp.asarray(roll, p2.dtype), p2[..., 0].shape)
    pitch = jnp.broadcast_to(jnp.asarray(pitch, p2.dtype), p2[..., 0].shape)
    return jnp.stack(
        [p2[..., 0], p2[..., 1], z, roll, pitch, p2[..., 2]], axis=-1
    )


def pose3_transform_points(points: jax.Array, p: jax.Array) -> jax.Array:
    """Apply pose3 to local 3-D points [..., N, 3]
    (``Keyframe.transform_points_3D``, `slam_objects.py:200-223`)."""
    R = pose3_rotmat(p)
    t = p[..., None, :3]
    return (
        jnp.matmul(points, jnp.swapaxes(R, -1, -2),
                   precision=jax.lax.Precision.HIGHEST)
        + t
    )
