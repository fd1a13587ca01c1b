"""SE(2) pose algebra in JAX.

A pose is an array ``[..., 3]`` holding ``(x, y, theta)``. All ops broadcast
over leading dimensions and are jit/vmap/grad safe.

Conventions match GTSAM's ``Pose2`` exactly (the reference uses gtsam
throughout, e.g. `/root/reference/bruce_slam/src/bruce_slam/slam.py:1268`
relies on ``Pose2.Logmap``):

* ``compose(a, b)`` = a ∘ b (apply b in a's frame).
* ``between(a, b)`` = a⁻¹ ∘ b.
* ``expmap/logmap`` are the exact SE(2) exponential/logarithm with the
  V-matrix translation coupling (not the first-order approximation).
* ``transform_points`` maps local-frame points to the pose's parent frame,
  equivalent to ``Keyframe.transform_points``
  (`/root/reference/bruce_slam/src/bruce_slam/slam_objects.py:178-198`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-10


def wrap_angle(theta: jax.Array) -> jax.Array:
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def se2_rotmat(theta: jax.Array) -> jax.Array:
    """Rotation matrix [..., 2, 2] for heading theta [...]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def se2_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a ∘ b. Shapes [..., 3] -> [..., 3]."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    t = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, t], axis=-1)


def se2_inverse(a: jax.Array) -> jax.Array:
    """a⁻¹. Shapes [..., 3] -> [..., 3]."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    return jnp.stack([x, y, -a[..., 2]], axis=-1)


def se2_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """a⁻¹ ∘ b — the transform taking frame a to frame b."""
    return se2_compose(se2_inverse(a), b)


def se2_expmap(xi: jax.Array) -> jax.Array:
    """Exact SE(2) exponential map. xi = [vx, vy, omega] -> pose.

    Matches gtsam.Pose2.Expmap: t = V(w) @ v with
    V = [[sin w / w, -(1 - cos w)/w], [(1 - cos w)/w, sin w / w]].
    """
    v = xi[..., :2]
    w = xi[..., 2]
    w_safe = jnp.where(jnp.abs(w) < _EPS, 1.0, w)
    sw, cw = jnp.sin(w), jnp.cos(w)
    a = jnp.where(jnp.abs(w) < _EPS, 1.0 - w * w / 6.0, sw / w_safe)
    b = jnp.where(jnp.abs(w) < _EPS, w / 2.0, (1.0 - cw) / w_safe)
    x = a * v[..., 0] - b * v[..., 1]
    y = b * v[..., 0] + a * v[..., 1]
    return jnp.stack([x, y, wrap_angle(w)], axis=-1)


def se2_logmap(p: jax.Array) -> jax.Array:
    """Exact SE(2) logarithm map. pose -> [vx, vy, omega].

    Matches gtsam.Pose2.Logmap (used for the PCM consistency metric at
    `/root/reference/bruce_slam/src/bruce_slam/slam.py:1268`).
    """
    w = wrap_angle(p[..., 2])
    t = p[..., :2]
    w_safe = jnp.where(jnp.abs(w) < _EPS, 1.0, w)
    sw, cw = jnp.sin(w), jnp.cos(w)
    a = jnp.where(jnp.abs(w) < _EPS, 1.0 - w * w / 6.0, sw / w_safe)
    b = jnp.where(jnp.abs(w) < _EPS, w / 2.0, (1.0 - cw) / w_safe)
    # V^{-1} = 1/(a^2 + b^2) * [[a, b], [-b, a]]
    det = a * a + b * b
    vx = (a * t[..., 0] + b * t[..., 1]) / det
    vy = (-b * t[..., 0] + a * t[..., 1]) / det
    return jnp.stack([vx, vy, w], axis=-1)


def se2_local_coordinates(base: jax.Array, target: jax.Array) -> jax.Array:
    """Tangent vector xi with base ∘ Exp(xi) = target (gtsam localCoordinates)."""
    return se2_logmap(se2_between(base, target))


def se2_retract(base: jax.Array, xi: jax.Array) -> jax.Array:
    """base ∘ Exp(xi) — the gtsam Pose2 retraction used by the optimizer."""
    return se2_compose(base, se2_expmap(xi))


def se2_matrix(p: jax.Array) -> jax.Array:
    """Homogeneous 3x3 matrix [..., 3, 3] of the pose."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    row0 = jnp.stack([c, -s, p[..., 0]], axis=-1)
    row1 = jnp.stack([s, c, p[..., 1]], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def se2_from_matrix(T: jax.Array) -> jax.Array:
    """Inverse of :func:`se2_matrix`: 3x3 homogeneous matrix -> (x, y, theta).

    Mirrors the reference's ICP output parsing
    (`/root/reference/bruce_slam/src/bruce_slam/slam.py:320-321`).
    """
    theta = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    return jnp.stack([T[..., 0, 2], T[..., 1, 2], theta], axis=-1)


def se2_transform_points(points: jax.Array, pose: jax.Array) -> jax.Array:
    """Apply pose to local points [..., N, 2] -> parent-frame points.

    Equivalent to ``Keyframe.transform_points(points, pose)``
    (`/root/reference/bruce_slam/src/bruce_slam/slam_objects.py:178-198`).
    """
    R = se2_rotmat(pose[..., 2])
    t = pose[..., None, :2]
    # fp32 MXU pass: bf16 would quantize 30 m coordinates to ~0.1 m
    return (
        jnp.matmul(points, jnp.swapaxes(R, -1, -2),
                   precision=jax.lax.Precision.HIGHEST)
        + t
    )
