"""Closed-form 2-D surface-normal estimation for masked point clouds.

Support for point-to-line ICP (cloud/icp.py). The reference's
libpointmatcher pipeline uses a PointToPoint minimizer
(`/root/reference/bruce_slam/config/icp.yaml`), which on wall-like sonar
geometry slides tangentially when the two clouds sample the wall at
different spots — a bias the round-2 error budget measured at several cm
per loop closure. Point-to-line removes it; this module provides the
normals. (Deliberate improvement over the reference, not a port;
libpointmatcher ships the same option as PointToPlaneErrorMinimizer +
SurfaceNormalDataPointsFilter.)

Everything is one pairwise-distance matmul + top_k + closed-form 2x2
eigenvectors — no trees, fully vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import pairwise_sq_dists

_BIG = 1e30


def estimate_normals(
    points: jax.Array,  # (M, 2)
    mask: jax.Array,  # (M,)
    k: int = 8,
    max_radius: float = 2.0,
) -> jax.Array:
    """Unit normal per point from the local neighborhood scatter.

    The normal is the eigenvector of the SMALLEST eigenvalue of the 2x2
    covariance of the k nearest valid neighbors within ``max_radius``
    (closed form — no eigvalsh, which blows up TPU compile times; see
    slam/scan_matching.py:max_eig_2x2). Points with fewer than 3 usable
    neighbors get a zero normal, which downstream weighting treats as
    "no line constraint".
    Returns (M, 2); zero rows mean "no reliable normal".
    """
    M = points.shape[0]
    d2 = pairwise_sq_dists(points, points)
    d2 = jnp.where(mask[None, :], d2, _BIG)
    d2 = jnp.fill_diagonal(d2, _BIG, inplace=False)
    # k nearest neighbors (negated distances -> top_k)
    neg, idx = jax.lax.top_k(-d2, k)
    nd2 = -neg  # (M, k)
    w = ((nd2 <= max_radius**2) & mask[:, None]).astype(points.dtype)  # (M,k)
    nbr = points[idx]  # (M, k, 2)
    wsum = jnp.sum(w, axis=1)
    mu = jnp.sum(nbr * w[..., None], axis=1) / jnp.maximum(wsum, 1e-9)[:, None]
    d = (nbr - mu[:, None, :]) * w[..., None]
    # 2x2 scatter entries
    a = jnp.sum(d[..., 0] * d[..., 0], axis=1)
    b = jnp.sum(d[..., 0] * d[..., 1], axis=1)
    c = jnp.sum(d[..., 1] * d[..., 1], axis=1)
    # smallest eigenvalue of [[a, b], [b, c]] (quadratic formula)
    h = 0.5 * (a + c)
    r = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    lam = h - r
    # eigenvector for lam: (b, lam - a), or (lam - c, b) when b ~ 0 picks the
    # axis-aligned case; choose the better-conditioned of the two forms
    v1 = jnp.stack([b, lam - a], axis=-1)
    v2 = jnp.stack([lam - c, b], axis=-1)
    use1 = jnp.abs(lam - a) > jnp.abs(lam - c)
    v = jnp.where(use1[:, None], v1, v2)
    # b == 0 exactly (axis-aligned scatter): normal is the smaller-variance axis
    axis_n = jnp.where(
        (a < c)[:, None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0], points.dtype), (M, 2)),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0], points.dtype), (M, 2)),
    )
    v = jnp.where((jnp.abs(b) < 1e-12)[:, None], axis_n, v)
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    unit = v / jnp.maximum(norm, 1e-12)
    ok = (wsum >= 3) & mask
    return jnp.where(ok[:, None], unit, 0.0)
