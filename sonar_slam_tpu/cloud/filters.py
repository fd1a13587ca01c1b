"""Point-cloud outlier / density filters.

Replaces the PCL ``RadiusOutlierRemoval`` and libpointmatcher density-filter
bindings (`/root/reference/bruce_slam/src/bruce_slam/cpp/pcl.cpp:54-126`) with
masked pairwise-distance reductions (clouds are small; the N x N distance
matrix is an MXU matmul).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import pairwise_sq_dists


def remove_outlier(
    points: jax.Array,
    mask: jax.Array,
    radius: float | jax.Array,
    min_points: int | jax.Array,
):
    """Radius outlier removal: keep points with >= min_points neighbors.

    Matches PCL semantics (the query point counts itself, since a radius
    search over the indexed cloud returns the query at distance 0) used at
    `feature_extraction.py:245-249` and `mapping.py:176-181`. Points are kept
    in place — the output is an updated mask (no compaction/reordering).
    """
    d2 = pairwise_sq_dists(points, points)
    within = (d2 <= jnp.asarray(radius) ** 2) & mask[None, :]
    counts = jnp.sum(within & mask[:, None], axis=-1)
    return mask & (counts >= min_points)


def density_filter(
    points: jax.Array,
    mask: jax.Array,
    knn: int,
    min_density: float,
    max_density: float,
):
    """kNN-density gate: keep points whose local 2-D density lies in range.

    Capability analog of ``pcl.density_filter`` (`pcl.cpp:76-126`): density is
    estimated as knn / (pi * r_k^2) with r_k the distance to the knn-th
    neighbor. Returns the updated mask.
    """
    d2 = pairwise_sq_dists(points, points)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    # distance to the knn-th neighbor (self included at distance 0)
    neg_top, _ = jax.lax.top_k(-d2, knn + 1)
    rk2 = -neg_top[:, -1]
    density = knn / jnp.maximum(jnp.pi * rk2, 1e-12)
    return mask & (density >= min_density) & (density <= max_density)
