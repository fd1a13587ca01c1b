"""Voxel-grid downsampling with fixed output capacity.

Replaces the libpointmatcher octree downsampler used throughout the reference
(`/root/reference/bruce_slam/src/bruce_slam/cpp/pcl.cpp:128-159`, called from
`feature_extraction.py:241-242` and `slam.py:286-292`). Instead of an octree
we bin points on a regular grid of cell size ``resolution`` over a static
extent and emit one centroid per occupied cell — a scatter-add plus top-k
compaction, both native TPU ops. The representative differs from the octree's
node sample by at most one cell diagonal; downstream consumers only require
~``resolution``-spaced points.

When more than ``max_out`` cells are occupied, the densest cells win (the
count is logged in the output mask sum — callers can assert).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VoxelGridSpec:
    """Static voxel-grid geometry: origin (x0, y0), cell size, grid dims."""

    x0: float
    y0: float
    resolution: float
    nx: int
    ny: int

    @property
    def num_cells(self) -> int:
        return self.nx * self.ny


def _cell_ids(points, mask, spec: VoxelGridSpec):
    ix = jnp.floor((points[:, 0] - spec.x0) / spec.resolution).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - spec.y0) / spec.resolution).astype(jnp.int32)
    inside = (ix >= 0) & (ix < spec.nx) & (iy >= 0) & (iy < spec.ny)
    ok = mask & inside
    ids = jnp.where(ok, iy * spec.nx + ix, spec.num_cells)
    return ids, ok


def voxel_downsample(
    points: jax.Array,
    mask: jax.Array,
    spec: VoxelGridSpec,
    max_out: int,
):
    """Downsample (points [N, 2], mask [N]) to centroids of occupied cells.

    Returns (out_points [max_out, 2], out_mask [max_out]).
    """
    ids, ok = _cell_ids(points, mask, spec)
    w = ok.astype(points.dtype)
    sums = jnp.zeros((spec.num_cells + 1, 2), points.dtype).at[ids].add(points * w[:, None])
    counts = jnp.zeros((spec.num_cells + 1,), points.dtype).at[ids].add(w)
    counts = counts[:-1]
    sums = sums[:-1]
    # densest occupied cells first; ties broken by cell id (deterministic)
    score, cell_idx = jax.lax.top_k(counts, max_out)
    out_mask = score > 0
    centroids = sums[cell_idx] / jnp.maximum(counts[cell_idx], 1.0)[:, None]
    centroids = jnp.where(out_mask[:, None], centroids, 0.0)
    return centroids, out_mask


def voxel_downsample_with_conf(
    points: jax.Array,
    mask: jax.Array,
    conf: jax.Array,  # (N,) per-point confidence channel
    spec: VoxelGridSpec,
    max_out: int,
):
    """Downsample carrying a per-point scalar confidence (round-5 frontend
    fidelity channel — detection counts / weights riding along with the
    cloud). Geometry is IDENTICAL to :func:`voxel_downsample` (count-based
    centroids and ranking, so a confidence-blind consumer sees the exact
    same cloud); the output confidence is the mean of the member points'.

    Returns (out_points [max_out, 2], out_mask, out_conf [max_out]).
    """
    ids, ok = _cell_ids(points, mask, spec)
    w = ok.astype(points.dtype)
    sums = jnp.zeros((spec.num_cells + 1, 2), points.dtype).at[ids].add(
        points * w[:, None])
    counts = jnp.zeros((spec.num_cells + 1,), points.dtype).at[ids].add(w)
    csum = jnp.zeros((spec.num_cells + 1,), points.dtype).at[ids].add(
        w * conf.astype(points.dtype))
    counts, sums, csum = counts[:-1], sums[:-1], csum[:-1]
    score, cell_idx = jax.lax.top_k(counts, max_out)
    out_mask = score > 0
    denom = jnp.maximum(counts[cell_idx], 1.0)
    centroids = sums[cell_idx] / denom[:, None]
    centroids = jnp.where(out_mask[:, None], centroids, 0.0)
    out_conf = jnp.where(out_mask, csum[cell_idx] / denom, 0.0)
    return centroids, out_mask, out_conf


def voxel_downsample_with_keys(
    points: jax.Array,
    mask: jax.Array,
    keys: jax.Array,
    spec: VoxelGridSpec,
    max_out: int,
):
    """Downsample carrying an integer key per point (e.g. keyframe index).

    Mirrors ``pcl.downsample(points, keys, resolution)`` as used by
    ``SLAM.get_points(..., return_keys=True)``
    (`/root/reference/bruce_slam/src/bruce_slam/slam.py:286-290`). The output
    key of a cell is that of the lowest-index contributing point
    (deterministic; the octree variant keeps the representative's descriptor).

    Returns (out_points [max_out, 2], out_keys [max_out] int32, out_mask).
    """
    ids, ok = _cell_ids(points, mask, spec)
    n = points.shape[0]
    w = ok.astype(points.dtype)
    sums = jnp.zeros((spec.num_cells + 1, 2), points.dtype).at[ids].add(points * w[:, None])
    counts = jnp.zeros((spec.num_cells + 1,), points.dtype).at[ids].add(w)
    first_pt = (
        jnp.full((spec.num_cells + 1,), n, jnp.int32)
        .at[ids]
        .min(jnp.where(ok, jnp.arange(n, dtype=jnp.int32), n))
    )
    counts, sums, first_pt = counts[:-1], sums[:-1], first_pt[:-1]
    score, cell_idx = jax.lax.top_k(counts, max_out)
    out_mask = score > 0
    centroids = sums[cell_idx] / jnp.maximum(counts[cell_idx], 1.0)[:, None]
    centroids = jnp.where(out_mask[:, None], centroids, 0.0)
    safe_first = jnp.clip(first_pt[cell_idx], 0, n - 1)
    out_keys = jnp.where(out_mask, keys[safe_first], -1).astype(jnp.int32)
    return centroids, out_keys, out_mask
