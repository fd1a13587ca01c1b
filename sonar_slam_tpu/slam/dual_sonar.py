"""Dual-sonar (horizontal + vertical) 3-D point fusion.

The reference rig optionally carries a vertical Oculus M1200d next to the
horizontal M750d (`/root/reference/README.md:9-17`); keyframes reserve fields
for it — ``points3D`` ("3D point cloud from orthogonal sensor fusion"),
``vertical_images`` / ``horizontal_images`` (`slam_objects.py:101-116`) and a
3-D transform path (`transform_points_3D`, `slam_objects.py:200-223`) — but
the fusion algorithm itself lives outside the published repo. This module
provides a TPU-native implementation of that orthogonal-fusion capability:

* The vertical sonar images the body x-z plane: a detection at (range rho,
  elevation phi) is the scene point (x = rho cos phi, z = rho sin phi).
* ``elevation_profile`` reduces a vertical frame's CFAR detections into a
  per-forward-distance height estimate z(x) (mean over detections per x bin).
* ``fuse_vertical`` lifts the horizontal 2-D cloud to 3-D by sampling that
  profile at each point's forward distance; points with no vertical evidence
  keep z = 0 (the planar assumption the 3-DOF SLAM already makes).

Everything is masked/fixed-capacity and vmaps over frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sonar import SonarGeometry


def vertical_cell_xz(geometry: SonarGeometry) -> jax.Array:
    """(R, C, 2) (x fwd, z down-positive) for each vertical-polar cell.

    The vertical fan's "bearings" are elevations; an M1200d in the vertical
    mount sweeps +-aperture/2 about the horizontal plane.
    """
    r = geometry.ranges[:, None]
    e = geometry.bearings[None, :]
    return jnp.asarray(
        np.stack([r * np.cos(e), r * np.sin(e)], axis=-1), jnp.float32
    )


def elevation_profile(
    detections: jax.Array,  # (R, C) bool CFAR mask of the vertical frame
    geometry: SonarGeometry,
    num_bins: int,
    max_x: float,
    min_count: int = 2,
):
    """Per-forward-distance height estimate from one vertical frame.

    Returns (z (num_bins,), valid (num_bins,)): mean z of detections whose
    forward distance falls in each x bin of width max_x / num_bins. Bins
    with fewer than ``min_count`` detections are invalid — a genuine floor
    return spans at least two range rows per beam (the transmit pulse),
    while isolated speckle detections land alone and would otherwise poison
    the bin with an arbitrary height.
    """
    cells = vertical_cell_xz(geometry).reshape(-1, 2)
    mask = detections.reshape(-1)
    x, z = cells[:, 0], cells[:, 1]
    bin_w = max_x / num_bins
    b = jnp.clip((x / bin_w).astype(jnp.int32), 0, num_bins - 1)
    w = mask.astype(jnp.float32)
    sums = jnp.zeros((num_bins,), jnp.float32).at[b].add(z * w)
    counts = jnp.zeros((num_bins,), jnp.float32).at[b].add(w)
    zbar = sums / jnp.maximum(counts, 1.0)
    return zbar, counts >= min_count


def fuse_vertical(
    h_points: jax.Array,  # (N, 2) horizontal cloud (x, y)
    h_mask: jax.Array,
    profile_z: jax.Array,  # (B,) from elevation_profile
    profile_valid: jax.Array,
    max_x: float,
    max_bearing: float = float(np.radians(6.0)),
):
    """Lift the horizontal 2-D cloud to 3-D using the vertical profile.

    Returns (points3d (N, 3), mask (N,)). The mask equals the input mask —
    unmatched points keep z = 0 rather than being dropped, preserving the
    planar fallback of the 3-DOF pipeline.

    Only points within ``max_bearing`` of the body x-axis receive a height:
    the vertical fan images a narrow strip about the x-z plane (the M1200d's
    out-of-plane aperture is a few degrees), so its profile says nothing
    about terrain far off-axis — measured, extrapolating it across the full
    horizontal FOV costs ~1 m z-RMSE against the simulated seafloor while
    the in-strip profile is centimeter-accurate.
    """
    B = profile_z.shape[0]
    bin_w = max_x / B
    fwd = jnp.linalg.norm(h_points, axis=-1)  # forward distance = slant range
    brg = jnp.arctan2(h_points[:, 1], jnp.maximum(h_points[:, 0], 1e-6))
    in_strip = jnp.abs(brg) <= max_bearing
    b = jnp.clip((fwd / bin_w).astype(jnp.int32), 0, B - 1)
    z = jnp.where(profile_valid[b] & in_strip, profile_z[b], 0.0)
    pts3 = jnp.concatenate([h_points, z[:, None]], axis=-1)
    return jnp.where(h_mask[:, None], pts3, 0.0), h_mask


def fuse_frames(
    h_points: jax.Array,  # (F, N, 2) batch of horizontal clouds
    h_masks: jax.Array,
    v_detections: jax.Array,  # (F, R, C) batch of vertical CFAR masks
    geometry_v: SonarGeometry,
    num_bins: int = 64,
):
    """Batched fusion across frames (one vmap)."""
    max_x = geometry_v.max_range

    def one(hp, hm, vd):
        z, ok = elevation_profile(vd, geometry_v, num_bins, max_x)
        return fuse_vertical(hp, hm, z, ok, max_x)

    return jax.vmap(one)(h_points, h_masks, v_detections)
