"""Dual-sonar (horizontal + vertical) 3-D point fusion.

The reference rig optionally carries a vertical Oculus M1200d next to the
horizontal M750d (`/root/reference/README.md:9-17`); keyframes reserve fields
for it — ``points3D`` ("3D point cloud from orthogonal sensor fusion"),
``vertical_images`` / ``horizontal_images`` (`slam_objects.py:101-116`) and a
3-D transform path (`transform_points_3D`, `slam_objects.py:200-223`) — but
the fusion algorithm itself lives outside the published repo. This module
provides a TPU-native implementation of that orthogonal-fusion capability.

Two generations:

* Production path (round 5): ``beam_floor_samples`` extracts ONE
  intensity-weighted range centroid per vertical beam (the return envelope
  spans ~3 range rows; the centroid recovers the continuous range, so z =
  r sin(phi) is exact to centimeters instead of a bin width), the samples
  from ALL keyframes accumulate into a global ``ElevationGrid`` through the
  optimized SLAM poses (``accumulate_elevation``), and ``lift_from_grid``
  assigns z to any horizontal point the grid covers — points get vertical
  evidence from EVERY keyframe whose strip crossed them, not just their
  own frame's narrow fan. The per-beam samples are themselves fused 3-D
  points (body (x, 0, z)), exported alongside.
* Legacy per-frame path (round 2, kept for the planar fallback + tests):
  ``elevation_profile`` mean-bins one frame's detections into z(x);
  ``fuse_vertical`` lifts that frame's cloud from its own profile only.

Everything is masked/fixed-capacity and vmaps over frames.
"""

from __future__ import annotations

from typing import NamedTuple

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
    """Batched fusion across frames (one vmap) — legacy per-frame path."""
    max_x = geometry_v.max_range

    def one(hp, hm, vd):
        z, ok = elevation_profile(vd, geometry_v, num_bins, max_x)
        return fuse_vertical(hp, hm, z, ok, max_x)

    return jax.vmap(one)(h_points, h_masks, v_detections)


# ----------------------------------------------------------------------
# production path: per-beam centroids + global elevation grid
# ----------------------------------------------------------------------


class ElevationGrid(NamedTuple):
    """Seafloor height map fused from every keyframe's vertical fan.

    ``z``: weighted mean height per cell (meaningful where ``w > 0``);
    ``w``: accumulated sample weight. Grid geometry lives in the companion
    ``ElevationSpec``. This is the mapping-export payload the reference
    reserves keyframe fields for but never ships (`slam_objects.py:101-116`).
    """

    z: jax.Array  # (H, W)
    w: jax.Array  # (H, W)


class ElevationSpec(NamedTuple):
    x0: float
    y0: float
    resolution: float
    nx: int
    ny: int


def beam_floor_samples(
    v_img: jax.Array,  # (R, C) vertical polar intensity frame
    v_det: jax.Array,  # (R, C) CFAR + intensity detection mask
    geometry: SonarGeometry,
    centroid_halfwin: int = 2,
    noise_floor: float = 30.0,
    min_window_dets: int = 3,
):
    """One (x_fwd, z, weight) sample per vertical beam.

    Per beam: the strongest detected range row anchors a +-``centroid_halfwin``
    window; the intensity-weighted range centroid over that window recovers
    the CONTINUOUS return range (the transmit pulse spans ~3 rows, so the
    centroid beats the row quantization by an order of magnitude — the
    round-2 mean-bin profile carried the full bin width as error). Then
    ``x = r cos(phi), z = r sin(phi)`` with phi the (tilt-included) beam
    elevation. ``noise_floor`` is subtracted inside the window so speckle
    neighbors don't drag the centroid.

    ``min_window_dets``: a genuine floor return's pulse envelope spans >= 3
    detected rows; an isolated speckle false alarm detects exactly 1.
    Measured (seed-0 dual bag): every beam sample with |z error| > 0.3 m had
    exactly 1 window detection, and gating at 3 takes the per-beam z RMSE
    from 0.83 m to 0.020 m while keeping 93% of the samples — the vertical
    twin of the horizontal frontend's min_voxel_hits speckle gate.

    Returns (xz (C, 2), weight (C,)) — weight 0 where the beam saw nothing.
    """
    R, C = v_img.shape
    img = v_img.astype(jnp.float32)
    scored = jnp.where(v_det, img, 0.0)
    best = jnp.argmax(scored, axis=0)  # (C,)
    has = jnp.take_along_axis(scored, best[None], axis=0)[0] > 0.0

    offs = jnp.arange(-centroid_halfwin, centroid_halfwin + 1)
    rows = jnp.clip(best[None, :] + offs[:, None], 0, R - 1)  # (W, C)
    win = jnp.take_along_axis(img, rows, axis=0)
    win = jnp.maximum(win - noise_floor, 0.0)
    wsum = jnp.maximum(jnp.sum(win, axis=0), 1e-6)
    row_c = jnp.sum(win * rows.astype(jnp.float32), axis=0) / wsum
    # speckle gate: enough DETECTED rows inside the centroid window
    ndet = jnp.sum(jnp.take_along_axis(v_det, rows, axis=0), axis=0)
    has = has & (ndet >= min_window_dets)
    # row -> range uses the simulator/sonar convention r = (row+1)*dr
    r = (row_c + 1.0) * geometry.range_resolution
    phi = jnp.asarray(geometry.bearings, jnp.float32)
    xz = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
    w = jnp.where(has, jnp.take_along_axis(scored, best[None], axis=0)[0], 0.0)
    return xz, w


def accumulate_elevation(
    sample_xy: jax.Array,  # (S, 2) global-frame sample positions
    sample_z: jax.Array,  # (S,)
    sample_w: jax.Array,  # (S,) 0 = invalid
    spec: ElevationSpec,
) -> ElevationGrid:
    """Scatter-add weighted height samples into the global grid."""
    ix = jnp.floor((sample_xy[:, 0] - spec.x0) / spec.resolution).astype(jnp.int32)
    iy = jnp.floor((sample_xy[:, 1] - spec.y0) / spec.resolution).astype(jnp.int32)
    inside = (ix >= 0) & (ix < spec.nx) & (iy >= 0) & (iy < spec.ny)
    w = jnp.where(inside, sample_w, 0.0)
    idx = jnp.where(inside, iy * spec.nx + ix, spec.nx * spec.ny)
    n = spec.nx * spec.ny
    zsum = jnp.zeros((n + 1,), jnp.float32).at[idx].add(w * sample_z)
    wsum = jnp.zeros((n + 1,), jnp.float32).at[idx].add(w)
    z = zsum[:n] / jnp.maximum(wsum[:n], 1e-6)
    return ElevationGrid(
        z=z.reshape(spec.ny, spec.nx), w=wsum[:n].reshape(spec.ny, spec.nx)
    )


def lift_from_grid(
    points_xy: jax.Array,  # (N, 2) global-frame query positions
    grid: ElevationGrid,
    spec: ElevationSpec,
):
    """Height at each query from the 3x3 weighted neighborhood of its cell.

    Returns (z (N,), valid (N,)): ``valid`` is False where no neighborhood
    cell holds data — callers keep the planar z = 0 fallback there (the
    3-DOF pipeline's assumption, as in :func:`fuse_vertical`).
    """
    ix = jnp.floor((points_xy[:, 0] - spec.x0) / spec.resolution).astype(jnp.int32)
    iy = jnp.floor((points_xy[:, 1] - spec.y0) / spec.resolution).astype(jnp.int32)
    zacc = jnp.zeros((points_xy.shape[0],), jnp.float32)
    wacc = jnp.zeros((points_xy.shape[0],), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cx = jnp.clip(ix + dx, 0, spec.nx - 1)
            cy = jnp.clip(iy + dy, 0, spec.ny - 1)
            w = grid.w[cy, cx]
            zacc = zacc + w * grid.z[cy, cx]
            wacc = wacc + w
    inside = (ix >= 0) & (ix < spec.nx) & (iy >= 0) & (iy < spec.ny)
    valid = inside & (wacc > 1e-6)
    return jnp.where(valid, zacc / jnp.maximum(wacc, 1e-6), 0.0), valid


def fuse_frames_global(
    h_points: jax.Array,  # (F, N, 2) horizontal clouds, LOCAL frames
    h_masks: jax.Array,  # (F, N)
    v_imgs: jax.Array,  # (F, R, C) vertical intensity frames
    v_dets: jax.Array,  # (F, R, C) vertical detection masks
    poses: jax.Array,  # (F, 3) optimized keyframe poses
    geometry_v: SonarGeometry,
    spec: ElevationSpec,
):
    """Production dual-sonar fusion: per-beam floor samples from every
    keyframe -> global elevation grid through the SLAM poses -> lift every
    horizontal point the grid covers.

    Returns ``(points3d (F, N, 3) local xyz, mask (F, N),
    floor3d (F, C, 3) local xyz of the per-beam samples, floor_w (F, C),
    grid ElevationGrid)``. One jittable program (vmaps + two scatters).
    """
    from ..geometry import se2_transform_points

    xz, w = jax.vmap(
        lambda im, de: beam_floor_samples(im, de, geometry_v)
    )(v_imgs, v_dets)  # (F, C, 2), (F, C)
    # strip points lie along body-x: local (x_fwd, 0) -> global via pose
    local_xy = jnp.stack([xz[..., 0], jnp.zeros_like(xz[..., 0])], axis=-1)
    gxy = jax.vmap(se2_transform_points)(local_xy, poses)  # (F, C, 2)
    grid = accumulate_elevation(
        gxy.reshape(-1, 2), xz[..., 1].reshape(-1), w.reshape(-1), spec
    )

    h_global = jax.vmap(se2_transform_points)(h_points, poses)
    F, N = h_masks.shape
    z, zok = lift_from_grid(h_global.reshape(-1, 2), grid, spec)
    z = (z * zok).reshape(F, N)
    pts3 = jnp.concatenate([h_points, z[..., None]], axis=-1)
    pts3 = jnp.where(h_masks[..., None], pts3, 0.0)

    floor3d = jnp.stack(
        [xz[..., 0], jnp.zeros_like(xz[..., 0]), xz[..., 1]], axis=-1
    )
    return pts3, h_masks, floor3d, w, grid
