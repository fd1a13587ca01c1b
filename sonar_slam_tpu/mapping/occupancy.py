"""Submap-per-keyframe log-odds occupancy mapping.

Rebuild of `Mapping`/`Submap`
(`/root/reference/bruce_slam/src/bruce_slam/mapping.py:11-582`):

* Each keyframe owns a log-odds image over a **downsampled polar grid**
  (range skip / bearing skip chosen so cells ~ map resolution,
  `mapping.py:153-168`): feature hits are splatted into polar cells,
  inflated with a separable Gaussian (sigma from inflation_range /
  inflation_angle), normalized so a hit peaks at ``hit_prob``, clipped to
  [0.5, hit_prob], and every cell *before the first hit along each beam* is
  marked ``miss_prob`` (free space carving) — no-hit frames are all-miss
  (`mapping.py:170-227`).
* The global grid is the scatter-add of every submap's log-odds through its
  current pose, with per-keyframe deduplication of polar cells landing in
  the same world cell (`fit_grid`, `mapping.py:466-499`).
* Loop closures move poses; the reference incrementally dec/re-fit/inc's
  each moved keyframe (`update_pose`, `mapping.py:254-270`). TPU-first, the
  repaint is a **batched full re-render**: one vmapped transform + one big
  scatter-add over all keyframes — embarrassingly parallel and cheaper on
  TPU than serial dec/inc (the incremental path is also provided).
* Exports: occupancy method 1 (log-odds -> probability,
  `mapping.py:306-355`), method 2 (point projection + dilation over the
  observed-free region, `mapping.py:357-439`), intensity grid
  (`mapping.py:272-298`).

The global grid has static extent (mapping.yaml origin/size); the reference
grows it in 50 m increments at runtime (`adjust_bounds`, `mapping.py:501-582`)
— here growth is a host-side reallocation (`grow``), since shapes are static
under jit (documented divergence: size it up front or grow between scans).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logit, expit

from ..geometry import se2_between, se2_transform_points
from ..cloud import remove_outlier
from ..slam.sonar import SonarGeometry


@dataclass(frozen=True)
class MappingConfig:
    """mapping.yaml semantics (`/root/reference/bruce_slam/config/mapping.yaml`)."""

    x0: float = -100.0
    y0: float = -100.0
    width: float = 200.0
    height: float = 200.0
    resolution: float = 0.2
    hit_prob: float = 0.8
    miss_prob: float = 0.3
    inflation_angle: float = 0.04
    inflation_range: float = 0.4
    inflation_radius: float = 0.5  # method 2
    outlier_filter_radius: float = 5.0
    outlier_filter_min_points: int = 20
    min_translation: float = 0.5
    min_rotation: float = 0.015
    max_keyframes: int = 128

    @property
    def rows(self) -> int:
        return int(np.ceil(self.height / self.resolution))

    @property
    def cols(self) -> int:
        return int(np.ceil(self.width / self.resolution))


class SubmapModel:
    """Static per-geometry tables: downsampled polar cell centers + Gaussian
    inflation kernels (`mapping.py:145-216`)."""

    def __init__(self, config: MappingConfig, geometry: SonarGeometry):
        self.config = config
        self.geometry = geometry
        self.r_skip = max(
            1, int(np.floor(config.resolution / geometry.range_resolution))
        )
        bearing_arc = geometry.angular_resolution * geometry.max_range
        self.c_skip = max(1, int(np.floor(config.resolution / bearing_arc)))
        self.ranges = geometry.ranges[:: self.r_skip]
        self.bearings = geometry.bearings[:: self.c_skip]
        self.shape = (len(self.ranges), len(self.bearings))
        B, R = np.meshgrid(self.bearings, self.ranges)
        self.sonar_xy = jnp.asarray(
            np.stack([np.cos(B) * R, np.sin(B) * R], -1).reshape(-1, 2),
            jnp.float32,
        )  # (S, 2)

        hr = int(
            round(
                config.inflation_range / geometry.range_resolution / self.r_skip
            )
        )
        hc = int(
            round(
                config.inflation_angle / geometry.angular_resolution / self.c_skip
            )
        )
        self.kernel_r = jnp.asarray(_gaussian_kernel(2 * hr + 1), jnp.float32)
        self.kernel_c = jnp.asarray(_gaussian_kernel(2 * hc + 1), jnp.float32)
        self.hr, self.hc = hr, hc
        # normalization so an isolated hit peaks at hit_prob (mapping.py:215)
        self.peak = float(self.kernel_r[hr] * self.kernel_c[hc])


def _gaussian_kernel(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, -1): sigma = 0.3((k-1)/2 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return k / k.sum()


class MappingState(NamedTuple):
    kf_logodds: jax.Array  # (K, S) per-keyframe submap log-odds
    kf_poses: jax.Array  # (K, 3)
    kf_valid: jax.Array  # (K,)
    num_kf: jax.Array  # int32
    grid: jax.Array  # (H, W) accumulated log-odds (render cache)


def mapping_init(config: MappingConfig, model: SubmapModel) -> MappingState:
    K = config.max_keyframes
    S = model.sonar_xy.shape[0]
    return MappingState(
        kf_logodds=jnp.zeros((K, S), jnp.float32),
        kf_poses=jnp.zeros((K, 3), jnp.float32),
        kf_valid=jnp.zeros((K,), bool),
        num_kf=jnp.asarray(0, jnp.int32),
        grid=jnp.zeros((config.rows, config.cols), jnp.float32),
    )


def _sep_conv2(img: jax.Array, kr: jax.Array, kc: jax.Array) -> jax.Array:
    """Separable 2-D convolution with zero border (cv2.BORDER_CONSTANT)."""
    x = img[None, None]  # NCHW
    krn = kr[None, None, :, None]
    x = jax.lax.conv_general_dilated(
        x, krn, (1, 1), [((kr.shape[0] - 1) // 2,) * 2, (0, 0)]
    )
    kcn = kc[None, None, None, :]
    x = jax.lax.conv_general_dilated(
        x, kcn, (1, 1), [(0, 0), ((kc.shape[0] - 1) // 2,) * 2]
    )
    return x[0, 0]


def build_submap_logodds(
    points: jax.Array,  # (N, 2) keyframe feature points (local frame)
    pmask: jax.Array,  # (N,)
    model: SubmapModel,
    filter_outliers: bool = True,
) -> jax.Array:
    """One keyframe's polar log-odds image, flattened to (S,).

    Mirrors `Mapping.add_keyframe`'s occupancy-1 path (`mapping.py:170-227`).
    """
    cfg = model.config
    geom = model.geometry
    R, C = model.shape

    if filter_outliers and cfg.outlier_filter_min_points > 1:
        pmask = remove_outlier(
            points, pmask, cfg.outlier_filter_radius, cfg.outlier_filter_min_points
        )

    # splat hits into the downsampled polar grid (mapping.py:183-187)
    rng = jnp.linalg.norm(points, axis=-1)
    brg = jnp.arctan2(points[:, 1], points[:, 0])
    r_full = jnp.clip(
        jnp.round(rng / geom.range_resolution - 1).astype(jnp.int32),
        0,
        geom.num_ranges - 1,
    )
    c_full = jnp.clip(
        jnp.round(
            (brg - geom.bearings[0])
            / (geom.bearings[-1] - geom.bearings[0])
            * (geom.num_bearings - 1)
        ).astype(jnp.int32),
        0,
        geom.num_bearings - 1,
    )
    r = jnp.clip(r_full // model.r_skip, 0, R - 1)
    c = jnp.clip(c_full // model.c_skip, 0, C - 1)
    mask_img = jnp.zeros((R, C), jnp.float32).at[r, c].max(
        pmask.astype(jnp.float32)
    )

    has_points = jnp.any(pmask)

    # Gaussian inflation, normalized so a hit peaks at hit_prob, clipped to
    # [0.5, hit_prob] (mapping.py:209-216)
    inflated = _sep_conv2(mask_img, model.kernel_r, model.kernel_c)
    inflated = inflated / (model.peak / cfg.hit_prob)
    probs = jnp.clip(inflated, 0.5, cfg.hit_prob)

    # free-space carving: cells before the first hit per beam -> miss_prob;
    # beams with no hit are fully miss (mapping.py:219-223)
    hit = probs > 0.5
    first_hit = jnp.argmax(hit, axis=0)
    no_hit = ~jnp.any(hit, axis=0)
    first_hit = jnp.where(no_hit, R, first_hit)
    row_idx = jnp.arange(R)[:, None]
    probs = jnp.where(row_idx < first_hit[None, :], cfg.miss_prob, probs)

    # frames with no points at all are all-miss (mapping.py:224-225)
    probs = jnp.where(has_points, probs, cfg.miss_prob)
    return logit(probs).reshape(-1)


def _world_cells(model: SubmapModel, pose: jax.Array):
    cfg = model.config
    xy = se2_transform_points(model.sonar_xy, pose)
    r = jnp.round((xy[:, 1] - cfg.y0) / cfg.resolution).astype(jnp.int32)
    c = jnp.round((xy[:, 0] - cfg.x0) / cfg.resolution).astype(jnp.int32)
    inside = (r >= 0) & (r < cfg.rows) & (c >= 0) & (c < cfg.cols)
    return r, c, inside


def _dedup_first(cell_idx: jax.Array, valid: jax.Array):
    """Keep the first occurrence (lowest source index) of each cell id —
    np.unique(return_index=True) semantics in `fit_grid` (mapping.py:489-491).
    """
    S = cell_idx.shape[0]
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(valid, cell_idx, big)
    order = jnp.argsort(key, stable=True)  # groups cells; first occ leads
    sorted_key = key[order]
    first = jnp.concatenate(
        [jnp.asarray([True]), sorted_key[1:] != sorted_key[:-1]]
    )
    keep_sorted = first & (sorted_key != big)
    keep = jnp.zeros((S,), bool).at[order].set(keep_sorted)
    return keep


def _splat_one(model: SubmapModel, pose, logodds, enabled):
    """One keyframe's (cell ids, contribution values) after dedup."""
    r, c, inside = _world_cells(model, pose)
    idx = r * model.config.cols + c
    keep = _dedup_first(idx, inside & enabled)
    vals = jnp.where(keep, logodds, 0.0)
    safe_idx = jnp.where(keep, idx, 0)
    return safe_idx, vals, keep


@functools.partial(jax.jit, static_argnums=(1,))
def render_global_logodds(state: MappingState, model: SubmapModel) -> jax.Array:
    """Full batched repaint: scatter-add every valid submap through its
    current pose. The TPU replacement for serial inc/dec repainting."""
    cfg = model.config

    idx, vals, keep = jax.vmap(
        lambda p, l, v: _splat_one(model, p, l, v)
    )(state.kf_poses, state.kf_logodds, state.kf_valid)
    grid = jnp.zeros((cfg.rows * cfg.cols,), jnp.float32)
    grid = grid.at[idx.reshape(-1)].add(
        jnp.where(keep.reshape(-1), vals.reshape(-1), 0.0)
    )
    return grid.reshape(cfg.rows, cfg.cols)


def add_keyframe(
    state: MappingState,
    key,
    pose,
    points,
    pmask,
    model: SubmapModel,
) -> MappingState:
    """Insert/overwrite a keyframe submap (`Mapping.add_keyframe`,
    `mapping.py:145-252`) and incrementally add it to the render cache."""
    lo = build_submap_logodds(points, pmask, model)
    key = jnp.asarray(key, jnp.int32)
    state = state._replace(
        kf_logodds=state.kf_logodds.at[key].set(lo),
        kf_poses=state.kf_poses.at[key].set(jnp.asarray(pose, jnp.float32)),
        kf_valid=state.kf_valid.at[key].set(True),
        num_kf=jnp.maximum(state.num_kf, key + 1),
    )
    idx, vals, keep = _splat_one(model, state.kf_poses[key], lo, jnp.asarray(True))
    flat = state.grid.reshape(-1).at[idx].add(jnp.where(keep, vals, 0.0))
    return state._replace(grid=flat.reshape(state.grid.shape))


def update_poses(
    state: MappingState,
    new_poses: jax.Array,  # (K, 3) current SLAM estimates
    model: SubmapModel,
) -> MappingState:
    """Repaint after loop closure: move keyframes whose pose changed beyond
    min_translation/min_rotation (`pose_changed`, `mapping.py:138-143`) and
    re-render the whole grid batched."""
    cfg = model.config
    d = jax.vmap(se2_between)(state.kf_poses, new_poses)
    moved = (jnp.linalg.norm(d[:, :2], axis=-1) > cfg.min_translation) | (
        jnp.abs(d[:, 2]) > cfg.min_rotation
    )
    poses = jnp.where((moved & state.kf_valid)[:, None], new_poses, state.kf_poses)
    state = state._replace(kf_poses=poses)
    return state._replace(grid=render_global_logodds(state, model))


def occupancy_grid_method1(
    state: MappingState,
    model: SubmapModel,
    frames: jax.Array | None = None,
) -> jax.Array:
    """Log-odds -> int8 occupancy 0..100 (`get_occupancy_grid1`,
    `mapping.py:306-355`). Unobserved cells have log-odds 0 -> 50.

    ``frames``: optional (K,) bool mask re-rendering only a subset of
    keyframes (the GetOccupancyMap service semantics, `mapping.py:313-324`).
    """
    if frames is None:
        grid = state.grid
    else:
        grid = render_global_logodds(
            state._replace(kf_valid=state.kf_valid & frames), model
        )
    probs = expit(grid)
    return jnp.clip(jnp.round(100.0 * probs), 0, 100).astype(jnp.int8)


def resample_grid(grid: jax.Array, src_resolution: float,
                  dst_resolution: float) -> jax.Array:
    """Nearest-neighbor resample to a coarser resolution (the service's
    ``resolution`` argument; `mapping.py:330-341` uses cv2 INTER_NEAREST and
    requires dst >= src)."""
    if dst_resolution < src_resolution:
        raise ValueError("target resolution must be >= map resolution")
    ratio = src_resolution / dst_resolution
    H, W = grid.shape
    h, w = int(np.floor(H * ratio)), int(np.floor(W * ratio))
    rr = jnp.clip((jnp.arange(h) / ratio).astype(jnp.int32), 0, H - 1)
    cc = jnp.clip((jnp.arange(w) / ratio).astype(jnp.int32), 0, W - 1)
    return grid[rr][:, cc]


def get_occupancy_map(
    state: MappingState,
    model: SubmapModel,
    frames: jax.Array | None = None,
    resolution: float | None = None,
    method: int = 1,
    points=None,
    pmask=None,
):
    """The GetOccupancyMap service (`bruce_msgs/srv/GetOccupancyMap.srv`,
    served at `mapping_node.py:77,82-88`): occupancy for a keyframe subset at
    a requested resolution. Returns (grid int8, resolution)."""
    if method == 1:
        occ = occupancy_grid_method1(state, model, frames)
    else:
        occ = occupancy_grid_method2(state, model, points, pmask)
    res = model.config.resolution
    if resolution is not None and resolution > 0 and abs(
        resolution - res
    ) > res * 1e-1:
        occ = resample_grid(occ, res, resolution)
        res = resolution
    return occ, res


def occupancy_grid_method2(
    state: MappingState,
    model: SubmapModel,
    points: jax.Array,  # (P, 2) global-frame feature points
    pmask: jax.Array,
) -> jax.Array:
    """Point-projection occupancy (`get_occupancy_grid2`, `mapping.py:357-439`):
    -1 unknown, 0 observed-free (any submap footprint), 100 within the
    inflation radius of a projected point."""
    cfg = model.config

    # observed-free: cells touched by any valid submap footprint
    idx, _, keep = jax.vmap(
        lambda p, l, v: _splat_one(model, p, l, v)
    )(state.kf_poses, state.kf_logodds, state.kf_valid)
    free = jnp.zeros((cfg.rows * cfg.cols,), bool)
    free = free.at[idx.reshape(-1)].max(keep.reshape(-1))
    free = free.reshape(cfg.rows, cfg.cols)

    pmask = remove_outlier(
        points, pmask, cfg.outlier_filter_radius, cfg.outlier_filter_min_points
    )
    r = jnp.round((points[:, 1] - cfg.y0) / cfg.resolution).astype(jnp.int32)
    c = jnp.round((points[:, 0] - cfg.x0) / cfg.resolution).astype(jnp.int32)
    ok = pmask & (r >= 0) & (r < cfg.rows) & (c >= 0) & (c < cfg.cols)
    occ_mask = jnp.zeros((cfg.rows, cfg.cols), jnp.float32).at[
        jnp.where(ok, r, 0), jnp.where(ok, c, 0)
    ].max(ok.astype(jnp.float32))

    # ellipse (circular) dilation via 0/1 conv (cv2.dilate MORPH_ELLIPSE)
    hs = int(np.ceil(cfg.inflation_radius / cfg.resolution))
    y, x = np.mgrid[-hs : hs + 1, -hs : hs + 1]
    kernel = jnp.asarray(
        ((x / max(hs, 1)) ** 2 + (y / max(hs, 1)) ** 2 <= 1.0 + 1e-6).astype(
            np.float32
        )
    )
    dil = jax.lax.conv_general_dilated(
        occ_mask[None, None],
        kernel[None, None],
        (1, 1),
        [(hs, hs), (hs, hs)],
    )[0, 0]
    occupied = dil > 0

    out = jnp.full((cfg.rows, cfg.cols), -1, jnp.int8)
    out = jnp.where(free, jnp.int8(0), out)
    out = jnp.where(occupied, jnp.int8(100), out)
    return out


def submap_intensity(img: jax.Array, model: SubmapModel) -> jax.Array:
    """Downsample a polar ping image to the submap grid, flattened to (S,) —
    the per-keyframe intensity payload for :func:`intensity_grid`
    (`mapping.py:241-243`: ``r2n(ping)[::r_skip, ::c_skip]``)."""
    R, C = model.shape
    return img[:: model.r_skip, :: model.c_skip][:R, :C].reshape(-1).astype(
        jnp.float32
    )


def intensity_grid(
    state: MappingState,
    model: SubmapModel,
    kf_intensity: jax.Array,  # (K, S) per-keyframe downsampled intensities
) -> jax.Array:
    """Average-intensity map (`get_intensity_grid`, `mapping.py:272-298`):
    -1 unobserved else round(sum / 255 * 100 / count). The reference's
    intensity path is bit-rotted (`mapping.py:242` references an undefined
    variable); this implements the intended behavior."""
    cfg = model.config
    idx, _, keep = jax.vmap(
        lambda p, l, v: _splat_one(model, p, l, v)
    )(state.kf_poses, state.kf_logodds, state.kf_valid)
    flat_idx = idx.reshape(-1)
    flat_keep = keep.reshape(-1)
    inten = jnp.where(flat_keep, kf_intensity.reshape(-1), 0.0)
    sums = jnp.zeros((cfg.rows * cfg.cols,), jnp.float32).at[flat_idx].add(inten)
    counts = jnp.zeros((cfg.rows * cfg.cols,), jnp.float32).at[flat_idx].add(
        flat_keep.astype(jnp.float32)
    )
    avg = jnp.round(sums / 255.0 * 100.0 / jnp.maximum(counts, 1.0))
    out = jnp.where(counts > 0, avg, -1.0).astype(jnp.int8)
    return out.reshape(cfg.rows, cfg.cols)


def grow(config: MappingConfig, state: MappingState, pad_m: float = 50.0):
    """Host-side map growth by ``pad_m`` on all four sides (the reference's
    `adjust_bounds` 50 m increments). Returns (new_config, new_state);
    requires re-jitting grid-shaped programs (static shapes)."""
    new_cfg = MappingConfig(
        x0=config.x0 - pad_m,
        y0=config.y0 - pad_m,
        width=config.width + 2 * pad_m,
        height=config.height + 2 * pad_m,
        resolution=config.resolution,
        hit_prob=config.hit_prob,
        miss_prob=config.miss_prob,
        inflation_angle=config.inflation_angle,
        inflation_range=config.inflation_range,
        inflation_radius=config.inflation_radius,
        outlier_filter_radius=config.outlier_filter_radius,
        outlier_filter_min_points=config.outlier_filter_min_points,
        min_translation=config.min_translation,
        min_rotation=config.min_rotation,
        max_keyframes=config.max_keyframes,
    )
    pad_cells = int(round(pad_m / config.resolution))
    grid = np.zeros((new_cfg.rows, new_cfg.cols), np.float32)
    grid[
        pad_cells : pad_cells + config.rows, pad_cells : pad_cells + config.cols
    ] = np.asarray(state.grid)
    return new_cfg, state._replace(grid=jnp.asarray(grid))


def save_submaps(path: str, config: MappingConfig, state: MappingState,
                 model: SubmapModel) -> None:
    """Per-submap debug dump (the reference's ``save_submaps``,
    `mapping_node.py:139-155`: one entry per keyframe with its pose and
    submap raster, plus the map bounds tuple). Host-side; the per-keyframe
    log-odds live in the fixed-capacity state, so this is one copy — no
    re-rendering. Load with ``np.load(path)``:

    * ``poses`` (K', 3), ``logodds`` (K', S) sonar-raster submap log-odds,
    * ``cell_xy`` (S, 2) the raster's local cell coordinates,
    * ``map_size`` = (x0, y0, width, height, resolution).
    """
    nk = int(state.num_kf)
    valid = np.asarray(state.kf_valid)[:nk]
    np.savez_compressed(
        path,
        poses=np.asarray(state.kf_poses)[:nk][valid],
        logodds=np.asarray(state.kf_logodds)[:nk][valid],
        cell_xy=np.asarray(model.sonar_xy),
        map_size=np.asarray(
            [config.x0, config.y0, config.width, config.height,
             config.resolution], np.float32),
    )
