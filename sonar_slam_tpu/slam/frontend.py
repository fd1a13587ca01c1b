"""Sonar feature extraction: polar ping -> masked 2-D point cloud.

Rebuild of `FeatureExtraction.callback`
(`/root/reference/bruce_slam/src/bruce_slam/feature_extraction.py:196-252`):

1. CFAR detection on the polar image (SOCA by default, feature.yaml),
2. intensity gate ``peaks &= img > threshold``,
3. detected polar cells -> body-frame Cartesian points,
4. voxel downsample at ``resolution`` then radius outlier removal.

Instead of rasterizing the detection mask into a Cartesian image and reading
back nonzero pixels (`feature_extraction.py:231-238`), we map each detected
polar cell directly to its continuous (range cos b, range sin b) point — the
same convention the SLAM node ends up with (`slam_ros.py:169-170`), minus the
pixel quantization (documented divergence; strictly higher fidelity).

The whole pipeline is one jit program and vmaps over frames, so a bag's worth
of pings is a single batched TPU call.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..kernels.cfar import cfar_ca2, cfar_goca2, cfar_os2, cfar_soca2
from ..kernels.cfar_factors import (
    threshold_factor_ca,
    threshold_factor_goca,
    threshold_factor_os,
    threshold_factor_soca,
)
from ..cloud import remove_outlier
from ..cloud.knn import pairwise_sq_dists
from ..geometry import se2_between, se2_transform_points
from .sonar import SonarGeometry


class FeatureConfig(NamedTuple):
    """feature.yaml semantics (`/root/reference/bruce_slam/config/feature.yaml`)."""

    # CFAR row-border policy (kernels/cfar.py): "strict" = reference
    # semantics (rows within ntc/2+ngc/2 of either edge never detect — this
    # blinds the outer ~12% of every ping's swath and was the round-5 map
    # recall ceiling, docs/ACCURACY.md); "extend" = edge-replicate pad so
    # the whole swath detects. Production default: extend.
    cfar_edge: str = "extend"
    ntc: int = 40
    ngc: int = 10
    pfa: float = 0.1
    rank: int = 10
    alg: str = "SOCA"
    threshold: float = 65.0
    resolution: float = 0.5
    outlier_radius: float = 1.0
    outlier_min_points: int = 5
    skip: int = 1
    max_points: int = 256  # output cloud capacity (TPU padding)
    # sub-bin peak refinement: log-parabolic interpolation of the intensity
    # peak along range (pulse envelope) and bearing (beam pattern) recovers
    # the continuous scatterer position to a fraction of a cell. The
    # reference reads back rasterized pixel centers (feature_extraction.py:
    # 231-238) and cannot do this; on real Oculus data the return envelope
    # spans several cells, so the information is there.
    subbin: bool = True
    # minimum CFAR detections per voxel for the voxel to emit a point. A
    # genuine return's pulse/beam envelope spans several polar cells, so
    # real features land 5+ detections in their voxel; isolated speckle
    # false alarms land exactly 1. Measured (seeds 0/4, full-config
    # geometry): the err>0.5 m feature tail is count-1 voxels at every
    # quantile (median good count 8, good q10 ~5) — this single gate
    # removes the heavy tail the round-4 error budget identified as the
    # ATE frontier (docs/ACCURACY.md round 5). The reference's pixel-count
    # voxel filter has no analog (its downsampler keeps every occupied
    # octree node, pcl.cpp:128-159). 1 = off (legacy behavior).
    min_voxel_hits: int = 1
    # temporal corroboration gate: a keyframe point survives only if the
    # feature cloud of an ADJACENT ping contains a point within
    # ``corroborate_rho`` meters after odometry motion compensation. Speckle
    # (simulated and real sonar alike) decorrelates frame to frame while
    # genuine returns persist, so this is the evidence axis the in-frame
    # count gate lacks: far-range real returns whose envelope spans one cell
    # (count 1) corroborate; isolated speckle does not. Measured (seeds 0/4,
    # full config, rho=0.3): 98.8% of err<0.2 m points kept, 5.5-13% of the
    # err>0.5 m tail kept, per-point feature RMS 16.4->8.1 / 15.7->9.5 cm
    # (docs/ACCURACY.md round 5). The reference processes each ping
    # independently (feature_extraction.py:196-252) and has no analog.
    # Costs two extra feature extractions per keyframe (the neighbor
    # pings), batched into the same compiled programs.
    corroborate: bool = False
    corroborate_rho: float = 0.3
    # require BOTH neighbors to corroborate (AND) instead of either (OR).
    # Stricter on speckle (independent frames: survival rate squared) at
    # the cost of real returns near the FOV edge that only one neighbor
    # sees. Measured end-to-end (seeds 1/2/4, full config, TPU): see
    # docs/ACCURACY.md round 5.
    corroborate_both: bool = False


class StaticVoxelBinner:
    """Scatter-free voxel downsampling for the STATIC polar cell table.

    The detector's input geometry never changes within a run, so the mapping
    polar cell -> voxel is computed once on the host and voxelization becomes
    a gather + masked sum over a precomputed (num_voxels, group) index table,
    followed by one top_k. On TPU this compiles in seconds and runs at memory
    bandwidth, whereas the generic scatter-add voxelizer costs ~100 s of
    Mosaic compile and ~30 ms/frame at 512x256 (measured) — scatters with
    data-dependent indices are the wrong tool when the binning is static.
    """

    def __init__(self, cells_xy: np.ndarray, resolution: float,
                 x0: float, y0: float, nx: int, ny: int,
                 max_group: int = 1024, cell_valid: np.ndarray | None = None):
        n_cells = len(cells_xy)
        ix = np.floor((cells_xy[:, 0] - x0) / resolution).astype(np.int64)
        iy = np.floor((cells_xy[:, 1] - y0) / resolution).astype(np.int64)
        inside = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
        if cell_valid is not None:
            inside = inside & cell_valid
        vid = np.where(inside, iy * nx + ix, -1)
        used = np.unique(vid[vid >= 0])
        remap = {v: i for i, v in enumerate(used)}
        V = len(used)
        groups: list[list[int]] = [[] for _ in range(V)]
        for cell, v in enumerate(vid):
            if v >= 0:
                groups[remap[v]].append(cell)
        G = min(max(len(g) for g in groups), max_group)
        idx = np.full((V, G), n_cells, np.int32)  # sentinel -> padded False
        for i, g in enumerate(groups):
            take = g[:G]  # overflow cells dropped (closest-range voxels only)
            idx[i, : len(take)] = take
        self.dropped_cells = sum(max(0, len(g) - G) for g in groups)
        self.group_idx = jnp.asarray(idx)
        padded_xy = np.concatenate(
            [cells_xy, np.zeros((1, 2), np.float32)]
        )
        self.group_xy = jnp.asarray(padded_xy[idx])  # (V, G, 2) static
        self.num_voxels = V
        self.num_cells = n_cells

    def __call__(self, flat_mask: jax.Array, max_out: int,
                 flat_weights: jax.Array | None = None,
                 flat_xy: jax.Array | None = None,
                 min_hits: int = 1):
        """(num_cells,) bool detection mask -> (points [max_out,2], mask).

        With ``flat_weights`` (e.g. echo intensities), voxel representatives
        are intensity-weighted centroids — sub-cell precision the reference's
        rasterized pixel-center readback cannot provide (the voxel ranking
        stays by hit count). ``flat_xy`` optionally overrides the static cell
        positions with refined (e.g. sub-bin-interpolated) per-cell points;
        voxel ASSIGNMENT always uses the static positions (offsets are a
        fraction of a cell, far below the voxel size). Weighted or not,
        exactly one point per occupied voxel is emitted.
        """
        padded = jnp.concatenate([flat_mask, jnp.zeros((1,), bool)])
        hits = padded[self.group_idx]  # (V, G)
        h = hits.astype(jnp.float32)
        counts = jnp.sum(h, axis=1)
        if flat_weights is None:
            w = h
            wsum = counts
        else:
            wp = jnp.concatenate([flat_weights.astype(jnp.float32),
                                  jnp.zeros((1,), jnp.float32)])
            w = h * wp[self.group_idx]
            wsum = jnp.sum(w, axis=1)
        if flat_xy is None:
            group_xy = self.group_xy
        else:
            xyp = jnp.concatenate(
                [flat_xy.astype(jnp.float32), jnp.zeros((1, 2), jnp.float32)]
            )
            group_xy = xyp[self.group_idx]
        sums = jnp.einsum("vg,vgc->vc", w, group_xy,
                          precision=jax.lax.Precision.HIGHEST)
        score, vi = jax.lax.top_k(counts, max_out)
        # speckle gate: a voxel must collect >= min_hits detections (see
        # FeatureConfig.min_voxel_hits)
        out_mask = score > max(min_hits, 1) - 0.5
        centroids = sums[vi] / jnp.maximum(wsum[vi], 1e-6)[:, None]
        # third channel: the voxel's detection count — the measured
        # speckle/real separator (isolated speckle = 1, genuine returns'
        # pulse envelopes = several), consumed downstream as per-point
        # registration confidence (SlamParams.conf_ref/conf_power)
        conf = jnp.where(out_mask, score, 0.0)
        return jnp.where(out_mask[:, None], centroids, 0.0), out_mask, conf


class FeatureExtractor:
    """Builds the static pieces (tau, voxel grid, cell tables) once per
    (config, geometry) — the analog of ``FeatureExtraction.configure`` +
    ``generate_map_xy`` caching (`feature_extraction.py:78-81,134-173`).

    ``use_pallas``: "auto" selects the fused Pallas detector (CFAR + intensity
    gate in one VMEM pass, kernels/cfar_pallas.py) on TPU for the sum-based
    variants; "never" forces the XLA path (always used for OS and on CPU).
    """

    def __init__(
        self,
        config: FeatureConfig,
        geometry: SonarGeometry,
        use_pallas: str = "auto",
    ):
        self.config = config
        self.geometry = geometry
        t, g = config.ntc // 2, config.ngc // 2
        edge = config.cfar_edge
        if config.alg == "CA":
            tau = threshold_factor_ca(config.ntc, config.pfa)
            self._detect = lambda img: cfar_ca2(img, t, g, tau, edge)[0]
        elif config.alg == "SOCA":
            tau = threshold_factor_soca(config.ntc, config.pfa)
            self._detect = lambda img: cfar_soca2(img, t, g, tau, edge)[0]
        elif config.alg == "GOCA":
            tau = threshold_factor_goca(config.ntc, config.pfa)
            self._detect = lambda img: cfar_goca2(img, t, g, tau, edge)[0]
        elif config.alg == "OS":
            tau = threshold_factor_os(config.ntc, config.rank, config.pfa)
            self._detect = lambda img: cfar_os2(
                img, t, g, config.rank, tau, edge)[0]
        else:
            raise ValueError(f"unknown CFAR alg {config.alg}")
        self.tau = tau

        cells_np = geometry.cell_points().reshape(-1, 2).astype(np.float32)
        self._cells = jnp.asarray(cells_np)
        # sub-bin refinement tables: the metric displacement of each cell's
        # point per +1 ROW (radial, pulse axis) and per +1 COLUMN (tangential,
        # beam axis). A fractional peak offset (dr, dc) in cell units then
        # maps to cell_xy + dr*step_r + dc*step_c.
        Rn, Cn = geometry.num_ranges, geometry.num_bearings
        b = np.asarray(geometry.bearings, np.float64)
        db = np.gradient(b)
        ur = np.stack([np.cos(b), np.sin(b)], -1)  # radial unit
        ut = np.stack([-np.sin(b), np.cos(b)], -1)  # tangential unit
        step_r = np.broadcast_to(ur[None], (Rn, Cn, 2)) * geometry.range_resolution
        step_c = (geometry.ranges[:, None, None] * db[None, :, None]) * ut[None]
        self._step_r = jnp.asarray(step_r.reshape(-1, 2).astype(np.float32))
        self._step_c = jnp.asarray(step_c.reshape(-1, 2).astype(np.float32))
        half_width = float(
            np.sin(geometry.horizontal_aperture / 2) * geometry.max_range
        )
        res = config.resolution
        # strict-edge CFAR can never detect inside the border band — exclude
        # those rows from the binner (shrinks the per-voxel group tables
        # near min range). With edge="extend" the whole swath can detect,
        # so every row stays bin-eligible.
        if config.cfar_edge == "strict":
            hw = (config.ntc + config.ngc) // 2
            row_ok = np.zeros(geometry.num_ranges, bool)
            row_ok[hw : geometry.num_ranges - hw] = True
        else:
            row_ok = np.ones(geometry.num_ranges, bool)
        cell_ok = np.repeat(row_ok, geometry.num_bearings)
        self._binner = StaticVoxelBinner(
            cells_np, res, x0=0.0, y0=-half_width,
            nx=int(np.ceil(geometry.max_range / res)) + 1,
            ny=int(np.ceil(2 * half_width / res)) + 1,
            cell_valid=cell_ok,
        )

        def _subbin_xy(img: jax.Array) -> jax.Array:
            """Refined per-cell positions via log-parabolic peak interpolation.

            A Gaussian pulse/beam envelope is exactly parabolic in log
            intensity, so the 3-point parabola vertex recovers the continuous
            peak position. Non-peak cells (non-negative curvature) keep their
            static position; offsets are clipped to half a cell.
            """
            L = jnp.log(jnp.maximum(img, 1.0))

            def peak_delta(axis: int) -> jax.Array:
                lm = jnp.roll(L, 1, axis=axis)
                lp = jnp.roll(L, -1, axis=axis)
                num = lm - lp
                den = lm + lp - 2.0 * L
                d = jnp.where(den < -1e-6, num / (2.0 * den), 0.0)
                # boundary rows/cols have no valid 3-point neighborhood —
                # force zero offset there (duplicating the edge sample would
                # bias every inward-decreasing boundary peak by -0.5 cells)
                edge = jnp.zeros(L.shape, bool)
                if axis == 0:
                    edge = edge.at[0].set(True).at[-1].set(True)
                else:
                    edge = edge.at[:, 0].set(True).at[:, -1].set(True)
                d = jnp.where(edge, 0.0, d)
                return jnp.clip(d, -0.5, 0.5).reshape(-1, 1)

            return (
                self._cells
                + peak_delta(0) * self._step_r
                + peak_delta(1) * self._step_c
            )

        self._subbin_xy = _subbin_xy

        @jax.jit
        def _pipeline(img: jax.Array):
            img = img.astype(jnp.float32)
            peaks = self._detect(img)
            peaks = peaks & (img > self.config.threshold)
            flat = peaks.reshape(-1)
            pts, mask, conf = self._binner(
                flat, self.config.max_points, img.reshape(-1),
                _subbin_xy(img) if self.config.subbin else None,
                min_hits=self.config.min_voxel_hits,
            )
            if self.config.outlier_min_points > 1:
                mask = remove_outlier(
                    pts,
                    mask,
                    self.config.outlier_radius,
                    self.config.outlier_min_points,
                )
            return pts, mask, conf

        self._pipeline = _pipeline
        self._pipeline_batch = jax.jit(jax.vmap(_pipeline))

        # OS is pallas-eligible too: sonar intensities are decoded uint8
        # values, where the kernel's intensity-level binary search is exact
        self._pallas_ok = (
            use_pallas != "never"
            and config.alg in ("CA", "SOCA", "GOCA", "OS")
            and jax.default_backend() not in ("cpu",)
        )
        if self._pallas_ok:
            from ..kernels.cfar_pallas import cfar_pallas_batch

            t, g = config.ntc // 2, config.ngc // 2

            Rn, Cn = geometry.num_ranges, geometry.num_bearings

            def _postprocess(args_):
                flat_peaks, flat_intensity = args_
                pts, mask, conf = self._binner(
                    flat_peaks, config.max_points, flat_intensity,
                    _subbin_xy(flat_intensity.reshape(Rn, Cn))
                    if config.subbin else None,
                    min_hits=config.min_voxel_hits,
                )
                if config.outlier_min_points > 1:
                    mask = remove_outlier(
                        pts, mask, config.outlier_radius,
                        config.outlier_min_points,
                    )
                return pts, mask, conf

            # SEPARATE small jit units composed with a host-level chunk loop:
            # one fused jit of (pallas CFAR + wide postprocess) takes the
            # remote Mosaic compile service >30 min (it drops the request);
            # each unit here compiles in minutes and is persistently cached.
            # The chunk is sized to cover a full bench replay (128 keyframe
            # capacity) in ONE dispatch: each extra dispatch costs >100 ms
            # of tunnel latency, which at chunk=32 was ~40% of the whole
            # feature stage.
            chunk = 128

            @jax.jit
            def _detect_batch(imgs):
                det, _ = cfar_pallas_batch(
                    imgs.astype(jnp.float32), t, g, self.tau, config.alg,
                    intensity_threshold=config.threshold, rank=config.rank,
                    edge=config.cfar_edge,
                )
                B = det.shape[0]
                return (
                    det.reshape(B, -1),
                    imgs.astype(jnp.float32).reshape(B, -1),
                )

            _chunk_post = jax.jit(jax.vmap(_postprocess))

            def _pallas_batch(imgs):
                flat, inten = _detect_batch(imgs)
                B = flat.shape[0]
                pad = (-B) % chunk
                if pad:
                    flat = jnp.pad(flat, ((0, pad), (0, 0)))
                    inten = jnp.pad(inten, ((0, pad), (0, 0)))
                outs = [
                    _chunk_post((flat[i : i + chunk], inten[i : i + chunk]))
                    for i in range(0, B + pad, chunk)
                ]
                pts = jnp.concatenate([o[0] for o in outs])[:B]
                mask = jnp.concatenate([o[1] for o in outs])[:B]
                conf = jnp.concatenate([o[2] for o in outs])[:B]
                return pts, mask, conf

            # host-composed: already made of jitted units (do NOT wrap in an
            # enclosing jit — that recreates the monolithic compile)
            self.extract_batch_traced = _pallas_batch
            self._pallas_batch = _pallas_batch
        else:
            self.extract_batch_traced = jax.vmap(_pipeline)

    def extract(self, img: jax.Array):
        """One polar frame [R, C] -> (points [max_points, 2], mask)."""
        return self._pipeline(img)[:2]

    def extract_batch(self, imgs: jax.Array):
        """[B, R, C] frames -> ([B, max_points, 2], [B, max_points]) in one
        fused TPU call — the batched replacement for the per-ping ROS
        callback. Uses the fused Pallas detector on TPU."""
        return self.extract_batch_conf(imgs)[:2]

    def extract_batch_conf(self, imgs: jax.Array):
        """Like :meth:`extract_batch` plus the per-point confidence channel
        (voxel detection counts): ([B, N, 2], [B, N] bool, [B, N] f32)."""
        if self._pallas_ok:
            return self._pallas_batch(imgs)
        return self._pipeline_batch(imgs)

    def detections(self, img: jax.Array):
        """Raw CFAR + intensity detection mask (for visualization parity)."""
        img = img.astype(jnp.float32)
        return self._detect(img) & (img > self.config.threshold)


def corroboration_gate(
    pts: jax.Array,        # (K, N, 2) keyframe body-frame points
    masks: jax.Array,      # (K, N) bool
    pose2: jax.Array,      # (K, 3) keyframe odometry pose (any shared frame)
    nb_pts: jax.Array,     # (K, M, 2) neighbor-ping body-frame points
    nb_masks: jax.Array,   # (K, M) bool
    nb_pose2: jax.Array,   # (K, 3) neighbor odometry pose (same frame)
    rho: float,
) -> jax.Array:
    """Per-point corroboration flags against ONE adjacent-ping cloud.

    Motion-compensates the neighbor cloud into the keyframe body frame via
    the odometry relative pose (over one ping period the odometry relative
    error is millimetric — far below ``rho``), then flags keyframe points
    with a masked neighbor within ``rho``. OR the flags over several
    neighbors before applying: ``masks & (corr_prev | corr_next)``.

    See :class:`FeatureConfig.corroborate` for the measurement that sized
    ``rho`` and the reference-divergence note.
    """
    rel = jax.vmap(se2_between)(pose2, nb_pose2)
    q = jax.vmap(se2_transform_points)(nb_pts, rel)
    d2 = jax.vmap(pairwise_sq_dists)(pts, q)  # (K, N, M), MXU path
    d2 = jnp.where(nb_masks[:, None, :], d2, jnp.inf)
    return masks & (jnp.min(d2, axis=-1) < rho * rho)


def corroborate(
    pts: jax.Array,
    masks: jax.Array,
    pose2: jax.Array,
    neighbors,  # iterable of (nb_pts, nb_masks, nb_pose2)
    rho: float,
    both: bool = False,
) -> jax.Array:
    """Apply :func:`corroboration_gate` over several neighbor clouds.

    ``both=False`` keeps points corroborated by ANY neighbor (the shipped
    semantics — robust to FOV-edge points one neighbor misses);
    ``both=True`` requires EVERY neighbor (stricter: independent-frame
    speckle survival is the product of per-neighbor rates). Shared by
    `pipeline.replay` and `bench.py` so the semantics are tested once.
    """
    corr = None
    for nb_pts, nb_masks, nb_pose2 in neighbors:
        c = corroboration_gate(pts, masks, pose2, nb_pts, nb_masks,
                               nb_pose2, rho)
        corr = c if corr is None else ((corr & c) if both else (corr | c))
    return masks & corr
