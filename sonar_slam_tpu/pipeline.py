"""End-to-end offline replay: the `slam.launch file:=bag` equivalent.

The reference's offline mode instantiates every node in one process and
pumps rosbag messages through their callbacks
(`/root/reference/bruce_slam/scripts/slam_node.py:8-65`), with launch-arg
selection of the dead-reckoning vs Kalman front end and the optional FOG
gyro (`launch/slam.launch:4,42-44`). Here the replay is a handful of fused
device programs over pre-aligned tensors:

1. odometry front end over synchronized ticks — dead reckoning (optionally
   FOG-yaw-driven) or the 12-state Kalman filter (one lax.scan either way),
2. the keyframe-gate pre-pass (tiny scalar scan; keyframe selection needs
   only odometry, so non-keyframe pings never touch the detector — the
   reference runs CFAR on every ping),
3. batched CFAR feature extraction over keyframe pings (Pallas on TPU),
4. ``slam_scan`` — the full SSM/NSSM/PCM smoother scan.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .estimators import (
    DRConfig,
    GyroConfig,
    KalmanConfig,
    dead_reckoning_scan,
    dead_reckoning_with_basis_scan,
    gyro_integrate,
    kalman_scan,
)
from .estimators.kalman import EVENT_DEPTH, EVENT_DVL, EVENT_GYRO, EVENT_IMU
from .geometry import pose3_to_pose2, se2_between, se2_compose
from .io.dataset import SensorStreams, build_dr_ticks, match_pings_to_ticks
from .io.simulate import SyntheticBag
from .slam.core import (
    KeyframeInput,
    SlamDims,
    SlamParams,
    select_keyframes,
    slam_scan,
)
from .slam.frontend import FeatureConfig, FeatureExtractor
from .slam.refine import RefineParams, refine_loops


class ReplayResult(NamedTuple):
    trajectory: np.ndarray  # (K', 3) optimized keyframe poses
    covs: np.ndarray  # (K', 3, 3)
    dr_trajectory: np.ndarray  # (K', 3) odometry poses at keyframes
    keyframe_times: np.ndarray  # (K',)
    keyframe_ping_idx: np.ndarray  # (K',) ping index of each keyframe
    num_keyframes: int
    outputs: object  # StepOutputs stacked (device arrays)
    carry: object  # final SlamCarry (for mapping / export / checkpoint)
    dr_poses_at_ticks: np.ndarray  # (T, 6) full-rate odometry
    dense_trajectory: np.ndarray  # (Ts, 3) SLAM pose at EVERY ping (see below)
    points3d: np.ndarray | None = None  # (K', N, 3) dual-sonar fused clouds
    points3d_mask: np.ndarray | None = None
    # dual-sonar production outputs (slam/dual_sonar.py round-5 path):
    # per-beam floor samples as fused 3-D points (local frames) + the global
    # elevation grid (the z mapping export)
    floor_points3d: np.ndarray | None = None  # (K', Cv, 3)
    floor_weights: np.ndarray | None = None  # (K', Cv)
    elevation_z: np.ndarray | None = None  # (H, W)
    elevation_w: np.ndarray | None = None  # (H, W)
    elevation_spec: object | None = None  # ElevationSpec


def _kalman_odometry(bag: SyntheticBag, kalman_config: KalmanConfig):
    """Merged sensor event stream -> full-rate pose3 at IMU events.

    Returns (times (T,), poses3 (T, 6)) for the IMU-event subsequence (the
    reference publishes odometry on IMU ticks, `kalman.py:217`).
    """
    times = [bag.imu_time, bag.dvl_time, bag.depth_time]
    types = [
        np.full(len(bag.imu_time), EVENT_IMU, np.int32),
        np.full(len(bag.dvl_time), EVENT_DVL, np.int32),
        np.full(len(bag.depth_time), EVENT_DEPTH, np.int32),
    ]
    zs = [
        bag.imu_rpy,
        bag.dvl_vel,
        np.stack([bag.depth, np.zeros_like(bag.depth),
                  np.zeros_like(bag.depth)], -1),
    ]
    if kalman_config.use_gyro and bag.gyro_time is not None:
        # FOG delta-yaw corrections (kalman.py:138-149); the simulator's
        # gyro frame is already sonar-aligned (identity offset matrix)
        times.append(bag.gyro_time)
        types.append(np.full(len(bag.gyro_time), EVENT_GYRO, np.int32))
        zg = np.zeros((len(bag.gyro_time), 3), np.float32)
        zg[:, 0] = bag.gyro_delta[:, 0]
        zs.append(zg)
    times = np.concatenate(times)
    types = np.concatenate(types)
    z = np.concatenate(zs).astype(np.float32)
    order = np.argsort(times, kind="stable")
    times, types, z = times[order], types[order], z[order]
    _, poses = kalman_scan(jnp.asarray(types), jnp.asarray(z, jnp.float32),
                           kalman_config)
    imu_sel = types == EVENT_IMU
    return times[imu_sel], poses[jnp.asarray(np.nonzero(imu_sel)[0])]


def replay(
    bag: SyntheticBag,
    feature_config: FeatureConfig,
    params: SlamParams,
    dims: SlamDims,
    dr_config: DRConfig = DRConfig(roll_offset=0.0),
    frontend: str = "dr",  # "dr" | "dr_gyro" | "kalman"
    gyro_config: GyroConfig | None = None,
    kalman_config: KalmanConfig | None = None,
    use_vertical: bool = False,  # dual-sonar 3-D fusion (configs[3])
    refine_params: RefineParams | None = None,
    mesh=None,  # jax.sharding.Mesh: shard the refinement fan-outs (§5.7)
) -> ReplayResult:
    # 1) odometry front end
    tick_basis = None  # (T, 2, 2) DVL basis integrals (dr frontends only)
    if frontend == "kalman":
        if kalman_config is None:
            from .io.config import load_kalman_config

            kalman_config = load_kalman_config()._replace(imu_offset=0.0)
            # the yaml's dt_imu / A_imu assume the real 200 Hz VN100; adapt
            # to this bag's actual IMU rate (position integrates v * dt_imu
            # per IMU event, kalman.py:202-204)
            dt = float(np.median(np.diff(bag.imu_time)))
            A = np.asarray(kalman_config.A_imu)
            A = A.copy()
            A[0, 6] = A[1, 7] = A[3, 9] = A[4, 10] = dt
            kalman_config = kalman_config._replace(
                dt_imu=dt, A_imu=jnp.asarray(A)
            )
        tick_time, dr_poses3 = _kalman_odometry(bag, kalman_config)
    else:
        gyro_yaw = None
        gyro_time = None
        if frontend == "dr_gyro":
            if gyro_config is None:
                gyro_config = GyroConfig(
                    offset_matrix=jnp.eye(3, dtype=jnp.float32),
                    latitude=0.0, sensor_rate=50.0, roll0=0.0,
                )
            ypr = gyro_integrate(jnp.asarray(bag.gyro_delta), gyro_config)
            gyro_yaw = np.asarray(ypr[:, 0])
            gyro_time = bag.gyro_time
            dr_config = dr_config._replace(use_gyro=True)
        streams = SensorStreams(
            imu_time=bag.imu_time,
            imu_rpy=bag.imu_rpy,
            dvl_time=bag.dvl_time,
            dvl_vel=bag.dvl_vel,
            depth_time=bag.depth_time,
            depth=bag.depth,
            gyro_time=gyro_time,
            gyro_yaw=gyro_yaw,
        )
        bundle = build_dr_ticks(streams)
        tick_time = bundle.tick_time
        if (dims.refine_scale_basis and dims.estimate_dvl_scale) or (
            dims.aggregate_with_dr_basis
        ):
            # one fused scan: full-DR lane + the two basis-integral lanes
            dr_poses3, tick_basis = dead_reckoning_with_basis_scan(
                bundle.ticks, dr_config
            )
        else:
            _, dr_poses3 = dead_reckoning_scan(bundle.ticks, dr_config)

    # 2) pair pings with odometry (approximate-time sync, slop 0.5 s)
    tick_idx, sync_ok = match_pings_to_ticks(bag.ping_time, tick_time)
    ping_dr3 = dr_poses3[tick_idx]
    ping_dr2 = pose3_to_pose2(ping_dr3)

    # 3) keyframe gate pre-pass (skip pattern = candidate mask)
    candidate = sync_ok & (np.arange(len(bag.ping_time)) % feature_config.skip == 0)
    kf_mask = np.asarray(
        select_keyframes(
            jnp.asarray(bag.ping_time),
            ping_dr2,
            jnp.asarray(candidate),
            params,
        )
    )
    kf_idx = np.nonzero(kf_mask)[0]
    K = dims.max_keyframes
    if len(kf_idx) > K:
        raise ValueError(
            f"{len(kf_idx)} keyframes exceed capacity {K}; raise "
            "SlamDims.max_keyframes or loosen keyframe gates"
        )
    pad = K - len(kf_idx)
    valid = np.zeros(K, bool)
    valid[: len(kf_idx)] = True
    sel = np.concatenate([kf_idx, np.zeros(pad, np.int64)])

    # 4) batched feature extraction on keyframe pings only
    extractor = FeatureExtractor(feature_config, bag.geometry)
    pts, masks, conf = extractor.extract_batch_conf(
        jnp.asarray(bag.ping_images[sel]))
    if feature_config.corroborate:
        # temporal speckle gate (FeatureConfig.corroborate): extract the two
        # adjacent pings' clouds (same compiled K-batch programs) and keep
        # keyframe points corroborated after DR motion comp
        from .slam.frontend import corroborate

        neighbors = []
        for nb_sel in (np.clip(sel - 1, 0, len(bag.ping_time) - 1),
                       np.clip(sel + 1, 0, len(bag.ping_time) - 1)):
            npts, nmask, _ = extractor.extract_batch_conf(
                jnp.asarray(bag.ping_images[nb_sel]))
            neighbors.append((npts, nmask, jnp.asarray(ping_dr2[nb_sel])))
        masks = corroborate(
            pts, masks, jnp.asarray(ping_dr2[sel]), neighbors,
            feature_config.corroborate_rho, feature_config.corroborate_both)
    masks = masks & jnp.asarray(valid)[:, None]

    frames = KeyframeInput(
        time=jnp.asarray(bag.ping_time[sel], jnp.float32),
        dr_pose3=ping_dr3[sel],
        points=pts,
        pmask=masks,
        valid=jnp.asarray(valid),
        conf=conf,
    )

    if dims.aggregate_with_dr_basis and tick_basis is None:
        raise ValueError(
            "aggregate_with_dr_basis requires a DR frontend (the basis "
            "integrals come from dead_reckoning_with_basis_scan)"
        )
    kf_basis = (
        jnp.asarray(tick_basis[tick_idx][sel])
        if tick_basis is not None else None
    )

    # 5) the fused SLAM scan
    carry, outputs = slam_scan(frames, params, dims, kf_basis)

    # 5b) post-convergence loop re-registration (slam/refine.py), optionally
    # sharding its registration fan-outs over a device mesh
    if dims.refine_iters > 0:
        carry = refine_loops(
            carry, params,
            refine_params if refine_params is not None
            else RefineParams.default(),
            dims, mesh, kf_basis,
        )

    nk = int(carry.num_kf)

    # 6) full-rate pose: compose each ping's DR delta onto its latest
    # keyframe's optimized pose — the reference's realtime publish_pose
    # (`slam_ros.py:182-185,228-257`) reproduced in one batched op
    kf_of_ping = np.clip(
        np.searchsorted(kf_idx, np.arange(len(bag.ping_time)), side="right") - 1,
        0, max(nk - 1, 0),
    )
    base = jnp.asarray(kf_of_ping)
    dense = se2_compose(
        carry.poses[base],
        se2_between(carry.dr_poses[base], ping_dr2),
    )

    points3d = points3d_mask = None
    floor3d = floor_w = egrid = espec = None
    if use_vertical:
        if bag.vertical_images is None:
            raise ValueError("bag has no vertical sonar stream")
        from .slam.dual_sonar import (
            ElevationSpec, fuse_frames_global,
        )
        from .kernels.cfar import cfar_soca2
        from .kernels.cfar_factors import threshold_factor_soca

        tau = threshold_factor_soca(feature_config.ntc, feature_config.pfa)
        t_, g_ = feature_config.ntc // 2, feature_config.ngc // 2
        vimgs = jnp.asarray(bag.vertical_images[sel])
        vdet = jax.vmap(
            lambda im: cfar_soca2(im, t_, g_, tau)[0]
            & (im > feature_config.threshold)
        )(vimgs)
        # elevation-grid extent: the survey area (trajectory +- max range)
        half = float(dims.max_range) * (1.0 + dims.aggregation_extent)
        res = 0.5
        n = int(np.ceil(2 * half / res))
        espec = ElevationSpec(x0=-half, y0=-half, resolution=res, nx=n, ny=n)
        p3, p3m, floor3, fw, egrid_dev = fuse_frames_global(
            carry.points, carry.pmasks, vimgs, vdet, carry.poses,
            bag.vertical_geometry, espec,
        )
        points3d, points3d_mask = np.asarray(p3), np.asarray(p3m)
        floor3d, floor_w = np.asarray(floor3), np.asarray(fw)
        egrid = (np.asarray(egrid_dev.z), np.asarray(egrid_dev.w))

    return ReplayResult(
        trajectory=np.asarray(carry.poses[:nk]),
        covs=np.asarray(carry.covs[:nk]),
        dr_trajectory=np.asarray(carry.dr_poses[:nk]),
        keyframe_times=np.asarray(carry.times[:nk]),
        keyframe_ping_idx=kf_idx,
        num_keyframes=nk,
        outputs=outputs,
        carry=carry,
        dr_poses_at_ticks=np.asarray(dr_poses3),
        dense_trajectory=np.asarray(dense),
        points3d=points3d,
        points3d_mask=points3d_mask,
        floor_points3d=floor3d,
        floor_weights=floor_w,
        elevation_z=egrid[0] if egrid is not None else None,
        elevation_w=egrid[1] if egrid is not None else None,
        elevation_spec=espec,
    )


def _umeyama_rotation(est: np.ndarray, truth: np.ndarray) -> np.ndarray:
    """Best SE(2) alignment rotation est->truth (Umeyama, no scale).

    Unequal lengths are expected (truncated replays); align over the
    common prefix (ADVICE r3)."""
    n = min(len(est), len(truth))
    a, b = est[:n, :2], truth[:n, :2]
    A, B = a - a.mean(0), b - b.mean(0)
    U, _, Vt = np.linalg.svd(A.T @ B)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    return Vt.T @ np.diag([1, d]) @ U.T


def ate_rmse(est: np.ndarray, truth: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE over xy) after optional SE(2) alignment
    (Umeyama, no scale) — the benchmark metric from BASELINE.md."""
    n = min(len(est), len(truth))
    a, b = est[:n, :2], truth[:n, :2]
    if align and len(a) >= 2:
        R = _umeyama_rotation(est, truth)
        a = (R @ (a - a.mean(0)).T).T + b.mean(0)
    return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1))))


def ate_heading_deg(
    est: np.ndarray, truth: np.ndarray, align: bool = True
) -> float:
    """Heading component of the absolute trajectory error: RMSE of the
    wrapped yaw residual (degrees) after the SAME SE(2) alignment as
    ``ate_rmse``. The north star is "1 cm / 0.5 deg" (BASELINE.md) — the
    reference exports yaw as a first-class pose-graph state
    (`/root/reference/bruce_slam/src/bruce_slam/slam.py:165-202`)."""
    dth = est[:, 2] - truth[: len(est), 2]
    if align and len(est) >= 2:
        R = _umeyama_rotation(est, truth)
        dth = dth + np.arctan2(R[1, 0], R[0, 0])
    dth = np.arctan2(np.sin(dth), np.cos(dth))
    return float(np.degrees(np.sqrt(np.mean(dth**2))))
