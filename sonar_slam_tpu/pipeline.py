"""End-to-end offline replay: the `slam.launch file:=bag` equivalent.

The reference's offline mode instantiates every node in one process and
pumps rosbag messages through their callbacks
(`/root/reference/bruce_slam/scripts/slam_node.py:8-65`). Here the replay is
four fused device programs over pre-aligned tensors:

1. ``dead_reckoning_scan`` over synchronized sensor ticks (one lax.scan),
2. batched CFAR feature extraction over *keyframe pings only* (one vmap) —
   keyframe selection needs only dead reckoning, so non-keyframe pings never
   touch the detector (the reference runs CFAR on every ping),
3. the keyframe-gate pre-pass (tiny scalar scan),
4. ``slam_scan`` — the full SSM/NSSM/PCM smoother scan.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .estimators import DRConfig, dead_reckoning_scan
from .geometry import pose3_to_pose2
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


class ReplayResult(NamedTuple):
    trajectory: np.ndarray  # (K', 3) optimized keyframe poses
    covs: np.ndarray  # (K', 3, 3)
    dr_trajectory: np.ndarray  # (K', 3) dead-reckoning poses at keyframes
    keyframe_times: np.ndarray  # (K',)
    keyframe_ping_idx: np.ndarray  # (K',) ping index of each keyframe
    num_keyframes: int
    outputs: object  # StepOutputs stacked (device arrays)
    carry: object  # final SlamCarry (for mapping / export / checkpoint)
    dr_poses_at_ticks: np.ndarray  # (T, 6) full-rate dead reckoning


def replay(
    bag: SyntheticBag,
    feature_config: FeatureConfig,
    params: SlamParams,
    dims: SlamDims,
    dr_config: DRConfig = DRConfig(roll_offset=0.0),
) -> ReplayResult:
    # 1) dead reckoning over synchronized ticks
    streams = SensorStreams(
        imu_time=bag.imu_time,
        imu_rpy=bag.imu_rpy,
        dvl_time=bag.dvl_time,
        dvl_vel=bag.dvl_vel,
        depth_time=bag.depth_time,
        depth=bag.depth,
    )
    bundle = build_dr_ticks(streams)
    _, dr_poses3 = dead_reckoning_scan(bundle.ticks, dr_config)

    # 2) pair pings with odometry (approximate-time sync, slop 0.5 s)
    tick_idx, sync_ok = match_pings_to_ticks(bag.ping_time, bundle.tick_time)
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
    pts, masks = extractor.extract_batch(jnp.asarray(bag.ping_images[sel]))
    masks = masks & jnp.asarray(valid)[:, None]

    frames = KeyframeInput(
        time=jnp.asarray(bag.ping_time[sel], jnp.float32),
        dr_pose3=ping_dr3[sel],
        points=pts,
        pmask=masks,
        valid=jnp.asarray(valid),
    )

    # 5) the fused SLAM scan
    carry, outputs = slam_scan(frames, params, dims)

    nk = int(carry.num_kf)
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
    )


def ate_rmse(est: np.ndarray, truth: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE over xy) after optional SE(2) alignment
    (Umeyama, no scale) — the benchmark metric from BASELINE.md."""
    a, b = est[:, :2], truth[:, :2]
    if align and len(a) >= 2:
        ca, cb = a.mean(0), b.mean(0)
        A, B = a - ca, b - cb
        H = A.T @ B
        U, _, Vt = np.linalg.svd(H)
        d = np.sign(np.linalg.det(Vt.T @ U.T))
        R = Vt.T @ np.diag([1, d]) @ U.T
        a = (R @ A.T).T + cb
    return float(np.sqrt(np.mean(np.sum((a - b[: len(a)]) ** 2, axis=1))))
