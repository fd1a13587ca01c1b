#!/usr/bin/env python
"""Error-budget decomposition of the synthetic-benchmark ATE.

Round-1 verdict: "accuracy is the headline weakness ... publish an error
budget: quantify the feature-quantization floor vs estimation error by
replaying with noiseless sensors / ground-truth odometry lanes."

Four lanes decompose the end-to-end ATE:

  A  full pipeline            (sensor noise + feature noise + estimation)
  B  noiseless sensors        (feature noise + estimation)
  C  ground-truth features    (sensor noise + estimation)
  D  noiseless + GT features  (estimation machinery floor)

plus the raw dead-reckoning ATE (what SLAM must beat) and the per-point
feature fidelity RMS (the render/quantization floor feeding ICP).

Usage: python scripts/error_budget.py [--full] [--seed N] [--out FILE]
                                      [--tpu]

``--tpu`` keeps the ambient (tunneled TPU) platform — required for the full
config, whose CPU replay takes >1 h; all four lanes share one compiled
program (they differ only in input data), so the TPU run is minutes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:  # persistent cache: shared with bench.py's full-config executable
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from dataclasses import replace

from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.estimators import DRConfig
from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
from sonar_slam_tpu.pipeline import ate_rmse, replay
from sonar_slam_tpu.slam import FeatureConfig, SlamDims, SlamParams
from sonar_slam_tpu.slam.core import KeyframeInput, slam_scan
from sonar_slam_tpu.geometry import pose3_to_pose2


def setups(full: bool):
    """Production configs (kept in sync with bench.py)."""
    icp_prod = ICPConfig(max_iterations=12, min_diff_rot=1e-3,
                         min_diff_trans=1e-2, point_to_line=True,
                         outlier_max_dist=0.5)
    if full:
        sim = SimConfig(duration=480.0, speed=0.5, sonar_rate=5.0,
                        num_ranges=512, num_bearings=256, loop_radius=18.0,
                        imu_rate=50.0)
        dims = SlamDims(max_keyframes=128, max_points=256,
                        target_capacity=1024, nssm_cov_samples=12,
                        ssm_sobol=64, nssm_sobol=512, max_loops=128,
                        gn_iters=3, icp=icp_prod,
                        nssm_target_window=2, nssm_pair_refine=True,
                        pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
                        pair_refine_min_inliers=25,
                        nssm_reinit_after_select=True, aggregate_with_dr=True,
                        aggregate_with_dr_basis=True,
                        estimate_dvl_scale=True,
                        refine_iters=2, refine_sweep=True, refine_chain=True,
                        refine_final_sweep=True,
                        refine_scale_from_chain=True, refine_sweep_budget=0,
                        refine_scale_basis=True, refine_incremental=True)
        kf_t = 3.0
    else:
        sim = SimConfig(duration=90.0, speed=0.5, sonar_rate=1.0,
                        num_ranges=192, num_bearings=96, loop_radius=10.0,
                        imu_rate=20.0)
        dims = SlamDims(max_keyframes=32, max_points=128, target_capacity=512,
                        nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=128,
                        max_loops=32, gn_iters=3, icp=icp_prod,
                        nssm_target_window=2, nssm_pair_refine=True,
                        pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
                        pair_refine_min_inliers=25,
                        refine_iters=2, refine_sweep=True, refine_chain=True)
        kf_t = 2.0
    return sim, dims, kf_t


def bench_rparams(full: bool = False):
    """Refinement params matching bench.py: the full config tightens the
    consensus-prune gates with its finer sonar bins."""
    from sonar_slam_tpu.slam import RefineParams

    rp = RefineParams.default()
    if full:
        rp = rp._replace(prune_max_dt=jnp.float32(0.18),
                         prune_max_dr=jnp.float32(0.06),
                         sweep_min_inliers=jnp.asarray(15, jnp.int32))
    return rp


def bench_params(dims, kf_t, full: bool = False):
    return SlamParams.default(dims)._replace(
        keyframe_translation=jnp.float32(kf_t),
        ssm_min_points=jnp.asarray(20, jnp.int32),
        nssm_min_points=jnp.asarray(50 if full else 20, jnp.int32),
        fuse_odometry=jnp.asarray(True),
        use_best_start_tf=jnp.asarray(True),
        nssm_every=jnp.asarray(5 if full else 1, jnp.int32),
        odom_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
        icp_odom_sigmas=jnp.asarray(
            [0.2, 0.2, 0.1] if full else [0.3, 0.3, 0.1], jnp.float32),
    )


def gt_features(bag, sim, dims, rng):
    """Ground-truth feature clouds: visible world points in the TRUE body
    frame, voxel-thinned to the cloud capacity — zero render/detector error."""
    N = dims.max_points
    pts_all = np.zeros((len(bag.ping_time), N, 2), np.float32)
    mask_all = np.zeros((len(bag.ping_time), N), bool)
    for i, pose in enumerate(bag.true_pose_at_ping):
        c, s = np.cos(pose[2]), np.sin(pose[2])
        rel = bag.world_points - pose[:2]
        lx = c * rel[:, 0] + s * rel[:, 1]
        ly = -s * rel[:, 0] + c * rel[:, 1]
        r = np.hypot(lx, ly)
        b = np.arctan2(ly, lx)
        vis = ((r > 0.5) & (r < sim.max_range * 0.98)
               & (b > bag.geometry.bearings[0]) & (b < bag.geometry.bearings[-1]))
        P = np.stack([lx[vis], ly[vis]], -1)
        # voxel-thin at the feature resolution so densities match the
        # real frontend's output
        if len(P):
            key = np.round(P / 0.5).astype(np.int64)
            _, keep = np.unique(key[:, 0] * 100003 + key[:, 1],
                                return_index=True)
            P = P[np.sort(keep)]
        if len(P) > N:
            P = P[rng.permutation(len(P))[:N]]
        pts_all[i, : len(P)] = P
        mask_all[i, : len(P)] = True
    return pts_all, mask_all


def replay_gt_features(bag, sim, params, dims, kf_t, rng):
    """Replay using GT feature clouds but the bag's (noisy or not) odometry."""
    from sonar_slam_tpu.io.dataset import (SensorStreams, build_dr_ticks,
                                           match_pings_to_ticks)
    from sonar_slam_tpu.estimators import dead_reckoning_scan
    from sonar_slam_tpu.slam.core import select_keyframes

    streams = SensorStreams(
        imu_time=bag.imu_time, imu_rpy=bag.imu_rpy, dvl_time=bag.dvl_time,
        dvl_vel=bag.dvl_vel, depth_time=bag.depth_time, depth=bag.depth)
    bundle = build_dr_ticks(streams)
    _, dr3 = dead_reckoning_scan(bundle.ticks, DRConfig(roll_offset=0.0))
    tick_idx, sync_ok = match_pings_to_ticks(bag.ping_time, bundle.tick_time)
    ping_dr3 = dr3[tick_idx]
    candidate = sync_ok
    kf_mask = np.asarray(select_keyframes(
        jnp.asarray(bag.ping_time), pose3_to_pose2(ping_dr3),
        jnp.asarray(candidate), params))
    kf_idx = np.nonzero(kf_mask)[0][: dims.max_keyframes]
    K = dims.max_keyframes
    valid = np.zeros(K, bool)
    valid[: len(kf_idx)] = True
    sel = np.concatenate([kf_idx, np.zeros(K - len(kf_idx), np.int64)])
    pts, masks = gt_features(bag, sim, dims, rng)
    frames = KeyframeInput(
        time=jnp.asarray(bag.ping_time[sel], jnp.float32),
        dr_pose3=ping_dr3[sel],
        points=jnp.asarray(pts[sel]),
        pmask=jnp.asarray(masks[sel]) & jnp.asarray(valid)[:, None],
        valid=jnp.asarray(valid),
    )
    carry, _ = slam_scan(frames, params, dims)
    if dims.refine_iters > 0:
        from sonar_slam_tpu.slam import RefineParams, refine_loops

        carry = refine_loops(carry, params, RefineParams.default(), dims)
    nk = int(carry.num_kf)
    truth = bag.true_pose_at_ping[kf_idx][:nk]
    return (ate_rmse(np.asarray(carry.poses[:nk]), truth),
            ate_rmse(np.asarray(carry.dr_poses[:nk]), truth),
            nk, int(carry.num_loops))


def feature_rms(bag, fc, geom):
    from sonar_slam_tpu.slam.frontend import FeatureExtractor
    ex = FeatureExtractor(fc, geom, use_pallas="never")
    errs = []
    for i in range(0, len(bag.ping_images), max(1, len(bag.ping_images) // 12)):
        pts, mask = ex.extract(bag.ping_images[i])
        pts = np.asarray(pts)[np.asarray(mask)]
        pose = bag.true_pose_at_ping[i]
        c, s = np.cos(pose[2]), np.sin(pose[2])
        P = np.stack([pose[0] + c * pts[:, 0] - s * pts[:, 1],
                      pose[1] + s * pts[:, 0] + c * pts[:, 1]], -1)
        d = np.sqrt(((P[:, None, :] - bag.world_points[None]) ** 2).sum(-1)).min(1)
        errs.append(d[d < 1.0])
    d = np.concatenate(errs)
    return float(np.sqrt((d ** 2).mean())), float(np.median(d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--tpu", action="store_true",
                    help="keep the ambient TPU platform (handled at import)")
    args = ap.parse_args()

    sim, dims, kf_t = setups(args.full)
    sim = replace(sim, seed=args.seed)
    sim_clean = replace(sim, dvl_noise=0.0, dvl_scale_bias=0.0,
                        imu_yaw_noise=0.0, imu_yaw_drift=0.0,
                        gyro_noise=0.0)
    params = bench_params(dims, kf_t, full=args.full)
    fc = FeatureConfig(max_points=dims.max_points)
    rng = np.random.default_rng(123)
    report = {}

    bag = simulate_bag(sim)
    bag_clean = simulate_bag(sim_clean)

    rms, med = feature_rms(bag, fc, bag.geometry)
    report["feature_rms_cm"] = round(rms * 100, 2)
    report["feature_median_cm"] = round(med * 100, 2)
    print(f"feature fidelity: RMS {rms*100:.2f} cm, median {med*100:.2f} cm",
          flush=True)

    def lane(name, bag_, gt_feat):
        if gt_feat:
            ate, dr_ate, nk, nl = replay_gt_features(
                bag_, sim, params, dims, kf_t, rng)
        else:
            res = replay(bag_, fc, params, dims, DRConfig(roll_offset=0.0))
            truth = bag_.true_pose_at_ping[res.keyframe_ping_idx][: res.num_keyframes]
            ate = ate_rmse(res.trajectory, truth)
            dr_ate = ate_rmse(res.dr_trajectory, truth)
            nk, nl = res.num_keyframes, int(np.asarray(res.carry.num_loops))
        report[name] = {"ate_cm": round(ate * 100, 2),
                        "dr_ate_cm": round(dr_ate * 100, 2),
                        "keyframes": nk, "loops": nl}
        print(f"{name:34s} ATE {ate*100:6.2f} cm (DR {dr_ate*100:6.2f}) "
              f"kf={nk} loops={nl}", flush=True)

    lane("A_full_pipeline", bag, False)
    lane("B_noiseless_sensors", bag_clean, False)
    lane("C_gt_features", bag, True)
    lane("D_noiseless_gt_features", bag_clean, True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
