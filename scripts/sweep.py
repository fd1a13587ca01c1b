#!/usr/bin/env python
"""Parallel hyperparameter sweep: replay one bag under many SLAM configs.

The BASELINE.json headline sweep: "64 CFAR/ICP hyperparameter configs
replayed in parallel over the bag on one TPU slice". All numeric SLAM
parameters are traced (`SlamParams`), so every lane shares ONE compiled
program; lanes are vmapped and (if >1 device) sharded over the mesh.

Usage:
  python scripts/sweep.py --simulate --lanes 64 --out sweep.json
  python scripts/sweep.py --file survey.npz --lanes 16 --cpu
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file")
    ap.add_argument("--simulate", action="store_true")
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--duration", type=float, default=90.0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    import jax.numpy as jnp

    from sonar_slam_tpu.cloud import ICPConfig
    from sonar_slam_tpu.estimators import DRConfig, dead_reckoning_scan
    from sonar_slam_tpu.geometry import pose3_to_pose2
    from sonar_slam_tpu.io.dataset import (
        SensorStreams, build_dr_ticks, match_pings_to_ticks,
    )
    from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
    from sonar_slam_tpu.parallel import make_config_mesh, stack_params
    from sonar_slam_tpu.parallel.sweep import sweep_scan
    from sonar_slam_tpu.pipeline import ate_rmse
    from sonar_slam_tpu.slam import (
        FeatureConfig, FeatureExtractor, KeyframeInput, SlamDims, SlamParams,
        select_keyframes,
    )

    if args.simulate or not args.file:
        bag = simulate_bag(SimConfig(duration=args.duration, speed=0.5, sonar_rate=1.0,
                                     num_ranges=192, num_bearings=96,
                                     loop_radius=10.0, imu_rate=20.0))
    else:
        from scripts.replay import load_npz_bag

        bag = load_npz_bag(args.file, 0.0, 0.0)

    dims = SlamDims(max_keyframes=32, max_points=128, target_capacity=512,
                    nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=128,
                    max_loops=16, gn_iters=3,
                    icp=ICPConfig(min_diff_rot=1e-3, min_diff_trans=1e-2))
    base = SlamParams.default(dims)._replace(
        keyframe_translation=jnp.float32(2.0),
        ssm_min_points=jnp.asarray(20, jnp.int32),
        nssm_min_points=jnp.asarray(20, jnp.int32),
    )

    # lane grid: point_noise x icp_odom_sigma scale x max_rotation
    noises = [0.3, 0.4, 0.5, 0.6]
    sig_scales = [0.5, 1.0, 1.5, 2.0]
    rot_gates = [np.radians(20), np.radians(30), np.radians(45), np.radians(60)]
    combos = list(itertools.product(noises, sig_scales, rot_gates))
    combos = (combos * ((args.lanes + len(combos) - 1) // len(combos)))[: args.lanes]
    lanes = [
        base._replace(
            point_noise=jnp.float32(n),
            icp_odom_sigmas=base.icp_odom_sigmas * s,
            ssm_max_rotation=jnp.float32(r),
        )
        for (n, s, r) in combos
    ]
    stacked = stack_params(lanes)

    # shared preprocessing (config-independent up to the keyframe gate, which
    # uses the base config's gates so all lanes share the same keyframes —
    # like the reference harness replaying the same bag)
    streams = SensorStreams(bag.imu_time, bag.imu_rpy, bag.dvl_time,
                            bag.dvl_vel, bag.depth_time, bag.depth)
    bundle = build_dr_ticks(streams)
    tick_idx, sync_ok = match_pings_to_ticks(bag.ping_time, bundle.tick_time)
    _, dr3 = dead_reckoning_scan(bundle.ticks, DRConfig(roll_offset=0.0))
    ping_dr3 = dr3[tick_idx]
    kf_mask = select_keyframes(jnp.asarray(bag.ping_time),
                               pose3_to_pose2(ping_dr3),
                               jnp.asarray(sync_ok), base)
    kf_idx = np.nonzero(np.asarray(kf_mask))[0][: dims.max_keyframes]
    valid = np.zeros(dims.max_keyframes, bool)
    valid[: len(kf_idx)] = True
    sel = np.concatenate([kf_idx,
                          np.zeros(dims.max_keyframes - len(kf_idx), np.int64)])
    ext = FeatureExtractor(FeatureConfig(max_points=dims.max_points), bag.geometry)
    pts, masks = ext.extract_batch(jnp.asarray(bag.ping_images[sel]))
    frames = KeyframeInput(
        time=jnp.asarray(bag.ping_time[sel], jnp.float32),
        dr_pose3=ping_dr3[sel],
        points=pts,
        pmask=masks & jnp.asarray(valid)[:, None],
        valid=jnp.asarray(valid),
    )

    n_dev = len(jax.devices())
    mesh = make_config_mesh(n_dev) if n_dev > 1 and args.lanes % n_dev == 0 else None
    t0 = time.time()
    carry, outputs = sweep_scan(frames, stacked, dims, mesh=mesh)
    jax.block_until_ready(carry.poses)
    compile_s = time.time() - t0
    t0 = time.time()
    carry, outputs = sweep_scan(frames, stacked, dims, mesh=mesh)
    jax.block_until_ready(carry.poses)
    wall = time.time() - t0

    nk = int(np.asarray(carry.num_kf)[0])
    truth = bag.true_pose_at_ping[kf_idx][:nk]
    ates = [
        ate_rmse(np.asarray(carry.poses[i][:nk]), truth)
        for i in range(args.lanes)
    ]
    loops = np.asarray(carry.num_loops)
    best = int(np.argmin(ates))
    report = {
        "lanes": args.lanes,
        "devices": n_dev,
        "keyframes": nk,
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 1),
        "lane_seconds_per_lane": round(wall / args.lanes, 4),
        "best_lane": best,
        "best_config": {
            "point_noise": float(combos[best][0]),
            "icp_sigma_scale": float(combos[best][1]),
            "ssm_max_rotation_deg": float(np.degrees(combos[best][2])),
        },
        "best_ate_m": round(ates[best], 4),
        "median_ate_m": round(float(np.median(ates)), 4),
        "loops_per_lane": [int(x) for x in loops],
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
