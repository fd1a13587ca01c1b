#!/usr/bin/env python
"""Full-config accuracy/perf variant comparison on the ambient device.

Static (dims) variants recompile; traced (params) variants reuse the cached
program. Used to pick the benchmark configuration (VERDICT r1 items 2/6).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.estimators import DRConfig, dead_reckoning_scan
from sonar_slam_tpu.geometry import pose3_to_pose2
from sonar_slam_tpu.io.dataset import (SensorStreams, build_dr_ticks,
                                       match_pings_to_ticks)
from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
from sonar_slam_tpu.pipeline import ate_rmse
from sonar_slam_tpu.slam import (FeatureConfig, FeatureExtractor,
                                 KeyframeInput, SlamDims, SlamParams,
                                 select_keyframes, slam_scan)

SIM = SimConfig(duration=480.0, speed=0.5, sonar_rate=5.0, num_ranges=512,
                num_bearings=256, loop_radius=18.0, imu_rate=50.0)


def dims_of(sobol=512, cov=30, iters=24, icp_over=None):
    return SlamDims(max_keyframes=128, max_points=256, target_capacity=1024,
                    nssm_cov_samples=cov, ssm_sobol=64, nssm_sobol=sobol,
                    max_loops=32, gn_iters=3,
                    icp=ICPConfig(max_iterations=iters, min_diff_rot=1e-3,
                                  min_diff_trans=1e-2, **(icp_over or {})))


def bench_params(dims, **over):
    base = dict(
        keyframe_translation=jnp.float32(3.0),
        ssm_min_points=jnp.asarray(20, jnp.int32),
        nssm_min_points=jnp.asarray(20, jnp.int32),
        fuse_odometry=jnp.asarray(True),
        odom_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
        icp_odom_sigmas=jnp.asarray([0.3, 0.3, 0.03], jnp.float32),
    )
    base.update(over)
    return SlamParams.default(dims)._replace(**base)


def run(name, bag, dims, params, repeats=3):
    streams = SensorStreams(imu_time=bag.imu_time, imu_rpy=bag.imu_rpy,
                            dvl_time=bag.dvl_time, dvl_vel=bag.dvl_vel,
                            depth_time=bag.depth_time, depth=bag.depth)
    bundle = build_dr_ticks(streams)
    tick_idx, sync_ok = match_pings_to_ticks(bag.ping_time, bundle.tick_time)
    _, dr3 = dead_reckoning_scan(bundle.ticks, DRConfig(roll_offset=0.0))
    ping_dr3 = dr3[tick_idx]
    kf_mask = np.asarray(select_keyframes(
        jnp.asarray(bag.ping_time), pose3_to_pose2(ping_dr3),
        jnp.asarray(sync_ok), params))
    kf_idx = np.nonzero(kf_mask)[0][: dims.max_keyframes]
    K = dims.max_keyframes
    valid = np.zeros(K, bool)
    valid[: len(kf_idx)] = True
    sel = np.concatenate([kf_idx, np.zeros(K - len(kf_idx), np.int64)])
    ex = FeatureExtractor(FeatureConfig(max_points=dims.max_points),
                          bag.geometry)
    pts, masks = ex.extract_batch(jnp.asarray(bag.ping_images[sel]))
    frames = KeyframeInput(
        time=jnp.asarray(bag.ping_time[sel], jnp.float32),
        dr_pose3=ping_dr3[sel], points=pts,
        pmask=masks & jnp.asarray(valid)[:, None],
        valid=jnp.asarray(valid))
    c, _ = slam_scan(frames, params, dims)
    jax.block_until_ready(c.poses)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        c, _ = slam_scan(frames, params, dims)
        jax.block_until_ready(c.poses)
        ts.append(time.time() - t0)
    nk = int(c.num_kf)
    truth = bag.true_pose_at_ping[kf_idx][:nk]
    ate = ate_rmse(np.asarray(c.poses[:nk]), truth)
    dr_ate = ate_rmse(np.asarray(c.dr_poses[:nk]), truth)
    print(f"{name:40s} wall={np.median(ts):.3f}s "
          f"({np.median(ts)/max(nk,1)*1e3:.1f} ms/kf) ATE={ate*100:5.1f} cm "
          f"(DR {dr_ate*100:5.1f}) loops={int(c.num_loops)}", flush=True)
    return ate, float(np.median(ts))


def main():
    from dataclasses import replace

    seeds = [0] if "--one-seed" in sys.argv else [0, 1]
    bags = {s: simulate_bag(replace(SIM, seed=s)) for s in seeds}

    p2l = dict(point_to_line=True, outlier_max_dist=0.5)
    variants = [
        ("baseline 512/30/24 p2p", dims_of(), {}),
        ("prodA 512/12/12 p2l g.5 mp50", dims_of(cov=12, iters=12, icp_over=p2l),
         dict(nssm_min_points=jnp.asarray(50, jnp.int32))),
        ("prodB 512/12/12 p2p mp50", dims_of(cov=12, iters=12),
         dict(nssm_min_points=jnp.asarray(50, jnp.int32))),
    ]
    for name, dims, pover in variants:
        for s in seeds:
            params = bench_params(dims, **pover)
            run(f"{name} seed{s}", bags[s], dims, params)


if __name__ == "__main__":
    main()
