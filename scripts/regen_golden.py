#!/usr/bin/env python
"""Regenerate the golden trajectory for tests/test_golden.py.

Run ONLY after a deliberate behavior change (simulator physics, frontend
semantics, SLAM defaults), then explain the change in the commit message:

    python scripts/regen_golden.py

The config here must stay in sync with tests/test_golden.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
from sonar_slam_tpu.slam import SlamDims, SlamParams, FeatureConfig
from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.pipeline import replay, ate_rmse


def main():
    bag = simulate_bag(
        SimConfig(duration=90.0, speed=0.5, sonar_rate=1.0, num_ranges=192,
                  num_bearings=96, loop_radius=10.0, imu_rate=20.0)
    )
    # benchmark configuration (matches bench.py --small): the golden guards
    # the HEADLINE behavior — production ICP/loop stack + odometry fusion
    dims = SlamDims(
        max_keyframes=32, max_points=128, target_capacity=512,
        nssm_min_st_sep=8, nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=128,
        max_loops=32, gn_iters=3,
        icp=ICPConfig(max_iterations=12, min_diff_rot=1e-3,
                      min_diff_trans=1e-2, point_to_line=True,
                      outlier_max_dist=0.5),
        nssm_target_window=2, nssm_pair_refine=True,
        pair_refine_max_dt=0.35, pair_refine_max_dr=0.07,
        pair_refine_min_inliers=25,
        refine_iters=2, refine_sweep=True, refine_chain=True,
    )
    p = SlamParams.default(dims)._replace(
        keyframe_translation=jnp.float32(2.0),
        keyframe_duration=jnp.float32(1.0),
        ssm_min_points=jnp.asarray(20, jnp.int32),
        nssm_min_points=jnp.asarray(20, jnp.int32),
        fuse_odometry=jnp.asarray(True),
        use_best_start_tf=jnp.asarray(True),
        odom_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
        icp_odom_sigmas=jnp.asarray([0.3, 0.3, 0.1], jnp.float32),
    )
    res = replay(bag, FeatureConfig(max_points=128), p, dims)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "small_traj.npz")
    truth = bag.true_pose_at_ping[res.keyframe_ping_idx][: res.num_keyframes]
    np.savez(
        out,
        keyframe_ping_idx=res.keyframe_ping_idx,
        trajectory=res.trajectory,
        num_loops=int(np.asarray(res.carry.num_loops)),
    )
    print(f"golden regenerated: {out}")
    print(f"  keyframes={res.num_keyframes} "
          f"loops={int(np.asarray(res.carry.num_loops))} "
          f"ATE={ate_rmse(res.trajectory, truth)*100:.2f} cm")


if __name__ == "__main__":
    main()
