"""Golden-trajectory regression: the canonical small synthetic survey must
keep producing (nearly) the same trajectory — the TPU analog of the
reference's repeated-run overlay checking (SURVEY.md §4.2), made exact.

Regeneration protocol (ONLY after a deliberate behavior change):
    python scripts/regen_golden.py
and explain the change in the commit message. The tolerance below is set
from the measured cross-run determinism (bit-identical on a fixed platform;
commit 65c0ca4) plus a small allowance for compiler fusion drift — far below
the ~5 cm per-keyframe accuracy budget, so real regressions cannot hide.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
from sonar_slam_tpu.slam import SlamDims, SlamParams, FeatureConfig
from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.pipeline import replay

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "small_traj.npz")


def test_golden_trajectory():
    bag = simulate_bag(
        SimConfig(duration=90.0, speed=0.5, sonar_rate=1.0, num_ranges=192,
                  num_bearings=96, loop_radius=10.0, imu_rate=20.0)
    )
    # benchmark configuration (matches bench.py --small and
    # scripts/regen_golden.py): production ICP/loop stack
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
    gold = np.load(GOLDEN)
    np.testing.assert_array_equal(
        res.keyframe_ping_idx, gold["keyframe_ping_idx"]
    )
    assert res.trajectory.shape == gold["trajectory"].shape
    # tight tolerance (VERDICT r1 #10): cross-run spread on one platform is
    # bit-zero; 5e-4 m absorbs only compiler-level fp reassociation. Anything
    # larger is a behavior change -> regenerate deliberately (docstring).
    np.testing.assert_allclose(
        res.trajectory, gold["trajectory"], atol=5e-4,
        err_msg="trajectory drifted from golden — intended? regenerate + explain",
    )
    assert int(res.carry.num_loops) == int(gold["num_loops"])
