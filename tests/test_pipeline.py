"""End-to-end integration tests: synthetic bag -> full SLAM replay.

The reference's only system test is offline bag replay (SURVEY.md §4); here
the bag is synthesized with ground truth, so we can assert accuracy (ATE)
instead of eyeballing rviz.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
from sonar_slam_tpu.slam import SlamDims, SlamParams, FeatureConfig
from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.pipeline import replay, ate_rmse


@pytest.fixture(scope="module")
def small_bag():
    return simulate_bag(
        SimConfig(
            duration=90.0,
            speed=0.5,
            sonar_rate=1.0,
            num_ranges=192,
            num_bearings=96,
            loop_radius=10.0,
            imu_rate=20.0,
        )
    )


SMALL_DIMS = SlamDims(
    max_keyframes=32,
    max_points=128,
    target_capacity=512,
    nssm_min_st_sep=8,
    nssm_cov_samples=12,
    ssm_sobol=64,
    nssm_sobol=128,
    max_loops=16,
    gn_iters=3,
    icp=ICPConfig(min_diff_rot=1e-3, min_diff_trans=1e-2),
    max_range=30.0,
)


def small_params(dims):
    p = SlamParams.default(dims)
    return p._replace(
        keyframe_translation=jnp.float32(2.0),
        keyframe_duration=jnp.float32(1.0),
        ssm_min_points=jnp.asarray(20, jnp.int32),
        nssm_min_points=jnp.asarray(20, jnp.int32),
    )


@pytest.fixture(scope="module")
def result(small_bag):
    dims = SMALL_DIMS
    return replay(small_bag, FeatureConfig(max_points=128), small_params(dims), dims)


def test_replay_produces_keyframes(result):
    assert result.num_keyframes >= 10
    assert result.trajectory.shape == (result.num_keyframes, 3)
    assert np.isfinite(result.trajectory).all()


def test_dr_matches_truth_shape(small_bag, result):
    # clean sensors: dead reckoning alone should already be decent
    truth = small_bag.true_pose_at_ping[result.keyframe_ping_idx]
    # both trajectories are relative to their own start; align and compare
    err = ate_rmse(result.dr_trajectory, truth)
    assert err < 1.5, f"DR ATE {err}"


def test_slam_ate_reasonable(small_bag, result):
    truth = small_bag.true_pose_at_ping[result.keyframe_ping_idx]
    err = ate_rmse(result.trajectory, truth)
    dr_err = ate_rmse(result.dr_trajectory, truth)
    assert err < 1.0, f"SLAM ATE {err} (DR {dr_err})"


def test_ssm_factors_used(result):
    used = np.asarray(result.outputs.ssm_used_icp)[: result.num_keyframes]
    # most keyframes should get a successful sequential scan match
    assert used[1:].mean() > 0.5, f"SSM success rate {used[1:].mean()}"


def test_covariances_positive_definite(result):
    covs = result.covs
    eig = np.linalg.eigvalsh(covs)
    assert (eig > -1e-6).all()


def test_skip_frames_gate_keyframes(small_bag):
    """feature.yaml skip: non-skip pings publish NaN placeholders in the
    reference and can never become keyframes (slam_ros.py:173-174) — here
    they are excluded by the candidate mask."""
    dims = SMALL_DIMS
    res = replay(
        small_bag, FeatureConfig(max_points=128, skip=2), small_params(dims), dims
    )
    assert res.num_keyframes >= 5
    assert (res.keyframe_ping_idx % 2 == 0).all()
