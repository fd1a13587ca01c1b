"""Alternative odometry front ends (FOG gyro DR, Kalman) + services."""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
from sonar_slam_tpu.slam import SlamDims, SlamParams, FeatureConfig
from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.pipeline import replay, ate_rmse


@pytest.fixture(scope="module")
def bag():
    return simulate_bag(
        SimConfig(duration=60.0, speed=0.5, sonar_rate=1.0, num_ranges=128,
                  num_bearings=64, loop_radius=10.0, imu_rate=20.0,
                  gyro_rate=20.0)
    )


DIMS = SlamDims(
    max_keyframes=16, max_points=96, target_capacity=256,
    nssm_cov_samples=8, ssm_sobol=32, nssm_sobol=64, max_loops=8,
    gn_iters=3, icp=ICPConfig(min_diff_rot=1e-3, min_diff_trans=1e-2),
)


def params():
    # the benchmark configuration: odometry fusion + honest sensor sigmas
    return SlamParams.default(DIMS)._replace(
        keyframe_translation=jnp.float32(2.0),
        ssm_min_points=jnp.asarray(15, jnp.int32),
        nssm_min_points=jnp.asarray(15, jnp.int32),
        fuse_odometry=jnp.asarray(True),
        odom_sigmas=jnp.asarray([0.05, 0.05, 0.01], jnp.float32),
        icp_odom_sigmas=jnp.asarray([0.3, 0.3, 0.03], jnp.float32),
    )


def test_dr_gyro_frontend(bag):
    res = replay(bag, FeatureConfig(max_points=96), params(), DIMS,
                 frontend="dr_gyro")
    assert res.num_keyframes >= 5
    truth = bag.true_pose_at_ping[res.keyframe_ping_idx]
    assert ate_rmse(res.trajectory, truth) < 1.0


def test_kalman_frontend(bag):
    res = replay(bag, FeatureConfig(max_points=96), params(), DIMS,
                 frontend="kalman")
    assert res.num_keyframes >= 3
    truth = bag.true_pose_at_ping[res.keyframe_ping_idx]
    # the reference's KF integrates velocity on IMU ticks with fixed dt —
    # cruder than trapezoidal DR; just require a sane trajectory
    assert ate_rmse(res.trajectory, truth) < 3.0


def test_dense_trajectory(bag):
    res = replay(bag, FeatureConfig(max_points=96), params(), DIMS)
    assert res.dense_trajectory.shape == (len(bag.ping_time), 3)
    # dense pose at each keyframe ping equals the keyframe pose
    for i, p in enumerate(res.keyframe_ping_idx[: res.num_keyframes]):
        np.testing.assert_allclose(
            res.dense_trajectory[p], res.trajectory[i], atol=1e-4
        )
    # dense ATE against ground truth at ping rate is sane
    err = ate_rmse(res.dense_trajectory, bag.true_pose_at_ping)
    assert err < 1.0


def test_predict_slam_update(bag):
    from sonar_slam_tpu.slam.services import (
        predict_slam_update,
        query_pose_uncertainty,
    )

    res = replay(bag, FeatureConfig(max_points=96), params(), DIMS)
    carry = res.carry
    odom = jnp.asarray(
        [
            [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]],  # straight on
            [[1.0, 0.0, 0.5], [1.0, 0.0, 0.5]],  # turning
        ],
        jnp.float32,
    )
    pred, cov = predict_slam_update(
        carry, DIMS, odom, jnp.asarray([0.2, 0.2, 0.02])
    )
    assert pred.shape == (2, 2, 3)
    assert cov.shape == (2, 3, 3)
    # predicted terminal covariance exceeds the current latest-pose cov
    cur = np.asarray(query_pose_uncertainty(
        carry, DIMS, jnp.asarray([res.num_keyframes - 1])
    ))[0]
    assert np.trace(np.asarray(cov[0])) > np.trace(cur) * 0.5
    # straight path starts from the latest pose
    start = np.asarray(carry.poses[res.num_keyframes - 1])
    np.testing.assert_allclose(
        np.asarray(pred[0, 0, :2]),
        start[:2] + np.array([np.cos(start[2]), np.sin(start[2])]),
        atol=0.2,
    )


def test_dual_sonar_replay():
    from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag

    # wide vertical aperture + shallow floor so downward beams reach the
    # floor within sonar range (a +-12 deg fan at 6 m altitude only grazes it)
    dual_bag = simulate_bag(
        SimConfig(duration=50.0, speed=0.5, sonar_rate=1.0, num_ranges=128,
                  num_bearings=64, loop_radius=10.0, imu_rate=20.0,
                  vertical_sonar=True, seafloor_depth=4.0,
                  vertical_aperture_deg=60.0)
    )
    res = replay(dual_bag, FeatureConfig(max_points=96), params(), DIMS,
                 use_vertical=True)
    assert res.points3d is not None
    assert res.points3d.shape[2] == 3
    # fused z values near the seafloor depth for points with vertical evidence
    zs = res.points3d[..., 2][res.points3d_mask & (res.points3d[..., 2] != 0)]
    assert len(zs) > 10
    assert 2.0 < np.median(np.asarray(zs)) < 6.0


def test_kalman_gyro_frontend(bag):
    from sonar_slam_tpu.io.config import load_kalman_config

    kc = load_kalman_config()._replace(imu_offset=0.0, use_gyro=True)
    import numpy as _np
    dt = float(_np.median(_np.diff(bag.imu_time)))
    A = _np.array(kc.A_imu)
    A[0, 6] = A[1, 7] = A[3, 9] = A[4, 10] = dt
    kc = kc._replace(dt_imu=dt, A_imu=jnp.asarray(A))
    res = replay(bag, FeatureConfig(max_points=96), params(), DIMS,
                 frontend="kalman", kalman_config=kc)
    assert res.num_keyframes >= 3
    truth = bag.true_pose_at_ping[res.keyframe_ping_idx]
    assert ate_rmse(res.trajectory, truth) < 3.0
