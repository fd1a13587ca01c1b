import numpy as np
import jax
import jax.numpy as jnp

from sonar_slam_tpu.estimators import (
    DRConfig,
    DRTicks,
    dead_reckoning_scan,
    prepare_imu_euler,
    GyroConfig,
    gyro_integrate,
    KalmanConfig,
    kalman_scan,
)
from sonar_slam_tpu.estimators.kalman import EVENT_IMU, EVENT_DVL, EVENT_DEPTH

rng = np.random.default_rng(5)


def make_ticks(T, vel, yaw_rate=0.0, depth=2.0, dt=0.2):
    time = np.arange(T) * dt
    yaw = yaw_rate * time
    euler = np.stack([np.zeros(T), np.zeros(T), yaw], -1)
    return DRTicks(
        time=jnp.asarray(time, jnp.float32),
        vel=jnp.asarray(np.tile(vel, (T, 1)), jnp.float32),
        euler=jnp.asarray(euler, jnp.float32),
        gyro_yaw=jnp.zeros(T, jnp.float32),
        depth=jnp.full((T,), depth, jnp.float32),
        valid=jnp.ones(T, bool),
    )


def test_dr_straight_line():
    # constant forward velocity 0.2 m/s for 20 s -> ~4 m in x, depth carried
    cfg = DRConfig(roll_offset=0.0)
    ticks = make_ticks(101, np.array([0.2, 0.0, 0.0]), dt=0.2)
    _, poses = dead_reckoning_scan(ticks, cfg)
    final = np.asarray(poses[-1])
    # first tick only initializes; 100 integration steps * 0.2 s * 0.2 m/s = 4 m
    np.testing.assert_allclose(final[0], 4.0, atol=1e-3)
    np.testing.assert_allclose(final[1], 0.0, atol=1e-5)
    np.testing.assert_allclose(final[2], 2.0, atol=1e-6)


def test_dr_yaw_zeroing():
    # initial yaw must be zeroed: heading 1.3 rad constant => motion along +x
    cfg = DRConfig(roll_offset=0.0)
    ticks = make_ticks(51, np.array([0.3, 0.0, 0.0]))
    ticks = ticks._replace(euler=ticks.euler.at[:, 2].add(1.3))
    _, poses = dead_reckoning_scan(ticks, cfg)
    final = np.asarray(poses[-1])
    np.testing.assert_allclose(final[1], 0.0, atol=1e-4)
    assert final[0] > 2.5


def test_dr_turn_integration():
    # constant speed + constant yaw rate -> arc; radius = v / omega
    v, w, dt = 0.3, 0.1, 0.05
    cfg = DRConfig(roll_offset=0.0)
    ticks = make_ticks(2001, np.array([v, 0.0, 0.0]), yaw_rate=w, dt=dt)
    _, poses = dead_reckoning_scan(ticks, cfg)
    xy = np.asarray(poses)[:, :2]
    radius = v / w
    center = np.array([0.0, radius])
    d = np.linalg.norm(xy[200:] - center, axis=1)
    np.testing.assert_allclose(d, radius, rtol=0.02)


def test_dr_velocity_gate_reuses_last_good():
    cfg = DRConfig(dvl_max_velocity=0.5, roll_offset=0.0)
    T = 41
    vel = np.tile([0.2, 0.0, 0.0], (T, 1))
    vel[20:25] = [9.0, 0.0, 0.0]  # bogus spike
    ticks = make_ticks(T, np.zeros(3))._replace(vel=jnp.asarray(vel, jnp.float32))
    _, poses = dead_reckoning_scan(ticks, cfg)
    final = np.asarray(poses[-1])
    # spike replaced by last good 0.2 -> identical to clean run
    np.testing.assert_allclose(final[0], 40 * 0.2 * 0.2, atol=1e-3)


def test_dr_invalid_ticks_hold_pose():
    cfg = DRConfig(roll_offset=0.0)
    ticks = make_ticks(21, np.array([0.2, 0.0, 0.0]))
    valid = np.ones(21, bool)
    valid[10:] = False
    ticks = ticks._replace(valid=jnp.asarray(valid))
    _, poses = dead_reckoning_scan(ticks, cfg)
    np.testing.assert_allclose(np.asarray(poses[9]), np.asarray(poses[-1]))


def test_prepare_imu_euler_mount_unrotation():
    # mount roll -90 deg (dead_reckoning.yaml imu_pose): undo it exactly
    mount = jnp.asarray([-np.pi / 2, 0.0, 0.0], jnp.float32)
    imu = jnp.asarray([[-np.pi / 2, 0.2, 0.7]], jnp.float32)  # sensor frame
    out = np.asarray(prepare_imu_euler(imu, mount))
    # R_imu Rm^-1 with equal roll cancels the mount roll
    assert abs(out[0, 0]) < 0.3  # roll mostly removed


def test_gyro_integrate_identity_offset():
    T = 500
    cfg = GyroConfig(
        offset_matrix=jnp.eye(3, dtype=jnp.float32),
        latitude=0.0,
        sensor_rate=250.0,
        roll0=0.0,
    )
    deltas = np.zeros((T, 3), np.float32)
    deltas[:, 0] = 0.001  # yaw channel after offset
    ypr = np.asarray(gyro_integrate(jnp.asarray(deltas), cfg))
    np.testing.assert_allclose(ypr[-1, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(ypr[-1, 2], 0.0, atol=1e-5)


def test_gyro_earth_rate_compensation():
    T = 250  # one second of samples
    cfg = GyroConfig(
        offset_matrix=jnp.eye(3, dtype=jnp.float32),
        latitude=np.pi / 2,  # max earth rate
        sensor_rate=250.0,
        roll0=0.0,
    )
    ypr = np.asarray(gyro_integrate(jnp.zeros((T, 3), jnp.float32), cfg))
    expected_roll = -15.04107 / 3600.0  # deg... reference treats as rad/s
    np.testing.assert_allclose(ypr[-1, 2], expected_roll, rtol=1e-4)


def _kalman_cfg(use_gyro=False):
    H_dvl = np.zeros((3, 12), np.float32)
    H_dvl[0, 6] = H_dvl[1, 7] = H_dvl[2, 8] = 1
    H_imu = np.zeros((3, 12), np.float32)
    H_imu[0, 3] = H_imu[1, 4] = H_imu[2, 5] = 1
    H_depth = np.zeros((3, 12), np.float32)
    H_depth[0, 2] = 1
    H_gyro = np.zeros((3, 12), np.float32)
    H_gyro[0, 11] = 1
    dt = 0.005
    A = np.eye(12, dtype=np.float32)
    A[0, 6] = A[1, 7] = A[3, 9] = A[4, 10] = dt
    return KalmanConfig(
        A_imu=jnp.asarray(A),
        Q=jnp.asarray(np.eye(12, dtype=np.float32) * 1e-3),
        H_dvl=jnp.asarray(H_dvl),
        R_dvl=jnp.asarray(np.eye(3, dtype=np.float32) * 1e-4),
        H_imu=jnp.asarray(H_imu),
        R_imu=jnp.asarray(np.eye(3, dtype=np.float32) * 1e-2),
        H_depth=jnp.asarray(H_depth),
        R_depth=jnp.asarray(np.eye(3, dtype=np.float32) * 1e-2),
        H_gyro=jnp.asarray(H_gyro),
        R_gyro=jnp.asarray(np.eye(3, dtype=np.float32) * 1e-8),
        dt_imu=dt,
        imu_offset=0.0,
        use_gyro=use_gyro,
    )


def test_kalman_tracks_constant_velocity():
    cfg = _kalman_cfg()
    # interleave DVL (vx=0.4) and IMU events for 10 s at 200 Hz IMU, 5 Hz DVL
    T = 2000
    types = np.full(T, EVENT_IMU, np.int32)
    z = np.zeros((T, 3), np.float32)
    types[::40] = EVENT_DVL
    z[::40] = [0.4, 0.0, 0.0]
    st, poses = kalman_scan(jnp.asarray(types), jnp.asarray(z), cfg)
    final = np.asarray(poses[-1])
    n_imu = (types == EVENT_IMU).sum()
    expected_x = 0.4 * cfg.dt_imu * n_imu  # velocity integrated on IMU ticks
    np.testing.assert_allclose(final[0], expected_x, rtol=0.05)
    np.testing.assert_allclose(final[1], 0.0, atol=0.01)


def test_kalman_depth_correction():
    # P starts at zero (as in the reference), so corrections only bite once
    # IMU predict steps have inflated it with Q — interleave both.
    cfg = _kalman_cfg()
    T = 400
    types = np.full(T, EVENT_IMU, np.int32)
    types[1::2] = EVENT_DEPTH
    z = np.zeros((T, 3), np.float32)
    z[1::2, 0] = 3.5
    st, _ = kalman_scan(jnp.asarray(types), jnp.asarray(z), cfg)
    np.testing.assert_allclose(float(st.x[2]), 3.5, rtol=0.05)
