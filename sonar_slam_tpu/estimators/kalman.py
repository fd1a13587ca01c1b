"""12-state linear Kalman filter front end (alternative to dead reckoning).

Rebuild of `KalmanNode` (`/root/reference/bruce_slam/src/bruce_slam/
kalman.py:25-243`): state = (x, y, z, roll, pitch, yaw, and their rates).
Sensors arrive asynchronously — IMU ticks run predict(A_imu) + correct(H_imu)
and integrate the filtered velocity into the pose (`kalman.py:177-217`); DVL /
depth / FOG ticks are pure corrections (`kalman.py:138-175`). The ROS
subscriber callbacks become a single time-sorted event stream scanned with
``lax.switch`` on the event type.

Event types: 0 = IMU (z = roll+offset, pitch, yaw-yaw0), 1 = DVL (z = vx, vy,
vz; skipped above dvl_max_velocity), 2 = depth (z = depth, 0, 0), 3 = gyro
(z = mount-rotated delta-yaw, 0, 0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EVENT_IMU, EVENT_DVL, EVENT_DEPTH, EVENT_GYRO = 0, 1, 2, 3


class KalmanConfig(NamedTuple):
    A_imu: jax.Array  # (12, 12) state transition (kalman.yaml)
    Q: jax.Array  # (12, 12) process noise
    H_dvl: jax.Array  # (3, 12)
    R_dvl: jax.Array  # (3, 3)
    H_imu: jax.Array
    R_imu: jax.Array
    H_depth: jax.Array
    R_depth: jax.Array
    H_gyro: jax.Array
    R_gyro: jax.Array
    dt_imu: float = 0.005
    # over-speed gate sized ~2x above benchmark cruise speed (see the
    # DRConfig.dvl_max_velocity note in dead_reckoning.py); the yaml loader
    # still yields the reference's literal 0.5
    dvl_max_velocity: float = 1.0
    imu_offset: float = jnp.pi  # radians (kalman.yaml imu_offset: 180 deg)
    use_gyro: bool = False


class KalmanState(NamedTuple):
    x: jax.Array  # (12,)
    P: jax.Array  # (12, 12)
    pose: jax.Array  # (6,) pose3 vector
    yaw_gyro: jax.Array
    imu_yaw0: jax.Array
    imu_yaw0_set: jax.Array


def kalman_init() -> KalmanState:
    return KalmanState(
        x=jnp.zeros(12, jnp.float32),
        P=jnp.zeros((12, 12), jnp.float32),
        pose=jnp.zeros(6, jnp.float32),
        yaw_gyro=jnp.asarray(0.0, jnp.float32),
        imu_yaw0=jnp.asarray(0.0, jnp.float32),
        imu_yaw0_set=jnp.asarray(False),
    )


def _mm(a, b):
    # HIGHEST: 12-state covariance products under the TPU's default bf16
    # MXU pass lose ~3 digits per tick and drift P off symmetric-PSD
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _predict(x, P, A, Q):
    return _mm(A, x), _mm(_mm(A, P), A.T) + Q


def _correct(x, P, z, H, R):
    S = _mm(_mm(H, P), H.T) + R
    K = _mm(_mm(P, H.T), jnp.linalg.inv(S))
    return x + _mm(K, z - _mm(H, x)), P - _mm(_mm(K, H), P)


def kalman_scan(events_type, events_z, config: KalmanConfig):
    """Scan a merged sensor event stream.

    Args:
        events_type: (T,) int32 in {0: imu, 1: dvl, 2: depth, 3: gyro}
        events_z:    (T, 3) per-event measurement vector (see module doc)

    Returns (final KalmanState, poses (T, 6)) — pose outputs update on IMU
    events and hold elsewhere, mirroring the reference's publish-on-IMU.
    """
    cfg = config

    def imu_event(s: KalmanState, z):
        x, P = _predict(s.x, s.P, cfg.A_imu, cfg.Q)
        yaw0 = jnp.where(s.imu_yaw0_set, s.imu_yaw0, z[2])
        zz = jnp.stack([z[0] + cfg.imu_offset, z[1], z[2] - yaw0])
        x, P = _correct(x, P, zz, cfg.H_imu, cfg.R_imu)
        # integrate filtered velocity (kalman.py:201-216)
        tx = x[6] * cfg.dt_imu
        ty = x[7] * cfg.dt_imu
        yaw_for_frame = jnp.where(cfg.use_gyro, s.yaw_gyro, s.pose[5])
        cy, sy = jnp.cos(yaw_for_frame), jnp.sin(yaw_for_frame)
        px = s.pose[0] + cy * tx - sy * ty
        py = s.pose[1] + sy * tx + cy * ty
        yaw = jnp.where(cfg.use_gyro, s.yaw_gyro, x[5])
        pose = jnp.stack([px, py, 0.0 * px, x[3], x[4], yaw])
        return s._replace(
            x=x, P=P, pose=pose, imu_yaw0=yaw0, imu_yaw0_set=jnp.asarray(True)
        )

    def dvl_event(s: KalmanState, z):
        ok = ~jnp.any(jnp.abs(z) > cfg.dvl_max_velocity)
        x, P = _correct(s.x, s.P, z, cfg.H_dvl, cfg.R_dvl)
        return s._replace(
            x=jnp.where(ok, x, s.x), P=jnp.where(ok, P, s.P)
        )

    def depth_event(s: KalmanState, z):
        x, P = _correct(s.x, s.P, z, cfg.H_depth, cfg.R_depth)
        return s._replace(x=x, P=P)

    def gyro_event(s: KalmanState, z):
        x, P = _correct(s.x, s.P, z, cfg.H_gyro, cfg.R_gyro)
        return s._replace(x=x, P=P, yaw_gyro=s.yaw_gyro + x[11])

    def body(s, ev):
        t, z = ev
        s = jax.lax.switch(t, [imu_event, dvl_event, depth_event, gyro_event], s, z)
        return s, s.pose

    return jax.lax.scan(
        body, kalman_init(), (events_type.astype(jnp.int32), events_z)
    )
