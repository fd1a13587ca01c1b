"""DVL + IMU + depth dead reckoning as a pure scan.

Rebuild of `DeadReckoningNode`
(`/root/reference/bruce_slam/src/bruce_slam/dead_reckoning.py:27-267`):

* IMU orientation is un-rotated by the mount pose and yaw-zeroed at start
  (`dead_reckoning.py:124-133`); the vehicle rotation used for integration is
  ``Ypr(yaw - yaw0, pitch, 90° + roll)`` (or the FOG yaw when available,
  `dead_reckoning.py:169-175`).
* DVL velocities above ``dvl_max_velocity`` reuse the last good velocity and
  accumulate an error timer (warn after 5 s) (`dead_reckoning.py:195-213`).
* Translation integrates trapezoidally in the body frame and is rotated into
  the odom frame by the yaw-only pose; depth comes straight from the pressure
  sensor (`dead_reckoning.py:215-242`).

The ROS ApproximateTimeSynchronizer becomes host-side stream alignment (see
``sonar_slam_tpu.io.dataset``): the scan consumes one tick per synchronized
(IMU, DVL[, gyro], depth) tuple.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import rot3_ypr, rot3_to_ypr, rot3_inverse, pose3_make


class DRConfig(NamedTuple):
    # DVL over-speed outlier gate. The reference ships 0.5 in
    # dead_reckoning.yaml for a vehicle cruising ~0.25 m/s — i.e. the gate
    # sits ~2x above cruise so it only catches genuine DVL glitches. Our
    # benchmark vehicle cruises at 0.5 m/s; mirroring the literal 0.5 put
    # the gate ON the operating point, silently censoring the upper tail of
    # the (noisy, scale-stretched) forward velocity: measured, it swallowed
    # 40-100% of the injected DVL scale bias per seed and left a -0.5%
    # speed bias even on unbiased data. Default preserves the reference's
    # 2x-cruise INTENT; loading the reference yaml still yields its 0.5.
    dvl_max_velocity: float = 1.0
    keyframe_duration: float = 1.0
    keyframe_translation: float = 4.0
    keyframe_rotation: float = 0.5235988  # deg(30)
    use_gyro: bool = False
    error_warn_secs: float = 5.0
    roll_offset: float = jnp.pi / 2  # the hardcoded "radians(90) + roll"


class DRTicks(NamedTuple):
    """Time-sorted synchronized sensor ticks (T, ...)."""

    time: jax.Array  # (T,) seconds
    vel: jax.Array  # (T, 3) DVL body velocities
    euler: jax.Array  # (T, 3) mount-corrected IMU (roll, pitch, yaw_raw)
    gyro_yaw: jax.Array  # (T,) FOG yaw (ignored unless use_gyro)
    depth: jax.Array  # (T,)
    valid: jax.Array  # (T,) bool


class DRState(NamedTuple):
    pose: jax.Array  # (6,) pose3 (x, y, z, roll, pitch, yaw)
    prev_time: jax.Array
    prev_vel: jax.Array  # (3,)
    initialized: jax.Array  # bool
    yaw0: jax.Array
    yaw0_set: jax.Array  # bool
    error_timer: jax.Array


def dead_reckoning_init() -> DRState:
    return DRState(
        pose=jnp.zeros(6, jnp.float32),
        prev_time=jnp.asarray(0.0, jnp.float32),
        prev_vel=jnp.zeros(3, jnp.float32),
        initialized=jnp.asarray(False),
        yaw0=jnp.asarray(0.0, jnp.float32),
        yaw0_set=jnp.asarray(False),
        error_timer=jnp.asarray(0.0, jnp.float32),
    )


def prepare_imu_euler(imu_rpy: jax.Array, mount_rpy: jax.Array) -> jax.Array:
    """Batched mount-frame correction: R_imu ∘ R_mount⁻¹ -> (roll,pitch,yaw).

    Mirrors ``rot = r2g(imu.orientation).compose(self.imu_rot.inverse())``
    (`dead_reckoning.py:124-125`); ``mount_rpy`` comes from the config's
    ``imu_pose`` (dead_reckoning.yaml: [0,0,0, deg(-90),0,0]).
    """
    R = rot3_ypr(imu_rpy[..., 2], imu_rpy[..., 1], imu_rpy[..., 0])
    Rm = rot3_ypr(mount_rpy[2], mount_rpy[1], mount_rpy[0])
    return rot3_to_ypr(jnp.matmul(R, rot3_inverse(Rm),
                                  precision=jax.lax.Precision.HIGHEST))


def dead_reckoning_step(state: DRState, tick, config: DRConfig):
    """One synchronized tick -> new state + emitted pose3 (always emitted;
    callers pair emissions with tick times)."""
    time, vel, euler, gyro_yaw, depth, valid = tick

    # yaw zeroing at first valid tick
    yaw0 = jnp.where(state.yaw0_set, state.yaw0, euler[2])
    yaw0_set = state.yaw0_set | valid

    # vehicle rotation for this tick
    yaw = jnp.where(config.use_gyro, gyro_yaw, euler[2] - yaw0)
    roll = jnp.where(
        config.use_gyro, euler[0], config.roll_offset + euler[0]
    )
    rpy = jnp.stack([roll, euler[1], yaw])

    # DVL over-speed gate
    over = jnp.any(jnp.abs(vel) > config.dvl_max_velocity)
    dt = jnp.maximum(time - state.prev_time, 0.0)
    error_timer = jnp.where(over, state.error_timer + dt, 0.0)
    vel_used = jnp.where(over, state.prev_vel, vel)
    # over-speed before initialization drops the tick entirely
    usable = valid & (state.initialized | ~over)

    # trapezoidal body-frame translation, rotated by yaw only
    dv = 0.5 * (vel_used + state.prev_vel) * dt
    cy, sy = jnp.cos(state.pose[5]), jnp.sin(state.pose[5])
    px = state.pose[0] + cy * dv[0] - sy * dv[1]
    py = state.pose[1] + sy * dv[0] + cy * dv[1]

    moved = pose3_make(jnp.stack([px, py, depth]), rpy)
    first = pose3_make(jnp.stack([0.0 * px, 0.0 * py, depth]), rpy)
    new_pose = jnp.where(state.initialized, moved, first)
    pose = jnp.where(usable, new_pose, state.pose)

    new_state = DRState(
        pose=pose,
        prev_time=jnp.where(usable, time, state.prev_time),
        prev_vel=jnp.where(usable, vel_used, state.prev_vel),
        initialized=state.initialized | usable,
        yaw0=yaw0,
        yaw0_set=yaw0_set,
        error_timer=jnp.where(usable, error_timer, state.error_timer),
    )
    return new_state, pose


def dead_reckoning_scan(ticks: DRTicks, config: DRConfig):
    """Integrate a whole tick stream. Returns (final_state, poses (T, 6)).

    One fused jit scan — the entire dead-reckoning node for a bag replay.
    """

    def body(state, tick):
        return dead_reckoning_step(state, tick, config)

    return jax.lax.scan(body, dead_reckoning_init(), tuple(ticks))


def dvl_basis_scan(ticks: DRTicks, config: DRConfig) -> jax.Array:
    """Cumulative world-frame basis integrals of the body-x / body-y DVL
    velocity components: (T, 2, 2) where ``basis[t, a]`` is the planar
    position the DR would reach integrating ONLY body-axis-``a`` velocity.

    This linearly decomposes the DR translation by velocity axis:
    ``pos_xy(t) = basis[t, 0] + basis[t, 1]`` and, under per-axis velocity
    corrections ``(cx, cy)``, ``pos_xy(t; c) = cx*basis[t,0] +
    cy*basis[t,1]`` — EXACTLY, including through turns where the body axes
    rotate (the per-axis keyframe-delta ratio model used before round 4
    breaks precisely there). Consumed by the refinement stage's direct
    DVL-scale least-squares solve
    (``slam/refine.py::solve_scale_from_basis``). No reference analog (the
    reference has no online scale calibration at all).

    Implemented as two extra ``dead_reckoning_scan`` passes with the other
    axis's velocity zeroed — bit-identical gate/trapezoid/yaw semantics
    (the over-speed gate keys on the dominant forward axis in practice, so
    zeroing the ~0 lateral component does not change gate decisions).
    """
    ex = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    ey = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    _, px = dead_reckoning_scan(ticks._replace(vel=ticks.vel * ex), config)
    _, py = dead_reckoning_scan(ticks._replace(vel=ticks.vel * ey), config)
    return jnp.stack([px[:, :2], py[:, :2]], axis=1)


def dead_reckoning_with_basis_scan(ticks: DRTicks, config: DRConfig):
    """Fused full-DR + basis-integral pass: ``(poses (T, 6), basis (T, 2, 2))``.

    Semantically identical to ``dead_reckoning_scan`` + ``dvl_basis_scan``
    (three sequential passes) but runs as ONE ``lax.scan`` with the three
    velocity-mask lanes vmapped into the carry. The DR scan is
    latency-bound on TPU (tiny per-step ops over tens of thousands of
    sequential ticks, ~40 ms per pass through this environment's remote
    device), so batching the lanes pays one pass's latency instead of
    three — the per-step work is elementwise and merely widens.
    ``vmap`` preserves per-lane gate/trapezoid/yaw semantics exactly
    (every op in ``dead_reckoning_step`` is elementwise).
    """
    masks = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32
    )

    def one(mask):
        _, p = dead_reckoning_scan(
            ticks._replace(vel=ticks.vel * mask), config
        )
        return p

    poses = jax.vmap(one)(masks)  # (3, T, 6)
    return poses[0], jnp.stack(
        [poses[1, :, :2], poses[2, :, :2]], axis=1
    )
