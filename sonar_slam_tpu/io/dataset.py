"""Host-side stream alignment: the middleware replacement.

The reference's entire "communication backend" is ROS topic pub/sub plus
message_filters time synchronization (SURVEY.md §2): an
``ApproximateTimeSynchronizer`` pairs IMU+DVL for dead reckoning
(`dead_reckoning.py:92-97`), a ``Cache`` provides the last depth
(`dead_reckoning.py:74,112`), and another approximate sync (slop 0.5 s) pairs
feature clouds with odometry (`slam_ros.py:91-96`). Offline, all of that
collapses into these deterministic, one-shot alignment functions producing
fixed tensors that feed the jitted scans.

A C++ implementation of the same alignment (for large bags / production
data loading) lives in ``native/``; these NumPy versions are the reference
implementation and the fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..estimators import DRTicks


class SensorStreams(NamedTuple):
    """Raw time-sorted sensor arrays (host memory)."""

    imu_time: np.ndarray
    imu_rpy: np.ndarray
    dvl_time: np.ndarray
    dvl_vel: np.ndarray
    depth_time: np.ndarray
    depth: np.ndarray
    gyro_time: np.ndarray | None = None
    gyro_yaw: np.ndarray | None = None


class DRTickBundle(NamedTuple):
    ticks: DRTicks
    tick_time: np.ndarray  # (T,) for downstream matching (host copy)


def _native_runtime():
    """The optional C++ host runtime (native/runtime.py); None if absent."""
    try:
        import importlib.util
        import os as _os

        path = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__)))), "native", "runtime.py",
        )
        spec = importlib.util.spec_from_file_location("sonar_native_runtime", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod if mod.available() else None
    except Exception:
        return None


_NATIVE = None
_NATIVE_CHECKED = False


def _native():
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE = _native_runtime()
        _NATIVE_CHECKED = True
    return _NATIVE


def _nearest_np(ref_times: np.ndarray, query_times: np.ndarray):
    """Pure-NumPy nearest-time alignment (reference impl for the native one)."""
    pos = np.searchsorted(ref_times, query_times)
    lo = np.clip(pos - 1, 0, len(ref_times) - 1)
    hi = np.clip(pos, 0, len(ref_times) - 1)
    pick_hi = np.abs(ref_times[hi] - query_times) < np.abs(
        ref_times[lo] - query_times
    )
    idx = np.where(pick_hi, hi, lo)
    return idx, np.abs(ref_times[idx] - query_times)


def _last_at_or_before_np(ref_times: np.ndarray, query_times: np.ndarray):
    """Pure-NumPy Cache.getLast alignment (reference impl)."""
    return np.searchsorted(ref_times, query_times, side="right") - 1


def _nearest(ref_times: np.ndarray, query_times: np.ndarray):
    """Index of nearest ref time for each query; (idx, |dt|). Dispatches to
    the C++ runtime when built, else NumPy."""
    if len(ref_times) == 0:
        return (
            np.zeros(len(query_times), np.int64),
            np.full(len(query_times), np.inf),
        )
    nat = _native()
    if nat is not None:
        return nat.align_nearest(ref_times, query_times)
    return _nearest_np(ref_times, query_times)


def _last_at_or_before(ref_times: np.ndarray, query_times: np.ndarray):
    """Index of last ref time <= query (Cache.getLast); -1 when none."""
    if len(ref_times) == 0:
        return np.full(len(query_times), -1, np.int64)
    nat = _native()
    if nat is not None:
        return nat.align_last_before(ref_times, query_times)
    return _last_at_or_before_np(ref_times, query_times)


def build_dr_ticks(
    streams: SensorStreams,
    imu_slop: float = 0.1,
    gyro_slop: float = 0.1,
) -> DRTickBundle:
    """Synchronize (IMU, DVL[, gyro], depth) into dead-reckoning ticks.

    Mirrors the reference's sync topology: ticks fire at DVL samples (the
    callback stamp is the DVL stamp, `dead_reckoning.py:141`), each matched
    to the nearest IMU within ``imu_slop`` and the last depth at or before
    (missing depth invalidates the tick, `dead_reckoning.py:112-114`).
    """
    t = streams.dvl_time
    imu_idx, imu_dt = _nearest(streams.imu_time, t)
    dep_idx = _last_at_or_before(streams.depth_time, t)
    valid = (imu_dt <= imu_slop) & (dep_idx >= 0)

    euler = streams.imu_rpy[imu_idx]
    depth = np.where(dep_idx >= 0, streams.depth[np.clip(dep_idx, 0, None)], 0.0)

    if streams.gyro_time is not None:
        g_idx, g_dt = _nearest(streams.gyro_time, t)
        gyro_yaw = streams.gyro_yaw[g_idx]
        valid = valid & (g_dt <= gyro_slop)
    else:
        gyro_yaw = np.zeros_like(t)

    ticks = DRTicks(
        time=jnp.asarray(t, jnp.float32),
        vel=jnp.asarray(streams.dvl_vel, jnp.float32),
        euler=jnp.asarray(euler, jnp.float32),
        gyro_yaw=jnp.asarray(gyro_yaw, jnp.float32),
        depth=jnp.asarray(depth, jnp.float32),
        valid=jnp.asarray(valid),
    )
    return DRTickBundle(ticks=ticks, tick_time=t)


def match_pings_to_ticks(
    ping_times: np.ndarray,
    tick_times: np.ndarray,
    slop: float = 0.5,
):
    """Pair each sonar ping with its nearest DR tick (the feature/odometry
    ApproximateTimeSynchronizer, slop 0.5 s, `slam_ros.py:84-96`).

    Returns (tick_idx (T,), valid (T,)).
    """
    idx, dt = _nearest(tick_times, ping_times)
    return idx, dt <= slop
