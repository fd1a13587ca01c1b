"""L3 estimators: pure step/scan state estimation front ends.

Rebuilds the reference's three odometry front ends as pure functions:
dead reckoning (`/root/reference/bruce_slam/src/bruce_slam/dead_reckoning.py`),
the 12-state Kalman filter (`kalman.py`) and the FOG gyro integrator
(`gyro.py`). The ROS callbacks/time-sync collapse into time-sorted tick
tensors processed by a single `lax.scan` (or closed-form cumsum for the gyro).
"""

from .dead_reckoning import (
    DRConfig,
    DRTicks,
    DRState,
    dead_reckoning_init,
    dead_reckoning_step,
    dead_reckoning_scan,
    dead_reckoning_with_basis_scan,
    dvl_basis_scan,
    prepare_imu_euler,
)
from .gyro import GyroConfig, gyro_integrate
from .kalman import KalmanConfig, KalmanState, kalman_init, kalman_scan
