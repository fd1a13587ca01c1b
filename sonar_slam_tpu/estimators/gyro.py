"""Fiber-optic gyro (KVH DSP-1760) delta-angle integrator.

Rebuild of `GyroFilter`
(`/root/reference/bruce_slam/src/bruce_slam/gyro.py:16-88`): each message
carries delta angles; they are rotated by the configured gyro->sonar mount
offset, the earth's rotation rate (from latitude) is subtracted from the roll
channel, and the angles are integrated. Because integration is a plain sum,
the whole stream is one rotated matmul + cumsum — no scan needed.

Note (documented divergence): the reference initializes ``roll = 90.`` in
*degrees* but integrates radian deltas and feeds the result to
``Rot3.Ypr`` as radians (`gyro.py:21,66-71`) — an upstream unit bug. We
initialize with ``roll0`` in radians (default pi/2, the intended mount roll).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GyroConfig(NamedTuple):
    offset_matrix: jax.Array  # (3, 3) gyro->sonar rotation (from gyro.yaml xyz degrees)
    latitude: float = 0.7106  # radians (gyro.yaml: 40.7059... degrees)
    sensor_rate: float = 250.0
    roll0: float = jnp.pi / 2
    pitch0: float = 0.0
    yaw0: float = 0.0

    @property
    def earth_rate(self):
        """Earth rotation compensation, deg/s -> applied per sample
        (`gyro.py:38`): -15.04107 * sin(latitude) / 3600."""
        return -15.04107 * jnp.sin(self.latitude) / 3600.0


def gyro_integrate(deltas: jax.Array, config: GyroConfig):
    """Integrate (T, 3) delta-angle messages -> (T, 3) (yaw, pitch, roll).

    ``arr = delta @ offset_matrix`` yields (d_yaw, d_pitch, d_roll); the
    earth-rate correction adds to the roll channel each sample
    (`gyro.py:56-68`).
    """
    arr = jnp.matmul(deltas, config.offset_matrix,
                     precision=jax.lax.Precision.HIGHEST)
    d_yaw, d_pitch, d_roll = arr[:, 0], arr[:, 1], arr[:, 2]
    d_roll = d_roll + config.earth_rate / config.sensor_rate
    yaw = config.yaw0 + jnp.cumsum(d_yaw)
    pitch = config.pitch0 + jnp.cumsum(d_pitch)
    roll = config.roll0 + jnp.cumsum(d_roll)
    return jnp.stack([yaw, pitch, roll], axis=-1)
