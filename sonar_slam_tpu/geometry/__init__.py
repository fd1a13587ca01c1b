"""L1 geometry: SE(2)/SE(3) pose algebra as pure JAX functions.

Replaces the gtsam.Pose2 / gtsam.Pose3 / gtsam.Rot3 usage of the reference
(`bruce_slam/src/bruce_slam/utils/conversions.py`, `slam_objects.py`).
All functions are shape-polymorphic over leading batch dimensions and safe to
`jax.jit` / `jax.vmap` / differentiate.
"""

from .se2 import (
    wrap_angle,
    se2_compose,
    se2_inverse,
    se2_between,
    se2_expmap,
    se2_logmap,
    se2_matrix,
    se2_from_matrix,
    se2_transform_points,
    se2_rotmat,
    se2_local_coordinates,
    se2_retract,
)
from .se3 import (
    rot3_ypr,
    rot3_to_ypr,
    rot3_compose,
    rot3_inverse,
    pose3_make,
    pose3_compose,
    pose3_inverse,
    pose3_between,
    pose3_to_pose2,
    pose2_to_pose3,
    pose3_transform_points,
)
