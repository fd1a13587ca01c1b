"""L5 SLAM: sonar model, feature frontend, scan matching, and the fused
keyframe-step smoother (the reference's slam.py + slam_ros.py, TPU-first)."""

from .sonar import (
    SonarGeometry,
    remap_polar_to_cart,
    adjust_gamma,
    decompress_gamma,
    wiener_deconvolve,
    points_in_fov,
)
from .frontend import FeatureConfig, FeatureExtractor
from .scan_matching import (
    GlobalInitResult,
    global_initialize,
    match_count_costs,
    estimate_pose_covariance,
    localize_covariance,
    apply_covariance_floor,
    sobol_unit_samples,
)
from .core import (
    SlamDims,
    SlamParams,
    SlamCarry,
    KeyframeInput,
    StepOutputs,
    slam_init,
    keyframe_step,
    slam_scan,
    select_keyframes,
    STATUS_SUCCESS,
    STATUS_NOT_ENOUGH_POINTS,
    STATUS_LARGE_TRANSFORMATION,
    STATUS_NOT_ENOUGH_OVERLAP,
    STATUS_NOT_CONVERGED,
    STATUS_INITIALIZATION_FAILURE,
    STATUS_NAMES,
)
from .refine import RefineParams, refine_loops
