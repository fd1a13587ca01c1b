"""Config system: the reference's YAML semantics, ROS-free.

The reference loads 7 YAML files through roslaunch/rosparam
(`/root/reference/bruce_slam/launch/slam.launch:13-60`), with two
substitution mechanisms: ``deg(x)`` strings evaluated to radians and
``$(find pkg)`` package-path substitution; the libpointmatcher ``icp.yaml``
is passed by file path into the C++ ICP (`slam_ros.py:124-125`).

This module parses the same file shapes into the framework's typed configs:
``slam.yaml`` -> (SlamParams, SlamDims), ``feature.yaml`` -> FeatureConfig,
``dead_reckoning.yaml`` -> DRConfig, ``gyro.yaml`` -> GyroConfig,
``kalman.yaml`` -> KalmanConfig, ``mapping.yaml`` -> MappingConfig, and
``icp.yaml`` (libpointmatcher pipeline schema) -> ICPConfig. Defaults
matching the reference ship in ``sonar_slam_tpu/config/``.
"""

from __future__ import annotations

import os
import re
from typing import Any

import numpy as np
import yaml

from ..cloud import ICPConfig
from ..estimators import DRConfig, GyroConfig, KalmanConfig

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config")

_DEG_RE = re.compile(r"^\s*deg\(\s*([-+0-9.eE]+)\s*\)\s*$")
_FIND_RE = re.compile(r"\$\(\s*find\s+([A-Za-z0-9_]+)\s*\)")


def _substitute(value: Any) -> Any:
    """Evaluate rosparam-style substitutions: deg(x) and $(find pkg)."""
    if isinstance(value, str):
        m = _DEG_RE.match(value)
        if m:
            return float(np.radians(float(m.group(1))))
        if _FIND_RE.search(value):
            return _FIND_RE.sub(CONFIG_DIR.rstrip("/").rsplit("/", 1)[0], value)
        return value
    if isinstance(value, dict):
        return {k: _substitute(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_substitute(v) for v in value]
    return value


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return _substitute(yaml.safe_load(f)) or {}


def default_path(name: str) -> str:
    return os.path.join(CONFIG_DIR, name)


# ----------------------------------------------------------------------


def load_icp_config(path: str | None = None) -> ICPConfig:
    """Parse a libpointmatcher-schema icp.yaml into ICPConfig.

    Recognized pipeline elements (config/icp.yaml + `pcl.cpp:187-197`):
    KDTreeMatcher.maxDist, MaxDistOutlierFilter.maxDist,
    TrimmedDistOutlierFilter.ratio, CounterTransformationChecker
    .maxIterationCount, DifferentialTransformationChecker
    {minDiffRotErr, minDiffTransErr, smoothLength}. Unknown elements are
    ignored (the reference's NullInspector, error minimizer names, etc.).
    """
    raw = load_yaml(path or default_path("icp.yaml"))
    kw: dict[str, Any] = {}
    matcher = raw.get("matcher") or {}
    if "KDTreeMatcher" in matcher and matcher["KDTreeMatcher"]:
        kd = matcher["KDTreeMatcher"]
        if "maxDist" in kd:
            kw["knn_max_dist"] = float(kd["maxDist"])
    for filt in raw.get("outlierFilters") or []:
        if isinstance(filt, dict):
            if "MaxDistOutlierFilter" in filt:
                kw["outlier_max_dist"] = float(filt["MaxDistOutlierFilter"]["maxDist"])
            if "TrimmedDistOutlierFilter" in filt:
                kw["trim_ratio"] = float(filt["TrimmedDistOutlierFilter"]["ratio"])
    for chk in raw.get("transformationCheckers") or []:
        if isinstance(chk, dict):
            if "CounterTransformationChecker" in chk:
                kw["max_iterations"] = int(
                    chk["CounterTransformationChecker"]["maxIterationCount"]
                )
            if "DifferentialTransformationChecker" in chk:
                d = chk["DifferentialTransformationChecker"]
                kw["min_diff_rot"] = float(d.get("minDiffRotErr", 0.01))
                kw["min_diff_trans"] = float(d.get("minDiffTransErr", 0.1))
                kw["smooth_length"] = int(d.get("smoothLength", 4))
    return ICPConfig(**kw)


def load_feature_config(path: str | None = None, max_points: int = 256):
    """feature.yaml -> FeatureConfig (`feature_extraction.py:85-99`)."""
    from ..slam.frontend import FeatureConfig

    raw = load_yaml(path or default_path("feature.yaml"))
    cfar = raw.get("CFAR", {})
    filt = raw.get("filter", {})
    return FeatureConfig(
        ntc=int(cfar.get("Ntc", 40)),
        ngc=int(cfar.get("Ngc", 10)),
        pfa=float(cfar.get("Pfa", 0.1)),
        rank=int(cfar.get("rank", 10)),
        alg=str(cfar.get("alg", "SOCA")),
        threshold=float(filt.get("threshold", 65)),
        resolution=float(filt.get("resolution", 0.5)),
        outlier_radius=float(filt.get("radius", 1.0)),
        outlier_min_points=int(filt.get("min_points", 5)),
        skip=int(filt.get("skip", 1)),
        max_points=max_points,
    )


def load_slam_config(path: str | None = None, dims_overrides: dict | None = None):
    """slam.yaml -> (SlamParams, SlamDims, icp_config_path).

    Numeric gates/noise go into SlamParams (traced); structural counts
    (target/source frames, min_st_sep, cov_samples, pcm queue size) go into
    SlamDims (static) — mirroring `slam_ros.py:35-132` param ingest.
    """
    import jax.numpy as jnp

    from ..slam.core import SlamDims, SlamParams

    raw = load_yaml(path or default_path("slam.yaml"))
    ssm = raw.get("ssm", {})
    nssm = raw.get("nssm", {})

    dims_kw = dict(
        ssm_target_frames=int(ssm.get("target_frames", 3)),
        nssm_source_frames=int(nssm.get("source_frames", 5)),
        nssm_min_st_sep=int(nssm.get("min_st_sep", 8)),
        nssm_cov_samples=int(nssm.get("cov_samples", 30)),
        pcm_queue_slots=int(raw.get("pcm_queue_size", 5)) + 1,
        point_resolution=float(raw.get("point_resolution", 0.5)),
    )
    dims_kw.update(dims_overrides or {})
    icp_path = raw.get("icp_config")
    if icp_path:
        dims_kw.setdefault("icp", load_icp_config(icp_path))
    dims = SlamDims(**dims_kw)

    f = jnp.float32
    params = SlamParams.default(dims)._replace(
        keyframe_duration=f(raw.get("keyframe_duration", 1.0)),
        keyframe_translation=f(raw.get("keyframe_translation", 3.0)),
        keyframe_rotation=f(raw.get("keyframe_rotation", np.radians(30))),
        prior_sigmas=jnp.asarray(raw.get("prior_sigmas", [0.1, 0.1, 0.01]), f),
        odom_sigmas=jnp.asarray(raw.get("odom_sigmas", [0.2, 0.2, 0.02]), f),
        icp_odom_sigmas=jnp.asarray(raw.get("icp_odom_sigmas", [0.1, 0.1, 0.01]), f),
        point_resolution=f(raw.get("point_resolution", 0.5)),
        ssm_enable=jnp.asarray(bool(ssm.get("enable", True))),
        ssm_min_points=jnp.asarray(int(ssm.get("min_points", 50)), jnp.int32),
        ssm_max_translation=f(ssm.get("max_translation", 3.0)),
        ssm_max_rotation=f(ssm.get("max_rotation", np.radians(30))),
        nssm_enable=jnp.asarray(bool(nssm.get("enable", True))),
        nssm_min_points=jnp.asarray(int(nssm.get("min_points", 50)), jnp.int32),
        nssm_max_translation=f(nssm.get("max_translation", 10.0)),
        nssm_max_rotation=f(nssm.get("max_rotation", np.radians(60))),
        min_pcm=jnp.asarray(int(raw.get("min_pcm", 2)), jnp.int32),
        pcm_queue_size=jnp.asarray(int(raw.get("pcm_queue_size", 5)), jnp.int32),
    )
    return params, dims, icp_path


def load_dead_reckoning_config(path: str | None = None):
    """dead_reckoning.yaml -> (DRConfig, imu_mount_rpy (3,), imu_version)."""
    raw = load_yaml(path or default_path("dead_reckoning.yaml"))
    imu_pose = raw.get("imu_pose", [0, 0, 0, -np.pi / 2, 0, 0])
    cfg = DRConfig(
        dvl_max_velocity=float(raw.get("dvl_max_velocity", 0.5)),
        keyframe_duration=float(raw.get("keyframe_duration", 1.0)),
        keyframe_translation=float(raw.get("keyframe_translation", 4.0)),
        keyframe_rotation=float(raw.get("keyframe_rotation", np.radians(30))),
        use_gyro=bool(raw.get("use_gyro", False)),
    )
    mount_rpy = np.asarray(imu_pose[3:6], np.float32)
    return cfg, mount_rpy, int(raw.get("imu_version", 1))


def load_gyro_config(path: str | None = None) -> GyroConfig:
    """gyro.yaml -> GyroConfig (`gyro.py:23-45`)."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    raw = load_yaml(path or default_path("gyro.yaml"))
    off = raw.get("offset", {})
    mat = Rotation.from_euler(
        "xyz",
        [float(off.get("x", 0)), float(off.get("y", 0)), float(off.get("z", 0))],
        degrees=True,
    ).as_matrix()
    return GyroConfig(
        offset_matrix=jnp.asarray(mat, jnp.float32),
        latitude=float(np.radians(raw.get("latitude", 40.70594689371728))),
        sensor_rate=float(raw.get("sensor_rate", 250)),
    )


def load_kalman_config(path: str | None = None) -> KalmanConfig:
    """kalman.yaml -> KalmanConfig (`kalman.py:38-92`)."""
    import jax.numpy as jnp

    raw = load_yaml(path or default_path("kalman.yaml"))
    a = lambda k: jnp.asarray(raw[k], jnp.float32)
    return KalmanConfig(
        A_imu=a("A_imu"),
        Q=a("Q"),
        H_dvl=a("H_dvl"),
        R_dvl=a("R_dvl"),
        H_imu=a("H_imu"),
        R_imu=a("R_imu"),
        H_depth=a("H_depth"),
        R_depth=a("R_depth"),
        H_gyro=a("H_gyro"),
        R_gyro=a("R_gyro"),
        dt_imu=float(raw.get("dt_imu", 0.005)),
        dvl_max_velocity=float(raw.get("dvl_max_velocity", 0.5)),
        imu_offset=float(np.radians(raw.get("imu_offset", 180))),
        use_gyro=bool(raw.get("use_gyro", False)),
    )


def load_mapping_config(path: str | None = None, max_keyframes: int = 128):
    """mapping.yaml -> MappingConfig (`mapping_node.py:23-80`)."""
    from ..mapping import MappingConfig

    raw = load_yaml(path or default_path("mapping.yaml"))
    origin = raw.get("origin", [-100.0, -100.0])
    size = raw.get("size", [200.0, 200.0])
    return MappingConfig(
        x0=float(origin[0]),
        y0=float(origin[1]),
        width=float(size[0]),
        height=float(size[1]),
        resolution=float(raw.get("resolution", 0.2)),
        hit_prob=float(raw.get("hit_prob", 0.8)),
        miss_prob=float(raw.get("miss_prob", 0.3)),
        inflation_angle=float(raw.get("inflation_angle", 0.04)),
        inflation_range=float(raw.get("inflation_range", 0.4)),
        inflation_radius=float(raw.get("inflation_radius", 0.5)),
        outlier_filter_radius=float(raw.get("outlier_filter_radius", 5.0)),
        outlier_filter_min_points=int(raw.get("outlier_filter_min_points", 20)),
        min_translation=float(raw.get("min_translation", 0.5)),
        min_rotation=float(raw.get("min_rotation", 0.015)),
        max_keyframes=max_keyframes,
    )
