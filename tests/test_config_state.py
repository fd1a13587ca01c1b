import os
import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.io.config import (
    load_yaml,
    load_icp_config,
    load_feature_config,
    load_slam_config,
    load_dead_reckoning_config,
    load_gyro_config,
    load_kalman_config,
    load_mapping_config,
    default_path,
)
from sonar_slam_tpu.io.state import (
    get_states,
    save_checkpoint,
    load_checkpoint,
    STATE_DTYPE,
)
from sonar_slam_tpu.slam.core import SlamDims, slam_init
from sonar_slam_tpu.utils import CodeTimer, timing_report, Streams


def test_deg_substitution(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: deg(30)\nnested:\n  b: deg(-90)\nlist: [deg(45), 1.5]\n")
    raw = load_yaml(str(p))
    np.testing.assert_allclose(raw["a"], np.radians(30))
    np.testing.assert_allclose(raw["nested"]["b"], np.radians(-90))
    np.testing.assert_allclose(raw["list"][0], np.radians(45))
    assert raw["list"][1] == 1.5


def test_icp_config_parses_reference_schema():
    cfg = load_icp_config()
    assert cfg.knn_max_dist == 10.0
    assert cfg.outlier_max_dist == 3.0
    assert cfg.trim_ratio == 0.8
    assert cfg.max_iterations == 40
    assert cfg.min_diff_rot == 0.01
    assert cfg.min_diff_trans == 0.1
    assert cfg.smooth_length == 4


def test_feature_config_defaults():
    cfg = load_feature_config()
    assert (cfg.ntc, cfg.ngc, cfg.pfa, cfg.rank, cfg.alg) == (40, 10, 0.1, 10, "SOCA")
    assert cfg.threshold == 65.0


def test_slam_config_defaults():
    params, dims, icp_path = load_slam_config()
    np.testing.assert_allclose(float(params.keyframe_rotation), np.radians(30))
    np.testing.assert_allclose(np.asarray(params.odom_sigmas), [0.2, 0.2, 0.02])
    assert dims.nssm_min_st_sep == 8
    assert dims.nssm_cov_samples == 30
    assert dims.pcm_queue_slots == 6
    assert dims.icp.max_iterations == 40  # pulled through $(find ...) icp.yaml
    assert int(params.min_pcm) == 2


def test_dr_gyro_kalman_mapping_configs():
    dr, mount, ver = load_dead_reckoning_config()
    assert dr.dvl_max_velocity == 0.5
    np.testing.assert_allclose(mount, [-np.pi / 2, 0, 0], atol=1e-6)
    g = load_gyro_config()
    assert g.offset_matrix.shape == (3, 3)
    k = load_kalman_config()
    assert k.A_imu.shape == (12, 12)
    np.testing.assert_allclose(float(k.A_imu[0, 6]), 0.005, rtol=1e-6)
    m = load_mapping_config()
    assert (m.rows, m.cols) == (1000, 1000)
    assert m.hit_prob == 0.8


def test_get_states_layout():
    dims = SlamDims(max_keyframes=8, max_points=16, target_capacity=32,
                    max_loops=4, pcm_queue_slots=3)
    carry = slam_init(dims)
    # fabricate two keyframes
    carry = carry._replace(
        num_kf=jnp.asarray(2, jnp.int32),
        times=carry.times.at[:2].set(jnp.asarray([100.0, 101.5])),
        poses=carry.poses.at[:2].set(jnp.asarray([[0, 0, 0], [1, 0, 0.1]])),
        dr_poses3=carry.dr_poses3.at[1].set(jnp.asarray([1, 0, 2.0, 0, 0, 0.1])),
    )
    st = get_states(carry, dims, refresh_covs=False)
    assert st.dtype == STATE_DTYPE
    assert len(st) == 2
    np.testing.assert_allclose(st[1]["time"], 1.5, atol=1e-6)
    np.testing.assert_allclose(st[1]["pose"], [1, 0, 0.1], atol=1e-6)
    np.testing.assert_allclose(st[1]["dr_pose3"][2], 2.0)


def test_checkpoint_roundtrip(tmp_path):
    dims = SlamDims(max_keyframes=8, max_points=16, target_capacity=32,
                    max_loops=4, pcm_queue_slots=3)
    carry = slam_init(dims)
    carry = carry._replace(
        num_kf=jnp.asarray(3, jnp.int32),
        poses=carry.poses.at[0].set(jnp.asarray([1.0, 2.0, 0.3])),
    )
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, carry)
    restored = load_checkpoint(path, slam_init(dims))
    assert int(restored.num_kf) == 3
    np.testing.assert_allclose(np.asarray(restored.poses[0]), [1.0, 2.0, 0.3])
    # whole tree equality
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(carry),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_code_timer_accumulates():
    with CodeTimer("test span", silent=True):
        _ = sum(range(1000))
    rep = timing_report()
    assert "test span" in rep
    assert rep["test span"][1] >= 1


def test_streams_registry():
    assert Streams.SONAR_FEATURES != Streams.SLAM_CLOUD


def test_profile_slam_components():
    from sonar_slam_tpu.utils import profile_slam_components
    from sonar_slam_tpu.slam.core import SlamParams
    from sonar_slam_tpu.cloud import ICPConfig

    dims = SlamDims(max_keyframes=8, max_points=32, target_capacity=64,
                    ssm_sobol=16, nssm_sobol=16, nssm_cov_samples=4,
                    max_loops=4, pcm_queue_slots=3,
                    icp=ICPConfig(max_iterations=5))
    spans = profile_slam_components(dims, SlamParams.default(dims), repeats=1)
    assert len(spans) == 4
    assert all(v >= 0 for v in spans.values())
    assert "SLAM - nonsequential scan matching - ICP" in spans
