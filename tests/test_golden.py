"""Golden-trajectory regression: the canonical small synthetic survey must
keep producing (nearly) the same trajectory — the TPU analog of the
reference's repeated-run overlay checking (SURVEY.md §4.2), made exact.

Regenerate the golden after *deliberate* behavior changes:
    python - <<'PY'
    # (see git log for the generation snippet)
    PY
and explain the change in the commit message.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.io.simulate import SimConfig, simulate_bag
from sonar_slam_tpu.slam import SlamDims, SlamParams, FeatureConfig
from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.pipeline import replay

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "small_traj.npz")


def test_golden_trajectory():
    bag = simulate_bag(
        SimConfig(duration=90.0, speed=0.5, sonar_rate=1.0, num_ranges=192,
                  num_bearings=96, loop_radius=10.0, imu_rate=20.0)
    )
    dims = SlamDims(
        max_keyframes=32, max_points=128, target_capacity=512,
        nssm_min_st_sep=8, nssm_cov_samples=12, ssm_sobol=64, nssm_sobol=128,
        max_loops=16, gn_iters=3,
        icp=ICPConfig(min_diff_rot=1e-3, min_diff_trans=1e-2),
    )
    p = SlamParams.default(dims)._replace(
        keyframe_translation=jnp.float32(2.0),
        keyframe_duration=jnp.float32(1.0),
        ssm_min_points=jnp.asarray(20, jnp.int32),
        nssm_min_points=jnp.asarray(20, jnp.int32),
    )
    res = replay(bag, FeatureConfig(max_points=128), p, dims)
    gold = np.load(GOLDEN)
    np.testing.assert_array_equal(
        res.keyframe_ping_idx, gold["keyframe_ping_idx"]
    )
    assert res.trajectory.shape == gold["trajectory"].shape
    # loose tolerance: compiler/fusion changes may move fp rounding slightly,
    # but the trajectory must stay the same solution
    np.testing.assert_allclose(
        res.trajectory, gold["trajectory"], atol=0.05
    ), "trajectory drifted from golden — intended? regenerate + explain"
    assert abs(int(res.carry.num_loops) - int(gold["num_loops"])) <= 1
