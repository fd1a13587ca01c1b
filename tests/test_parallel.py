"""Sweep sharding, multi-robot exchange, and checkpoint-resume equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.cloud import ICPConfig
from sonar_slam_tpu.parallel import (
    stack_params,
    sweep_scan,
    make_config_mesh,
    exchange_keyframes,
    merge_interrobot_factors,
)
from sonar_slam_tpu.parallel.sweep import vary
from sonar_slam_tpu.parallel.multi_robot import KeyframeSummary
from sonar_slam_tpu.slam import (
    KeyframeInput,
    SlamDims,
    SlamParams,
    keyframe_step,
    slam_init,
    slam_scan,
)

rng = np.random.default_rng(17)

DIMS = SlamDims(
    max_keyframes=8, max_points=32, target_capacity=64,
    nssm_min_st_sep=4, nssm_source_frames=2, ssm_target_frames=2,
    nssm_cov_samples=4, ssm_sobol=16, nssm_sobol=16, max_loops=4,
    gn_iters=2, pcm_queue_slots=3, icp=ICPConfig(max_iterations=6),
)


def make_frames(n=6):
    pts = rng.uniform(0, 15, size=(DIMS.max_keyframes, DIMS.max_points, 2))
    dr = np.zeros((DIMS.max_keyframes, 6), np.float32)
    dr[:, 0] = np.arange(DIMS.max_keyframes) * 1.5
    valid = np.arange(DIMS.max_keyframes) < n
    return KeyframeInput(
        time=jnp.asarray(np.arange(DIMS.max_keyframes) * 2.0, jnp.float32),
        dr_pose3=jnp.asarray(dr),
        points=jnp.asarray(pts, jnp.float32),
        pmask=jnp.ones((DIMS.max_keyframes, DIMS.max_points), bool)
        & jnp.asarray(valid)[:, None],
        valid=jnp.asarray(valid),
    )


def small_params():
    return SlamParams.default(DIMS)._replace(
        keyframe_translation=jnp.float32(1.0),
        ssm_min_points=jnp.asarray(5, jnp.int32),
        nssm_min_points=jnp.asarray(5, jnp.int32),
    )


def test_sweep_identical_lanes_deterministic():
    frames = make_frames()
    p = small_params()
    stacked = stack_params([p, p, p])
    carry, outputs = sweep_scan(frames, stacked, DIMS)
    poses = np.asarray(carry.poses)
    # identical lanes agree to fp tolerance (XLA may vectorize the lane axis
    # with SIMD remainder loops whose contraction order differs per lane)
    np.testing.assert_allclose(poses[0], poses[1], atol=1e-5)
    np.testing.assert_allclose(poses[0], poses[2], atol=1e-5)
    # lanes match the unbatched scan (vmapped vs plain programs fuse
    # differently, so bit-equality only holds within the batched program)
    c1, _ = slam_scan(frames, p, DIMS)
    np.testing.assert_allclose(poses[0], np.asarray(c1.poses), atol=1e-5)


def test_sweep_sharded_over_mesh():
    frames = make_frames()
    p = small_params()
    lanes = vary(p, point_noise=[0.3, 0.4, 0.5, 0.6, 0.3, 0.4, 0.5, 0.6])
    mesh = make_config_mesh(8)
    carry, outputs = sweep_scan(frames, stack_params(lanes), DIMS, mesh=mesh)
    poses = np.asarray(carry.poses)
    assert poses.shape[0] == 8
    # identical configs in different lanes agree to fp tolerance
    np.testing.assert_allclose(poses[0], poses[4], atol=1e-5)
    np.testing.assert_allclose(poses[1], poses[5], atol=1e-5)


def test_vary_validates_lengths():
    p = small_params()
    with pytest.raises(ValueError):
        vary(p, point_noise=[0.3], ssm_max_translation=[1.0, 2.0])


def test_multi_robot_exchange_and_merge():
    n = 4
    mesh = make_config_mesh(n, axis="robot")
    N = 64
    base = rng.uniform(0, 10, size=(N, 2)).astype(np.float32)
    # all robots observe the same structure from different poses
    poses = np.array(
        [[0, 0, 0], [1.0, 0.5, 0.1], [8.0, -2.0, 0.4], [0.2, 0.1, 0.0]],
        np.float32,
    )
    from sonar_slam_tpu.geometry import se2_transform_points, se2_inverse

    clouds = np.stack(
        [
            np.asarray(
                se2_transform_points(jnp.asarray(base), se2_inverse(jnp.asarray(p)))
            )
            for p in poses
        ]
    )
    summary = KeyframeSummary(
        robot_id=jnp.arange(n, dtype=jnp.int32),
        key=jnp.zeros((n,), jnp.int32),
        pose=jnp.asarray(poses),
        cov=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1)),
        points=jnp.asarray(clouds),
        pmask=jnp.ones((n, N), bool),
    )
    gathered = exchange_keyframes(summary, mesh)
    assert gathered.pose.shape == (n, 3)
    own = jax.tree.map(lambda x: x[0], summary)
    tfs, ok, ov = merge_interrobot_factors(own, gathered, min_overlap=30)
    ok = np.asarray(ok)
    assert not ok[0]  # never matches itself
    assert ok[1] and ok[3]  # overlapping neighbors matched
    # the recovered transform between robot 0 and robot 1 is between(p0, p1)
    from sonar_slam_tpu.geometry import se2_between

    expect = np.asarray(se2_between(jnp.asarray(poses[0]), jnp.asarray(poses[1])))
    np.testing.assert_allclose(np.asarray(tfs[1]), expect, atol=0.05)


def test_keyframe_axis_sharding_matches_core():
    """The K-sharded NSSM gating + global transform (parallel/keyframe_shard)
    must reproduce the in-core single-device computation exactly
    (VERDICT r1 item 4 / SURVEY §5.7)."""
    from sonar_slam_tpu.parallel.keyframe_shard import (
        nssm_gate_sharded,
        nssm_target_select_sharded,
        transform_clouds_sharded,
    )
    from sonar_slam_tpu.geometry import se2_inverse, se2_transform_points
    from sonar_slam_tpu.slam.scan_matching import max_eig_2x2

    K, N, W = 16, 32, 3  # K divisible by the 8-device mesh
    r = np.random.default_rng(3)
    points = jnp.asarray(r.uniform(0, 20, size=(K, N, 2)), jnp.float32)
    pmasks = jnp.asarray(r.random((K, N)) > 0.2)
    poses = jnp.asarray(
        np.stack([np.linspace(0, 30, K), np.linspace(0, 5, K),
                  np.linspace(0, 1.2, K)], -1), jnp.float32)
    covs = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 1e-3, (K, 1, 1))
    tgt_ok = jnp.arange(K) < 10
    src_poses = poses[-W:]
    src_covs = covs[-W:]
    src_ok = jnp.asarray([True, True, False])
    mesh = make_config_mesh(8, axis="kf")
    max_range, half_ap = 30.0, float(np.radians(65.0))

    # sharded global transform == vmapped single-device transform
    g_shard = np.asarray(transform_clouds_sharded(points, poses, mesh))
    g_ref = np.asarray(jax.vmap(se2_transform_points)(points, poses))
    np.testing.assert_array_equal(g_shard, g_ref)

    # sharded gating == the core's frame_sel chain (slam/core.py run_nssm)
    sel, counts = nssm_gate_sharded(
        points, pmasks, poses, tgt_ok, src_poses, src_covs, src_ok,
        mesh, max_range, half_ap)

    def ref_frame_sel(w):
        pose, cov = src_poses[w], src_covs[w]
        tstd = jnp.sqrt(max_eig_2x2(cov[:2, :2]))
        rstd = jnp.sqrt(cov[2, 2])
        local = se2_transform_points(g_ref.reshape(-1, 2), se2_inverse(pose))
        rng_ = jnp.linalg.norm(local, axis=-1)
        brg = jnp.arctan2(local[:, 1], local[:, 0])
        return ((rng_ < tstd * 5.0 + max_range)
                & (jnp.abs(brg) < rstd * 5.0 + half_ap) & src_ok[w])

    sels_ref = jax.vmap(ref_frame_sel)(jnp.arange(W))
    sel_ref = jnp.any(sels_ref, axis=0).reshape(K, N) & pmasks & tgt_ok[:, None]
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel_ref))
    np.testing.assert_array_equal(
        np.asarray(counts), np.asarray(jnp.sum(sel_ref, axis=1)))

    # the full target selection picks the reference argmax
    _, counts2, best, have = nssm_target_select_sharded(
        points, pmasks, poses, tgt_ok, src_poses, src_covs, src_ok,
        mesh, max_range, half_ap)
    ref_counts = np.asarray(jnp.sum(sel_ref, axis=1))
    assert bool(have) == bool((ref_counts > 10).any())
    assert int(best) == int(np.argmax(np.where(ref_counts > 10, ref_counts, -1)))


def test_checkpoint_resume_equivalence(tmp_path):
    """Stopping the scan mid-way, checkpointing, and resuming must produce
    exactly the full-run result (the carry is RNG-free)."""
    from sonar_slam_tpu.io.state import load_checkpoint, save_checkpoint

    frames = make_frames(6)
    p = small_params()

    def step(carry, i):
        f = jax.tree.map(lambda x: x[i], frames)
        return keyframe_step(carry, f, p, DIMS)

    # full run
    carry_full = slam_init(DIMS)
    for i in range(6):
        carry_full, _ = step(carry_full, i)

    # run 3 steps, checkpoint, restore, run the rest
    carry_a = slam_init(DIMS)
    for i in range(3):
        carry_a, _ = step(carry_a, i)
    path = str(tmp_path / "mid.npz")
    save_checkpoint(path, carry_a)
    carry_b = load_checkpoint(path, slam_init(DIMS))
    for i in range(3, 6):
        carry_b, _ = step(carry_b, i)

    for a, b in zip(jax.tree_util.tree_leaves(carry_full),
                    jax.tree_util.tree_leaves(carry_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
