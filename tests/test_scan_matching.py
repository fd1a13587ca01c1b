import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.slam.scan_matching import (
    sobol_unit_samples,
    match_count_costs,
    global_initialize,
    estimate_pose_covariance,
    localize_covariance,
    apply_covariance_floor,
)
from sonar_slam_tpu.geometry import (
    se2_compose,
    se2_between,
    se2_inverse,
    se2_transform_points,
)

rng = np.random.default_rng(9)


def padded(points, capacity):
    out = np.zeros((capacity, 2), np.float32)
    out[: len(points)] = points
    mask = np.zeros(capacity, bool)
    mask[: len(points)] = True
    return jnp.asarray(out), jnp.asarray(mask)


def l_cloud(n=150):
    t = rng.uniform(0, 1, size=n)
    w1 = np.stack([8 * t[: n // 2], np.zeros(n // 2)], -1)
    w2 = np.stack([np.zeros(n - n // 2), 6 * t[n // 2 :]], -1)
    return (np.concatenate([w1, w2]) + rng.normal(scale=0.03, size=(n, 2))).astype(
        np.float32
    )


def test_sobol_deterministic():
    a = sobol_unit_samples(64)
    b = sobol_unit_samples(64)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 3)
    assert (a >= 0).all() and (a < 1).all()


def test_match_count_costs_prefers_truth():
    cloud = l_cloud()
    tp, tm = padded(cloud, 256)
    # source = cloud observed from source_pose; with zero delta the transform
    # should align perfectly
    source_pose = jnp.asarray([1.0, 0.5, 0.2], jnp.float32)
    target_pose = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    true_tf = se2_between(target_pose, source_pose)
    sp, sm = padded(
        np.asarray(se2_transform_points(jnp.asarray(cloud), se2_inverse(true_tf))), 256
    )
    deltas = jnp.asarray(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.3]], jnp.float32
    )
    costs, tfs = match_count_costs(sp, sm, tp, tm, source_pose, target_pose, deltas, 0.3)
    costs = np.asarray(costs)
    assert costs[0] < costs[1] and costs[0] < costs[2]
    assert costs[0] <= -140  # nearly all points overlap
    np.testing.assert_allclose(np.asarray(tfs[0]), np.asarray(true_tf), atol=1e-5)


def test_global_initialize_finds_offset():
    cloud = l_cloud()
    tp, tm = padded(cloud, 256)
    target_pose = jnp.zeros(3, jnp.float32)
    # true source pose is offset from the believed source pose by delta*
    believed = jnp.asarray([0.5, -0.3, 0.1], jnp.float32)
    true_delta = jnp.asarray([0.4, 0.3, -0.15], jnp.float32)
    true_pose = se2_compose(believed, true_delta)
    tf = se2_between(target_pose, true_pose)
    sp, sm = padded(
        np.asarray(se2_transform_points(jnp.asarray(cloud), se2_inverse(tf))), 256
    )
    res = global_initialize(
        sp, sm, tp, tm, believed, target_pose,
        bounds=jnp.asarray([1.0, 1.0, 0.5], jnp.float32),
        unit_samples=jnp.asarray(sobol_unit_samples(256)),
        point_noise=0.3,
        num_guesses=8,
    )
    # the best sample should land within the noise radius of the true delta
    np.testing.assert_allclose(
        np.asarray(res.best_delta), np.asarray(true_delta), atol=0.3
    )
    assert float(res.best_cost) <= -100
    # guesses: deduped, masked, best-first; re-targetable to any target pose
    guesses = np.asarray(res.guesses_vs(target_pose))
    assert guesses.shape == (8, 3)
    assert bool(res.guess_mask[0])
    m = np.asarray(res.guess_mask)
    kept = guesses[m]
    np.testing.assert_allclose(
        kept[0], np.asarray(se2_between(target_pose, se2_compose(believed, res.best_delta))),
        atol=1e-5,
    )
    for i in range(1, len(kept)):
        assert np.linalg.norm(kept[i] - kept[i - 1]) >= 0.01 - 1e-6


def test_estimate_pose_covariance_rejects_outliers():
    true_mean = np.array([1.0, 2.0, 0.3])
    G = 30
    samples = true_mean + rng.normal(scale=[0.02, 0.02, 0.005], size=(G, 3))
    samples[:5] = [[9, 9, 2]] * 5  # gross outliers
    mask = np.ones(G, bool)
    mu, cov, n = estimate_pose_covariance(
        jnp.asarray(samples, jnp.float32), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(mu), true_mean, atol=0.02)
    assert np.all(np.linalg.eigvalsh(np.asarray(cov)) < 0.01)
    assert int(n) == 30


def test_localize_covariance_rotation():
    cov = np.diag([4.0, 1.0, 0.1]).astype(np.float32)
    pose = jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32)
    local = np.asarray(localize_covariance(jnp.asarray(cov), pose))
    # rotating the frame by 90 deg swaps x/y variances
    np.testing.assert_allclose(local[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(local[1, 1], 4.0, atol=1e-5)
    np.testing.assert_allclose(local[2, 2], 0.1, atol=1e-6)


def test_apply_covariance_floor():
    sig = jnp.asarray([0.1, 0.1, 0.01], jnp.float32)
    tiny = jnp.asarray(np.diag([1e-8, 1e-8, 1e-10]), jnp.float32)
    out, used = apply_covariance_floor(tiny, sig)
    assert bool(used)
    np.testing.assert_allclose(np.asarray(out), np.diag([0.01, 0.01, 1e-4]), rtol=1e-5)
    big = jnp.asarray(np.diag([1.0, 1.0, 0.5]), jnp.float32)
    out, used = apply_covariance_floor(big, sig)
    assert not bool(used)
    np.testing.assert_allclose(np.asarray(out), np.asarray(big))
