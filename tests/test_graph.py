import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.graph import (
    GraphConfig,
    Smoother,
    sigmas_to_sqrt_info,
    cov_to_sqrt_info,
    pcm_select,
    max_clique_mask,
    pairwise_consistency_matrix,
    max_clique_host,
)
from sonar_slam_tpu.geometry import se2_compose, se2_between, se2_inverse

rng = np.random.default_rng(11)
CFG = GraphConfig(max_poses=16, max_factors=64, gn_iters=8)


def test_prior_only():
    s = Smoother(CFG)
    s.add_prior([1.0, 2.0, 0.3], [0.1, 0.1, 0.01])
    s.insert(0, [0.0, 0.0, 0.0])
    poses = np.asarray(s.update())
    np.testing.assert_allclose(poses[0], [1.0, 2.0, 0.3], atol=1e-5)


def test_perfect_odometry_chain():
    s = Smoother(CFG)
    s.add_prior([0, 0, 0], [0.1, 0.1, 0.01])
    s.insert(0, [0, 0, 0])
    deltas = [[1.0, 0.0, 0.1], [1.0, 0.2, -0.05], [0.5, -0.1, 0.3]]
    truth = [np.zeros(3)]
    for k, d in enumerate(deltas):
        truth.append(np.asarray(se2_compose(jnp.asarray(truth[-1]), jnp.asarray(d))))
        s.add_odometry(k, k + 1, d, [0.2, 0.2, 0.02])
        s.insert(k + 1, truth[-1] + rng.normal(scale=0.05, size=3))
    poses = np.asarray(s.update())
    np.testing.assert_allclose(poses[: len(truth)], np.stack(truth), atol=1e-4)


def test_loop_closure_corrects_drift():
    """Square loop: noisy odometry + exact loop factor pulls end pose home."""
    s = Smoother(CFG)
    s.add_prior([0, 0, 0], [0.01, 0.01, 0.001])
    s.insert(0, [0, 0, 0])
    true_delta = np.array([2.0, 0.0, np.pi / 2], np.float32)
    truth = [np.zeros(3, np.float32)]
    for k in range(4):
        truth.append(np.asarray(se2_compose(jnp.asarray(truth[-1]), jnp.asarray(true_delta))))
    # corrupt odometry
    guess = [np.zeros(3, np.float32)]
    for k in range(4):
        noisy = true_delta + rng.normal(scale=[0.1, 0.1, 0.03], size=3).astype(np.float32)
        s.add_odometry(k, k + 1, noisy, [0.2, 0.2, 0.05])
        guess.append(np.asarray(se2_compose(jnp.asarray(guess[-1]), jnp.asarray(noisy))))
        s.insert(k + 1, guess[-1])
    drift = np.linalg.norm(guess[4][:2] - truth[4][:2])
    # exact loop-closure factor X0 -> X4
    z = np.asarray(se2_between(jnp.asarray(truth[0]), jnp.asarray(truth[4])))
    s.add_odometry(0, 4, z, [0.01, 0.01, 0.001])
    poses = np.asarray(s.update())
    err = np.linalg.norm(poses[4][:2] - truth[4][:2])
    assert err < 0.02
    assert err < drift


def test_matches_scipy_least_squares():
    """The GN solution must match an independent scipy solve of the same NLLS."""
    from scipy.optimize import least_squares
    from sonar_slam_tpu.geometry import se2_logmap

    n = 5
    s = Smoother(CFG)
    prior_sig = np.array([0.1, 0.1, 0.05])
    s.add_prior([0, 0, 0], prior_sig)
    truth = [np.zeros(3, np.float32)]
    factors = []
    for k in range(n - 1):
        d = np.array([1.0, 0.1 * k, 0.2], np.float32)
        truth.append(np.asarray(se2_compose(jnp.asarray(truth[-1]), jnp.asarray(d))))
        zn = d + rng.normal(scale=0.05, size=3).astype(np.float32)
        sig = np.array([0.2, 0.2, 0.05])
        factors.append((k, k + 1, zn, sig))
        s.add_odometry(k, k + 1, zn, sig)
        s.insert(k + 1, truth[-1])
    # a loop factor 0->4
    z04 = np.asarray(se2_between(jnp.asarray(truth[0]), jnp.asarray(truth[4]))) + np.array(
        [0.03, -0.02, 0.01], np.float32
    )
    sig04 = np.array([0.1, 0.1, 0.02])
    factors.append((0, 4, z04, sig04))
    s.add_odometry(0, 4, z04, sig04)
    ours = np.asarray(s.update())[:n]

    # independent float64 NumPy implementation of the same NLLS objective
    def np_compose(a, b):
        ca, sa = np.cos(a[2]), np.sin(a[2])
        return np.array(
            [
                a[0] + ca * b[0] - sa * b[1],
                a[1] + sa * b[0] + ca * b[1],
                np.arctan2(np.sin(a[2] + b[2]), np.cos(a[2] + b[2])),
            ]
        )

    def np_inverse(a):
        ca, sa = np.cos(a[2]), np.sin(a[2])
        return np.array([-(ca * a[0] + sa * a[1]), -(-sa * a[0] + ca * a[1]), -a[2]])

    def np_logmap(p):
        w = np.arctan2(np.sin(p[2]), np.cos(p[2]))
        if abs(w) < 1e-10:
            a, b = 1.0, w / 2.0
        else:
            a, b = np.sin(w) / w, (1 - np.cos(w)) / w
        det = a * a + b * b
        return np.array(
            [(a * p[0] + b * p[1]) / det, (-b * p[0] + a * p[1]) / det, w]
        )

    def residuals(x):
        poses = x.reshape(n, 3)
        res = [np_logmap(poses[0]) / prior_sig]
        for i, j, z, sig in factors:
            h = np_compose(np_inverse(poses[i]), poses[j])
            res.append(np_logmap(np_compose(np_inverse(np.float64(z)), h)) / sig)
        return np.concatenate(res)

    ref = least_squares(
        residuals, np.float64(np.stack(truth)).ravel(), xtol=1e-14, ftol=1e-14,
        gtol=1e-14, method="lm",
    )
    ref_poses = ref.x.reshape(n, 3)
    cost_ours = 0.5 * np.sum(residuals(np.float64(ours).ravel()) ** 2)
    cost_ref = 0.5 * np.sum(residuals(ref.x) ** 2)
    assert cost_ours <= cost_ref + 1e-6
    np.testing.assert_allclose(ours, ref_poses, atol=2e-3)


def test_marginal_covariance_grows_along_chain():
    s = Smoother(CFG)
    s.add_prior([0, 0, 0], [0.1, 0.1, 0.01])
    s.insert(0, [0, 0, 0])
    for k in range(3):
        s.add_odometry(k, k + 1, [1.0, 0.0, 0.0], [0.2, 0.2, 0.02])
        s.insert(k + 1, [k + 1.0, 0.0, 0.0])
    s.update()
    c0 = np.asarray(s.marginal_covariance(0))
    c3 = np.asarray(s.marginal_covariance(3))
    np.testing.assert_allclose(c0, np.diag([0.01, 0.01, 1e-4]), atol=1e-5)
    assert np.linalg.det(c3) > np.linalg.det(c0)
    # chain of 3 odometry steps along x: x-variance = prior + 3 * odom
    np.testing.assert_allclose(c3[0, 0], 0.01 + 3 * 0.04, rtol=0.05)


def test_robust_factor_downweights_outlier():
    def final_error(robust):
        s = Smoother(CFG)
        s.add_prior([0, 0, 0], [0.01, 0.01, 0.001])
        s.insert(0, [0, 0, 0])
        for k in range(3):
            s.add_odometry(k, k + 1, [1.0, 0.0, 0.0], [0.1, 0.1, 0.01])
            s.insert(k + 1, [k + 1.0, 0.0, 0.0])
        # wildly wrong loop factor
        s.add_odometry(0, 3, [0.0, 5.0, 1.0], [0.1, 0.1, 0.01], robust=robust)
        poses = np.asarray(s.update())
        return np.linalg.norm(poses[3] - [3.0, 0.0, 0.0])

    assert final_error(True) < final_error(False)


def test_cov_to_sqrt_info_roundtrip():
    A = rng.normal(size=(3, 3))
    cov = A @ A.T + np.eye(3)
    R = np.asarray(cov_to_sqrt_info(jnp.asarray(cov, jnp.float32)))
    np.testing.assert_allclose(R.T @ R, np.linalg.inv(cov), rtol=2e-3, atol=1e-4)


# --- PCM ---


def _loop_entry(src_pose, tgt_pose, noise=0.0):
    t = np.asarray(se2_between(jnp.asarray(tgt_pose), jnp.asarray(src_pose)))
    return t + noise


def test_pcm_accepts_consistent_rejects_outlier():
    Q = 5
    # ground-truth poses for sources/targets of 3 real loops + 1 outlier
    tgt = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [0, 0, 0], [0, 0, 0]], np.float32)
    src = np.array([[5, 1, 0.2], [6, 1, 0.2], [7, 1, 0.2], [5, 1, 0.2], [0, 0, 0]], np.float32)
    transforms = np.stack(
        [
            _loop_entry(src[0], tgt[0]),
            _loop_entry(src[1], tgt[1]),
            _loop_entry(src[2], tgt[2]),
            _loop_entry(src[3], tgt[3], noise=np.array([3.0, -2.0, 0.8], np.float32)),
            np.zeros(3, np.float32),
        ]
    )
    covs = np.tile(np.diag([0.01, 0.01, 0.001]).astype(np.float32), (Q, 1, 1))
    valid = np.array([True, True, True, True, False])
    mask, size = pcm_select(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(transforms),
        jnp.asarray(covs), jnp.asarray(valid), min_pcm=2,
    )
    mask = np.asarray(mask)
    assert int(size) == 3
    assert mask[:3].all() and not mask[3] and not mask[4]


def test_pcm_min_size_gate():
    Q = 3
    src = np.zeros((Q, 3), np.float32)
    tgt = np.zeros((Q, 3), np.float32)
    transforms = rng.normal(size=(Q, 3)).astype(np.float32) * 5  # all inconsistent
    covs = np.tile(np.diag([1e-4, 1e-4, 1e-5]).astype(np.float32), (Q, 1, 1))
    valid = np.ones(Q, bool)
    mask, size = pcm_select(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(transforms),
        jnp.asarray(covs), jnp.asarray(valid), min_pcm=2,
    )
    assert int(size) == 0
    assert not np.asarray(mask).any()


def test_max_clique_host_matches_jit():
    Q = 5
    adj_mat = rng.uniform(size=(Q, Q)) > 0.4
    adj_mat = np.triu(adj_mat, 1)
    adj_mat = adj_mat | adj_mat.T
    mask, size = max_clique_mask(jnp.asarray(adj_mat), jnp.ones(Q, bool), 1)
    adj = {i: {j for j in range(Q) if adj_mat[i, j]} for i in range(Q)}
    host = max_clique_host(adj)
    assert int(size) == len(host)


def test_optimize_survives_nan_factor():
    """A non-finite factor must not poison the solve: the NaN guard takes a
    zero step (escalating the Levenberg damping) and returns the input poses
    unchanged and finite, instead of propagating NaN through every pose.
    Observed failure mode on TPU (round 4): marginally-PD fp32 normal
    equations under cm-level refined floors -> cholesky NaN -> whole
    trajectory NaN."""
    s = Smoother(CFG)
    s.add_prior([0, 0, 0], [0.1, 0.1, 0.01])
    s.insert(0, [0, 0, 0])
    s.add_odometry(0, 1, [1.0, 0.0, 0.0], [0.2, 0.2, 0.02])
    s.insert(1, [1.0, 0.0, 0.0])
    # poison: a factor whose measurement is NaN
    s.add_odometry(1, 2, [np.nan, 0.0, 0.0], [0.2, 0.2, 0.02])
    s.insert(2, [2.0, 0.0, 0.0])
    poses = np.asarray(s.update())
    assert np.isfinite(poses).all()
    np.testing.assert_allclose(poses[1], [1.0, 0.0, 0.0], atol=1e-5)


def test_optimize_step_clamp_bounds_motion():
    """With a tiny trust-region clamp, one optimize() call moves each pose by
    at most step_clamp_t * gn_iters (uniform scaling preserves direction)."""
    cfg = CFG._replace(gn_iters=3, step_clamp_t=0.01, step_clamp_r=0.002)
    s = Smoother(cfg)
    s.add_prior([0, 0, 0], [0.1, 0.1, 0.01])
    s.insert(0, [0, 0, 0])
    # a far-off initial value the solver wants to yank 5 m in one step
    s.add_odometry(0, 1, [1.0, 0.0, 0.0], [0.05, 0.05, 0.01])
    s.insert(1, [6.0, 0.0, 0.0])
    poses = np.asarray(s.update())
    assert np.isfinite(poses).all()
    moved = np.linalg.norm(poses[1, :2] - [6.0, 0.0])
    assert moved <= 0.01 * cfg.gn_iters + 1e-6


def test_optimize_clamped_still_converges():
    """The clamp must not change the fixed point: a graph whose first step
    exceeds the clamp still converges to the same solution with enough
    sweeps."""
    cfg = CFG._replace(gn_iters=64, step_clamp_t=0.5, step_clamp_r=0.1,
                       convergence_tol=1e-7)
    s = Smoother(cfg)
    s.add_prior([0, 0, 0], [0.1, 0.1, 0.01])
    s.insert(0, [0, 0, 0])
    s.add_odometry(0, 1, [1.0, 0.0, 0.0], [0.05, 0.05, 0.01])
    s.insert(1, [6.0, 3.0, 0.5])
    poses = np.asarray(s.update())
    np.testing.assert_allclose(poses[1], [1.0, 0.0, 0.0], atol=1e-4)
