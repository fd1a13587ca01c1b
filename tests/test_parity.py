"""Component-level parity vs the installable reference libraries.

The reference uses scipy `shgo` for global scan-match initialization
(`/root/reference/bruce_slam/src/bruce_slam/slam.py:692-701`) and sklearn
`MinCovDet` for the multi-start ICP covariance (`slam.py:365-371`). Neither
GTSAM nor libpointmatcher is installable here, but scipy/sklearn are — so
these tests pin our owned re-implementations to the actual libraries on
matched inputs, bounding the "1 cm parity" claim with direct evidence.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.slam.scan_matching import (
    estimate_pose_covariance,
    global_initialize,
    sobol_unit_samples,
)
from sonar_slam_tpu.geometry import se2_transform_points


def _make_clouds(seed=0, n=96, true_delta=(0.6, -0.4, 0.12)):
    """Target cloud + source cloud observed from a pose offset by
    ``true_delta`` from the identity-aligned pose."""
    rng = np.random.default_rng(seed)
    # structured scene: two walls + a blob (registration observable)
    t = np.linspace(0, 8, n // 3)
    w1 = np.stack([t, 0.15 * np.sin(1.7 * t)], -1) + [4.0, -3.0]
    w2 = np.stack([0.2 * np.sin(2.1 * t), t], -1) + [10.0, -2.0]
    th = np.linspace(0, 2 * np.pi, n - 2 * (n // 3))
    blob = np.stack([6 + 0.8 * np.cos(th), 2 + 0.8 * np.sin(th)], -1)
    target = np.concatenate([w1, w2, blob]).astype(np.float32)
    d = np.asarray(true_delta, np.float32)
    c, s = np.cos(d[2]), np.sin(d[2])
    R = np.array([[c, -s], [s, c]], np.float32)
    # source points: target points seen from the offset pose (+ small noise)
    source = (target - d[:2]) @ R + rng.normal(
        scale=0.01, size=target.shape
    ).astype(np.float32)
    return source, target, d


def _count_cost(pose, source, target, noise):
    """The reference's overlap cost, continuous form (slam.py:536-568)."""
    c, s = np.cos(pose[2]), np.sin(pose[2])
    moved = source @ np.array([[c, s], [-s, c]]) + pose[:2]
    d2 = ((moved[:, None, :] - target[None]) ** 2).sum(-1)
    return -float((d2.min(1) <= noise**2).sum())


class TestShgoParity:
    def test_matches_scipy_shgo_optimum(self):
        from scipy.optimize import shgo

        source, target, true_delta = _make_clouds()
        noise = 0.35
        bounds = np.array([1.0, 1.0, 0.3])

        # reference: shgo Sobol sampling over the +/- bounds box
        # (slam.py:692-701: n*iters sobol samples of the same cost)
        ret = shgo(
            lambda p: _count_cost(p, source, target, noise),
            bounds=[(-b, b) for b in bounds],
            n=128, iters=2, sampling_method="sobol",
            minimizer_kwargs={"options": {"ftol": 1e-2}},
        )

        # ours: one batched Sobol evaluation of the identical predicate
        mask = jnp.ones(len(source), bool)
        gi = global_initialize(
            jnp.asarray(source), mask, jnp.asarray(target),
            jnp.ones(len(target), bool),
            source_pose=jnp.zeros(3, jnp.float32),
            target_pose=jnp.zeros(3, jnp.float32),
            bounds=jnp.asarray(bounds, jnp.float32),
            unit_samples=jnp.asarray(sobol_unit_samples(256)),
            point_noise=jnp.asarray(noise, jnp.float32),
            num_guesses=8,
        )
        ours = np.asarray(gi.best_delta)

        # both must land in the true basin; agreement bounded by the Sobol
        # sample spacing (shgo additionally polishes with a local minimizer
        # on a piecewise-constant cost, so exact equality is not defined)
        assert np.linalg.norm(ours[:2] - true_delta[:2]) < noise
        assert abs(ours[2] - true_delta[2]) < 0.15
        assert np.linalg.norm(ret.x[:2] - true_delta[:2]) < noise
        # our best cost is at least as good as the cost at scipy's optimum
        # (we evaluate the same predicate; argmin over our samples must not
        # be worse than shgo's returned sample up to one point of overlap)
        ours_cost = float(gi.best_cost)
        scipy_cost = _count_cost(ret.x, source, target, noise)
        assert ours_cost <= scipy_cost + 1.0

    def test_guess_list_matches_reference_ordering(self):
        """Guess list = cost-sorted eps-deduped samples (slam_objects.py:
        287-300): best-first and pairwise-distinct."""
        source, target, _ = _make_clouds(seed=3)
        mask = jnp.ones(len(source), bool)
        gi = global_initialize(
            jnp.asarray(source), mask, jnp.asarray(target),
            jnp.ones(len(target), bool),
            jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            bounds=jnp.asarray([1.0, 1.0, 0.3], jnp.float32),
            unit_samples=jnp.asarray(sobol_unit_samples(128)),
            point_noise=jnp.asarray(0.35, jnp.float32),
            num_guesses=6,
        )
        guesses = np.asarray(gi.guess_poses)[np.asarray(gi.guess_mask)]
        costs = [_count_cost(g, source, target, 0.35) for g in guesses]
        # best-first: the first guess attains the minimum cost of the list
        assert costs[0] == min(costs)
        # eps-dedup: pairwise distances exceed the dedup epsilon
        for i in range(len(guesses)):
            for j in range(i + 1, len(guesses)):
                assert np.linalg.norm(guesses[i] - guesses[j]) >= 0.01


class TestMinCovDetParity:
    def _samples(self, seed=0, n_in=24, n_out=6):
        rng = np.random.default_rng(seed)
        mean = np.array([0.5, -0.3, 0.1])
        cov = np.diag([0.02, 0.03, 0.005]) ** 2
        inliers = rng.multivariate_normal(mean, cov, size=n_in)
        outliers = rng.multivariate_normal(
            mean + [1.5, -1.0, 0.6], np.eye(3) * 0.04, size=n_out)
        return np.concatenate([inliers, outliers]).astype(np.float32), mean

    def test_matches_sklearn_mincovdet(self):
        from sklearn.covariance import MinCovDet

        samples, _ = self._samples()
        mcd = MinCovDet(support_fraction=0.8, random_state=0).fit(samples)

        mu, cov, n = estimate_pose_covariance(
            jnp.asarray(samples), jnp.ones(len(samples), bool))
        mu, cov = np.asarray(mu), np.asarray(cov)

        # the robust location must agree closely (both reject the outliers)
        np.testing.assert_allclose(mu, mcd.location_, atol=0.02)

        # covariance parity vs the empirical covariance of sklearn's OWN
        # support set (sklearn then applies consistency+reweighting factors
        # we deliberately omit — documented divergence; the apples-to-apples
        # quantity is the h-subset scatter)
        sup = samples[mcd.support_]
        emp = np.cov(sup.T, bias=True)
        scale = np.trace(cov) / np.trace(emp)
        assert 0.5 < scale < 2.0
        # correlation structure matches
        def corr(m):
            d = np.sqrt(np.diag(m))
            return m / np.outer(d, d)
        np.testing.assert_allclose(corr(cov), corr(emp), atol=0.35)

    def test_outlier_rejection_matches(self):
        """Both implementations must exclude the planted outliers from the
        support (location far closer to the inlier mean than the
        contaminated mean)."""
        from sklearn.covariance import MinCovDet

        samples, true_mean = self._samples(seed=7)
        contaminated_mean = samples.mean(0)
        mcd = MinCovDet(support_fraction=0.8, random_state=0).fit(samples)
        mu, _, _ = estimate_pose_covariance(
            jnp.asarray(samples), jnp.ones(len(samples), bool))
        mu = np.asarray(mu)
        for est in (mu, mcd.location_):
            assert np.linalg.norm(est - true_mean) < 0.05
            assert (np.linalg.norm(est - true_mean)
                    < 0.25 * np.linalg.norm(contaminated_mean - true_mean))
        # and the two agree with each other
        np.testing.assert_allclose(mu, mcd.location_, atol=0.02)
