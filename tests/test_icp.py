import numpy as np
import jax
import jax.numpy as jnp

from sonar_slam_tpu.cloud import ICPConfig, icp, icp_multistart
from sonar_slam_tpu.geometry import se2_transform_points, se2_between, se2_inverse

rng = np.random.default_rng(3)


def make_cloud(n=200, capacity=256):
    """An L-shaped wall structure (gives ICP full SE(2) observability)."""
    t = rng.uniform(0, 1, size=n)
    wall1 = np.stack([10 * t[: n // 2], np.zeros(n // 2)], -1)
    wall2 = np.stack([np.zeros(n - n // 2), 8 * t[n // 2 :]], -1)
    pts = np.concatenate([wall1, wall2]) + rng.normal(scale=0.02, size=(n, 2))
    out = np.zeros((capacity, 2), np.float32)
    out[:n] = pts
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask)


TIGHT = ICPConfig(min_diff_rot=1e-4, min_diff_trans=1e-3)


def test_icp_reference_checker_stops_early():
    """With the reference icp.yaml thresholds (minDiffTransErr=0.1 m) the
    differential checker stops while refinement steps are still ~5 cm —
    faithful to libpointmatcher's semantics. Accuracy tests use TIGHT."""
    tgt, tmask = make_cloud()
    true = jnp.asarray([0.4, -0.3, 0.1], jnp.float32)
    src = se2_transform_points(tgt, se2_inverse(true))
    res = icp(src, tmask, tgt, tmask, jnp.zeros(3), ICPConfig())
    assert bool(res.ok) and bool(res.converged)
    assert int(res.iterations) < 40


def test_icp_recovers_known_transform():
    tgt, tmask = make_cloud()
    true = jnp.asarray([0.4, -0.3, 0.1], jnp.float32)
    # source points are the target observed from pose `true`:
    # target = true ∘ source  =>  source = true⁻¹(target)
    src = se2_transform_points(tgt, se2_inverse(true))
    res = icp(src, tmask, tgt, tmask, jnp.zeros(3), TIGHT)
    assert bool(res.ok)
    est = np.asarray(res.pose)
    np.testing.assert_allclose(est, np.asarray(true), atol=1e-3)


def test_icp_uses_guess_basin():
    tgt, tmask = make_cloud()
    true = jnp.asarray([1.5, 0.8, 0.3], jnp.float32)
    src = se2_transform_points(tgt, se2_inverse(true))
    good = icp(src, tmask, tgt, tmask, true + 0.05, TIGHT)
    np.testing.assert_allclose(np.asarray(good.pose), np.asarray(true), atol=3e-2)


def test_icp_fails_on_empty_source():
    tgt, tmask = make_cloud()
    src = jnp.zeros_like(tgt)
    smask = jnp.zeros(tgt.shape[0], bool)
    res = icp(src, smask, tgt, tmask, jnp.zeros(3), ICPConfig())
    assert not bool(res.ok)


def test_icp_trimming_rejects_outliers():
    tgt, tmask = make_cloud()
    true = jnp.asarray([0.3, 0.2, 0.05], jnp.float32)
    src = np.array(se2_transform_points(tgt, se2_inverse(true)))
    # corrupt 15% of the source with far-away junk
    n_bad = 30
    src[:n_bad] = rng.uniform(30, 60, size=(n_bad, 2))
    res = icp(jnp.asarray(src), tmask, tgt, tmask, jnp.zeros(3), TIGHT)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(true), atol=5e-2)


def test_icp_multistart_vmaps():
    tgt, tmask = make_cloud()
    true = jnp.asarray([0.5, -0.2, 0.15], jnp.float32)
    src = se2_transform_points(tgt, se2_inverse(true))
    guesses = jnp.stack(
        [
            jnp.zeros(3),
            true + jnp.asarray([0.1, -0.1, 0.02]),
            jnp.asarray([5.0, 5.0, 1.0]),  # bad basin
            jnp.zeros(3),  # padded out
        ]
    )
    gmask = jnp.asarray([True, True, True, False])
    res = icp_multistart(src, tmask, tgt, tmask, guesses, gmask, TIGHT)
    assert res.pose.shape == (4, 3)
    assert not bool(res.ok[3])  # masked guess can't be a sample
    est = np.asarray(res.pose[:2])
    np.testing.assert_allclose(est, np.tile(np.asarray(true), (2, 1)), atol=3e-2)


def test_icp_jit_compiles_once():
    tgt, tmask = make_cloud()
    src = tgt
    f = jax.jit(lambda g: icp(src, tmask, tgt, tmask, g, ICPConfig()))
    r1 = f(jnp.zeros(3))
    r2 = f(jnp.asarray([0.1, 0.1, 0.01]))
    assert bool(r1.ok) and bool(r2.ok)


def test_weighted_icp_downweights_low_confidence_outliers():
    """Round-5 confidence channel: per-point source/target weights enter the
    SOLVE (not the gates). A cluster of consistently-shifted low-confidence
    points inside the correspondence radius biases the unweighted solve;
    weighting them near zero recovers the true transform. All-ones weights
    reproduce the unweighted result bit-for-bit."""
    tgt, tmask = make_cloud()
    true = jnp.asarray([0.25, -0.2, 0.05], jnp.float32)
    src = se2_transform_points(tgt, se2_inverse(true))
    # poison: copy 60 source points shifted 1.2 m along the first wall's
    # tangent (inside outlier_max_dist=3) so they drag the solution
    src_np = np.array(src)
    msk = np.asarray(tmask).copy()
    poison = src_np[:60] + np.asarray([1.2, 0.6])
    src_np[200:256] = poison[:56]
    msk[200:256] = True
    srcp = jnp.asarray(src_np)
    mskp = jnp.asarray(msk)

    cfg = ICPConfig(min_diff_rot=1e-4, min_diff_trans=1e-3, trim_ratio=1.0)
    res_plain = icp(srcp, mskp, tgt, tmask, jnp.zeros(3), cfg)
    err_plain = float(np.linalg.norm(
        np.asarray(res_plain.pose)[:2] - np.asarray(true)[:2]))

    w = np.ones(256, np.float32)
    w[200:] = 0.02  # low-confidence channel for the poison
    res_w = icp(srcp, mskp, tgt, tmask, jnp.zeros(3), cfg,
                source_weights=jnp.asarray(w))
    err_w = float(np.linalg.norm(
        np.asarray(res_w.pose)[:2] - np.asarray(true)[:2]))
    assert err_plain > 0.1, err_plain  # the poison really bites unweighted
    assert err_w < 0.05, (err_w, err_plain)

    # all-ones weights == unweighted, bit-for-bit
    res_ones = icp(srcp, mskp, tgt, tmask, jnp.zeros(3), cfg,
                   source_weights=jnp.ones(256, jnp.float32),
                   target_weights=jnp.ones(256, jnp.float32))
    np.testing.assert_array_equal(np.asarray(res_ones.pose),
                                  np.asarray(res_plain.pose))
