"""Online DVL-scale calibration in the Gauss-Newton smoother.

A global log-scale variable makes the odometry's multiplicative velocity
bias observable from the (metric) sonar scan-match factors — the framework
capability identified by the round-2 error budget as the dominant
full-config ATE term. No reference equivalent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.geometry import se2_between
from sonar_slam_tpu.graph.factor_graph import (
    GraphConfig,
    add_between,
    add_prior,
    graph_init,
    optimize,
    optimize_with_marginal,
    set_pose_estimate,
    sigmas_to_sqrt_info,
)

TRUE_SCALE = 1.02  # DVL reads 2% long


def _build_graph(estimate_scale, n=12, metric_every=1, seed=0,
                 scale_xy=(TRUE_SCALE, TRUE_SCALE)):
    """Chain of poses on an arc; odometry measurements scaled per axis by
    ``scale_xy`` (scaled=True), exact metric between-factors every
    `metric_every` steps (scaled=False, the SSM analog). Heading crabs 0.3
    rad off the track tangent so both body axes carry translation (a
    tangent-aligned chain leaves the y-scale unobservable — physics, not a
    solver limitation)."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 1.2, n)
    truth = np.stack([10 * np.sin(th), 10 * (1 - np.cos(th)), th - 0.3],
                     -1).astype(np.float32)
    cfg = GraphConfig(max_poses=n, max_factors=3 * n, gn_iters=12,
                      estimate_scale=estimate_scale, scale_prior_sigma=0.1)
    sxy = np.array([scale_xy[0], scale_xy[1], 1.0], np.float32)
    g = graph_init(cfg)
    g = add_prior(g, truth[0], sigmas_to_sqrt_info([0.01, 0.01, 0.001]))
    for k in range(n):
        # initialize values from the SCALED odometry chain (what DR gives)
        g = set_pose_estimate(g, k, truth[k] * sxy)
    for k in range(n - 1):
        z = np.asarray(se2_between(jnp.asarray(truth[k]),
                                   jnp.asarray(truth[k + 1])))
        z_odo = z * sxy
        g = add_between(g, k, k + 1, jnp.asarray(z_odo),
                        sigmas_to_sqrt_info([0.02, 0.02, 0.002]), scaled=True)
        if k % metric_every == 0:
            z_m = z + rng.normal(scale=0.002, size=3).astype(np.float32)
            g = add_between(g, k, k + 1, jnp.asarray(z_m),
                            sigmas_to_sqrt_info([0.02, 0.02, 0.002]))
    return g, cfg, truth


def test_recovers_scale_and_poses():
    g, cfg, truth = _build_graph(estimate_scale=True)
    g = optimize(g, cfg)
    est_scale = np.exp(np.asarray(g.log_scale))
    # the measurement model is z_eff = exp(log_s) * z_odo with z_odo already
    # TRUE_SCALE * z; consistency requires exp(log_s) ~= 1 / TRUE_SCALE
    # (exp(log_scale) is the CORRECTION factor, the inverse of the bias)
    assert est_scale == pytest.approx(1.0 / TRUE_SCALE, abs=0.004)
    poses = np.asarray(g.poses)
    err = np.linalg.norm(poses[:, :2] - truth[:, :2], axis=1)
    assert err.max() < 0.05, err.max()


def test_recovers_per_axis_scale():
    """The simulator injects a PER-AXIS DVL scale (io/simulate.py); the
    two-variable model must recover each axis independently."""
    g, cfg, truth = _build_graph(estimate_scale=True, scale_xy=(1.03, 0.98))
    g = optimize(g, cfg)
    est = np.exp(np.asarray(g.log_scale))
    assert est[0] == pytest.approx(1.0 / 1.03, abs=0.004)
    assert est[1] == pytest.approx(1.0 / 0.98, abs=0.004)


def test_without_estimation_scale_stays_fixed():
    g, cfg, truth = _build_graph(estimate_scale=False)
    g = optimize(g, cfg)
    assert np.all(np.asarray(g.log_scale) == 0.0)
    # poses compromise between the conflicting scaled/metric factors
    poses = np.asarray(g.poses)
    err_off = np.linalg.norm(poses[:, :2] - truth[:, :2], axis=1).max()
    g2, cfg2, _ = _build_graph(estimate_scale=True)
    g2 = optimize(g2, cfg2)
    err_on = np.linalg.norm(
        np.asarray(g2.poses)[:, :2] - truth[:, :2], axis=1).max()
    assert err_on < err_off  # calibration strictly improves the fit


def test_scale_prior_holds_without_metric_factors():
    """With no metric anchor the scale is unobservable — the prior must keep
    it near nominal instead of drifting."""
    n = 8
    th = np.linspace(0, 0.8, n)
    truth = np.stack([5 * np.sin(th), 5 * (1 - np.cos(th)), th],
                     -1).astype(np.float32)
    cfg = GraphConfig(max_poses=n, max_factors=2 * n, gn_iters=10,
                      estimate_scale=True, scale_prior_sigma=0.05)
    g = graph_init(cfg)
    g = add_prior(g, truth[0], sigmas_to_sqrt_info([0.01, 0.01, 0.001]))
    for k in range(n):
        g = set_pose_estimate(g, k, truth[k])
    for k in range(n - 1):
        z = np.asarray(se2_between(jnp.asarray(truth[k]),
                                   jnp.asarray(truth[k + 1])))
        g = add_between(g, k, k + 1, jnp.asarray(z),
                        sigmas_to_sqrt_info([0.02, 0.02, 0.002]), scaled=True)
    g = optimize(g, cfg)
    assert np.all(np.abs(np.asarray(g.log_scale)) < 1e-3)


def test_marginal_covariance_with_scale_variable():
    g, cfg, _ = _build_graph(estimate_scale=True)
    g, cov = optimize_with_marginal(g, 5, cfg)
    cov = np.asarray(cov)
    assert cov.shape == (3, 3)
    assert np.isfinite(cov).all()
    assert (np.diag(cov) > 0).all()


def test_standalone_marginal_covariance_with_scale_variable():
    """Round-3 verdict bug: `marginal_covariance` sized its solve vector
    `3K+1` while the normal equations are `3K+2` wide under
    estimate_scale=True, so `cho_solve` raised on every scale-enabled config
    (the shipped full production config). Must match the fused-path
    `optimize_with_marginal` covariance exactly."""
    from sonar_slam_tpu.graph.factor_graph import marginal_covariance

    g, cfg, _ = _build_graph(estimate_scale=True)
    g, cov_fused = optimize_with_marginal(g, 5, cfg)
    cov_standalone = np.asarray(marginal_covariance(g, 5, cfg))
    assert cov_standalone.shape == (3, 3)
    assert np.isfinite(cov_standalone).all()
    np.testing.assert_allclose(cov_standalone, np.asarray(cov_fused),
                               rtol=1e-5, atol=1e-9)


def test_smoother_marginal_covariance_with_scale():
    """Smoother facade path under estimate_scale=True (crashed pre-fix)."""
    from sonar_slam_tpu.graph.factor_graph import Smoother

    cfg = GraphConfig(max_poses=8, max_factors=32, gn_iters=8,
                      estimate_scale=True, scale_prior_sigma=0.05)
    s = Smoother(cfg)
    s.add_prior([0, 0, 0], [0.01, 0.01, 0.001])
    s.insert(0, [0, 0, 0])
    s.add_odometry(0, 1, [1.0, 0.0, 0.1], [0.1, 0.1, 0.01])
    s.insert(1, [1.0, 0.0, 0.1])
    s.update()
    cov = np.asarray(s.marginal_covariance(1))
    assert cov.shape == (3, 3)
    assert np.isfinite(cov).all() and (np.diag(cov) > 0).all()


@pytest.mark.parametrize(
    # no list case: GraphConfig rides through jit static args, so values
    # must stay hashable — tuple is the supported sequence form
    "sp", [0.05, 1, np.float64(0.05), np.float32(0.05), (0.05, 0.01)]
)
def test_scale_prior_sigma_scalar_types(sp):
    """ADVICE r3: int / np.floating scalars raised TypeError in the
    tuple-unpack of scale_prior_sigma. Any scalar type or 2-sequence must
    assemble."""
    n = 4
    cfg = GraphConfig(max_poses=n, max_factors=2 * n, gn_iters=4,
                      estimate_scale=True, scale_prior_sigma=sp)
    g = graph_init(cfg)
    g = add_prior(g, [0, 0, 0], sigmas_to_sqrt_info([0.01, 0.01, 0.001]))
    for k in range(n):
        g = set_pose_estimate(g, k, [float(k), 0.0, 0.0])
    for k in range(n - 1):
        g = add_between(g, k, k + 1, jnp.asarray([1.0, 0.0, 0.0]),
                        sigmas_to_sqrt_info([0.02, 0.02, 0.002]), scaled=True)
    g = optimize(g, cfg)
    assert np.isfinite(np.asarray(g.poses)).all()


def test_scale_anchor_pins_log_scale():
    """GraphState.log_scale_anchor + a tight prior must pin the optimized
    scale at the anchor even when the factors' least-squares optimum
    disagrees (the refine-stage direct-measurement mechanism)."""
    n = 6
    cfg = GraphConfig(max_poses=n, max_factors=4 * n, gn_iters=12,
                      estimate_scale=True, scale_prior_sigma=(0.002, 0.002))
    g = graph_init(cfg)
    g = add_prior(g, [0, 0, 0], sigmas_to_sqrt_info([0.01, 0.01, 0.001]))
    for k in range(n):
        g = set_pose_estimate(g, k, [2.0 * k, 0.0, 0.0])
    for k in range(n - 1):
        # scaled odometry says 2.0; metric registration says 2.06 (the
        # factor optimum for exp(log_sx) would be ~1.03)
        g = add_between(g, k, k + 1, jnp.asarray([2.0, 0.0, 0.0]),
                        sigmas_to_sqrt_info([0.05, 0.05, 0.005]),
                        scaled=True)
        g = add_between(g, k, k + 1, jnp.asarray([2.06, 0.0, 0.0]),
                        sigmas_to_sqrt_info([0.02, 0.02, 0.002]))
    anchor = jnp.asarray([np.log(1.03), 0.0], jnp.float32)
    g = g._replace(log_scale_anchor=anchor, log_scale=anchor)
    g = optimize(g, cfg)
    np.testing.assert_allclose(np.asarray(g.log_scale), np.asarray(anchor),
                               atol=2e-3)
    # and with the default zero anchor + the same tight prior, the scale
    # stays pinned at nominal instead
    g0 = graph_init(cfg)
    g0 = add_prior(g0, [0, 0, 0], sigmas_to_sqrt_info([0.01, 0.01, 0.001]))
    for k in range(n):
        g0 = set_pose_estimate(g0, k, [2.0 * k, 0.0, 0.0])
    for k in range(n - 1):
        g0 = add_between(g0, k, k + 1, jnp.asarray([2.0, 0.0, 0.0]),
                         sigmas_to_sqrt_info([0.05, 0.05, 0.005]),
                         scaled=True)
        g0 = add_between(g0, k, k + 1, jnp.asarray([2.06, 0.0, 0.0]),
                         sigmas_to_sqrt_info([0.02, 0.02, 0.002]))
    g0 = optimize(g0, cfg)
    assert abs(float(g0.log_scale[0])) < 2e-3


def test_refine_anchor_recovers_injected_dvl_scale():
    """End-to-end mechanism test: stretch a synthetic survey's DR poses by
    a known factor (the DVL reading long), run the refinement pass with
    refine_scale_from_chain, and the anchored estimate must recover the
    injected factor from the chain ratios to ~0.3%."""
    import os
    import sys as _s

    repo_tests = os.path.dirname(os.path.abspath(__file__))
    if repo_tests not in _s.path:
        _s.path.insert(0, repo_tests)
    from test_refine import _build_carry, _dims, _params

    s_true = 1.02  # DR distances read 2% long
    dims = _dims(refine_iters=2, refine_sweep=True, refine_chain=True,
                 refine_scale_from_chain=True, estimate_dvl_scale=True,
                 gn_iters=8)
    carry, truth = _build_carry(dims, with_loop=False)
    # mark the odometry factors scaled (the synthetic builder adds plain
    # betweens; factor k-1 connects (k-1, k)), then stretch the scaled
    # measurements and the raw DR poses: the DVL reads long, sonar clouds
    # stay metric
    K = dims.max_keyframes
    g = carry.graph
    scaled = jnp.zeros_like(g.f_scaled).at[: K - 1].set(True)
    stretch = jnp.asarray([s_true, s_true, 1.0])
    g = g._replace(
        f_scaled=scaled,
        f_z=jnp.where(scaled[:, None], g.f_z * stretch, g.f_z),
    )
    carry = carry._replace(
        graph=g,
        dr_poses=carry.dr_poses * stretch,
    )

    from sonar_slam_tpu.slam.refine import RefineParams, refine_loops

    params = _params(dims)
    out = refine_loops(carry, params, RefineParams.default(), dims)
    est = float(np.exp(np.asarray(out.graph.log_scale))[0])
    # chain registrations are metric; DR deltas are stretched by s_true, so
    # exp(log_sx) must converge to 1/s_true
    np.testing.assert_allclose(est, 1.0 / s_true, atol=0.003)


def test_get_states_and_pose_uncertainty_with_scale_config():
    """get_states(refresh_covs=True) and services.query_pose_uncertainty on
    an estimate_dvl_scale=True SlamDims — the two shipped-config consumers
    that crashed in round 3 (io/state.py:60, slam/services.py:73)."""
    from sonar_slam_tpu.io.state import get_states
    from sonar_slam_tpu.slam.core import SlamDims, slam_init
    from sonar_slam_tpu.slam.services import query_pose_uncertainty

    dims = SlamDims(max_keyframes=8, max_points=16, target_capacity=32,
                    max_loops=4, pcm_queue_slots=3, estimate_dvl_scale=True)
    carry = slam_init(dims)
    graph = carry.graph
    graph = add_prior(graph, [0.0, 0.0, 0.0],
                      sigmas_to_sqrt_info([0.01, 0.01, 0.001]))
    graph = set_pose_estimate(graph, 1, [1.0, 0.0, 0.0])
    graph = add_between(graph, 0, 1, jnp.asarray([1.0, 0.0, 0.0]),
                        sigmas_to_sqrt_info([0.1, 0.1, 0.01]), scaled=True)
    graph = optimize(graph, dims.graph_config())
    carry = carry._replace(
        graph=graph,
        num_kf=jnp.asarray(2, jnp.int32),
        times=carry.times.at[:2].set(jnp.asarray([10.0, 11.0])),
        poses=graph.poses[: carry.poses.shape[0]],
    )
    st = get_states(carry, dims, refresh_covs=True)
    assert len(st) == 2
    assert np.isfinite(st["cov"]).all()
    covs = np.asarray(
        query_pose_uncertainty(carry, dims, jnp.asarray([0, 1]))
    )
    assert covs.shape == (2, 3, 3)
    assert np.isfinite(covs).all()


# ---------------------------------------------------------------------------
# round 4: joint per-axis solve from DVL basis integrals


def _simulate_ticks(sx, sy, crab=0.07, speed=0.5, duration=200.0, hz=5.0,
                    noise=0.0, seed=0):
    """Square-ish survey with four turns; body velocity mostly forward with
    a small lateral (crab) component; DVL stretched per axis by (sx, sy).
    Returns (DRTicks with STRETCHED velocities, true planar poses (T, 3))."""
    from sonar_slam_tpu.estimators import DRTicks

    rng = np.random.default_rng(seed)
    t = np.arange(0.0, duration, 1.0 / hz).astype(np.float32)
    T = len(t)
    # heading: straight legs + smooth 90-degree turns
    seg = T // 8
    rate = np.zeros(T, np.float32)
    for i in range(1, 8, 2):
        rate[i * seg:(i + 1) * seg] = (np.pi / 2) / (seg / hz)
    yaw = np.cumsum(rate / hz).astype(np.float32)
    v_body = np.stack([
        np.full(T, speed * np.cos(crab), np.float32),
        np.full(T, speed * np.sin(crab), np.float32),
        np.zeros(T, np.float32),
    ], -1)
    # truth: integrate the UNstretched velocity with the DR's exact
    # semantics (delta rotated by the PREVIOUS tick's yaw; first tick only
    # initializes) so the chain measurements and the basis integrals see
    # the same discretization — in the real pipeline both sides live on
    # the same sensor stream, so this is representative, not a fudge
    dt = 1.0 / hz
    yaw_prev = np.concatenate([yaw[:1], yaw[:-1]])
    cy, sy_ = np.cos(yaw_prev), np.sin(yaw_prev)
    dx = (cy * v_body[:, 0] - sy_ * v_body[:, 1]) * dt
    dy = (sy_ * v_body[:, 0] + cy * v_body[:, 1]) * dt
    dx[0] = dy[0] = 0.0
    truth = np.stack([np.cumsum(dx), np.cumsum(dy), yaw], -1)
    vel = v_body * np.array([sx, sy, 1.0], np.float32)
    vel = vel + rng.normal(scale=noise, size=vel.shape).astype(np.float32)
    ticks = DRTicks(
        time=jnp.asarray(t),
        vel=jnp.asarray(vel, jnp.float32),
        euler=jnp.asarray(np.stack(
            [np.zeros(T), np.zeros(T), yaw], -1), jnp.float32),
        gyro_yaw=jnp.zeros(T, jnp.float32),
        depth=jnp.zeros(T, jnp.float32),
        valid=jnp.ones(T, bool),
    )
    return ticks, truth


def _basis_solve(sx, sy, crab):
    from sonar_slam_tpu.estimators import DRConfig, dvl_basis_scan
    from sonar_slam_tpu.geometry import se2_between
    from sonar_slam_tpu.slam.refine import solve_scale_from_basis

    ticks, truth = _simulate_ticks(sx, sy, crab=crab)
    cfg = DRConfig(roll_offset=0.0)
    basis = dvl_basis_scan(ticks, cfg)
    # keyframes every ~6 s
    kf = np.arange(0, len(truth), 30)
    tk = jnp.asarray(truth[kf], jnp.float32)
    chain_z = jax.vmap(se2_between)(
        jnp.concatenate([tk[:1], tk[:-1]]), tk)  # k-1 -> k (k=0 unused)
    ok = jnp.arange(len(kf)) >= 1
    # dr heading at keyframes: the sim feeds yaw directly (no drift here)
    log_c, enough = solve_scale_from_basis(
        ok, chain_z, basis[kf], jnp.asarray(truth[kf, 2]),
        prior_sigma=(0.05, 0.01),
    )
    assert bool(enough)
    c = np.exp(np.asarray(log_c))
    return 1.0 / c[0], 1.0 / c[1]


@pytest.mark.parametrize("sx,sy", [(1.02, 0.99), (0.985, 1.012)])
def test_basis_solve_crab_trajectory(sx, sy):
    """On a realistic crab trajectory (4 deg): x recovers to <0.2%; y is
    weakly observed (lateral VELOCITY is tiny — turns rotate the x
    velocity, which the basis decomposition correctly attributes to the x
    axis) so the prior shrinks it toward nominal. The contract: y moves
    TOWARD truth, never past it, and never produces the ±4% garbage the
    per-interval ratio median measured on turning intervals."""
    est_sx, est_sy = _basis_solve(sx, sy, crab=0.07)
    assert abs(est_sx - sx) < 0.002, (est_sx, sx)
    assert abs(est_sy - sy) < abs(1.0 - sy), (est_sy, sy)  # beats nominal
    assert (est_sy - 1.0) * (sy - 1.0) >= 0.0  # correct side of nominal


def test_basis_solve_traced_prior_matches_tuple():
    """RefineParams.scale_prior_sigma is a traced (2,) array; feeding the
    solver the array must bit-match the former static tuple path (the
    round-4 refactor that made the prior sweepable without recompiles)."""
    from sonar_slam_tpu.estimators import DRConfig, dvl_basis_scan
    from sonar_slam_tpu.geometry import se2_between
    from sonar_slam_tpu.slam.refine import solve_scale_from_basis

    ticks, truth = _simulate_ticks(1.015, 0.99, crab=0.07)
    basis = dvl_basis_scan(ticks, DRConfig(roll_offset=0.0))
    kf = np.arange(0, len(truth), 30)
    tk = jnp.asarray(truth[kf], jnp.float32)
    chain_z = jax.vmap(se2_between)(jnp.concatenate([tk[:1], tk[:-1]]), tk)
    ok = jnp.arange(len(kf)) >= 1
    a, _ = solve_scale_from_basis(ok, chain_z, basis[kf],
                                  jnp.asarray(truth[kf, 2]),
                                  prior_sigma=(0.05, 0.01))
    b, _ = solve_scale_from_basis(ok, chain_z, basis[kf],
                                  jnp.asarray(truth[kf, 2]),
                                  prior_sigma=jnp.asarray(
                                      [0.05, 0.01], jnp.float32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a near-pin y prior keeps the weak axis at nominal
    c, _ = solve_scale_from_basis(ok, chain_z, basis[kf],
                                  jnp.asarray(truth[kf, 2]),
                                  prior_sigma=jnp.asarray(
                                      [0.05, 1e-4], jnp.float32))
    assert abs(float(np.exp(np.asarray(c))[1]) - 1.0) < 1e-3


def test_basis_solve_lateral_rich():
    """With genuine lateral motion (20 deg crab) BOTH axes recover to
    <0.25% — the y information is real when the physics provides it."""
    est_sx, est_sy = _basis_solve(1.02, 0.99, crab=0.35)
    assert abs(est_sx - 1.02) < 0.0025, est_sx
    assert abs(est_sy - 0.99) < 0.0025, est_sy


def test_basis_decomposition_is_exact():
    """cx*basis_x + cy*basis_y reproduces the DR of per-axis-corrected
    velocities (the linearity the solver relies on)."""
    from sonar_slam_tpu.estimators import (
        DRConfig, dead_reckoning_scan, dvl_basis_scan,
    )

    ticks, _ = _simulate_ticks(1.03, 0.97)
    cfg = DRConfig(roll_offset=0.0)
    basis = dvl_basis_scan(ticks, cfg)
    cx, cy = 1.0 / 1.03, 1.0 / 0.97
    corrected = ticks._replace(
        vel=ticks.vel * jnp.asarray([cx, cy, 1.0], jnp.float32))
    _, poses = dead_reckoning_scan(corrected, cfg)
    recon = cx * basis[:, 0] + cy * basis[:, 1]
    np.testing.assert_allclose(
        np.asarray(poses[:, :2]), np.asarray(recon), atol=1e-4)


def test_fused_basis_scan_bit_identical():
    """dead_reckoning_with_basis_scan (one vmapped scan) must reproduce the
    three separate passes bit-for-bit: every op in dead_reckoning_step is
    elementwise, so batching the velocity-mask lanes cannot change per-lane
    rounding. Guards the bench/pipeline fast path."""
    from sonar_slam_tpu.estimators import (
        DRConfig, dead_reckoning_scan, dead_reckoning_with_basis_scan,
        dvl_basis_scan,
    )

    ticks, _ = _simulate_ticks(1.02, 0.99, crab=0.07)
    # exercise the over-speed gate + invalid ticks in the fused path too
    vel = np.asarray(ticks.vel).copy()
    vel[40:44] *= 8.0
    valid = np.asarray(ticks.valid).copy()
    valid[100:103] = False
    ticks = ticks._replace(vel=jnp.asarray(vel), valid=jnp.asarray(valid))
    cfg = DRConfig(roll_offset=0.0)
    _, p_ref = dead_reckoning_scan(ticks, cfg)
    b_ref = dvl_basis_scan(ticks, cfg)
    p_f, b_f = dead_reckoning_with_basis_scan(ticks, cfg)
    assert bool((p_f == p_ref).all())
    assert bool((b_f == b_ref).all())
