"""Masked fixed-capacity SE(2) factor graph with Gauss-Newton solves.

Factor model mirrors the reference graph exactly
(`/root/reference/bruce_slam/src/bruce_slam/slam.py`):

* one ``PriorFactorPose2`` on X(0)                      (`slam.py:426-436`)
* ``BetweenFactorPose2`` odometry / SSM / loop factors  (`slam.py:438-454,
  804-824, 1105-1130`)
* diagonal, full-covariance Gaussian, and Cauchy-robust noise models
  (`slam.py:1163-1208`)

Residuals use gtsam's conventions: error = Logmap(z⁻¹ ∘ (xi⁻¹ ∘ xj)) in the
measurement tangent, with the Expmap retraction. Jacobians come from forward-
mode autodiff of that exact residual (no hand-linearization), vmapped over the
factor table; the normal equations are assembled with scatter-adds into a
dense (3K, 3K) system and solved by Cholesky — both MXU-native.

Everything is a pytree of fixed-shape arrays, so the whole smoother can live
inside a ``lax.scan`` step and be checkpointed by serializing the pytree.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import (
    se2_between,
    se2_inverse,
    se2_compose,
    se2_logmap,
    se2_retract,
)


class GraphConfig(NamedTuple):
    max_poses: int = 256
    max_factors: int = 1024
    gn_iters: int = 6  # max relinearization sweeps per update
    damping: float = 1e-9  # tiny LM damping for numerical safety
    convergence_tol: float = 1e-5  # early exit when max |delta| drops below
    # trust-region clamp on each GN sweep's step: a full step whose largest
    # translation / rotation component exceeds these is uniformly scaled
    # down (direction preserved). Generous defaults that never bind on a
    # healthy solve — they only stop a bad linearization under tight
    # information weights (cm-level refined floors) from launching poses
    # into a divergent orbit. 0 disables.
    step_clamp_t: float = 2.0  # m
    step_clamp_r: float = 0.5  # rad
    # online sensor-scale calibration: solve two extra global variables
    # log_scale = (log_sx, log_sy), one per body axis (the DVL's beam
    # geometry biases each velocity axis independently). Factors flagged
    # `scaled` (odometry) have their measured translation CORRECTED as
    # z_eff = (z_x * exp(log_sx), z_y * exp(log_sy)) inside the residual,
    # while unflagged factors (sonar scan matching — metric by physics)
    # anchor the scale. So exp(log_scale) is the correction factor: for a
    # DVL with multiplicative bias s (measures s * true velocity) the
    # solver recovers exp(log_scale) ~= 1/s. The classic DVL-scale-bias
    # shape error becomes observable from the loop/SSM factors. No
    # reference equivalent (GTSAM could, the reference doesn't); a
    # framework capability beyond parity.
    estimate_scale: bool = False
    # prior sigma on log_scale: scalar (both axes) or per-axis (sx, sy)
    # tuple. The y axis deserves a much tighter prior than x on survey
    # trajectories: lateral body velocity is a small fraction of forward
    # (crab/sway only), so the y scale is weakly observed and, left loose,
    # absorbs noise — measured to run away by 2-3% while x stays calibrated.
    scale_prior_sigma: float | tuple = 0.05


class GraphState(NamedTuple):
    poses: jax.Array  # (K, 3) current estimates
    num_poses: jax.Array  # int32
    prior_pose: jax.Array  # (3,)
    prior_sqrt_info: jax.Array  # (3, 3) whitening matrix (0 until set)
    f_i: jax.Array  # (F,) int32 source key
    f_j: jax.Array  # (F,) int32 target key
    f_z: jax.Array  # (F, 3) measurement xi->xj
    f_sqrt_info: jax.Array  # (F, 3, 3) whitening matrices
    f_robust: jax.Array  # (F,) bool Cauchy flag
    f_scaled: jax.Array  # (F,) bool: measurement corrected by exp(log_scale)
    num_factors: jax.Array  # int32
    log_scale: jax.Array  # (2,) per-axis log correction (0 = nominal)
    # prior center for log_scale. Default 0 (nominal). The refinement pass
    # can set it to a DIRECTLY-measured value (median ratio of refined
    # chain registrations to raw DR deltas, slam/refine.py) and pin the
    # variable there with a tight prior — the in-graph least-squares
    # estimate is systematically shrunk whenever refined factors are
    # Cauchy-robustified (a consistent 2% scale miss over a 3 m interval
    # is ~1.4 whitened sigmas at the 5 cm floor -> weight ~1/3), while the
    # measurement-domain median is immune to factor weighting.
    log_scale_anchor: jax.Array  # (2,)


def sigmas_to_sqrt_info(sigmas) -> jax.Array:
    """Diagonal noise model -> whitening matrix (gtsam Diagonal.Sigmas)."""
    return jnp.diag(1.0 / jnp.asarray(sigmas, jnp.float32))


def cov_to_sqrt_info(cov: jax.Array) -> jax.Array:
    """Full covariance -> whitening matrix via Cholesky of the information.

    Equivalent to gtsam.noiseModel.Gaussian.Covariance (`slam.py:1163-1175`).
    """
    info = jnp.linalg.inv(jnp.asarray(cov, jnp.float32))
    # symmetrize for numerical safety before factorizing
    info = 0.5 * (info + info.T)
    return jnp.linalg.cholesky(info).T  # upper-triangular R with RᵀR = info


def graph_init(config: GraphConfig) -> GraphState:
    K, F = config.max_poses, config.max_factors
    return GraphState(
        poses=jnp.zeros((K, 3), jnp.float32),
        num_poses=jnp.asarray(0, jnp.int32),
        prior_pose=jnp.zeros(3, jnp.float32),
        prior_sqrt_info=jnp.zeros((3, 3), jnp.float32),
        f_i=jnp.zeros((F,), jnp.int32),
        f_j=jnp.zeros((F,), jnp.int32),
        f_z=jnp.zeros((F, 3), jnp.float32),
        f_sqrt_info=jnp.zeros((F, 3, 3), jnp.float32),
        f_robust=jnp.zeros((F,), bool),
        f_scaled=jnp.zeros((F,), bool),
        num_factors=jnp.asarray(0, jnp.int32),
        log_scale=jnp.zeros(2, jnp.float32),
        log_scale_anchor=jnp.zeros(2, jnp.float32),
    )


def add_prior(state: GraphState, pose, sqrt_info) -> GraphState:
    """Anchor X(0) (`SLAM.add_prior`, `slam.py:426-436`) and insert its value."""
    state = state._replace(
        prior_pose=jnp.asarray(pose, jnp.float32),
        prior_sqrt_info=jnp.asarray(sqrt_info, jnp.float32),
    )
    return set_pose_estimate(state, 0, pose)._replace(
        num_poses=jnp.maximum(state.num_poses, 1)
    )


def add_between(
    state: GraphState, i, j, z, sqrt_info, robust=False, enabled=True,
    scaled=False,
) -> GraphState:
    """Append a BetweenFactorPose2 (masked no-op when ``enabled`` is False).

    ``scaled`` marks the measurement's translation as proportional to the
    global sensor scale (see GraphConfig.estimate_scale)."""
    slot = state.num_factors
    en = jnp.asarray(enabled)
    inc = en.astype(jnp.int32)
    # write into `slot` but zero the sqrt_info when disabled so a no-op write
    # can target slot 0 safely (it is overwritten only if enabled)
    safe = jnp.where(en, slot, jnp.asarray(state.f_i.shape[0] - 1, jnp.int32))
    return state._replace(
        f_i=state.f_i.at[safe].set(
            jnp.where(en, jnp.asarray(i, jnp.int32), state.f_i[safe])
        ),
        f_j=state.f_j.at[safe].set(
            jnp.where(en, jnp.asarray(j, jnp.int32), state.f_j[safe])
        ),
        f_z=state.f_z.at[safe].set(
            jnp.where(en, jnp.asarray(z, jnp.float32), state.f_z[safe])
        ),
        f_sqrt_info=state.f_sqrt_info.at[safe].set(
            jnp.where(en, jnp.asarray(sqrt_info, jnp.float32), state.f_sqrt_info[safe])
        ),
        f_robust=state.f_robust.at[safe].set(
            jnp.where(en, jnp.asarray(robust), state.f_robust[safe])
        ),
        f_scaled=state.f_scaled.at[safe].set(
            jnp.where(en, jnp.asarray(scaled), state.f_scaled[safe])
        ),
        num_factors=state.num_factors + inc,
    )


def set_pose_estimate(state: GraphState, k, pose) -> GraphState:
    """Insert/overwrite the initial value for key k (gtsam Values.insert)."""
    state = state._replace(
        poses=state.poses.at[jnp.asarray(k, jnp.int32)].set(
            jnp.asarray(pose, jnp.float32)
        )
    )
    return state._replace(
        num_poses=jnp.maximum(state.num_poses, jnp.asarray(k, jnp.int32) + 1)
    )


def _between_residual(xi, xj, z, sqrt_info):
    """Whitened gtsam BetweenFactorPose2 residual."""
    err = se2_logmap(se2_compose(se2_inverse(z), se2_between(xi, xj)))
    return jnp.matmul(sqrt_info, err, precision=jax.lax.Precision.HIGHEST)


def _factor_linearization(xi, xj, z, sqrt_info, robust):
    """Residual + Jacobians in the retraction tangent at the current estimate,
    with the Cauchy IRLS reweighting of gtsam's Robust(Cauchy(1.0)) model."""

    def f(delta):
        di, dj = delta[:3], delta[3:]
        return _between_residual(se2_retract(xi, di), se2_retract(xj, dj), z, sqrt_info)

    r = f(jnp.zeros(6))
    J = jax.jacfwd(f)(jnp.zeros(6))
    # Cauchy weight on the whitened norm (c = 1.0): w = 1 / (1 + ||r||^2)
    w = jnp.where(robust, 1.0 / (1.0 + jnp.sum(r * r)), 1.0)
    sw = jnp.sqrt(w)
    return sw * r, sw * J[:, :3], sw * J[:, 3:]


def _factor_linearization_scaled(xi, xj, z, sqrt_info, robust, scaled,
                                 log_scale):
    """Like _factor_linearization but with the measurement's translation
    corrected per-axis by exp(log_scale + ds) for `scaled` factors; returns
    the extra (3, 2) Jacobian block wrt the two scale variables."""

    def f(delta):
        di, dj, ds = delta[:3], delta[3:6], delta[6:8]
        s = jnp.where(scaled, jnp.exp(log_scale + ds), jnp.ones(2))
        z_eff = jnp.asarray([z[0] * s[0], z[1] * s[1], z[2]])
        return _between_residual(
            se2_retract(xi, di), se2_retract(xj, dj), z_eff, sqrt_info
        )

    r = f(jnp.zeros(8))
    J = jax.jacfwd(f)(jnp.zeros(8))
    w = jnp.where(robust, 1.0 / (1.0 + jnp.sum(r * r)), 1.0)
    sw = jnp.sqrt(w)
    return sw * r, sw * J[:, :3], sw * J[:, 3:6], sw * J[:, 6:8]


def _assemble_normal_equations(state: GraphState, config: GraphConfig):
    """Build the Gauss-Newton normal equations at the current estimates.

    Without scale estimation: H (3K, 3K), b (3K). With
    ``config.estimate_scale``: H (3K+2, 3K+2), b (3K+2) — the last two
    rows/columns belong to the global per-axis log_scale variables."""
    K = config.max_poses
    F = state.f_i.shape[0]
    active = jnp.arange(F) < state.num_factors

    xi = state.poses[state.f_i]
    xj = state.poses[state.f_j]
    if config.estimate_scale:
        r, Ji, Jj, Js = jax.vmap(
            _factor_linearization_scaled, in_axes=(0, 0, 0, 0, 0, 0, None)
        )(xi, xj, state.f_z, state.f_sqrt_info, state.f_robust,
          state.f_scaled, state.log_scale)
    else:
        r, Ji, Jj = jax.vmap(_factor_linearization)(
            xi, xj, state.f_z, state.f_sqrt_info, state.f_robust
        )
        Js = None
    m = active.astype(jnp.float32)[:, None]
    r = r * m
    Ji = Ji * m[..., None]
    Jj = Jj * m[..., None]

    n = 3 * K + (2 if config.estimate_scale else 0)
    H = jnp.zeros((n, n), jnp.float32)
    b = jnp.zeros((n,), jnp.float32)

    hp = jax.lax.Precision.HIGHEST

    def blocks(Ja, Jb):
        return jnp.einsum("fab,fac->fbc", Ja, Jb, precision=hp)

    def idx(keys):
        return 3 * keys[:, None] + jnp.arange(3)[None, :]  # (F, 3)

    ii, jj = idx(state.f_i), idx(state.f_j)
    H = H.at[ii[:, :, None], ii[:, None, :]].add(blocks(Ji, Ji))
    H = H.at[ii[:, :, None], jj[:, None, :]].add(blocks(Ji, Jj))
    H = H.at[jj[:, :, None], ii[:, None, :]].add(blocks(Jj, Ji))
    H = H.at[jj[:, :, None], jj[:, None, :]].add(blocks(Jj, Jj))
    b = b.at[ii].add(jnp.einsum("fab,fa->fb", Ji, r, precision=hp))
    b = b.at[jj].add(jnp.einsum("fab,fa->fb", Jj, r, precision=hp))

    if config.estimate_scale:
        Js = Js * m[..., None]  # (F, 3, 2)
        s = 3 * K
        srange = s + jnp.arange(2)
        crossi = jnp.einsum("fab,fas->fbs", Ji, Js, precision=hp)  # (F, 3, 2)
        crossj = jnp.einsum("fab,fas->fbs", Jj, Js, precision=hp)
        H = H.at[ii[:, :, None], srange[None, None, :]].add(crossi)
        H = H.at[srange[None, None, :], ii[:, :, None]].add(crossi)
        H = H.at[jj[:, :, None], srange[None, None, :]].add(crossj)
        H = H.at[srange[None, None, :], jj[:, :, None]].add(crossj)
        H = H.at[srange[:, None], srange[None, :]].add(
            jnp.einsum("fas,fat->st", Js, Js, precision=hp)
        )
        b = b.at[srange].add(jnp.einsum("fas,fa->s", Js, r, precision=hp))
        # prior on each log_scale: (log_scale + ds - anchor)^2 / sigma^2
        # (anchor defaults to 0 = nominal; see GraphState.log_scale_anchor)
        sp = config.scale_prior_sigma
        # scalar (incl. int / np.floating) -> both axes; else per-axis pair
        sx, sy = sp if isinstance(sp, (tuple, list)) else (sp, sp)
        w_s = jnp.asarray([1.0 / sx**2, 1.0 / sy**2], jnp.float32)
        H = H.at[srange, srange].add(w_s)
        b = b.at[srange].add(w_s * (state.log_scale - state.log_scale_anchor))

    # prior factor on X(0)
    def fprior(d):
        return jnp.matmul(state.prior_sqrt_info, se2_logmap(
            se2_compose(se2_inverse(state.prior_pose),
                        se2_retract(state.poses[0], d))
        ), precision=hp)

    r0 = fprior(jnp.zeros(3))
    J0 = jax.jacfwd(fprior)(jnp.zeros(3))
    H = H.at[:3, :3].add(jnp.matmul(J0.T, J0, precision=hp))
    b = b.at[:3].add(jnp.matmul(J0.T, r0, precision=hp))

    # gauge/padding regularization: identity on invalid pose blocks
    valid = jnp.repeat(jnp.arange(K) < state.num_poses, 3)
    if config.estimate_scale:
        valid = jnp.concatenate([valid, jnp.asarray([True, True])])
    H = H + jnp.diag(jnp.where(valid, config.damping, 1.0))
    return H, b


def _scaled_cho_factor(H):
    """Jacobi-preconditioned Cholesky: H = D (L Lᵀ) D with D = diag(√H_ii).

    Exact in infinite precision. In fp32 the symmetric diagonal scaling
    collapses the 1e-9..1e7 dynamic range of mixed pose / scale / padding
    blocks (cm-level refined floors give whitened weights ~1/0.002² on the
    rotation axis while padding rows sit at 1), which is what left the raw
    factorization marginally PD on TPU — the NaN source the Levenberg
    damping in ``optimize`` otherwise has to catch after the fact.
    """
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-12))
    Hs = H / (d[:, None] * d[None, :])
    return jnp.linalg.cholesky(Hs), d


def _scaled_cho_solve(Lf, b):
    """Solve H x = b given ``_scaled_cho_factor(H)`` (vector or matrix b)."""
    L, d = Lf
    dd = d if b.ndim == 1 else d[:, None]
    return jax.scipy.linalg.cho_solve((L, True), b / dd) / dd


@functools.partial(jax.jit, static_argnums=(1,))
def optimize(state: GraphState, config: GraphConfig) -> GraphState:
    """Run ``config.gn_iters`` relinearized Gauss-Newton sweeps.

    The ISAM2-equivalent of ``isam.update(...); calculateEstimate()``
    (`slam.py:1222-1230`) — but fully converged every call.
    """
    K = config.max_poses

    def cond(carry):
        _, _, it, max_delta, _ = carry
        # warm-started updates converge in one sweep between loop closures —
        # the while_loop skips the remaining relinearizations entirely
        return (it < config.gn_iters) & (max_delta > config.convergence_tol)

    def body(carry):
        poses, log_scale, it, prev_delta, lam = carry
        st = state._replace(poses=poses, log_scale=log_scale)
        H, b = _assemble_normal_equations(st, config)
        # adaptive RELATIVE Levenberg damping: lam starts at 0 (pure GN on
        # healthy paths) and only escalates when a sweep's Cholesky fails in
        # fp32 or the step magnitude grows — both observed on TPU under
        # cm-level refined information weights (a failed solve used to
        # propagate NaN through every downstream stage).
        Hd = H + lam * jnp.diag(jnp.diagonal(H))
        Lf = _scaled_cho_factor(Hd)
        delta = -_scaled_cho_solve(Lf, b)
        finite = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(finite, delta, 0.0)
        if config.estimate_scale:
            ds = delta[3 * K : 3 * K + 2]
            delta = delta[: 3 * K]
        else:
            ds = jnp.zeros(2, jnp.float32)
        delta = delta.reshape(K, 3)
        valid = (jnp.arange(K) < state.num_poses)[:, None]
        vdelta = jnp.where(valid, delta, 0.0)
        if config.step_clamp_t > 0.0:
            big_t = jnp.max(jnp.abs(vdelta[:, :2]))
            big_r = jnp.max(jnp.abs(vdelta[:, 2]))
            shrink = jnp.minimum(
                1.0,
                jnp.minimum(
                    config.step_clamp_t / jnp.maximum(big_t, 1e-12),
                    config.step_clamp_r / jnp.maximum(big_r, 1e-12),
                ),
            )
            delta, vdelta, ds = delta * shrink, vdelta * shrink, ds * shrink
        log_scale = log_scale + ds
        new_poses = jnp.where(valid, jax.vmap(se2_retract)(poses, delta), poses)
        max_delta = jnp.maximum(jnp.max(jnp.abs(vdelta)), jnp.max(jnp.abs(ds)))
        # a failed solve must not read as convergence — keep iterating with
        # the damping escalated until it factorizes
        max_delta = jnp.where(finite, max_delta, jnp.inf)
        grew = finite & (max_delta > prev_delta * 1.05)
        lam = jnp.where(
            ~finite,
            jnp.maximum(lam, 1e-6) * 100.0,
            jnp.where(
                grew,
                jnp.minimum(jnp.maximum(lam, 1e-8) * 30.0, 1.0),
                lam * 0.25,
            ),
        )
        return new_poses, log_scale, it + 1, max_delta, lam

    # fp32 throughout: the factorization/solves lower to blocked matmuls and
    # the default bf16 MXU pass would wash out cm-level pose corrections
    with jax.default_matmul_precision("highest"):
        poses, log_scale, _, _, _ = jax.lax.while_loop(
            cond, body,
            (state.poses, state.log_scale, jnp.asarray(0, jnp.int32),
             jnp.asarray(jnp.inf), jnp.asarray(0.0, jnp.float32)),
        )
    return state._replace(poses=poses, log_scale=log_scale)


def optimize_with_marginal(state: GraphState, k, config: GraphConfig):
    """``optimize`` + the marginal covariance of pose ``k`` from the FINAL
    linearization, reusing one normal-equation assembly + Cholesky instead of
    rebuilding them in a separate ``marginal_covariance`` call (the per-
    keyframe hot path of the SLAM scan does this every step)."""
    K = config.max_poses

    with jax.default_matmul_precision("highest"):
        state = optimize(state, config)
        H, _ = _assemble_normal_equations(state, config)
        Lf = _scaled_cho_factor(H)
        n = 3 * K + (2 if config.estimate_scale else 0)
        e = jnp.zeros((n, 3), jnp.float32)
        rows = 3 * jnp.asarray(k, jnp.int32) + jnp.arange(3)
        e = e.at[rows, jnp.arange(3)].set(1.0)
        cols = _scaled_cho_solve(Lf, e)
    return state, cols[rows, :]


@functools.partial(jax.jit, static_argnums=(2,))
def marginal_covariance(state: GraphState, k, config: GraphConfig) -> jax.Array:
    """3x3 marginal covariance of pose k (gtsam isam.marginalCovariance,
    `slam.py:1233`): the (k, k) block of H⁻¹ at the current linearization."""
    with jax.default_matmul_precision("highest"):
        H, _ = _assemble_normal_equations(state, config)
        Lf = _scaled_cho_factor(H)
        n = 3 * config.max_poses + (2 if config.estimate_scale else 0)
        e = jnp.zeros((n, 3), jnp.float32)
        rows = 3 * jnp.asarray(k, jnp.int32) + jnp.arange(3)
        e = e.at[rows, jnp.arange(3)].set(1.0)
        cols = _scaled_cho_solve(Lf, e)
        return cols[rows, :]


class Smoother:
    """Convenience host-side wrapper with an ISAM2-shaped API.

    Mirrors the reference's usage pattern: queue factors + values, then
    ``update()`` -> new estimates, ``marginal_covariance(k)``. The jitted
    functional API above is what the fused SLAM scan uses; this class exists
    for interactive / parity use.
    """

    def __init__(self, config: GraphConfig = GraphConfig()):
        self.config = config
        self.state = graph_init(config)

    def add_prior(self, pose, sigmas):
        self.state = add_prior(self.state, pose, sigmas_to_sqrt_info(sigmas))

    def add_odometry(self, i, j, z, sigmas, robust=False):
        self.state = add_between(
            self.state, i, j, z, sigmas_to_sqrt_info(sigmas), robust
        )

    def add_between_cov(self, i, j, z, cov, robust=False):
        self.state = add_between(self.state, i, j, z, cov_to_sqrt_info(cov), robust)

    def insert(self, k, pose):
        self.state = set_pose_estimate(self.state, k, pose)

    def update(self):
        self.state = optimize(self.state, self.config)
        return self.state.poses

    def estimate(self, k=None):
        return self.state.poses if k is None else self.state.poses[k]

    def marginal_covariance(self, k):
        return marginal_covariance(self.state, k, self.config)
