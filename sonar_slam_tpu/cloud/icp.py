"""Trimmed point-to-point ICP on SE(2), fully jittable and vmappable.

Replaces the libpointmatcher ICP pipeline the reference drives through
pybind11 (`/root/reference/bruce_slam/src/bruce_slam/cpp/pcl.cpp:185-213`)
with the pipeline config of `/root/reference/bruce_slam/config/icp.yaml`:

* KDTreeMatcher knn=1 maxDist=10        -> masked brute-force NN (knn.py)
* MaxDistOutlierFilter maxDist=3.0      -> hard distance gate
* TrimmedDistOutlierFilter ratio=0.8    -> keep the 80% closest matches
* PointToPointErrorMinimizer            -> closed-form weighted 2-D Procrustes
* CounterTransformationChecker 40       -> fixed-length lax.scan
* DifferentialTransformationChecker     -> smoothed incremental-motion gate
  (minDiffRotErr 0.01 / minDiffTransErr 0.1 / smoothLength 4)

Each iteration is one masked NN match (an MXU matmul) plus a closed-form
update, so a 30-hypothesis multi-start
(`slam.py:325-387` ``compute_icp_with_cov``) is just a ``vmap`` — no 2-second
wall-clock budget needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se2_compose, se2_transform_points, wrap_angle
from .knn import nn_match


class ICPConfig(NamedTuple):
    """Static ICP pipeline parameters (defaults = reference icp.yaml).

    ``point_to_line=True`` swaps the PointToPoint minimizer for a
    point-to-line one (normals from cloud/normals.py). On wall-dominated
    sonar clouds, point-to-point slides tangentially when the two clouds
    sample the wall at different spots; the round-2 error budget measured
    this at several cm per loop closure. libpointmatcher offers the same
    upgrade (PointToPlaneErrorMinimizer); the reference's icp.yaml simply
    doesn't select it — a deliberate, documented improvement.
    """

    max_iterations: int = 40
    knn_max_dist: float = 10.0
    outlier_max_dist: float = 3.0
    trim_ratio: float = 0.8
    min_diff_rot: float = 0.01
    min_diff_trans: float = 0.1
    smooth_length: int = 4
    min_matched_points: int = 3
    point_to_line: bool = False
    normal_k: int = 8
    normal_radius: float = 2.0
    # correspondence-radius annealing: iteration i gates matches at
    # max(outlier_min_dist, outlier_max_dist * outlier_dist_decay^i).
    # Early iterations keep the loose reference radius (so ICP can pull in
    # from a coarse Sobol seed); late iterations tighten so points in
    # NON-SHARED regions of a partial-overlap pair stop dragging the
    # solution — the round-2 error budget measured that drag at 5-40 cm per
    # loop closure with the reference's fixed 3 m radius. decay=1 disables
    # (exact reference behavior).
    outlier_dist_decay: float = 1.0
    outlier_min_dist: float = 0.5


class ICPResult(NamedTuple):
    pose: jax.Array  # (3,) source->target SE(2) estimate
    ok: jax.Array  # bool: enough matched points throughout ("success")
    converged: jax.Array  # bool: differential checker fired before cap
    iterations: jax.Array  # int32: iterations actually applied
    inliers: jax.Array  # int32: final weighted match count
    # registration information matrix (J^T J of the objective at the
    # solution) and mean squared inlier residual: cov ~= mse * info^-1
    # (Censi-style). Exposes how CONSTRAINED the registration is — near-zero
    # tangential information on a single straight wall, tiny overall
    # information for low-overlap loop candidates. The reference has no
    # equivalent (its covariance comes only from multi-start spread,
    # slam.py:365-371); this is a deliberate improvement feeding the loop
    # factor weights.
    info: jax.Array  # (3, 3)
    mse: jax.Array  # scalar


def _weighted_procrustes(src, dst, w):
    """Closed-form weighted rigid 2-D alignment src->dst. Returns (3,) delta."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    pc = jnp.sum(src * w[:, None], axis=0) / wsum
    qc = jnp.sum(dst * w[:, None], axis=0) / wsum
    a = src - pc
    b = dst - qc
    sxx = jnp.sum(w * (a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1]))
    syx = jnp.sum(w * (a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]))
    theta = jnp.arctan2(syx, sxx)
    c, s = jnp.cos(theta), jnp.sin(theta)
    tx = qc[0] - (c * pc[0] - s * pc[1])
    ty = qc[1] - (s * pc[0] + c * pc[1])
    return jnp.stack([tx, ty, theta])


def _weighted_p2l(src, dst, normals, w):
    """One linearized point-to-line update: minimize
    sum_i w_i (n_i . (src_i + t + theta*J src_i - dst_i))^2 over (t, theta).

    Zero normals (unreliable neighborhoods) drop out of the solve. A ridge
    proportional to trace(A) keeps directions the line constraints leave
    unobservable (e.g. tangential along one straight wall) anchored at zero
    update — the guess (odometry) holds them, instead of P2P inventing a
    tangential pull. Returns ((3,) delta, effective constraint weight).
    """
    have_n = jnp.sum(normals * normals, axis=-1) > 0.5
    wn = w * have_n.astype(src.dtype)
    r = jnp.sum(normals * (src - dst), axis=-1)
    jp = jnp.stack([-src[:, 1], src[:, 0]], axis=-1)  # J @ p
    a = jnp.stack(
        [normals[:, 0], normals[:, 1], jnp.sum(normals * jp, axis=-1)],
        axis=-1,
    )  # (N, 3)
    aw = a * wn[:, None]
    # HIGHEST: this (3,N)@(N,3) normal-equation product is the registration
    # solver itself — the default bf16 MXU pass rounds normals/residuals to
    # ~3 digits and biases every SSM/NSSM/chain measurement (measured 5x ATE
    # blowup on-chip, round 4)
    hp = jax.lax.Precision.HIGHEST
    A = jnp.matmul(aw.T, a, precision=hp)
    rhs = -jnp.matmul(aw.T, r, precision=hp)
    ridge = 1e-5 * jnp.trace(A) + 1e-9
    x = jnp.linalg.solve(A + ridge * jnp.eye(3, dtype=src.dtype), rhs)
    # keep the rotation inside the linearization's validity
    x = x.at[2].set(jnp.clip(x[2], -0.5, 0.5))
    mse = jnp.sum(wn * r * r) / jnp.maximum(jnp.sum(wn), 1.0)
    return x, jnp.sum(wn), A, mse


def _p2p_info(moved, dst, w):
    """J^T J and mean squared residual of the point-to-point objective at the
    current correspondences (the Censi covariance ingredients)."""
    r = dst - moved
    mx, my = moved[:, 0], moved[:, 1]
    sw = jnp.sum(w)
    info = jnp.zeros((3, 3), moved.dtype)
    info = info.at[0, 0].set(sw)
    info = info.at[1, 1].set(sw)
    info = info.at[0, 2].set(jnp.sum(w * -my))
    info = info.at[2, 0].set(jnp.sum(w * -my))
    info = info.at[1, 2].set(jnp.sum(w * mx))
    info = info.at[2, 1].set(jnp.sum(w * mx))
    info = info.at[2, 2].set(jnp.sum(w * (mx * mx + my * my)))
    mse = jnp.sum(w * jnp.sum(r * r, axis=-1)) / jnp.maximum(2.0 * sw, 1.0)
    return info, mse


def censi_covariance(info: jax.Array, mse: jax.Array, pose: jax.Array,
                     ridge: float = 1e-6) -> jax.Array:
    """Registration covariance of the RESULT POSE from (J^T J, mse).

    cov_delta = mse * (J^T J)^-1 is in the delta parametrization (rotation
    about the target-frame origin); the chain rule G = d(pose)/d(delta)
    moves it to the pose's (x, y, theta): a rotation delta-theta displaces
    the pose position by J @ t. Censi (ICRA 2007)-style closed form.
    """
    tr = jnp.trace(info)
    A = info + (ridge * tr + 1e-12) * jnp.eye(3, dtype=info.dtype)
    cov_delta = mse * jnp.linalg.inv(A)
    G = jnp.asarray(
        [[1.0, 0.0, -pose[1]], [0.0, 1.0, pose[0]], [0.0, 0.0, 1.0]],
        info.dtype,
    )
    hp = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(G, cov_delta, precision=hp), G.T,
                      precision=hp)


def _trim_threshold(d2, valid, ratio):
    """Squared-distance cutoff keeping `ratio` of the valid matches."""
    n = d2.shape[0]
    d2_sorted = jnp.sort(jnp.where(valid, d2, jnp.inf))
    count = jnp.sum(valid)
    k = jnp.clip(jnp.ceil(ratio * count).astype(jnp.int32) - 1, 0, n - 1)
    return d2_sorted[k]


def icp(
    source_points: jax.Array,
    source_mask: jax.Array,
    target_points: jax.Array,
    target_mask: jax.Array,
    guess: jax.Array,
    config: ICPConfig = ICPConfig(),
    source_weights: jax.Array | None = None,
    target_weights: jax.Array | None = None,
) -> ICPResult:
    """Run trimmed point-to-point ICP from an initial SE(2) guess.

    Equivalent call surface to ``SLAM.compute_icp``
    (`/root/reference/bruce_slam/src/bruce_slam/slam.py:294-323`): aligns
    source onto target, returning the absolute source->target transform.

    ``source_weights`` / ``target_weights`` (round-5 frontend-fidelity
    channel): per-point confidences in [0, 1] multiplied into each
    correspondence's SOLVE weight (Procrustes / point-to-line normal
    equations and the Censi information). Gating semantics — trim
    threshold, inlier COUNT, match starvation — stay binary, so
    all-ones weights reproduce the unweighted solver bit-for-bit (the
    reference has no per-point quality notion at all; libpointmatcher
    descriptors are dropped at the pcl.cpp boundary).
    """
    cfg = config
    smooth = cfg.smooth_length

    if cfg.point_to_line:
        from .normals import estimate_normals

        # target is fixed across iterations (and across vmapped multistart
        # lanes — XLA hoists this out of the batch): compute normals once
        tgt_normals = estimate_normals(
            target_points, target_mask, cfg.normal_k, cfg.normal_radius
        )

    def cond(carry):
        pose, done, ok, iters, rot_hist, trans_hist, inliers, info, mse = carry
        # while_loop early exit: once the differential checker fires (or the
        # match starves), the remaining iterations are skipped entirely — a
        # masked fixed-length scan would burn the full iteration budget.
        # Under vmap this runs until every lane is done (still a large win:
        # typical convergence is ~1/4 of the cap).
        return (~done) & (iters < cfg.max_iterations)

    def body(carry):
        pose, done, ok, iters, rot_hist, trans_hist, inliers, info, mse = carry
        moved = se2_transform_points(source_points, pose)
        idx, d2 = nn_match(
            target_points, target_mask, moved, source_mask, cfg.knn_max_dist
        )
        if cfg.outlier_dist_decay < 1.0:
            gate = jnp.maximum(
                cfg.outlier_min_dist,
                cfg.outlier_max_dist
                * cfg.outlier_dist_decay ** iters.astype(source_points.dtype),
            )
        else:
            gate = cfg.outlier_max_dist
        valid = (idx != -1) & (d2 <= gate**2)
        thresh = _trim_threshold(d2, valid, cfg.trim_ratio)
        w = (valid & (d2 <= thresh)).astype(source_points.dtype)
        n_match = jnp.sum(w).astype(jnp.int32)
        enough = n_match >= cfg.min_matched_points

        safe_idx = jnp.clip(idx, 0, target_points.shape[0] - 1)
        matched = target_points[safe_idx]
        ws = w
        if source_weights is not None:
            ws = ws * source_weights.astype(source_points.dtype)
        if target_weights is not None:
            ws = ws * target_weights.astype(source_points.dtype)[safe_idx]
        if cfg.point_to_line:
            delta_l, n_constrained, new_info, new_mse = _weighted_p2l(
                moved, matched, tgt_normals[safe_idx], ws
            )
            # starved of line constraints -> fall back to point-to-point
            delta_p = _weighted_procrustes(moved, matched, ws)
            info_p, mse_p = _p2p_info(moved, matched, ws)
            use_l = n_constrained >= 3
            delta = jnp.where(use_l, delta_l, delta_p)
            new_info = jnp.where(use_l, new_info, info_p)
            new_mse = jnp.where(use_l, new_mse, mse_p)
        else:
            delta = _weighted_procrustes(moved, matched, ws)
            new_info, new_mse = _p2p_info(moved, matched, ws)
        new_pose = se2_compose(delta, pose)

        # differential transformation checker over the last `smooth` deltas
        rot_hist = jnp.roll(rot_hist, 1).at[0].set(jnp.abs(wrap_angle(delta[2])))
        trans_hist = jnp.roll(trans_hist, 1).at[0].set(
            jnp.linalg.norm(delta[:2])
        )
        conv = (jnp.mean(rot_hist) < cfg.min_diff_rot) & (
            jnp.mean(trans_hist) < cfg.min_diff_trans
        )
        if cfg.outlier_dist_decay < 1.0:
            # don't declare convergence while the radius is still annealing —
            # the tight-gate refinement is the point of the schedule
            conv = conv & (gate <= cfg.outlier_min_dist * 1.001)

        step_ok = ok & enough
        advance = (~done) & step_ok
        pose = jnp.where(advance, new_pose, pose)
        iters = iters + advance.astype(jnp.int32)
        inliers = jnp.where(advance, n_match, inliers)
        info = jnp.where(advance, new_info, info)
        mse = jnp.where(advance, new_mse, mse)
        done = done | conv | ~step_ok
        return (pose, done, step_ok | done, iters, rot_hist, trans_hist,
                inliers, info, mse)

    big = jnp.full((smooth,), 1e6, source_points.dtype)
    init = (
        guess.astype(source_points.dtype),
        jnp.asarray(False),
        jnp.asarray(True),
        jnp.asarray(0, jnp.int32),
        big,
        big,
        jnp.asarray(0, jnp.int32),
        jnp.zeros((3, 3), source_points.dtype),
        jnp.asarray(0.0, source_points.dtype),
    )
    (pose, done, _, iters, rot_hist, trans_hist, inliers, info, mse) = (
        jax.lax.while_loop(cond, body, init)
    )
    # ok mirrors libpointmatcher "success": never starved of matches
    ok = inliers >= cfg.min_matched_points
    converged = (jnp.mean(rot_hist) < cfg.min_diff_rot) & (
        jnp.mean(trans_hist) < cfg.min_diff_trans
    )
    return ICPResult(pose=pose, ok=ok, converged=converged, iterations=iters,
                     inliers=inliers, info=info, mse=mse)


def icp_multistart(
    source_points: jax.Array,
    source_mask: jax.Array,
    target_points: jax.Array,
    target_mask: jax.Array,
    guesses: jax.Array,
    guess_mask: jax.Array,
    config: ICPConfig = ICPConfig(),
    source_weights: jax.Array | None = None,
    target_weights: jax.Array | None = None,
) -> ICPResult:
    """Batched ICP over G initial guesses — the TPU-native replacement for the
    reference's sequential 2-second-budget multi-start loop
    (`/root/reference/bruce_slam/src/bruce_slam/slam.py:343-358`).

    Returns an ICPResult with a leading G axis; ``ok`` is masked by
    ``guess_mask`` so padded guesses never count as samples.
    """
    run = jax.vmap(
        lambda g: icp(
            source_points, source_mask, target_points, target_mask, g,
            config, source_weights, target_weights,
        )
    )
    res = run(guesses)
    return res._replace(ok=res.ok & guess_mask)
