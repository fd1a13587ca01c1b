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
    """Static ICP pipeline parameters (defaults = reference icp.yaml)."""

    max_iterations: int = 40
    knn_max_dist: float = 10.0
    outlier_max_dist: float = 3.0
    trim_ratio: float = 0.8
    min_diff_rot: float = 0.01
    min_diff_trans: float = 0.1
    smooth_length: int = 4
    min_matched_points: int = 3


class ICPResult(NamedTuple):
    pose: jax.Array  # (3,) source->target SE(2) estimate
    ok: jax.Array  # bool: enough matched points throughout ("success")
    converged: jax.Array  # bool: differential checker fired before cap
    iterations: jax.Array  # int32: iterations actually applied
    inliers: jax.Array  # int32: final weighted match count


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
) -> ICPResult:
    """Run trimmed point-to-point ICP from an initial SE(2) guess.

    Equivalent call surface to ``SLAM.compute_icp``
    (`/root/reference/bruce_slam/src/bruce_slam/slam.py:294-323`): aligns
    source onto target, returning the absolute source->target transform.
    """
    cfg = config
    smooth = cfg.smooth_length

    def cond(carry):
        pose, done, ok, iters, rot_hist, trans_hist, inliers = carry
        # while_loop early exit: once the differential checker fires (or the
        # match starves), the remaining iterations are skipped entirely — a
        # masked fixed-length scan would burn the full iteration budget.
        # Under vmap this runs until every lane is done (still a large win:
        # typical convergence is ~1/4 of the cap).
        return (~done) & (iters < cfg.max_iterations)

    def body(carry):
        pose, done, ok, iters, rot_hist, trans_hist, inliers = carry
        moved = se2_transform_points(source_points, pose)
        idx, d2 = nn_match(
            target_points, target_mask, moved, source_mask, cfg.knn_max_dist
        )
        valid = (idx != -1) & (d2 <= cfg.outlier_max_dist**2)
        thresh = _trim_threshold(d2, valid, cfg.trim_ratio)
        w = (valid & (d2 <= thresh)).astype(source_points.dtype)
        n_match = jnp.sum(w).astype(jnp.int32)
        enough = n_match >= cfg.min_matched_points

        matched = target_points[jnp.clip(idx, 0, target_points.shape[0] - 1)]
        delta = _weighted_procrustes(moved, matched, w)
        new_pose = se2_compose(delta, pose)

        # differential transformation checker over the last `smooth` deltas
        rot_hist = jnp.roll(rot_hist, 1).at[0].set(jnp.abs(wrap_angle(delta[2])))
        trans_hist = jnp.roll(trans_hist, 1).at[0].set(
            jnp.linalg.norm(delta[:2])
        )
        conv = (jnp.mean(rot_hist) < cfg.min_diff_rot) & (
            jnp.mean(trans_hist) < cfg.min_diff_trans
        )

        step_ok = ok & enough
        advance = (~done) & step_ok
        pose = jnp.where(advance, new_pose, pose)
        iters = iters + advance.astype(jnp.int32)
        inliers = jnp.where(advance, n_match, inliers)
        done = done | conv | ~step_ok
        return (pose, done, step_ok | done, iters, rot_hist, trans_hist, inliers)

    big = jnp.full((smooth,), 1e6, source_points.dtype)
    init = (
        guess.astype(source_points.dtype),
        jnp.asarray(False),
        jnp.asarray(True),
        jnp.asarray(0, jnp.int32),
        big,
        big,
        jnp.asarray(0, jnp.int32),
    )
    pose, done, _, iters, rot_hist, trans_hist, inliers = jax.lax.while_loop(
        cond, body, init
    )
    # ok mirrors libpointmatcher "success": never starved of matches
    ok = inliers >= cfg.min_matched_points
    converged = (jnp.mean(rot_hist) < cfg.min_diff_rot) & (
        jnp.mean(trans_hist) < cfg.min_diff_trans
    )
    return ICPResult(pose=pose, ok=ok, converged=converged, iterations=iters,
                     inliers=inliers)


def icp_multistart(
    source_points: jax.Array,
    source_mask: jax.Array,
    target_points: jax.Array,
    target_mask: jax.Array,
    guesses: jax.Array,
    guess_mask: jax.Array,
    config: ICPConfig = ICPConfig(),
) -> ICPResult:
    """Batched ICP over G initial guesses — the TPU-native replacement for the
    reference's sequential 2-second-budget multi-start loop
    (`/root/reference/bruce_slam/src/bruce_slam/slam.py:343-358`).

    Returns an ICPResult with a leading G axis; ``ok`` is masked by
    ``guess_mask`` so padded guesses never count as samples.
    """
    run = jax.vmap(
        lambda g: icp(
            source_points, source_mask, target_points, target_mask, g, config
        )
    )
    res = run(guesses)
    return res._replace(ok=res.ok & guess_mask)
