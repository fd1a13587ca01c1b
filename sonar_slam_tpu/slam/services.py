"""Exploration-facing query services.

The reference defines two services consumed by its (external) exploration
stack: ``PredictSLAMUpdate.srv`` and ``QueryExplorationPath.srv``
(`/root/reference/bruce_msgs/srv/`, topic constants at
`utils/topics.py:31-34`). The serving side is not present in the reference
repo; this module provides working TPU-native equivalents over the smoother
state so an exploration planner has the same query surface:

* ``predict_slam_update``: given candidate future odometry chains, predict
  the trajectory and terminal marginal covariance after hypothetically
  extending the factor graph — the information-gain primitive exploration
  planners need. Batched over candidate paths with one vmap.
* ``query_pose_uncertainty``: current marginal covariances for a set of keys
  (the PoseHistory part of the exchange).
"""

from __future__ import annotations

import jax

from ..graph.factor_graph import (
    add_between,
    optimize_with_marginal,
    set_pose_estimate,
    sigmas_to_sqrt_info,
    marginal_covariance,
)
from ..geometry import se2_compose
from .core import SlamCarry, SlamDims


def predict_slam_update(
    carry: SlamCarry,
    dims: SlamDims,
    candidate_odometry: jax.Array,  # (P, S, 3) P candidate paths of S steps
    odom_sigmas: jax.Array,  # (3,) noise for the hypothetical factors
):
    """Predict poses + terminal covariance for each candidate path.

    For each path: append S hypothetical odometry BetweenFactors from the
    current latest keyframe, re-optimize, and report the predicted poses and
    the terminal marginal covariance. Requires S free keyframe slots.
    Returns (pred_poses (P, S, 3), term_cov (P, 3, 3)).
    """
    gcfg = dims.graph_config()
    sq = sigmas_to_sqrt_info(odom_sigmas)
    base_key = carry.num_kf - 1

    def one_path(odom):
        g = carry.graph
        pose = carry.poses[base_key]
        poses = []
        for s in range(odom.shape[0]):
            key = carry.num_kf + s
            pose = se2_compose(pose, odom[s])
            g = add_between(g, key - 1, key, odom[s], sq)
            g = set_pose_estimate(g, key, pose)
            poses.append(pose)
        last = carry.num_kf + odom.shape[0] - 1
        g, cov = optimize_with_marginal(g, last, gcfg)
        pred = jax.lax.dynamic_slice(
            g.poses, (carry.num_kf, 0), (odom.shape[0], 3)
        )
        return pred, cov

    return jax.vmap(one_path)(candidate_odometry)


def query_pose_uncertainty(carry: SlamCarry, dims: SlamDims, keys: jax.Array):
    """Marginal covariances for the given keyframe keys (batched)."""
    gcfg = dims.graph_config()
    return jax.vmap(lambda k: marginal_covariance(carry.graph, k, gcfg))(keys)
