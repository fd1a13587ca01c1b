"""Inter-robot graph merge: propose -> PCM-vet -> merge -> optimize.

Unit-level coverage of the two-robot capability (VERDICT r1 item 9); the
full pipeline demo is scripts/two_robot_demo.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sonar_slam_tpu.geometry import se2_between, se2_compose, se2_inverse
from sonar_slam_tpu.graph.factor_graph import (
    GraphConfig,
    add_between,
    add_prior,
    graph_init,
    optimize,
    set_pose_estimate,
    sigmas_to_sqrt_info,
)
from sonar_slam_tpu.parallel.multi_robot import (
    merge_pose_graphs,
    vet_interrobot_loops,
)

rng = np.random.default_rng(11)


def _chain_graph(true_poses, sigmas, prior=True, noise=0.0):
    """Odometry-chain graph over the given true poses (optionally noisy)."""
    n = len(true_poses)
    cfg = GraphConfig(max_poses=n, max_factors=2 * n + 4, gn_iters=8)
    g = graph_init(cfg)
    if prior:
        g = add_prior(g, true_poses[0], sigmas_to_sqrt_info([0.01, 0.01, 0.001]))
    for k in range(n):
        g = set_pose_estimate(g, k, true_poses[k])
    for k in range(n - 1):
        z = np.asarray(se2_between(jnp.asarray(true_poses[k]),
                                   jnp.asarray(true_poses[k + 1])))
        z = z + rng.normal(scale=noise, size=3) * np.array([1, 1, 0.1])
        g = add_between(g, k, k + 1, jnp.asarray(z, jnp.float32),
                        sigmas_to_sqrt_info(sigmas))
    return g, cfg


def _true_trajs():
    ta = np.stack([np.linspace(0, 8, 6), np.zeros(6), np.zeros(6)],
                  -1).astype(np.float32)
    tb = np.stack([np.linspace(0, 8, 6), np.full(6, 2.0),
                   np.full(6, 0.1)], -1).astype(np.float32)
    return ta, tb


def test_merge_recovers_cross_robot_geometry():
    ta, tb = _true_trajs()
    ga, _ = _chain_graph(ta, [0.05, 0.05, 0.01])
    gb, _ = _chain_graph(tb, [0.05, 0.05, 0.01], prior=False)
    # B's initial values are deliberately expressed in a WRONG frame (what a
    # robot with its own anchor would have): shifted + rotated
    t_off = jnp.asarray([3.0, -1.0, 0.3], jnp.float32)
    for k in range(6):
        gb = set_pose_estimate(
            gb, k, se2_compose(t_off, jnp.asarray(tb[k])))

    # two perfect inter-robot measurements (a=1<->b=1, a=4<->b=4)
    qa = np.array([1, 4], np.int32)
    qb = np.array([1, 4], np.int32)
    tfs = jnp.stack([
        se2_between(jnp.asarray(ta[1]), jnp.asarray(tb[1])),
        se2_between(jnp.asarray(ta[4]), jnp.asarray(tb[4])),
    ])
    covs = jnp.tile(jnp.diag(jnp.asarray([0.05, 0.05, 0.01]) ** 2)[None],
                    (2, 1, 1))
    accept = jnp.asarray([True, True])

    cfg = GraphConfig(max_poses=12, max_factors=32, gn_iters=10)
    merged = merge_pose_graphs(ga, 6, gb, 6, qa, qb, tfs, covs, accept, cfg)
    merged = optimize(merged, cfg)
    poses = np.asarray(merged.poses)

    # A unchanged (anchored), B pulled into A's frame at the true geometry
    np.testing.assert_allclose(poses[:6], ta, atol=1e-3)
    np.testing.assert_allclose(poses[6:12], tb, atol=2e-2)
    # cross-robot relative poses match truth everywhere
    for k in range(6):
        est = np.asarray(se2_between(jnp.asarray(poses[k]),
                                     jnp.asarray(poses[6 + k])))
        tru = np.asarray(se2_between(jnp.asarray(ta[k]), jnp.asarray(tb[k])))
        np.testing.assert_allclose(est, tru, atol=3e-2)


def test_pcm_rejects_inconsistent_interrobot_proposal():
    ta, tb = _true_trajs()
    good1 = se2_between(jnp.asarray(ta[1]), jnp.asarray(tb[1]))
    good2 = se2_between(jnp.asarray(ta[4]), jnp.asarray(tb[4]))
    bad = se2_between(jnp.asarray(ta[2]), jnp.asarray(tb[2])) + jnp.asarray(
        [1.5, -1.0, 0.4])
    tfs = jnp.stack([good1, bad, good2])
    covs = jnp.tile(jnp.diag(jnp.asarray([0.05, 0.05, 0.01]) ** 2)[None],
                    (3, 1, 1))
    a_poses = jnp.asarray(ta[[1, 2, 4]])
    b_poses = jnp.asarray(tb[[1, 2, 4]])
    accept, size = vet_interrobot_loops(
        a_poses, b_poses, tfs, covs, jnp.ones(3, bool), min_pcm=2)
    accept = np.asarray(accept)
    assert accept[0] and accept[2] and not accept[1]
    assert int(size) == 2


def test_merge_requires_accepted_loop():
    ta, tb = _true_trajs()
    ga, _ = _chain_graph(ta, [0.05, 0.05, 0.01])
    gb, _ = _chain_graph(tb, [0.05, 0.05, 0.01], prior=False)
    cfg = GraphConfig(max_poses=12, max_factors=32)
    import pytest

    with pytest.raises(ValueError):
        merge_pose_graphs(ga, 6, gb, 6, np.array([1]), np.array([1]),
                          jnp.zeros((1, 3)), jnp.eye(3)[None],
                          jnp.asarray([False]), cfg)
