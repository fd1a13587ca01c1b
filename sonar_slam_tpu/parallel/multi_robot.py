"""Multi-robot state exchange over device collectives.

The reference reserves hooks for multi-robot SLAM: the ``ISAM2Update``
message serializing smoother state (`bruce_msgs/msg/ISAM2Update.msg`,
`conversions.cpp:45-77` — dormant), ``rov_id`` frame prefixes
(`slam_ros.py:127-128,235-238`), and unused Keyframe submap/ring-key fields
(`slam_objects.py:120-135`). The TPU-native equivalent maps each robot to a
mesh lane and exchanges compact keyframe summaries (pose, covariance,
downsampled cloud) with ``all_gather`` over ICI — the same payload the
boost-serialized ISAM2Update intended, minus the middleware.

Inter-robot loop closures then run exactly like NSSM: every robot matches its
latest submap against every gathered neighbor submap with the batched ICP,
producing candidate between-robot factors (vetted by the caller's PCM queue).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..cloud import ICPConfig, count_overlap, icp
from ..geometry import se2_between, se2_transform_points


class KeyframeSummary(NamedTuple):
    """The ISAM2Update-analog wire format (one keyframe per robot)."""

    robot_id: jax.Array  # int32
    key: jax.Array  # int32 keyframe index on its owner
    pose: jax.Array  # (3,)
    cov: jax.Array  # (3, 3)
    points: jax.Array  # (N, 2) downsampled local cloud
    pmask: jax.Array  # (N,)


def exchange_keyframes(summary: KeyframeSummary, mesh: Mesh, axis: str | None = None):
    """All-gather each robot's latest keyframe summary across the mesh.

    Input: arrays with a leading robot axis (sharded one robot per device).
    Output: the same arrays fully gathered and replicated on every device —
    each robot now sees the whole summary table. ``axis`` defaults to the
    mesh's first axis name.
    """
    axis = axis or mesh.axis_names[0]

    def body(s: KeyframeSummary):
        # tiled gather along the existing robot axis -> every lane holds the
        # full (R, ...) summary table, replicated (out_specs P(None))
        return jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, tiled=True), s
        )

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis),), out_specs=P(None),
        check_vma=False,
    )
    return fn(summary)


def merge_interrobot_factors(
    own: KeyframeSummary,
    gathered: KeyframeSummary,
    point_noise: float = 0.5,
    min_overlap: int = 30,
    icp_config: ICPConfig = ICPConfig(),
):
    """Match our submap against every gathered neighbor submap.

    Returns per-neighbor (transform (R, 3), ok (R,), overlap (R,)): candidate
    BetweenFactor measurements own.key -> neighbor.key, for robots != self.
    """

    def match_one(nb_pose, nb_points, nb_mask, nb_robot):
        guess = se2_between(own.pose, nb_pose)
        res = icp(
            nb_points, nb_mask, own.points, own.pmask, guess, icp_config
        )
        # overlap evaluated after registration, as in SLAM.get_overlap
        moved = se2_transform_points(nb_points, res.pose)
        ov = count_overlap(moved, nb_mask, own.points, own.pmask, point_noise)
        ok = res.ok & (ov >= min_overlap) & (nb_robot != own.robot_id)
        return res.pose, ok, ov

    return jax.vmap(match_one)(
        gathered.pose, gathered.points, gathered.pmask, gathered.robot_id
    )


# ----------------------------------------------------------------------
# end-to-end two-robot merge: propose -> PCM-vet -> insert -> optimize
# (turns the dormant ISAM2Update intent, `bruce_msgs/conversions.cpp:45-77`
#  + `slam_ros.py:127-128`, into a demonstrated capability)
# ----------------------------------------------------------------------


def multi_robot_scan(frames_stacked, params, dims, mesh: Mesh,
                     axis: str | None = None):
    """Run each robot's FULL SLAM scan on its own mesh lane.

    ``frames_stacked``: a KeyframeInput pytree with a leading robot axis,
    sharded one robot per device. Each lane runs the complete fused
    SSM/NSSM/PCM scan independently (robots don't communicate during the
    survey; exchange happens afterwards). Returns (carries, outputs) with the
    robot axis sharded over the mesh.
    """
    from ..slam.core import slam_scan

    axis = axis or mesh.axis_names[0]

    def body(frames):
        carry, outs = slam_scan(
            jax.tree.map(lambda x: x[0], frames), params, dims
        )
        return (jax.tree.map(lambda x: x[None], carry),
                jax.tree.map(lambda x: x[None], outs))

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis),),
        out_specs=(P(axis), P(axis)), check_vma=False,
    )
    return fn(frames_stacked)


def propose_interrobot_loops(
    own: KeyframeSummary,  # batched (P, ...): robot A candidate keyframes
    other: KeyframeSummary,  # batched (P, ...): robot B candidate keyframes
    sobol_samples: jax.Array,  # (S, 3) unit Sobol points
    bounds: jax.Array,  # (3,) half-widths of the inter-robot search box
    point_noise: float = 0.5,
    min_overlap: int = 30,
    icp_config: ICPConfig = ICPConfig(),
):
    """All-pairs inter-robot loop proposal.

    For every (a, b) candidate pair, run the NSSM-style global init (Sobol
    search around the shared-world-frame relative pose — both robots are
    assumed deployed in one approximate global frame, the reference's
    multi-robot convention with `rov_id` frames) followed by ICP. Returns
    per-pair (tf (P, P, 3): measurement a-local -> b, ok (P, P), overlap).
    """
    from ..slam.scan_matching import global_initialize

    def match_pair(a_pose, a_pts, a_msk, b_pose, b_pts, b_msk):
        gi = global_initialize(
            b_pts, b_msk, a_pts, a_msk,
            source_pose=b_pose, target_pose=a_pose,
            bounds=bounds, unit_samples=sobol_samples,
            point_noise=jnp.asarray(point_noise, jnp.float32),
            num_guesses=1,
        )
        guess = gi.guesses_vs(a_pose)[0]
        res = icp(b_pts, b_msk, a_pts, a_msk, guess, icp_config)
        moved = se2_transform_points(b_pts, res.pose)
        ov = count_overlap(moved, b_msk, a_pts, a_msk, point_noise)
        return res.pose, res.ok & (ov >= min_overlap), ov

    def row(a_pose, a_pts, a_msk):
        return jax.vmap(
            lambda bp, bpt, bm: match_pair(a_pose, a_pts, a_msk, bp, bpt, bm)
        )(other.pose, other.points, other.pmask)

    return jax.vmap(row)(own.pose, own.points, own.pmask)


def vet_interrobot_loops(
    a_poses: jax.Array,  # (Q, 3) robot-A pose of each proposal (A frame)
    b_poses: jax.Array,  # (Q, 3) robot-B pose of each proposal (B frame)
    tfs: jax.Array,  # (Q, 3) measured a-local -> b transforms
    covs: jax.Array,  # (Q, 3, 3)
    valid: jax.Array,  # (Q,)
    min_pcm: int = 2,
):
    """PCM over inter-robot proposals. The consistency cycle only uses
    RELATIVE poses within each robot (frame-independent), so A poses in A's
    frame and B poses in B's frame compose correctly — exactly the PCM of
    `slam.py:1243-1287` applied across robots."""
    from ..graph.pcm import pcm_select

    return pcm_select(b_poses, a_poses, tfs, covs, valid, min_pcm)


def merge_pose_graphs(
    graph_a,
    nk_a: int,
    graph_b,
    nk_b: int,
    a_keys,  # (Q,) accepted proposals: robot-A keyframe index
    b_keys,  # (Q,) robot-B keyframe index
    tfs,  # (Q, 3) measured a-local -> b
    covs,  # (Q, 3, 3)
    accept,  # (Q,) bool from vet_interrobot_loops
    merged_config,
    deployment_z=None,  # optional (3,) known relative deployment A0 -> B0
    deployment_sqrt_info=None,
):
    """Merge two robots' pose graphs into one (B keys offset by ``nk_a``).

    Robot A keeps its prior (gauge anchor); robot B's own prior is dropped —
    B is anchored through the accepted inter-robot factors, plus (optionally)
    a between-factor on the two first keyframes encoding the KNOWN relative
    deployment (the shared-world-frame premise of the reference's rov_id
    design): without it, B keyframes far from the link points inherit B's
    full internal drift. B's initial values are re-expressed in A's frame via
    the first accepted proposal. Host-side assembly (merging is an offline/
    exchange-time op, not the per-keyframe hot path); returns an optimizable
    GraphState.
    """
    import numpy as np

    from ..geometry import se2_compose, se2_inverse
    from ..graph.factor_graph import (add_between, cov_to_sqrt_info,
                                      graph_init, set_pose_estimate)

    accept_np = np.asarray(accept)
    if not accept_np.any():
        raise ValueError("no accepted inter-robot loops to merge on")
    first = int(np.argmax(accept_np))
    a0, b0 = int(a_keys[first]), int(b_keys[first])
    # world-A pose of B keyframe b0 = pose_A(a0) ∘ tf0  =>  frame map
    # T_AB = pose_A(a0) ∘ tf0 ∘ pose_B(b0)⁻¹
    t_ab = se2_compose(
        se2_compose(jnp.asarray(graph_a.poses[a0]), jnp.asarray(tfs[first])),
        se2_inverse(jnp.asarray(graph_b.poses[b0])),
    )

    st = graph_init(merged_config)
    st = st._replace(
        prior_pose=graph_a.prior_pose,
        prior_sqrt_info=graph_a.prior_sqrt_info,
    )
    for k in range(nk_a):
        st = set_pose_estimate(st, k, graph_a.poses[k])
    for k in range(nk_b):
        st = set_pose_estimate(
            st, nk_a + k, se2_compose(t_ab, jnp.asarray(graph_b.poses[k]))
        )

    # robot A factors verbatim; robot B factors re-indexed by +nk_a
    for g, off, nf in ((graph_a, 0, int(graph_a.num_factors)),
                       (graph_b, nk_a, int(graph_b.num_factors))):
        for f in range(nf):
            st = add_between(
                st, int(g.f_i[f]) + off, int(g.f_j[f]) + off, g.f_z[f],
                g.f_sqrt_info[f], robust=bool(g.f_robust[f]),
                scaled=bool(g.f_scaled[f]),
            )
    # accepted inter-robot between-factors
    for q in range(len(accept_np)):
        if accept_np[q]:
            st = add_between(
                st, int(a_keys[q]), nk_a + int(b_keys[q]), tfs[q],
                cov_to_sqrt_info(covs[q]),
            )
    if deployment_z is not None:
        st = add_between(st, 0, nk_a, jnp.asarray(deployment_z, jnp.float32),
                         jnp.asarray(deployment_sqrt_info, jnp.float32))
    return st
