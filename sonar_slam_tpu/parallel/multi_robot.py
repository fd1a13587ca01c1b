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
