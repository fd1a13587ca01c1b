"""Keyframe-axis sharding: the workload's honest "sequence parallelism".

SURVEY.md §5.7: the reference's spatial-growth hot spots scan ALL past
keyframes — the NSSM target search FOV-gates every keyframe's cloud
(`/root/reference/bruce_slam/src/bruce_slam/slam.py:870-899`) and
`update_factor_graph` re-transforms every keyframe's points
(`slam.py:1227-1230`). On one chip these are K-axis batched ops; when a
trajectory outgrows a chip, the K axis is the natural shard dimension.

This module shards those two reductions over a `jax.sharding.Mesh` axis with
`shard_map`:

* `transform_clouds_sharded` — every keyframe's local cloud into the global
  frame (the repaint/aggregation primitive), embarrassingly parallel on K.
* `nssm_gate_sharded` — the 5-sigma range/bearing FOV gating of all keyframe
  points against the source window, plus per-frame gated counts; each device
  gates only its K/D slice, and the tiny (K,) counts vector is the only
  thing implicitly gathered for the argmax target selection.

Numerics match the in-core single-device path (`slam/core.py:frame_sel`)
exactly — tests/test_parallel.py asserts equality on the 8-device CPU mesh.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se2_inverse, se2_transform_points
from ..slam.scan_matching import max_eig_2x2


def kf_sharding(mesh: Mesh, axis: str = "kf"):
    """NamedSharding that splits a leading keyframe axis over ``axis``."""
    def spec(x):
        return NamedSharding(mesh, P(*((axis,) + (None,) * (x.ndim - 1))))
    return spec


def transform_clouds_sharded(
    points: jax.Array,  # (K, N, 2) local clouds
    poses: jax.Array,  # (K, 3)
    mesh: Mesh,
    axis: str = "kf",
) -> jax.Array:
    """All keyframe clouds transformed to the global frame, K-sharded.

    The sharded analog of `slam/core.py`'s
    ``jax.vmap(se2_transform_points)(c.points, c.poses)`` and the mapping
    repaint's per-keyframe re-transform (`mapping_node.py:99-102`).
    """

    def body(pts, pos):
        return jax.vmap(se2_transform_points)(pts, pos)

    run = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis),
    ))
    return run(points, poses)


def nssm_gate_sharded(
    points: jax.Array,  # (K, N, 2) local clouds
    pmasks: jax.Array,  # (K, N)
    poses: jax.Array,  # (K, 3) current estimates
    tgt_frames_ok: jax.Array,  # (K,) candidate-frame mask (< limit etc.)
    src_poses: jax.Array,  # (W, 3) source-window poses
    src_covs: jax.Array,  # (W, 3, 3) their marginals
    src_ok: jax.Array,  # (W,) source-window validity
    mesh: Mesh,
    max_range: float,
    half_aperture: float,
    axis: str = "kf",
):
    """5-sigma FOV gating of every keyframe point against the source window,
    sharded over the keyframe axis.

    Returns (sel (K, N) bool — K-sharded, counts (K,) int32). Semantics match
    `slam/core.py` run_nssm's ``frame_sel`` chain (itself rebuilding
    `slam.py:870-899`): a point is selected iff it falls inside ANY source
    window frame's covariance-padded FOV wedge, and its frame is a candidate.
    """
    W = src_poses.shape[0]

    def body(pts, msk, pos, fok, sposes, scovs, sok):
        # local shard: (k, N, 2)
        gpts = jax.vmap(se2_transform_points)(pts, pos)
        flat = gpts.reshape(-1, 2)

        def frame_sel(w):
            pose = sposes[w]
            cov = scovs[w]
            tstd = jnp.sqrt(max_eig_2x2(cov[:2, :2]))
            rstd = jnp.sqrt(cov[2, 2])
            local = se2_transform_points(flat, se2_inverse(pose))
            rng = jnp.linalg.norm(local, axis=-1)
            brg = jnp.arctan2(local[:, 1], local[:, 0])
            inside = (rng < tstd * 5.0 + max_range) & (
                jnp.abs(brg) < rstd * 5.0 + half_aperture
            )
            return inside & sok[w]

        sels = jax.vmap(frame_sel)(jnp.arange(W))
        sel = jnp.any(sels, axis=0).reshape(msk.shape) & msk & fok[:, None]
        return sel, jnp.sum(sel, axis=1).astype(jnp.int32)

    run = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    ))
    return run(points, pmasks, poses, tgt_frames_ok, src_poses, src_covs,
               src_ok)


def nssm_target_select_sharded(
    points, pmasks, poses, tgt_frames_ok, src_poses, src_covs, src_ok,
    mesh: Mesh, max_range: float, half_aperture: float,
    min_counts: int = 10, axis: str = "kf",
):
    """Full sharded target selection: gate (sharded) then pick the candidate
    frame with the most gated points (`slam.py:901-916`). The argmax runs on
    the replicated (K,) counts — the only cross-device data movement."""
    sel, counts = nssm_gate_sharded(
        points, pmasks, poses, tgt_frames_ok, src_poses, src_covs, src_ok,
        mesh, max_range, half_aperture, axis,
    )
    counts_ok = counts > min_counts
    best = jnp.argmax(jnp.where(counts_ok, counts, -1))
    have = jnp.any(counts_ok)
    return sel, counts, best, have
