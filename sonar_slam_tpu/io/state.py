"""State export and checkpoint/resume.

* ``get_states`` reproduces the reference's structured state array
  (`SLAM.get_states`, `/root/reference/bruce_slam/src/bruce_slam/
  slam.py:165-202`): per keyframe [time, pose2, dr_pose3, cov(3x3)] with
  covariances refreshed from the smoother and rotated to the global frame
  (`Keyframe.update`, `slam_objects.py:169-176`).
* ``save_checkpoint``/``load_checkpoint`` serialize the full ``SlamCarry``
  pytree — the working equivalent of the reference's dormant boost-serialized
  ``ISAM2Update`` snapshot (`bruce_msgs/src/bruce_msgs/conversions.cpp:45-77`,
  SURVEY.md §5.4). The carry is pure arrays, so a checkpoint is exact:
  resuming and continuing the scan is bit-identical to never stopping.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.factor_graph import marginal_covariance
from ..slam.core import SlamCarry, SlamDims

STATE_DTYPE = np.dtype(
    [
        ("time", np.float64),
        ("pose", np.float32, 3),
        ("dr_pose3", np.float32, 6),
        ("cov", np.float32, 9),
    ]
)


def _global_cov(cov: np.ndarray, theta: float) -> np.ndarray:
    """Rotate a local-frame covariance into the global frame
    (`slam_objects.py:169-176`)."""
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]], np.float32)
    out = cov.copy()
    out[:2, :2] = R @ out[:2, :2] @ R.T
    out[:2, 2] = R @ out[:2, 2]
    out[2, :2] = out[2, :2] @ R.T
    return out


def get_states(carry: SlamCarry, dims: SlamDims, refresh_covs: bool = True):
    """Export the trajectory as the reference's structured array.

    With ``refresh_covs`` the marginal covariance of *every* keyframe is
    recomputed from the current linearization (as `get_states` does via
    `isam.marginalCovariance`, `slam.py:188-192`) — batched in one vmap.
    """
    nk = int(carry.num_kf)
    states = np.zeros(nk, STATE_DTYPE)
    if nk == 0:
        return states
    if refresh_covs:
        gcfg = dims.graph_config()
        covs = jax.vmap(
            lambda k: marginal_covariance(carry.graph, k, gcfg)
        )(jnp.arange(nk))
        covs = np.asarray(covs)
    else:
        covs = np.asarray(carry.covs[:nk])

    times = np.asarray(carry.times[:nk], np.float64)
    poses = np.asarray(carry.poses[:nk])
    dr3 = np.asarray(carry.dr_poses3[:nk])
    t0 = times[0]
    for k in range(nk):
        states[k]["time"] = times[k] - t0
        states[k]["pose"] = poses[k]
        states[k]["dr_pose3"] = dr3[k]
        states[k]["cov"] = _global_cov(covs[k], poses[k][2]).ravel()
    return states


# ----------------------------------------------------------------------
# checkpoint / resume
# ----------------------------------------------------------------------


def save_checkpoint(path: str, carry) -> None:
    """Serialize any framework pytree (SlamCarry, MappingState, ...) to npz."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    np.savez_compressed(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_checkpoint(path: str, template):
    """Restore a pytree saved by ``save_checkpoint`` into the structure of
    ``template`` (shapes/dtypes validated leaf-by-leaf)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template "
                f"{np.shape(leaf)}"
            )
        restored.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, restored)
