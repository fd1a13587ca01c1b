"""Parallel execution: vmapped config sweeps sharded over a device mesh.

The reference's parallelism is ROS process-level only (SURVEY.md §2); its
benchmark harness replays each bag 10x sequentially (`run_bag.sh`). The TPU
equivalents built here:

* ``sweep``: vmap the entire SLAM replay over stacked ``SlamParams`` lanes
  and shard the lane axis over a ``jax.sharding.Mesh`` — 64 CFAR/ICP
  hyperparameter configs replay in parallel on one slice (BASELINE.json
  configs[4]). Determinism: identical lanes produce identical trajectories.
* ``multi_robot``: a collective-based analog of the dormant ``ISAM2Update``
  state-exchange message (bruce_msgs, SURVEY.md C20) — robots exchange
  compact pose/factor deltas with ``all_gather`` over ICI.
"""

from .sweep import stack_params, sweep_scan, make_config_mesh
from .multi_robot import exchange_keyframes, merge_interrobot_factors
