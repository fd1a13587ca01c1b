"""L4 graph: incremental SE(2) factor-graph smoothing on TPU.

Replaces GTSAM's ISAM2 backend (`/root/reference/bruce_slam/src/bruce_slam/
slam.py:54-59,1210-1241`) with a masked, fixed-capacity Gauss-Newton smoother
over padded keyframe arrays. At sonar-SLAM scales (<= ~10^3 keyframes) a full
relinearized batch solve per keyframe is cheaper on TPU than porting the Bayes
tree — the dense normal equations build is a scatter-add and the solve is one
Cholesky on the MXU — and it is *more* converged than incremental ISAM2.

The PCM loop-closure vetting lives in `pcm.py`.
"""

from .factor_graph import (
    GraphConfig,
    GraphState,
    graph_init,
    add_prior,
    add_between,
    set_pose_estimate,
    optimize,
    marginal_covariance,
    sigmas_to_sqrt_info,
    cov_to_sqrt_info,
    Smoother,
)
from .pcm import (
    pcm_select,
    pairwise_consistency_matrix,
    max_clique_mask,
    max_clique_host,
    CHI2_99_3DOF,
)
