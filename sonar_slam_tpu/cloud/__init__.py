"""L2 cloud ops: fixed-capacity masked point clouds on TPU.

Replaces `/root/reference/bruce_slam/src/bruce_slam/cpp/pcl.cpp` (libnabo
KD-tree matching, PCL radius outlier removal, octree voxel downsampling and
the libpointmatcher ICP pipeline). All ops take ``(points[N, 2], mask[N])``
pairs with static capacity N; invalid entries are ignored via masking, so
everything is jit/vmap-able and batches across frames, hypotheses and devices.
"""

from .knn import pairwise_sq_dists, nn_match, count_overlap
from .voxel import (
    VoxelGridSpec,
    voxel_downsample,
    voxel_downsample_with_conf,
    voxel_downsample_with_keys,
)
from .filters import remove_outlier, density_filter
from .icp import ICPConfig, ICPResult, icp, icp_multistart
from .normals import estimate_normals
