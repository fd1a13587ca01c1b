"""L6 mapping: log-odds occupancy grids with loop-closure repaint.

Rebuild of `/root/reference/bruce_slam/src/bruce_slam/mapping.py` (classes
``Submap``/``Mapping``) and the mapping node shell (`mapping_node.py`).
"""

from .occupancy import (
    MappingConfig,
    MappingState,
    SubmapModel,
    mapping_init,
    build_submap_logodds,
    add_keyframe,
    update_poses,
    render_global_logodds,
    occupancy_grid_method1,
    occupancy_grid_method2,
    intensity_grid,
    submap_intensity,
    grow,
    resample_grid,
    get_occupancy_map,
    save_submaps,
)
from .metrics import map_metrics, observed_mask, occupied_cell_centers
