"""L0 kernels: CFAR detectors and polar-image ops for Oculus sonar frames.

TPU-native replacements for the reference's native compute layer
(`/root/reference/bruce_slam/src/bruce_slam/cpp/cfar.cpp` and the OpenCV
polar→Cartesian remap in `feature_extraction.py` / `sonar.py`).
"""

from .cfar import (
    cfar_ca,
    cfar_soca,
    cfar_goca,
    cfar_os,
    cfar_ca2,
    cfar_soca2,
    cfar_goca2,
    cfar_os2,
    CFAR,
)
from .cfar_factors import (
    threshold_factor_ca,
    threshold_factor_soca,
    threshold_factor_goca,
    threshold_factor_os,
)
