"""L7 IO: dataset containers, stream alignment, synthetic bag simulation,
config parsing, and state export.

The reference's rosbag/ROS-middleware layer (`utils/io.py`, message_filters
time synchronizers) becomes host-side preprocessing into time-sorted tensors
(`dataset.py`), with a physics-based synthetic BlueROV bag generator
(`simulate.py`) standing in for the external sample rosbag (a Google Drive
download in the reference README — not vendored here).
"""

from .dataset import (
    SensorStreams,
    DRTickBundle,
    build_dr_ticks,
    match_pings_to_ticks,
)
from .simulate import SimConfig, SyntheticBag, simulate_bag
