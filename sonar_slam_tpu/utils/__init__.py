"""L3-style utilities: profiling, logging, stream registry, visualization."""

from .timing import CodeTimer, set_timing_enabled, timing_report
from .logging import loginfo, logwarn, logerror, logdebug, set_log_level
from .streams import Streams
from .profile import profile_slam_components
