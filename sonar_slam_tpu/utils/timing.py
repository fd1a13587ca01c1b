"""Wall-clock span profiling + JAX profiler hooks.

Rebuild of the reference's ``CodeTimer`` context manager
(`/root/reference/bruce_slam/src/bruce_slam/utils/io.py:229-260`), extended
with an accumulated per-span report and an optional JAX trace context. The
four reference span names are kept so numbers are comparable (SURVEY.md §5.1):
"SLAM - sequential scan matching - sampling" / "- ICP" and the
non-sequential pair.

Note: under jit, spans measure host-side dispatch+sync only — wrap the block
with ``jax.block_until_ready`` (``sync=``) for honest device timings, or use
``jax_profile_trace`` for an XLA-level profile.
"""

from __future__ import annotations

import contextlib
import timeit
from collections import defaultdict

from .logging import logdebug

_ENABLED = True
_TOTALS: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)


def set_timing_enabled(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = enabled


class CodeTimer:
    """``with CodeTimer("name", sync=arrays): ...`` wall-clock span."""

    def __init__(self, name: str = "code block", silent: bool = False, sync=None):
        self.name = name
        self.silent = silent
        self.sync = sync
        self.took = 0.0

    def __enter__(self):
        self.start = timeit.default_timer()
        return self

    def __exit__(self, exc_type, exc_value, tb):
        if self.sync is not None:
            import jax

            jax.block_until_ready(self.sync)
        self.took = timeit.default_timer() - self.start
        _TOTALS[self.name] += self.took
        _COUNTS[self.name] += 1
        if _ENABLED and not self.silent:
            logdebug(f"{self.name} took {self.took * 1000.0:.2f} ms")
        return False


def timing_report() -> dict[str, tuple[float, int]]:
    """{span: (total_seconds, calls)} accumulated since start/reset."""
    return {k: (_TOTALS[k], _COUNTS[k]) for k in _TOTALS}


def reset_timing() -> None:
    _TOTALS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def jax_profile_trace(logdir: str):
    """Capture an XLA profiler trace around a block (view with xprof/TB)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
