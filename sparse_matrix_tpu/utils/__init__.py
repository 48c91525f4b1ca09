"""Utilities: linprobe hash tables, debug flags, profiling helpers."""

from .linprobe import LinProbeSet, LinProbeMap, mul_hash_u32, EMPTY, MIN_CAPACITY  # noqa: F401
from .profiling import trace, trace_dir  # noqa: F401
from .debugflags import (  # noqa: F401
    debug_enabled,
    set_debug,
    record_histogram,
    get_histograms,
    clear_histograms,
)
