"""Utilities: instance caching, profiling hooks, truthful device timing."""

from .cache import cached_ntt, clear_ntt_cache
from .profiling import phase_breakdown, trace
from .truetime import measure_rtt, stream_gbps, time_chained

__all__ = [
    "cached_ntt",
    "clear_ntt_cache",
    "measure_rtt",
    "phase_breakdown",
    "stream_gbps",
    "time_chained",
    "trace",
]
