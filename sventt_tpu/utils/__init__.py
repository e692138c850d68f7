"""Utilities: instance caching, profiling hooks."""

from .cache import cached_ntt, clear_ntt_cache
from .profiling import phase_breakdown, trace

__all__ = ["cached_ntt", "clear_ntt_cache", "phase_breakdown", "trace"]
