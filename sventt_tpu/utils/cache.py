"""Twiddle/instance cache keyed by NttConfig.

The reference rebuilds its aux vector deterministically in every NTT ctor
(reference include/sventt/wrapper.hpp:34-46) -- cheap there, but here table
preparation involves host Python-int math plus device transfers, and jit
caches are per-instance.  SURVEY.md section 6 calls for a "twiddle cache
keyed by (N, g, n, decomposition)"; this is it: one NTT instance per config
per process, so repeated construction (applications, benchmarks, notebooks)
reuses prepared tables and compiled programs.
"""

from __future__ import annotations

import threading

from ..plan.config import NttConfig
from ..plan.wrapper import NTT

_lock = threading.Lock()
_cache: dict[tuple, NTT] = {}


def cached_ntt(
    config: NttConfig, enable_forward: bool = True, enable_inverse: bool = True
) -> NTT:
    """The process-wide NTT instance for this config (constructed once).

    A cached instance always has at least the requested directions enabled;
    requesting more directions than a cached instance has re-prepares it.
    """
    key = (config, True, True)  # cache fully-enabled instances only
    with _lock:
        ntt = _cache.get(key)
        if ntt is None or (
            (enable_forward and ntt._fwd is None)
            or (enable_inverse and ntt._inv is None)
        ):
            ntt = NTT(config, enable_forward=True, enable_inverse=True)
            _cache[key] = ntt
        return ntt


def clear_ntt_cache() -> None:
    with _lock:
        _cache.clear()
