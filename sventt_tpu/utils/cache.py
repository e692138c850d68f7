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

#: Guards the dicts only -- NEVER held across NTT construction (table prep
#: takes seconds to minutes; unrelated configs must not serialize on it).
_lock = threading.Lock()
_cache: dict[NttConfig, NTT] = {}
_building: dict[NttConfig, threading.Lock] = {}


def cached_ntt(
    config: NttConfig, enable_forward: bool = True, enable_inverse: bool = True
) -> NTT:
    """The process-wide NTT instance for this config (constructed once).

    Cached instances are always built with both directions enabled, so any
    combination of the ``enable_*`` flags is satisfied by the same entry
    (the flags exist for signature parity with ``NTT``).  Construction runs
    under a per-config lock: two threads warming different configs build
    concurrently, two threads racing the same config build it once.
    """
    with _lock:
        ntt = _cache.get(config)
        if ntt is not None:
            return ntt
        keylock = _building.setdefault(config, threading.Lock())
    with keylock:
        with _lock:
            ntt = _cache.get(config)
        if ntt is None:
            ntt = NTT(config, enable_forward=True, enable_inverse=True)
            with _lock:
                _cache[config] = ntt
        return ntt


def clear_ntt_cache() -> None:
    with _lock:
        _cache.clear()
        _building.clear()
