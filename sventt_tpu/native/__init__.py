"""Native host runtime: C++ golden oracle and field helpers via ctypes.

The compute path of the framework is JAX/XLA/Pallas; this package carries
the host-side native components (the role the reference's C++ host code
plays outside the SVE kernels): an exact golden NTT oracle at native speed,
naive convolution, and table-companion helpers.  Built on first use with the
system compiler; everything degrades to the pure-Python golden model if no
compiler is available (``available()`` reports which).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "host_golden.cc")
_LIB = os.path.join(_HERE, "libsventt_host.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    for cc in ("c++", "g++", "cc", "gcc"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                capture_output=True,
                timeout=120,
            )
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            # a committed/stale .so can be for another OS or arch (dlopen
            # fails even though the file exists); rebuild from source once
            # and retry before giving up the oracle
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB)
            except OSError:
                return None
        u64 = ctypes.c_uint64
        p64 = ctypes.POINTER(ctypes.c_uint64)
        lib.sventt_powmod.restype = u64
        lib.sventt_powmod.argtypes = [u64, u64, u64]
        lib.sventt_invmod.restype = u64
        lib.sventt_invmod.argtypes = [u64, u64]
        lib.sventt_golden_forward.restype = ctypes.c_int
        lib.sventt_golden_forward.argtypes = [p64, u64, u64, u64]
        lib.sventt_golden_inverse.restype = ctypes.c_int
        lib.sventt_golden_inverse.argtypes = [p64, u64, u64, u64]
        lib.sventt_cyclic_convolve_naive.restype = ctypes.c_int
        lib.sventt_cyclic_convolve_naive.argtypes = [p64, p64, p64, u64, u64]
        lib.sventt_montgomery_inverse.restype = u64
        lib.sventt_montgomery_inverse.argtypes = [u64]
        lib.sventt_shoup_precompute.restype = u64
        lib.sventt_shoup_precompute.argtypes = [u64, u64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def golden_forward(data, modulus: int, generator: int):
    """Native golden DIF forward (bit-reversed out), or None if unavailable.

    ``data``: numpy uint64 array, canonical residues; returns a new array.
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    from ..field.modulus import Modulus

    a = np.ascontiguousarray(np.asarray(data, dtype=np.uint64))
    m = a.shape[0]
    omega = Modulus(modulus, generator).get_root_forward(m)
    out = a.copy()
    rc = lib.sventt_golden_forward(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), m, modulus, omega
    )
    if rc != 0:
        raise ValueError("golden_forward failed (m must be a power of two)")
    return out


def golden_inverse(data, modulus: int, generator: int):
    """Native golden DIT inverse (natural order out), or None."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    from ..field.modulus import Modulus

    a = np.ascontiguousarray(np.asarray(data, dtype=np.uint64))
    m = a.shape[0]
    omega = Modulus(modulus, generator).get_root_forward(m)
    out = a.copy()
    rc = lib.sventt_golden_inverse(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), m, modulus, omega
    )
    if rc != 0:
        raise ValueError("golden_inverse failed (m must be a power of two)")
    return out
