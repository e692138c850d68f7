"""Native streaming q-series generators vs the numpy oracles.

The C++ generators (native/series.cc) mirror the reference's streaming
components: RestrictedPartition's rolling ring-buffer DP (reference
examples/magic-series/restricted-partition.hpp:37-50), the q-Pochhammer
product (gaussian-polynomial.hpp:19-45), and the Rothe-segment numerator
(gaussian-polynomial.hpp:52-146).  The numpy implementations in
apps/series.py (use_native=False) are the oracles.
"""

from __future__ import annotations

import numpy as np
import pytest

from sventt_tpu import native
from sventt_tpu.apps import series

N64 = 0xFFFFFC6E80000001  # flagship (64-bit)
N62 = 0x3A00000000000001  # reference test modulus (62-bit)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no host compiler for the native library"
)


@pytest.mark.parametrize("modulus", [N64, N62])
@pytest.mark.parametrize("k,degree", [(1, 10), (5, 64), (31, 500)])
def test_qpochhammer_matches_numpy(modulus, k, degree):
    got = native.qpochhammer(k, degree, modulus)
    want = series.q_pochhammer_coeffs(k, degree, modulus, use_native=False)
    assert (got == want).all()


@pytest.mark.parametrize("modulus", [N64, N62])
@pytest.mark.parametrize("k,degree", [(1, 32), (7, 300), (40, 1200)])
def test_restricted_partition_stream_matches_numpy(modulus, k, degree):
    want = series.restricted_partition_series(
        k, degree, modulus, use_native=False
    )
    with native.restricted_partition_stream(k, modulus) as s:
        # stream in uneven blocks to exercise the ring-buffer state
        parts, left = [], degree + 1
        for blk in (1, k, 3 * k + 1):
            take = min(blk, left)
            parts.append(s.next(take))
            left -= take
        if left:
            parts.append(s.next(left))
    got = np.concatenate(parts)
    assert s.position == degree + 1
    assert (got == want).all()


def test_restricted_partition_plain_integers():
    # p(n | parts <= 2) = 1,1,2,2,3,3,... ; p(n | parts <= 1) = all ones
    with native.restricted_partition_stream(2, N64) as s:
        assert list(s.next(10)) == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    with native.restricted_partition_stream(1, N62) as s:
        assert list(s.next(6)) == [1] * 6


@pytest.mark.parametrize("modulus", [N64, N62])
@pytest.mark.parametrize("n,k", [(9, 3), (25, 5), (64, 8), (100, 100)])
def test_gauss_numerator_range_matches_numpy(modulus, n, k):
    deg = min(n * k, 900)
    want = series._qbinom_numerator(n, k, deg, modulus, use_native=False)
    got = native.gauss_numerator_range(0, deg + 1, n, k, modulus)
    assert (got == want).all()
    # arbitrary interior window
    lo = deg // 3
    got_win = native.gauss_numerator_range(lo, deg - lo, n, k, modulus)
    assert (got_win == want[lo:deg]).all()


def test_gauss_numerator_rejects_k_above_n():
    with pytest.raises(ValueError):
        native.gauss_numerator_range(0, 4, 3, 5, N64)


def test_series_public_functions_use_native_consistently():
    """The public functions must return the same values whichever backend
    serves them (native preferred, numpy fallback)."""
    for fn, args in [
        (series.q_pochhammer_coeffs, (9, 200, N64)),
        (series.restricted_partition_series, (9, 200, N64)),
    ]:
        a = fn(*args, use_native=True)
        b = fn(*args, use_native=False)
        assert (a == b).all()
    a = series._qbinom_numerator(81, 9, 300, N62, use_native=True)
    b = series._qbinom_numerator(81, 9, 300, N62, use_native=False)
    assert (a == b).all()


def test_magic_series_chunked_with_streamed_numerator():
    """End-to-end: the chunked convolution path (which streams numerator
    blocks from the native Rothe segments) still reproduces M(m)."""
    # M(4) = 86; chunked path with a small block size
    got = series.magic_series_count(4, N62, 3, chunk=16)
    assert got == 86
