"""Reference-scale cross-check: magic series of order 30 two independent ways
under ONE shared prime, so the counts must be bit-identical.

The modulus is searched to satisfy both algorithms simultaneously:
2-adicity >= 15 for the NTT convolution pipeline (r = 13050 -> 2^15-point
transforms) and an odd n = 13051 | N-1 with all prime factors > 30 for the
Kinnaes roots-of-unity sum.  This mirrors the reference's strategy of
validating its NTT applications against the algorithmically independent
closed form (examples/magic-series-kinnaes).

Verified output (both methods): M(30) mod N = 2818567648502317936 with
N = 0x3ffffffea6928001. Takes a few minutes (the restricted-partition DP
is exact host Python).

Usage: python examples/magic_series_crosscheck.py [m]
"""

import sys
import time

sys.path.insert(0, ".")

from sventt_tpu.apps.kinnaes import kinnaes_length, kinnaes_magic_series_count_host
from sventt_tpu.apps.series import magic_series_count
from sventt_tpu.field.modulus import find_generator, is_probable_prime


def shared_modulus(m: int, bits: int = 62, two_adicity: int | None = None):
    """Prime N with 2^two_adicity | N-1 and odd n > r, min factor > m,
    n | N-1 -- valid for both the NTT pipeline and the Kinnaes sum.

    ``two_adicity`` defaults to what the convolution pipeline actually
    needs for this m: the linear convolution length 2r+1 rounds up to a
    2^ceil(log2(2r+1))-point transform (a fixed 15 broke m >= 33)."""
    r = m * m * (m - 1) // 2
    if two_adicity is None:
        two_adicity = (2 * r).bit_length()
    n = kinnaes_length(m)
    step = n << two_adicity
    j = ((1 << bits) - 2) // step
    while j > 0:
        N = j * step + 1
        if is_probable_prime(N):
            return N, find_generator(N), n
        j -= 1
    raise ValueError("no prime found")


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    N, g, n = shared_modulus(m)
    print(f"m={m}  N={hex(N)}  generator={g}  n={n}")
    t0 = time.time()
    via_ntt = magic_series_count(m, N, g)
    print(f"NTT convolution pipeline: {via_ntt}  ({time.time() - t0:.0f}s)")
    t0 = time.time()
    via_kin = kinnaes_magic_series_count_host(m, N, g, n)
    print(f"Kinnaes closed form:      {via_kin}  ({time.time() - t0:.0f}s)")
    assert via_ntt == via_kin, "cross-check FAILED"
    print("cross-check: MATCH")


if __name__ == "__main__":
    main()
