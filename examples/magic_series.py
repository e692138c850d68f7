"""Magic-series counting demo: the framework's end-to-end application.

Counts magic series of order m (multisets of m distinct values in
[1, m^2] summing to the magic constant) two independent ways:

1. NTT convolution pipeline: M(m) = [q^(m^2(m-1)/2)] qbinom(m^2, m)
   (the reference's examples/magic-series).
2. Kinnaes closed form over roots of unity (examples/magic-series-kinnaes).

Usage: python examples/magic_series.py [m]
"""

import sys

sys.path.insert(0, ".")

from sventt_tpu import TEST_GENERATOR, TEST_MODULUS
from sventt_tpu.apps import (
    kinnaes_magic_series_count,
    kinnaes_parameters,
    magic_series_count,
)


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    via_ntt = magic_series_count(m, TEST_MODULUS, TEST_GENERATOR)
    print(f"M({m}) mod {hex(TEST_MODULUS)} via NTT convolution: {via_ntt}")
    N, g, n = kinnaes_parameters(m)
    via_kinnaes = kinnaes_magic_series_count(m, N, g, n)
    print(f"M({m}) mod {hex(N)} via Kinnaes closed form:  {via_kinnaes}")
    if TEST_MODULUS == N:
        print("match:", via_ntt == via_kinnaes)
    else:
        # Different moduli: residues agree iff they came from the same
        # integer (true when M(m) < both moduli).
        print("cross-check: run both mod the same prime to compare directly;")
        print("see tests/test_apps.py::test_three_way_cross_check.")


if __name__ == "__main__":
    main()
