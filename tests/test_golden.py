"""Golden-model validation: the role of reference tests/test-ntt-reference.cpp.

The golden model is checked against the DFT definition itself (spot outputs
at indices 0, 1, m/2 and the full naive DFT), the round-trip identity, and
the convolution theorem -- so everything downstream can trust it as the
bit-exactness oracle.
"""

import pytest

from sventt_tpu.field.golden import (
    GoldenNTT,
    bitreverse,
    bitreverse_permutation,
    naive_dft,
)
from sventt_tpu.field.modulus import (
    FLAGSHIP_GENERATOR,
    FLAGSHIP_MODULUS,
    GOLDILOCKS_MODULUS,
    TEST_GENERATOR,
    TEST_MODULUS,
    Modulus,
)

# Five moduli like reference tests/test-ntt-reference.cpp:17-28.
MODULI = [
    Modulus(GOLDILOCKS_MODULUS, 7),
    Modulus(TEST_MODULUS, TEST_GENERATOR),
    Modulus(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR),
    Modulus(0xFFFF_FFFF_FFFF_FFC5, 0),  # largest 64-bit prime (no 2-adicity use)
    Modulus((1 << 32) + 15, 3),
]


def _rand_vec(rng, m, N):
    return [int(x) % N for x in rng.integers(0, 1 << 63, size=m)]


def test_bitreverse():
    assert bitreverse(0b001, 3) == 0b100
    assert bitreverse(0b011, 3) == 0b110
    assert bitreverse(1, 1) == 1
    perm = bitreverse_permutation(8)
    assert perm == [0, 4, 2, 6, 1, 5, 3, 7]
    for i in range(8):
        assert perm[perm[i]] == i


@pytest.mark.parametrize("log2m", range(1, 8))
def test_forward_is_bitreversed_dft(rng, log2m):
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    m = 1 << log2m
    ntt = GoldenNTT(m, mod)
    x = _rand_vec(rng, m, mod.modulus)
    got = ntt.forward(x)
    want_natural = naive_dft(x, mod)
    perm = bitreverse_permutation(m)
    # forward(x)[p] == DFT(x)[bitrev(p)] (reference tests/ntt-reference.hpp:43-61)
    assert got == [want_natural[perm[p]] for p in range(m)]
    # spot checks straight from the definition (test-ntt-reference.cpp:45-80):
    N = mod.modulus
    assert got[0] == sum(x) % N  # X[0] = plain sum
    if m >= 2:
        alt = sum(v if i % 2 == 0 else -v for i, v in enumerate(x)) % N
        assert got[1] == alt  # position 1 holds X[m/2] = alternating sum


@pytest.mark.parametrize(
    "mod", [m for m in MODULI if m.generator], ids=lambda m: hex(m.modulus)
)
@pytest.mark.parametrize("log2m", [1, 2, 4, 6])
def test_roundtrip(rng, mod, log2m):
    m = 1 << log2m
    if (mod.modulus - 1) % m:
        pytest.skip("modulus lacks 2-adicity for this m")
    ntt = GoldenNTT(m, mod)
    x = _rand_vec(rng, m, mod.modulus)
    assert ntt.inverse(ntt.forward(x)) == x  # test-ntt-reference.cpp:82-85


def test_convolution_theorem(rng):
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    m = 32
    ntt = GoldenNTT(m, mod)
    N = mod.modulus
    a = _rand_vec(rng, m, N)
    b = _rand_vec(rng, m, N)
    got = ntt.cyclic_convolve(a, b)
    want = [0] * m
    for i in range(m):
        for j in range(m):
            want[(i + j) % m] = (want[(i + j) % m] + a[i] * b[j]) % N
    assert got == want


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError):
        GoldenNTT(24, Modulus(TEST_MODULUS, TEST_GENERATOR))
