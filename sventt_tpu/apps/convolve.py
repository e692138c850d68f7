"""NTT-based convolution: the forward/pointwise/inverse composition.

The integration pattern of the reference's chunked power-series division
(reference examples/magic-series/gaussian-polynomial.hpp:148-244): forward
NTT both operands, convert one spectrum to the Montgomery domain, multiply
pointwise, inverse NTT.  Because forward output order is bit-reversed and the
inverse consumes exactly that order, the pointwise product needs no
reordering (SURVEY.md section 4.1).
"""

from __future__ import annotations

import numpy as np

from ..field.limb import U64, u64_from_int, u64_from_numpy, u64_to_numpy
from ..plan import NTT, NttConfig


def _next_pow2(x: int) -> int:
    return 1 << max(1, (x - 1).bit_length())


def make_convolver(modulus: int, generator: int, n: int, **cfg_kw) -> NTT:
    """An NTT sized for length-n cyclic convolutions."""
    return NTT(NttConfig(modulus, generator, n, **cfg_kw))


def cyclic_convolve(ntt: NTT, a: U64, b: U64) -> U64:
    """Length-n cyclic convolution of two device vectors (plain domain).

    Mirrors gaussian-polynomial.hpp:173-212: one operand's spectrum is
    converted to the Montgomery domain so the pointwise Montgomery product
    yields plain-domain results.
    """
    fc = ntt.fc
    fa = ntt.compute_forward(a)
    fb = ntt.compute_forward(b)
    r2 = u64_from_int(ntt.mod.montgomery_r2)
    fb_mont = fc.mont_mul_full(fb, r2)  # to Montgomery domain
    prod = fc.mont_mul_full(fa, fb_mont)
    if fc.lazy:
        prod = fc.normalize(prod)
    return ntt.compute_inverse(prod)


def poly_multiply(
    a: np.ndarray,
    b: np.ndarray,
    modulus: int,
    generator: int,
    *,
    out_len: int | None = None,
    ntt: NTT | None = None,
) -> np.ndarray:
    """Linear convolution (polynomial product) of coefficient arrays mod N.

    Host-convenience wrapper: zero-pads to the next power of two >= the
    full product length, runs the cyclic pipeline on device, returns
    canonical uint64 coefficients (truncated to ``out_len`` if given).
    """
    la, lb = len(a), len(b)
    full = la + lb - 1
    n = _next_pow2(full)
    if ntt is not None:
        if ntt.get_m() < full:
            raise ValueError("provided NTT is too short for the product")
        n = ntt.get_m()
    else:
        ntt = make_convolver(modulus, generator, n)
    pa = np.zeros(n, dtype=np.uint64)
    pb = np.zeros(n, dtype=np.uint64)
    pa[:la] = a
    pb[:lb] = b
    out = cyclic_convolve(ntt, u64_from_numpy(pa), u64_from_numpy(pb))
    res = u64_to_numpy(ntt.fc.normalize(out))[:full]
    return res[:out_len] if out_len is not None else res
