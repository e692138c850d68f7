"""u64-as-2xu32 limb arithmetic: device ops vs exact Python-int models.

Exhaustive-ish randomized checks of every primitive in
sventt_tpu/field/limb.py, including the corner values (0, 1, 2^32-1, 2^64-1,
N-1, 2N-1) that stress the carry/borrow chains.
"""

import numpy as np
import pytest

import jax

from sventt_tpu.field.limb import (
    U64,
    FieldConsts,
    mul32_wide,
    u64_add,
    u64_add_carry,
    u64_from_numpy,
    u64_lt,
    u64_min,
    u64_mul_wide,
    u64_mulhi,
    u64_mullo,
    u64_sub,
    u64_sub_borrow,
    u64_to_numpy,
)
from sventt_tpu.field.modulus import (
    FLAGSHIP_GENERATOR,
    FLAGSHIP_MODULUS,
    GOLDILOCKS_MODULUS,
    TEST_GENERATOR,
    TEST_MODULUS,
    Modulus,
)

M64 = (1 << 64) - 1


def _pairs(rng, n=512):
    corner = np.array(
        [0, 1, 2, 0xFFFF_FFFF, 1 << 32, M64, M64 - 1, 0x8000_0000_0000_0000],
        dtype=np.uint64,
    )
    a = np.concatenate([corner, rng.integers(0, 1 << 64, size=n, dtype=np.uint64)])
    b = np.concatenate(
        [corner[::-1], rng.integers(0, 1 << 64, size=n, dtype=np.uint64)]
    )
    return a, b


def test_roundtrip_numpy(rng):
    a = rng.integers(0, 1 << 64, size=64, dtype=np.uint64)
    assert (u64_to_numpy(u64_from_numpy(a)) == a).all()


def test_mul32_wide(rng):
    a = rng.integers(0, 1 << 32, size=1024, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=1024, dtype=np.uint64).astype(np.uint32)
    a[:3] = [0xFFFFFFFF, 0xFFFFFFFF, 0]
    b[:3] = [0xFFFFFFFF, 1, 0xFFFFFFFF]
    got = jax.jit(mul32_wide)(a, b)
    want = a.astype(np.uint64) * b.astype(np.uint64)
    assert (u64_to_numpy(got) == want).all()


def test_add_sub_mul(rng):
    a, b = _pairs(rng)
    ua, ub = u64_from_numpy(a), u64_from_numpy(b)
    ia, ib = a.astype(object), b.astype(object)  # exact ints

    assert (u64_to_numpy(jax.jit(u64_add)(ua, ub)) == (a + b)).all()
    assert (u64_to_numpy(jax.jit(u64_sub)(ua, ub)) == (a - b)).all()
    s, c = jax.jit(u64_add_carry)(ua, ub)
    want_c = np.array([(x + y) >> 64 for x, y in zip(ia, ib)], dtype=np.uint32)
    assert (np.asarray(c) == want_c).all()
    d, bo = jax.jit(u64_sub_borrow)(ua, ub)
    assert (np.asarray(bo) == (a < b).astype(np.uint32)).all()

    lo = jax.jit(u64_mullo)(ua, ub)
    hi = jax.jit(u64_mulhi)(ua, ub)
    wide_hi, wide_lo = jax.jit(u64_mul_wide)(ua, ub)
    want_full = [int(x) * int(y) for x, y in zip(ia, ib)]
    assert (u64_to_numpy(lo) == np.array([w & M64 for w in want_full], np.uint64)).all()
    assert (u64_to_numpy(hi) == np.array([w >> 64 for w in want_full], np.uint64)).all()
    assert (u64_to_numpy(wide_lo) == u64_to_numpy(lo)).all()
    assert (u64_to_numpy(wide_hi) == u64_to_numpy(hi)).all()

    assert (np.asarray(jax.jit(u64_lt)(ua, ub)) == (a < b)).all()
    assert (u64_to_numpy(jax.jit(u64_min)(ua, ub)) == np.minimum(a, b)).all()


MODS = [
    Modulus(TEST_MODULUS, TEST_GENERATOR),  # 62-bit: lazy path
    Modulus(GOLDILOCKS_MODULUS, 7),  # 64-bit: canonical path
    Modulus(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR),  # 64-bit flagship
]


@pytest.mark.parametrize("mod", MODS, ids=lambda m: hex(m.modulus))
def test_field_add_sub(rng, mod):
    fc = FieldConsts.from_modulus(mod)
    N = mod.modulus
    bound = 2 * N if fc.lazy else N
    a = rng.integers(0, bound, size=512, dtype=np.uint64)
    b = rng.integers(0, bound, size=512, dtype=np.uint64)
    a[:2], b[:2] = [0, bound - 1], [bound - 1, bound - 1]
    ua, ub = u64_from_numpy(a), u64_from_numpy(b)
    s = u64_to_numpy(jax.jit(fc.add)(ua, ub))
    d = u64_to_numpy(jax.jit(fc.sub)(ua, ub))
    assert (s < bound).all() and (d < bound).all()
    for x, y, gs, gd in zip(a, b, s, d):
        assert int(gs) % N == (int(x) + int(y)) % N
        assert int(gd) % N == (int(x) - int(y)) % N
    n = u64_to_numpy(fc.normalize(ua))
    assert (n < N).all()
    assert ((n.astype(object) - a.astype(object)) % N == 0).all()


@pytest.mark.parametrize("mod", MODS, ids=lambda m: hex(m.modulus))
def test_mont_mul(rng, mod):
    fc = FieldConsts.from_modulus(mod)
    N = mod.modulus
    bound = 2 * N if fc.lazy else N
    a = rng.integers(0, bound, size=256, dtype=np.uint64)
    w_plain = [int(x) % N for x in rng.integers(0, 1 << 63, size=256)]
    w = np.array([mod.to_montgomery(x) for x in w_plain], dtype=np.uint64)
    wp = np.array([mod.montgomery_precompute(int(x)) for x in w], dtype=np.uint64)
    got = u64_to_numpy(
        jax.jit(fc.mont_mul)(u64_from_numpy(a), u64_from_numpy(w), u64_from_numpy(wp))
    )
    assert (got < bound).all()
    for x, y, g in zip(a, w_plain, got):
        assert int(g) % N == int(x) * y % N
    # full (no companion) variant, Montgomery-domain both sides
    am = np.array([mod.to_montgomery(int(x) % N) for x in a], dtype=np.uint64)
    got2 = u64_to_numpy(
        jax.jit(fc.mont_mul_full)(u64_from_numpy(am), u64_from_numpy(w))
    )
    for x, y, g in zip(a, w_plain, got2):
        # mont(xR, yR) = xyR: still in the Montgomery domain
        assert mod.from_montgomery(int(g) % N) == int(x) % N * y % N


def test_shoup_mul(rng):
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    fc = FieldConsts.from_modulus(mod)
    N = mod.modulus
    a = rng.integers(0, 1 << 64, size=256, dtype=np.uint64)
    w = np.array([int(x) % N for x in rng.integers(0, 1 << 63, size=256)], np.uint64)
    wp = np.array([mod.shoup_precompute(int(x)) for x in w], dtype=np.uint64)
    got = u64_to_numpy(
        jax.jit(fc.shoup_mul)(u64_from_numpy(a), u64_from_numpy(w), u64_from_numpy(wp))
    )
    assert (got < 2 * N).all()
    for x, y, g in zip(a, w, got):
        assert int(g) % N == int(x) * int(y) % N


@pytest.mark.parametrize("mod", MODS, ids=lambda m: hex(m.modulus))
def test_butterflies(rng, mod):
    fc = FieldConsts.from_modulus(mod)
    N = mod.modulus
    bound = 2 * N if fc.lazy else N
    x0 = rng.integers(0, bound, size=128, dtype=np.uint64)
    x1 = rng.integers(0, bound, size=128, dtype=np.uint64)
    w_plain = int(rng.integers(1, N - 1, dtype=np.uint64))
    wm = mod.to_montgomery(w_plain)
    w = u64_from_numpy(np.full(128, wm, dtype=np.uint64))
    wp = u64_from_numpy(
        np.full(128, mod.montgomery_precompute(wm), dtype=np.uint64)
    )
    u0, u1 = u64_from_numpy(x0), u64_from_numpy(x1)

    y0, y1 = jax.jit(fc.butterfly_forward)(u0, u1, w, wp)
    g0, g1 = u64_to_numpy(y0), u64_to_numpy(y1)
    assert (g0 < bound).all() and (g1 < bound).all()
    for a, b, r0, r1 in zip(x0, x1, g0, g1):
        assert int(r0) % N == (int(a) + int(b)) % N
        assert int(r1) % N == (int(a) - int(b)) * w_plain % N

    z0, z1 = jax.jit(fc.butterfly_inverse)(u0, u1, w, wp)
    h0, h1 = u64_to_numpy(z0), u64_to_numpy(z1)
    for a, b, r0, r1 in zip(x0, x1, h0, h1):
        t = int(b) * w_plain % N
        assert int(r0) % N == (int(a) + t) % N
        assert int(r1) % N == (int(a) - t) % N

    # scaled final-layer inverse butterfly: outputs multiplied by s
    s_plain = mod.invert(128)
    sm = mod.to_montgomery(s_plain)
    swm = mod.to_montgomery(s_plain * w_plain % N)
    s = u64_from_numpy(np.full(128, sm, dtype=np.uint64))
    sp = u64_from_numpy(np.full(128, mod.montgomery_precompute(sm), np.uint64))
    sw = u64_from_numpy(np.full(128, swm, dtype=np.uint64))
    swp = u64_from_numpy(np.full(128, mod.montgomery_precompute(swm), np.uint64))
    v0, v1 = jax.jit(fc.butterfly_inverse_scaled)(u0, u1, s, sp, sw, swp)
    f0, f1 = u64_to_numpy(v0), u64_to_numpy(v1)
    for a, b, r0, r1 in zip(x0, x1, f0, f1):
        t = int(b) * w_plain % N
        assert int(r0) % N == (int(a) + t) * s_plain % N
        assert int(r1) % N == (int(a) - t) * s_plain % N


def test_lazy_rejected_for_wide_modulus():
    with pytest.raises(ValueError):
        FieldConsts.from_modulus(Modulus(GOLDILOCKS_MODULUS, 7), lazy=True)


def test_sparse_modulus_detection():
    from sventt_tpu.field.limb import detect_sparse_modulus

    assert detect_sparse_modulus(TEST_MODULUS) == ("low", 29, 57)
    assert detect_sparse_modulus(FLAGSHIP_MODULUS) == ("high", 1827, 31)
    assert detect_sparse_modulus(GOLDILOCKS_MODULUS) == ("high", 1, 32)
    # dense modulus falls back to the generic multiply
    assert detect_sparse_modulus((1 << 61) + 20 * (1 << 32) + 1)[0] == "generic"


@pytest.mark.parametrize(
    "N", [TEST_MODULUS, FLAGSHIP_MODULUS, GOLDILOCKS_MODULUS]
)
def test_sparse_mul_chains_exact(rng, N):
    """u64_mulhi_sparse / u64_mullo_sparse == exact q*N limbs for random and
    corner-case q (the Solinas/Proth fast path of Montgomery/Shoup
    reduction)."""
    from sventt_tpu.field.limb import (
        detect_sparse_modulus,
        u64_mulhi_sparse,
        u64_mullo_sparse,
    )

    form, c, s = detect_sparse_modulus(N)
    assert form != "generic"
    qs = np.concatenate(
        [
            rng.integers(0, 1 << 64, 512, dtype=np.uint64),
            np.array(
                [0, 1, N - 1, N, (2 * N) % (1 << 64), (1 << 64) - 1, 1 << 63],
                dtype=np.uint64,
            ),
        ]
    )
    q = u64_from_numpy(qs)
    hi = u64_to_numpy(u64_mulhi_sparse(q, form, c, s))
    lo = u64_to_numpy(u64_mullo_sparse(q, form, c, s))
    for v, h, l in zip(qs, hi, lo):
        p = int(v) * N
        assert int(h) == p >> 64
        assert int(l) == p & ((1 << 64) - 1)


@pytest.mark.parametrize("N", [FLAGSHIP_MODULUS, GOLDILOCKS_MODULUS])
def test_solinas_reduce128_exact(rng, N):
    """u64_reduce128_sparse_high == exact (hi*2^64 + lo) mod N over random
    and corner 128-bit values (must hold on the FULL u64 x u64 range)."""
    from sventt_tpu.field.limb import (
        detect_sparse_modulus,
        u64_reduce128_sparse_high,
    )

    form, c, s = detect_sparse_modulus(N)
    assert form == "high"
    corner = np.array(
        [0, 1, 2, 0xFFFF_FFFF, 1 << 32, M64, M64 - 1, N - 1, N,
         (2 * N) % (1 << 64), 1 << 63],
        dtype=np.uint64,
    )
    his = np.concatenate([corner, rng.integers(0, 1 << 64, 512, dtype=np.uint64)])
    los = np.concatenate([corner[::-1], rng.integers(0, 1 << 64, 512, dtype=np.uint64)])
    got = u64_to_numpy(
        jax.jit(lambda h, l: u64_reduce128_sparse_high(h, l, c, s))(
            u64_from_numpy(his), u64_from_numpy(los)
        )
    )
    for h, l, g in zip(his, los, got):
        v = (int(h) << 64) | int(l)
        assert int(g) % N == v % N, (hex(int(h)), hex(int(l)))


@pytest.mark.parametrize("N,g", [(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR),
                                 (GOLDILOCKS_MODULUS, 7)])
def test_solinas_mul(rng, N, g):
    """solinas_mul(a, w): canonical [0, N) a*w mod N for ANY a < 2^64 and
    plain twiddle w < N -- the companion-free 64-bit engine."""
    mod = Modulus(N, g)
    fc = FieldConsts.from_modulus(mod, modmul="solinas")
    a = np.concatenate([
        np.array([0, 1, N - 1, N, M64, 1 << 63], dtype=np.uint64),
        rng.integers(0, 1 << 64, 512, dtype=np.uint64),
    ])
    w = np.array(
        [int(x) % N for x in rng.integers(0, 1 << 63, size=a.size)], np.uint64
    )
    got = u64_to_numpy(
        jax.jit(fc.solinas_mul)(u64_from_numpy(a), u64_from_numpy(w))
    )
    assert (got < N).all()  # canonical output
    for x, y, r in zip(a, w, got):
        assert int(r) == int(x) * int(y) % N


def test_solinas_rejected_for_nonsparse():
    from sventt_tpu.field.limb import solinas_capable

    assert solinas_capable(FLAGSHIP_MODULUS)
    assert solinas_capable(GOLDILOCKS_MODULUS)
    assert not solinas_capable(TEST_MODULUS)  # low form
    with pytest.raises(ValueError):
        FieldConsts.from_modulus(
            Modulus(TEST_MODULUS, TEST_GENERATOR), modmul="solinas"
        )


@pytest.mark.parametrize("N,g", [(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR),
                                 (GOLDILOCKS_MODULUS, 7)])
def test_solinas_butterflies(rng, N, g):
    """butterfly_forward / inverse / inverse_scaled under the solinas
    engine: plain twiddles, wp=None, residues must match Python ints."""
    mod = Modulus(N, g)
    fc = FieldConsts.from_modulus(mod, modmul="solinas")
    a = rng.integers(0, N, size=256, dtype=np.uint64)
    b = rng.integers(0, N, size=256, dtype=np.uint64)
    w = np.array([int(x) % N for x in rng.integers(0, 1 << 63, 256)], np.uint64)
    au, bu, wu = u64_from_numpy(a), u64_from_numpy(b), u64_from_numpy(w)
    y0, y1 = jax.jit(lambda x0, x1, w: fc.butterfly_forward(x0, x1, w, None))(
        au, bu, wu
    )
    y0, y1 = u64_to_numpy(fc.normalize(y0)), u64_to_numpy(fc.normalize(y1))
    for x0, x1, tw, g0, g1 in zip(a, b, w, y0, y1):
        assert int(g0) % N == (int(x0) + int(x1)) % N
        assert int(g1) % N == (int(x0) - int(x1)) * int(tw) % N
    z0, z1 = jax.jit(lambda x0, x1, w: fc.butterfly_inverse(x0, x1, w, None))(
        au, bu, wu
    )
    z0, z1 = u64_to_numpy(fc.normalize(z0)), u64_to_numpy(fc.normalize(z1))
    for x0, x1, tw, g0, g1 in zip(a, b, w, z0, z1):
        t = int(x1) * int(tw) % N
        assert int(g0) % N == (int(x0) + t) % N
        assert int(g1) % N == (int(x0) - t) % N


def test_generic_modulus_field_ops(rng):
    """A dense (non-sparse) prime keeps the generic multiply path working."""
    from sventt_tpu.field.modulus import find_generator, is_probable_prime

    # prime with dense bit pattern: search near 2^61 + 3*2^33
    N = (1 << 61) + 3 * (1 << 33) + 1
    while not (is_probable_prime(N) and (N - 1) % 8 == 0):
        N += 8
    fc = FieldConsts.from_modulus(Modulus(N, find_generator(N)))
    assert fc.n_form == "generic" or fc.n_c.bit_length() <= 20
    xs = rng.integers(0, N, 256, dtype=np.uint64)
    ys = rng.integers(0, N, 256, dtype=np.uint64)
    a, b = u64_from_numpy(xs), u64_from_numpy(ys)
    got = u64_to_numpy(fc.mont_mul_full(a, b))
    rinv = pow(1 << 64, N - 2, N)
    for x, y, r in zip(xs, ys, got):
        assert int(r) % N == int(x) * int(y) * rinv % N
