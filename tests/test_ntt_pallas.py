"""Fused Pallas kernel chain vs the golden model (interpret mode on CPU).

Mirrors the reference's config-matrix kernel tests (SURVEY.md section 5):
every fused configuration must be bit-exact (mod N) against GoldenNTT,
including the 1/m fold in the final inverse stage.
"""

import numpy as np
import pytest

from sventt_tpu import (
    FLAGSHIP_GENERATOR,
    FLAGSHIP_MODULUS,
    TEST_GENERATOR,
    TEST_MODULUS,
)
from sventt_tpu.field.golden import GoldenNTT
from sventt_tpu.field.limb import FieldConsts, u64_from_numpy, u64_to_numpy
from sventt_tpu.field.modulus import Modulus
from sventt_tpu.ops.ntt_pallas import (
    fused_ntt,
    make_fused_forward,
    make_fused_inverse,
)

MODULI = [
    pytest.param(TEST_MODULUS, TEST_GENERATOR, True, id="62bit-lazy"),
    pytest.param(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, False, id="flagship-64bit"),
]


@pytest.mark.parametrize("m", [8, 32, 64])
@pytest.mark.parametrize("N,g,lazy", MODULI)
def test_fused_forward_matches_golden(rng, N, g, lazy, m):
    mod = Modulus(N, g)
    fc = FieldConsts.from_modulus(mod, lazy=lazy)
    tables = make_fused_forward(mod, m)
    golden = GoldenNTT(m, mod)
    x = rng.integers(0, N, (m, 3), dtype=np.uint64)
    out = u64_to_numpy(fc.normalize(fused_ntt(u64_from_numpy(x), tables, fc)))
    for c in range(x.shape[1]):
        want = golden.forward([int(v) for v in x[:, c]])
        assert [int(v) for v in out[:, c]] == want


@pytest.mark.parametrize("m", [8, 64])
@pytest.mark.parametrize("N,g,lazy", MODULI)
def test_fused_roundtrip(rng, N, g, lazy, m):
    mod = Modulus(N, g)
    fc = FieldConsts.from_modulus(mod, lazy=lazy)
    ft = make_fused_forward(mod, m)
    it = make_fused_inverse(mod, m)
    x = rng.integers(0, N, (m, 2), dtype=np.uint64)
    mid = fused_ntt(u64_from_numpy(x), ft, fc)
    back = u64_to_numpy(fc.normalize(fused_ntt(mid, it, fc)))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("m", [64])
def test_fused_inverse_matches_golden(rng, m):
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    fc = FieldConsts.from_modulus(mod, lazy=True)
    it = make_fused_inverse(mod, m)
    golden = GoldenNTT(m, mod)
    x = rng.integers(0, mod.modulus, (m, 2), dtype=np.uint64)
    out = u64_to_numpy(fc.normalize(fused_ntt(u64_from_numpy(x), it, fc)))
    for c in range(x.shape[1]):
        want = golden.inverse([int(v) for v in x[:, c]])
        assert [int(v) for v in out[:, c]] == want


@pytest.mark.parametrize("tw_layout", ["dedup", "hybrid"])
@pytest.mark.parametrize("N,g,lazy", MODULI)
def test_fused_tw_layouts_match_golden(rng, N, g, lazy, tw_layout):
    """Deduped / hybrid stage-twiddle storage (the reference's
    store_precomputation trade for STAGE tables, layer/sve/radix-two.hpp:
    96-138) must be bit-identical to the tiled default, both directions."""
    mod = Modulus(N, g)
    fc = FieldConsts.from_modulus(mod, lazy=lazy)
    m = 64
    ft = make_fused_forward(mod, m, tw_layout=tw_layout)
    it = make_fused_inverse(mod, m, tw_layout=tw_layout)
    golden = GoldenNTT(m, mod)
    x = rng.integers(0, N, (m, 3), dtype=np.uint64)
    mid = fused_ntt(u64_from_numpy(x), ft, fc)
    out = u64_to_numpy(fc.normalize(mid))
    for c in range(x.shape[1]):
        want = golden.forward([int(v) for v in x[:, c]])
        assert [int(v) for v in out[:, c]] == want
    back = u64_to_numpy(fc.normalize(fused_ntt(mid, it, fc)))
    np.testing.assert_array_equal(back, x)


def test_tw_layout_knob_via_wrapper(rng):
    """NttConfig(tw_layout=...) reaches the pallas leaf tables and stays
    bit-identical through the full wrapper path."""
    from sventt_tpu.plan import NTT, NttConfig

    cfg = NttConfig(
        TEST_MODULUS, TEST_GENERATOR, 1 << 10, engine="pallas",
        tw_layout="hybrid",
    )
    ntt = NTT(cfg)
    x = rng.integers(0, TEST_MODULUS, cfg.n, dtype=np.uint64)
    ref = NTT(cfg.with_(tw_layout=None))
    np.testing.assert_array_equal(ntt.forward_numpy(x), ref.forward_numpy(x))
    np.testing.assert_array_equal(ntt.inverse_numpy(x), ref.inverse_numpy(x))


def test_fused_1d_and_batch_pad(rng):
    """Flat (m,) inputs and non-multiple-of-BLOCK_B batches are padded."""
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    fc = FieldConsts.from_modulus(mod, lazy=True)
    m = 32
    tables = make_fused_forward(mod, m)
    golden = GoldenNTT(m, mod)
    x = rng.integers(0, mod.modulus, m, dtype=np.uint64)
    out = u64_to_numpy(fc.normalize(fused_ntt(u64_from_numpy(x), tables, fc)))
    assert [int(v) for v in out] == golden.forward([int(v) for v in x])


def test_pallas_engine_wrapper_sixstep(rng):
    """NTT wrapper with engine='pallas' (interpret) matches engine='jnp'."""
    from sventt_tpu.plan import NTT, NttConfig

    n = 1 << 12
    cfg_p = NttConfig(TEST_MODULUS, TEST_GENERATOR, n, strategy="six_step", engine="pallas")
    cfg_j = cfg_p.with_(engine="jnp")
    x = rng.integers(0, TEST_MODULUS, n, dtype=np.uint64)
    a = NTT(cfg_p).forward_numpy(x)
    b = NTT(cfg_j).forward_numpy(x)
    np.testing.assert_array_equal(a, b)
    back = NTT(cfg_p).inverse_numpy(a)
    np.testing.assert_array_equal(back, x)
