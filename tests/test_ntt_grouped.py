"""Radix-grouped (deferred-twiddle) Pallas kernels vs the golden model.

The grouped bodies factor 2-3 butterfly stages into scalar-constant
twiddles plus ONE combined table multiply per element (the TPU analogue of
the reference's radix-4/8 layers, include/sventt/layer/sve/radix-{four,
eight}.hpp).  Interpret mode is slow for large m, so CPU coverage stays at
m <= 64; m = 256 production shapes are verified on real TPU by bench.py's
native-oracle check.
"""

import numpy as np
import pytest

from sventt_tpu.field.golden import GoldenNTT
from sventt_tpu.field.limb import FieldConsts, u64_from_numpy, u64_to_numpy
from sventt_tpu.field.modulus import (
    FLAGSHIP_GENERATOR,
    FLAGSHIP_MODULUS,
    TEST_GENERATOR,
    TEST_MODULUS,
    Modulus,
)
from sventt_tpu.ops import ntt_pallas as P

CASES = [
    (TEST_MODULUS, TEST_GENERATOR, "montgomery"),
    (TEST_MODULUS, TEST_GENERATOR, "shoup"),
    (FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, "montgomery"),
]


def test_choose_groups():
    assert P._choose_groups(8, 3) == (3, 3, 2)
    assert P._choose_groups(7, 3) == (3, 2, 2)
    assert P._choose_groups(9, 3) == (3, 3, 3)
    assert P._choose_groups(4, 3) == (2, 2)
    assert P._choose_groups(1, 3) == (1,)
    assert P._choose_groups(5, 1) == (1,) * 5


@pytest.mark.parametrize("modulus,generator,modmul", CASES)
@pytest.mark.parametrize("m,max_r", [(8, 2), (16, 3), (64, 3)])
def test_grouped_sublane(rng, modulus, generator, modmul, m, max_r):
    mod = Modulus(modulus, generator)
    fc = FieldConsts.from_modulus(mod, modmul=modmul)
    g = GoldenNTT(m, mod)
    x = rng.integers(0, modulus, size=(m, 3), dtype=np.uint64)
    tf = P.make_grouped_forward(mod, m, modmul=modmul, max_r=max_r)
    out = u64_to_numpy(fc.normalize(P.fused_ntt(u64_from_numpy(x), tf, fc)))
    for c in range(3):
        want = g.forward([int(v) for v in x[:, c]])
        assert [int(v) % modulus for v in out[:, c]] == want
    ti = P.make_grouped_inverse(mod, m, modmul=modmul, max_r=max_r)
    back = u64_to_numpy(fc.normalize(P.fused_ntt(u64_from_numpy(out), ti, fc)))
    assert (back == x).all()


@pytest.mark.parametrize("modulus,generator,modmul", CASES)
@pytest.mark.parametrize("m,max_r", [(8, 2), (64, 3)])
def test_grouped_lane(rng, modulus, generator, modmul, m, max_r):
    mod = Modulus(modulus, generator)
    fc = FieldConsts.from_modulus(mod, modmul=modmul)
    g = GoldenNTT(m, mod)
    x = rng.integers(0, modulus, size=(3, m), dtype=np.uint64)
    lf = P.make_lane_grouped_forward(mod, m, modmul=modmul, max_r=max_r)
    out = u64_to_numpy(fc.normalize(P.fused_ntt_lane(u64_from_numpy(x), lf, fc)))
    for c in range(3):
        want = g.forward([int(v) for v in x[c]])
        assert [int(v) % modulus for v in out[c]] == want
    li = P.make_lane_grouped_inverse(mod, m, modmul=modmul, max_r=max_r)
    back = u64_to_numpy(fc.normalize(P.fused_ntt_lane(u64_from_numpy(out), li, fc)))
    assert (back == x).all()


def test_grouped_lane_with_pre_twiddle(rng, monkeypatch):
    """Six-step inter-step twiddle fused as prologue into the grouped lane
    kernel, checked via a full six-step transform at toy scale through the
    planner (grouped bodies forced on: they are non-default, see
    DEFAULT_MAX_RADIX)."""
    from sventt_tpu.plan import NTT, NttConfig

    monkeypatch.setattr(P, "DEFAULT_MAX_RADIX", 3)
    n0, n1 = 4, 16
    cfg = NttConfig(
        TEST_MODULUS, TEST_GENERATOR, n0 * n1, strategy="six_step",
        n0=n0, n1=n1, engine="pallas",
    )
    ntt = NTT(cfg)
    # the row child must actually be a lane-axis pallas leaf
    assert ntt._fwd_tables.lane, "expected a lane-axis row leaf"
    assert isinstance(
        next(iter(ntt._fwd_tables.lane.values())), P.GroupedLaneDirection
    )
    x = rng.integers(0, TEST_MODULUS, size=cfg.n, dtype=np.uint64)
    fwd = ntt.forward_numpy(x)
    g = GoldenNTT(cfg.n, cfg.mod)
    assert [int(v) for v in fwd] == g.forward([int(v) for v in x])
    assert (ntt.inverse_numpy(fwd) == x).all()


def test_grouped_inverse_scale_extra(rng):
    """scale_extra folds an extra factor into the last group's table."""
    m, extra = 16, 7
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    fc = FieldConsts.from_modulus(mod)
    g = GoldenNTT(m, mod)
    x = rng.integers(0, TEST_MODULUS, size=(m, 1), dtype=np.uint64)
    fwd = np.array(
        [g.forward([int(v) for v in x[:, 0]])], dtype=np.uint64
    ).T.copy()
    ti = P.make_grouped_inverse(mod, m, scale_extra=extra, modmul="montgomery")
    back = u64_to_numpy(fc.normalize(P.fused_ntt(u64_from_numpy(fwd), ti, fc)))
    want = [int(v) * extra % TEST_MODULUS for v in x[:, 0]]
    assert [int(v) for v in back[:, 0]] == want
