"""Middle-axis fused kernel (fused_ntt_mid) vs golden / transposed engines.

The mid kernel replaces the transpose / leading-axis leaf / transpose
sandwich for batched split levels (reference layer/sve/blocked-generic.hpp
fuses transposition into the blocked row layer the same way); it must be
bit-exact against the transposed sublane engine and the golden model.
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
from sventt_tpu.field.limb import FieldConsts, U64, u64_from_numpy, u64_to_numpy
from sventt_tpu.field.modulus import Modulus
from sventt_tpu.ops.ntt_pallas import (
    fused_ntt,
    fused_ntt_mid,
    make_fused_forward,
    make_fused_inverse,
)

MODULI = [
    pytest.param(TEST_MODULUS, TEST_GENERATOR, True, id="62bit-lazy"),
    pytest.param(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, False, id="flagship-64bit"),
]


def _transpose01(x: U64) -> U64:
    perm = (1, 0) + tuple(range(2, x.lo.ndim))
    return U64(np.swapaxes(x.hi, 0, 1), np.swapaxes(x.lo, 0, 1))


@pytest.mark.parametrize("N,g,lazy", MODULI)
def test_mid_forward_matches_sublane(rng, N, g, lazy):
    mod = Modulus(N, g)
    fc = FieldConsts.from_modulus(mod, lazy=lazy)
    m, a, b = 16, 4, 3
    tables = make_fused_forward(mod, m)
    x = rng.integers(0, N, (a, m, b), dtype=np.uint64)
    xu = u64_from_numpy(x)
    got = u64_to_numpy(fc.normalize(fused_ntt_mid(xu, tables, fc)))
    # reference: transpose to leading axis, sublane engine, transpose back
    ref = fused_ntt(_transpose01(xu), tables, fc)
    want = u64_to_numpy(fc.normalize(_transpose01(ref)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("N,g,lazy", MODULI)
def test_mid_inverse_matches_golden(rng, N, g, lazy):
    mod = Modulus(N, g)
    fc = FieldConsts.from_modulus(mod, lazy=lazy)
    m, a, b = 16, 3, 2
    tables = make_fused_inverse(mod, m)
    golden = GoldenNTT(m, mod)
    x = rng.integers(0, N, (a, m, b), dtype=np.uint64)
    got = u64_to_numpy(fc.normalize(fused_ntt_mid(u64_from_numpy(x), tables, fc)))
    for i in range(a):
        for j in range(b):
            want = golden.inverse([int(v) for v in x[i, :, j]])
            assert [int(v) for v in got[i, :, j]] == want


def test_mid_no_trailing_batch(rng):
    """(A, m) data: trailing batch of 1, padded to BLOCK_B internally."""
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    fc = FieldConsts.from_modulus(mod, lazy=True)
    m, a = 8, 5
    tables = make_fused_forward(mod, m)
    golden = GoldenNTT(m, mod)
    x = rng.integers(0, mod.modulus, (a, m), dtype=np.uint64)
    got = u64_to_numpy(fc.normalize(fused_ntt_mid(u64_from_numpy(x), tables, fc)))
    for i in range(a):
        assert [int(v) for v in got[i]] == golden.forward([int(v) for v in x[i]])


def test_batched_sixstep_uses_mid_path(rng):
    """A batched six-step NTT (pallas engine) takes the mid-axis path and
    stays bit-exact against the golden model, forward and roundtrip."""
    from sventt_tpu.plan import NTT, NttConfig
    from sventt_tpu.plan import planner

    n, b = 1 << 10, 3
    cfg = NttConfig(TEST_MODULUS, TEST_GENERATOR, n, strategy="six_step", engine="pallas")
    ntt = NTT(cfg)
    # the plan's row child must be a pallas leaf for the mid path
    assert planner._mid_row(ntt.plan, ntt._fwd_tables)
    x = rng.integers(0, cfg.modulus, (n, b), dtype=np.uint64)
    fwd = ntt.forward_numpy(x)
    golden = GoldenNTT(n, cfg.mod)
    for c in range(b):
        want = golden.forward([int(v) for v in x[:, c]])
        assert [int(v) for v in fwd[:, c]] == want
    back = ntt.inverse_numpy(fwd)
    np.testing.assert_array_equal(back, x)


def test_deep_plan_inner_levels_use_mid(rng):
    """A 3-level plan (inner splits carry a batch) is bit-exact end-to-end:
    the inner levels run through the mid kernel."""
    from sventt_tpu.plan import NTT, NttConfig

    n = 1 << 9
    # max_fused=8 -> Split(512, 64=Split(64,8,8), 8): inner split sees batch
    from sventt_tpu.plan import planner as pl_mod

    plan = pl_mod.build_plan(n, "pallas", max_fused=8)
    assert isinstance(plan.col, pl_mod.Split)
    cfg = NttConfig(TEST_MODULUS, TEST_GENERATOR, n, engine="pallas")
    ntt = NTT(cfg)
    ntt.plan = plan  # not used post-init; rebuild tables instead
    from sventt_tpu.plan.planner import PlanTables, run_forward, run_inverse

    ft = PlanTables(plan, cfg.mod, ntt.fc, inverse=False)
    it = PlanTables(plan, cfg.mod, ntt.fc, inverse=True)
    x = rng.integers(0, cfg.modulus, n, dtype=np.uint64)
    xu = u64_from_numpy(x)
    fwd = u64_to_numpy(ntt.fc.normalize(run_forward(xu, plan, ft)))
    golden = GoldenNTT(n, cfg.mod)
    assert [int(v) for v in fwd] == golden.forward([int(v) for v in x])
    back = u64_to_numpy(
        ntt.fc.normalize(run_inverse(u64_from_numpy(fwd), plan, it))
    )
    np.testing.assert_array_equal(back, x)
