"""2^30 readiness: memory budgets, plan validation, and a reduced-scale
end-to-end run of the production composition (VERDICT round 1, task 9).
"""

import jax
import numpy as np
import pytest

from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS, TEST_GENERATOR, TEST_MODULUS
from sventt_tpu.field.limb import u64_from_numpy, u64_to_numpy
from sventt_tpu.parallel import (
    DistributedNTT,
    distributed_memory_budget,
    make_ntt_mesh,
    validate_2p30,
)
from sventt_tpu.plan import NTT, NttConfig


def _cfg30():
    return NttConfig(
        FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, 1 << 30, strategy="six_step"
    )


def test_2p30_fits_8_chips():
    b = validate_2p30(8)
    # 1 GiB shard + 1 GiB all-to-all transient + 1 GiB w-only twiddles
    assert b.coefficients == (1 << 30) // 8 * 8
    assert b.inter_step_twiddles == b.coefficients  # companion-free
    assert b.total < 4 * (1 << 30)
    assert b.fits()


def test_2p30_two_chip_margin():
    """Even D=2 fits one direction with donation (12 GiB of 15.5);
    keeping both directions AND the caller's buffer does not."""
    b1 = distributed_memory_budget(
        _cfg30(), 2, enable_inverse=False, donate_input=True
    )
    assert b1.fits()
    b2 = distributed_memory_budget(_cfg30(), 2, donate_input=False)
    assert not b2.fits()


def test_budget_rejects_bad_mesh():
    with pytest.raises(ValueError, match="divisible"):
        distributed_memory_budget(_cfg30(), 3)


def test_companion_threshold_reflected():
    """Mid-size transforms keep the Montgomery companion (2x bytes/point);
    2^26+ drops it."""
    mid = distributed_memory_budget(
        NttConfig(TEST_MODULUS, TEST_GENERATOR, 1 << 20, strategy="six_step"), 8
    )
    assert mid.inter_step_twiddles == 2 * mid.coefficients
    big = distributed_memory_budget(_cfg30(), 8)
    assert big.inter_step_twiddles == big.coefficients


@pytest.mark.parametrize("engine", ["jnp", "mxu", "pallas"])
def test_leaf_table_bytes_matches_actual(engine):
    """_leaf_table_bytes must track the REAL per-leaf device bytes of
    PlanTables for every engine (round-4 VERDICT weak 4: the mxu branch
    was priced with the jnp formula, ~17x under).  The estimate must be
    within 2x of actual and never under-count by more than 10%."""
    from sventt_tpu.field.limb import FieldConsts
    from sventt_tpu.field.modulus import Modulus
    from sventt_tpu.parallel.budget import _leaf_table_bytes
    from sventt_tpu.plan import planner

    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    fc = FieldConsts.from_modulus(mod)
    plan = planner.build_plan(1 << 10, engine, max_fused=256)
    tables = planner.PlanTables(plan, mod, fc, inverse=False)

    def nbytes(obj):
        leaves = jax.tree_util.tree_leaves(obj)
        return sum(v.size * v.dtype.itemsize for v in leaves)

    actual = sum(nbytes(t) for t in tables.leaf.values()) + sum(
        nbytes(t) for t in tables.lane.values()
    )
    est = _leaf_table_bytes(plan)
    assert est <= 2 * actual + 4096
    assert est >= 0.9 * actual


def test_reduced_scale_production_composition(rng, monkeypatch):
    """The 2^30 composition at reduced leaf scale: a distributed six-step
    whose LOCAL shard plans are themselves Splits with fused pallas leaves
    (the production 2^24+ shape -- round-1 VERDICT weak item 6), run on the
    8-device CPU mesh in interpret mode and checked bit-exactly against the
    single-chip wrapper.

    MAX_FUSED is scaled down (256 -> 64) exactly like the leaf scale:
    locally each 2^8-point sub-transform decomposes into a Split(16, 64)
    with a lane-axis row leaf, mirroring how 2^15 locals decompose under
    the real cap.
    """
    from sventt_tpu.ops import ntt_pallas

    monkeypatch.setattr(ntt_pallas, "MAX_FUSED", 64)
    n = 1 << 16
    cfg = NttConfig(
        TEST_MODULUS, TEST_GENERATOR, n, strategy="six_step",
        n0=1 << 8, n1=1 << 8, engine="pallas",
    )
    mesh = make_ntt_mesh(8)
    dntt = DistributedNTT(cfg, mesh, enable_inverse=False)
    # the local plans must really contain Splits with pallas leaves
    from sventt_tpu.plan.planner import Split

    assert isinstance(dntt._col_plan, Split)
    assert dntt._col_plan.row.engine == "pallas"

    sntt = NTT(cfg, enable_inverse=False)
    x = rng.integers(0, cfg.modulus, n, dtype=np.uint64)
    xd = jax.device_put(u64_from_numpy(x), dntt.sharding())
    fwd_d = u64_to_numpy(dntt.fc.normalize(dntt.compute_forward(xd)))
    fwd_s = u64_to_numpy(sntt.fc.normalize(sntt.compute_forward(u64_from_numpy(x))))
    np.testing.assert_array_equal(fwd_d, fwd_s)
