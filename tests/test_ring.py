"""Pallas remote-DMA all-to-all ring (parallel/ring.py).

Bit-exactness vs the XLA collective on the 8-device CPU mesh (interpret
mode), plus the full distributed six-step with comm="ring" against both
comm="xla" and the single-chip wrapper -- including the 2^18-scale case
(VERDICT round 1, task 5).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sventt_tpu import TEST_GENERATOR, TEST_MODULUS
from sventt_tpu.field.limb import u64_from_numpy, u64_to_numpy
from sventt_tpu.parallel import DistributedNTT, make_ntt_mesh
from sventt_tpu.field.limb import U64
from sventt_tpu.parallel.ring import ring_all_to_all
from sventt_tpu.plan import NTT, NttConfig


@pytest.fixture(scope="module")
def mesh():
    return make_ntt_mesh(8)


@pytest.mark.parametrize("split,concat", [(1, 0), (0, 1)])
def test_ring_matches_xla_collective(mesh, rng, split, concat):
    D = 8
    r, c = 16, 64  # local shard shape; both divisible by D
    x = U64(
        jnp.asarray(rng.integers(0, 1 << 32, (D * r, c), dtype=np.uint64)
                    .astype(np.uint32)),
        jnp.asarray(rng.integers(0, 1 << 32, (D * r, c), dtype=np.uint64)
                    .astype(np.uint32)),
    )

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("shard"), out_specs=P("shard"),
        check_vma=False,
    )
    def via_ring(a):
        # one kernel moves BOTH limb planes (single collective_id)
        return ring_all_to_all(a, ("shard",), split, concat)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("shard"), out_specs=P("shard")
    )
    def via_xla(a):
        return U64(*(
            jax.lax.all_to_all(
                v, "shard", split_axis=split, concat_axis=concat, tiled=True
            )
            for v in a
        ))

    got, want = via_ring(x), via_xla(x)
    np.testing.assert_array_equal(np.asarray(got.hi), np.asarray(want.hi))
    np.testing.assert_array_equal(np.asarray(got.lo), np.asarray(want.lo))


@pytest.mark.parametrize("n", [1 << 12, 1 << 18])
def test_distributed_ring_matches_single_chip(mesh, rng, n):
    cfg = NttConfig(TEST_MODULUS, TEST_GENERATOR, n, strategy="six_step")
    dntt = DistributedNTT(cfg, mesh, comm="ring")
    sntt = NTT(cfg)
    x = rng.integers(0, cfg.modulus, n, dtype=np.uint64)
    xd = jax.device_put(u64_from_numpy(x), dntt.sharding())
    fwd_d = u64_to_numpy(dntt.fc.normalize(dntt.compute_forward(xd)))
    fwd_s = u64_to_numpy(sntt.fc.normalize(sntt.compute_forward(u64_from_numpy(x))))
    np.testing.assert_array_equal(fwd_d, fwd_s)
    back = dntt.compute_inverse(dntt.compute_forward(xd))
    np.testing.assert_array_equal(u64_to_numpy(dntt.fc.normalize(back)), x)


def test_ring_rejects_hierarchical_mesh():
    """Hierarchical (dcn, ici) meshes must use comm='xla': a flat rotation
    ring is the wrong schedule across a DCN tier, and the DMA machinery
    only supports LOGICAL ids over one named mesh dimension."""
    mesh2 = jax.make_mesh((2, 4), ("dcn", "ici"))
    cfg = NttConfig(TEST_MODULUS, TEST_GENERATOR, 1 << 12, strategy="six_step")
    with pytest.raises(ValueError, match="ring"):
        DistributedNTT(cfg, mesh2, axis=("dcn", "ici"), comm="ring")


def test_ring_rejects_partial_mesh(mesh):
    cfg = NttConfig(TEST_MODULUS, TEST_GENERATOR, 1 << 12, strategy="six_step")
    mesh2 = jax.make_mesh((2, 4), ("a", "b"))
    with pytest.raises(ValueError, match="ring"):
        DistributedNTT(cfg, mesh2, axis="a", comm="ring")
