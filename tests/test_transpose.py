"""Transpose strategies: correctness on CPU (pallas in interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sventt_tpu.field.limb import U64
from sventt_tpu.ops.transpose import transpose_pallas, transpose_u64, transpose_xla


def test_xla_transpose_with_batch(rng):
    x = jnp.asarray(rng.integers(0, 1 << 32, (8, 16, 3), dtype=np.uint32))
    got = transpose_xla(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x).transpose(1, 0, 2))


@pytest.mark.parametrize("shape,block", [((16, 32), 8), ((64, 16), 16)])
def test_pallas_transpose(rng, shape, block):
    x = jnp.asarray(rng.integers(0, 1 << 32, shape, dtype=np.uint32))
    got = transpose_pallas(x, block, block)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x).T)


def test_transpose_u64_strategies(rng):
    hi = jnp.asarray(rng.integers(0, 1 << 32, (16, 16), dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, (16, 16), dtype=np.uint32))
    a = transpose_u64(U64(hi, lo), "xla")
    b = transpose_u64(U64(hi, lo), "pallas", br=8, bc=8)
    np.testing.assert_array_equal(np.asarray(a.hi), np.asarray(b.hi))
    np.testing.assert_array_equal(np.asarray(a.lo), np.asarray(b.lo))


def test_transpose_pallas_rejects_indivisible_shapes():
    """A floor-divided grid would silently drop the remainder rows/cols
    (round-2 review finding); indivisible shapes must raise."""
    import jax.numpy as jnp
    import pytest

    from sventt_tpu.ops.transpose import transpose_pallas

    x = jnp.zeros((300, 256), jnp.uint32)
    with pytest.raises(ValueError, match="not divisible"):
        transpose_pallas(x, br=256, bc=256)
