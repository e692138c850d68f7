"""Round-5 truthful A/B: banded-matmul plane merge ("s8b") vs "s8".

The s8 tail spends 49 int32 tile-adds per point merging 64 product
planes into 15; s8b moves the merge onto the MXU via one block-banded
(15m, 8m) int8 matmul (120 vs 64 m^2 MACs -- the MXU is nearly free,
the VPU merge adds are ~30% of the measured level cost) and
materializes 4x fewer int32 product words.

One mid-orientation level over 2^22 points (the production inner-level
shape of the 2^24 plan), flagship modulus, truthful chains.  Run on the
real TPU:

    python experimental/r5_banded_ab.py [m]   # default 256
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS
from sventt_tpu.field.limb import FieldConsts, U64, u64_from_numpy, u64_to_numpy
from sventt_tpu.field.modulus import Modulus
from sventt_tpu.field.golden import GoldenNTT
from sventt_tpu.ops import ntt_mxu
from sventt_tpu.plan.planner import row_twiddles
from sventt_tpu.utils.truetime import time_chained


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    a = (1 << 22) // (m * m) * (m // 256 if m >= 256 else 1)
    b = (1 << 22) // (m * a)
    mod = Modulus(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR)
    fc = FieldConsts.from_modulus(mod, lazy=False)
    golden = GoldenNTT(m, mod)

    rng = np.random.default_rng(5)
    xs = rng.integers(0, mod.modulus, (m, 2), dtype=np.uint64)
    xs[:, 1] = mod.modulus - 1
    want = [golden.forward([int(v) for v in xs[:, c]]) for c in range(2)]

    x = jax.jit(
        lambda: U64(
            jnp.zeros((a, m, b), jnp.uint32),
            jnp.arange(a * m * b, dtype=jnp.uint32).reshape(a, m, b),
        )
    )()
    tw = row_twiddles(mod, a, m, inverse=False, w_only=False)

    for scheme in ("s8", "s8b"):
        t = ntt_mxu.make_mxu_tables(mod, m, inverse=False, scheme=scheme)
        got = u64_to_numpy(ntt_mxu.mxu_ntt(u64_from_numpy(xs), t, fc))
        for c in range(2):
            assert [int(v) for v in got[:, c]] == want[c], f"{scheme} mismatch"

        res = time_chained(
            lambda v, tt: ntt_mxu.mxu_ntt_mid(v, tt, fc), x, (t,), seconds=1.5
        )
        print(json.dumps({
            "variant": f"m{m}-{scheme}", "ms": round(res.ms, 4),
            "k": res.k, "verified": True,
        }), flush=True)

        res_f = time_chained(
            lambda v, tt, w: ntt_mxu.mxu_ntt_mid(v, tt, fc, tw=w),
            x, (t, tw), seconds=1.5,
        )
        print(json.dumps({
            "variant": f"m{m}-{scheme}+fused-tw", "ms": round(res_f.ms, 4),
            "k": res_f.k,
        }), flush=True)


if __name__ == "__main__":
    main()
