"""Round-5 truthful A/B: s8 balanced-digit scheme vs u7, and fused vs
separate inter-step twiddle, on one MXU level.

One m=256 level over 2^22 points in the mid orientation (the production
inner-level shape of the 2^24 plan), flagship modulus.  Timed with
utils.truetime (single-dispatch fori chains).  Run on the real TPU:

    python experimental/r5_s8_ab.py

Prints one JSON line per variant, golden-verified per variant first.
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
from sventt_tpu.plan.planner import row_twiddles, _mont_mul_bcast
from sventt_tpu.utils.truetime import time_chained

M = 256
A = 64
B = 256  # (A, M, B) = 2^22 points


def main():
    mod = Modulus(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR)
    fc = FieldConsts.from_modulus(mod, lazy=False)
    golden = GoldenNTT(M, mod)

    # correctness probe on 2 columns before timing anything
    rng = np.random.default_rng(5)
    xs = rng.integers(0, mod.modulus, (M, 2), dtype=np.uint64)
    xs[:, 1] = mod.modulus - 1
    want = [golden.forward([int(v) for v in xs[:, c]]) for c in range(2)]

    x = jax.jit(
        lambda: U64(
            jnp.zeros((A, M, B), jnp.uint32),
            jnp.arange(A * M * B, dtype=jnp.uint32).reshape(A, M, B),
        )
    )()
    tw = row_twiddles(mod, A, M, inverse=False, w_only=False)

    for scheme in ("s8", "u7"):
        t = ntt_mxu.make_mxu_tables(mod, M, inverse=False, scheme=scheme)
        got = u64_to_numpy(ntt_mxu.mxu_ntt(u64_from_numpy(xs), t, fc))
        for c in range(2):
            assert [int(v) for v in got[:, c]] == want[c], f"{scheme} mismatch"

        res = time_chained(
            lambda v, tt: ntt_mxu.mxu_ntt_mid(v, tt, fc), x, (t,), seconds=1.5
        )
        print(json.dumps({
            "variant": f"level-{scheme}", "ms": round(res.ms, 4),
            "k": res.k, "verified": True,
        }), flush=True)

        # fused twiddle prologue vs separate pass + bare level
        res_f = time_chained(
            lambda v, tt, w: ntt_mxu.mxu_ntt_mid(v, tt, fc, tw=w),
            x, (t, tw), seconds=1.5,
        )
        print(json.dumps({
            "variant": f"level-{scheme}+fused-tw", "ms": round(res_f.ms, 4),
            "k": res_f.k,
        }), flush=True)

        res_s = time_chained(
            lambda v, tt, w: ntt_mxu.mxu_ntt_mid(
                _mont_mul_bcast(fc, v, w, 1), tt, fc
            ),
            x, (t, tw), seconds=1.5,
        )
        print(json.dumps({
            "variant": f"level-{scheme}+separate-tw", "ms": round(res_s.ms, 4),
            "k": res_s.k,
        }), flush=True)


if __name__ == "__main__":
    main()
