"""Round-5 re-test: mxu lane orientation vs transpose/lead/transpose.

Round 4 measured the lane-orientation matmul (contract the LAST axis)
~9x slower under Mosaic, so the planner routes no-batch top levels
through transpose / leading-axis / transpose (PERF_NOTES.md: "re-test
each toolchain").  This is the truthful per-toolchain re-test at the
2^24 top-level row shape: (65536, 256) rows, m = 256.

    python experimental/r5_lane_ab.py [log2_rows]
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS
from sventt_tpu.field.limb import FieldConsts, U64
from sventt_tpu.field.modulus import Modulus
from sventt_tpu.ops import ntt_mxu
from sventt_tpu.ops.transpose import transpose_xla
from sventt_tpu.utils.truetime import time_chained

M = 256


def main():
    rows = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 16)
    mod = Modulus(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR)
    fc = FieldConsts.from_modulus(mod, lazy=False)
    t = ntt_mxu.make_mxu_tables(mod, M, inverse=False)

    x = jax.jit(
        lambda: U64(
            jnp.zeros((rows, M), jnp.uint32),
            jnp.arange(rows * M, dtype=jnp.uint32).reshape(rows, M),
        )
    )()

    def v_lane(v, t):
        return ntt_mxu.mxu_ntt_lane(v, t, fc)

    def v_sandwich(v, t):
        w = U64(transpose_xla(v.hi), transpose_xla(v.lo))
        w = ntt_mxu.mxu_ntt(w, t, fc)
        return U64(transpose_xla(w.hi), transpose_xla(w.lo))

    # equality first
    a = jax.jit(v_lane)(x, t)
    b = jax.jit(v_sandwich)(x, t)
    ok = bool(
        jnp.array_equal(a.hi, b.hi) & jnp.array_equal(a.lo, b.lo)
    )
    for name, fn in [("lane", v_lane), ("transpose-sandwich", v_sandwich)]:
        res = time_chained(fn, x, (t,), seconds=1.5, reps=2)
        print(json.dumps({
            "variant": name, "rows": rows, "m": M,
            "ms": round(res.ms, 4), "k": res.k, "equal": ok,
        }), flush=True)


if __name__ == "__main__":
    main()
