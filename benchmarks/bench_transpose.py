"""Transpose strategy benchmark grid with built-in verification.

The analogue of the reference's bench-transpose autotuning corpus
(reference tests/bench-transpose.cpp:105-499: every strategy x block size x
shape, verified by inverse-transpose after timing).  Results feed the
strategy choice in ops/transpose.py.

Emits one JSON line per point:
  {"strategy", "rows", "cols", "block", "ms", "gbps", "verified"}

Usage: python benchmarks/bench_transpose.py [--quick]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import chain_time_ms, emit, log
from sventt_tpu.ops.transpose import transpose_pallas, transpose_xla

SHAPES = [(1024, 1024), (4096, 4096), (256, 16384), (16384, 256)]
BLOCKS = [128, 256, 512]


def main() -> None:
    quick = "--quick" in sys.argv
    shapes = SHAPES[:2] if quick else SHAPES
    rng = np.random.default_rng(0)
    for r, c in shapes:
        x = jax.device_put(
            jnp.asarray(rng.integers(0, 1 << 32, (r, c), dtype=np.uint32))
        )
        want = np.asarray(x).T

        # XLA strategy (round trip per step keeps shapes closed)
        f = jax.jit(lambda a: transpose_xla(transpose_xla(a) + jnp.uint32(1)))
        ms = chain_time_ms(f, x) / 2  # two transposes per step
        ok = bool((np.asarray(jax.jit(transpose_xla)(x)) == want).all())
        gbps = r * c * 4 * 2 / (ms / 1e3) / 1e9
        emit(
            {
                "strategy": "xla",
                "rows": r,
                "cols": c,
                "block": None,
                "ms": round(ms, 4),
                "gbps": round(gbps, 1),
                "verified": ok,
            }
        )

        for b in BLOCKS:
            if r % b or c % b:
                continue
            try:
                g = jax.jit(
                    lambda a, b=b: transpose_pallas(
                        transpose_pallas(a, b, b) + jnp.uint32(1), b, b
                    )
                )
                ms = chain_time_ms(g, x) / 2
                ok = bool(
                    (np.asarray(transpose_pallas(x, b, b)) == want).all()
                )
                gbps = r * c * 4 * 2 / (ms / 1e3) / 1e9
                emit(
                    {
                        "strategy": "pallas",
                        "rows": r,
                        "cols": c,
                        "block": b,
                        "ms": round(ms, 4),
                        "gbps": round(gbps, 1),
                        "verified": ok,
                    }
                )
            except Exception as e:  # noqa: BLE001 -- strategy may not compile
                log(f"pallas {r}x{c} block {b}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
