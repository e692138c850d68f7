"""Transpose strategy benchmark grid with built-in verification.

The analogue of the reference's bench-transpose autotuning corpus
(reference tests/bench-transpose.cpp:105-499: every strategy x block size x
shape, verified by inverse-transpose after timing).  Results feed the
strategy choice in ops/transpose.py.

Timing via utils/truetime (single-dispatch fori chains, forced readback):
each chain iteration is transpose -> barrier -> transpose back -> barrier,
with `optimization_barrier` keeping both transposes materialized (a fused
T(T(x)) would be optimized to identity).  Verification is a second pass.

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

from benchmarks.common import emit, log
from sventt_tpu.ops.transpose import transpose_pallas, transpose_xla

#: Square, moderately skewed, and the 2^24 six-step row-matrix shapes
#: (256 x 65536 measured at 64 GB/s vs 179 GB/s square in round 1 --
#: the skew penalty that motivated the transpose-free mid-axis schedule).
SHAPES = [
    (1024, 1024), (4096, 4096), (256, 16384), (16384, 256),
    (256, 65536), (65536, 256),
]
BLOCKS = [128, 256, 512]


def _alt_chain_ms(transpose_one, x) -> float:
    """Two transposes per chain iteration, barrier-separated.

    ``transpose_one`` maps (r, c) -> (c, r); applying it twice restores the
    carry shape for the fori chain.  `optimization_barrier` after each
    transpose (+1 to touch the data) stops XLA from fusing T(T(x)) into an
    identity.  Returns truthful ms per SINGLE transpose.
    """
    from sventt_tpu.utils.truetime import time_chained

    def step(a):
        y = jax.lax.optimization_barrier(transpose_one(a) + jnp.uint32(1))
        return jax.lax.optimization_barrier(transpose_one(y) + jnp.uint32(1))

    return time_chained(step, x, seconds=1.0, reps=2).ms / 2


def main() -> None:
    quick = "--quick" in sys.argv
    shapes = SHAPES[:2] if quick else SHAPES
    rng = np.random.default_rng(0)

    # Pass 1: time every point.  No readbacks anywhere in this pass.
    inputs: dict[tuple[int, int], jax.Array] = {}
    rows: list[dict] = []
    for r, c in shapes:
        x = jax.device_put(
            jnp.asarray(rng.integers(0, 1 << 32, (r, c), dtype=np.uint32))
        )
        inputs[(r, c)] = x

        ms = _alt_chain_ms(transpose_xla, x)
        rows.append({"strategy": "xla", "rows": r, "cols": c, "block": None, "ms": ms})

        for b in BLOCKS:
            if r % b or c % b:
                continue
            try:
                ms = _alt_chain_ms(
                    lambda a, b=b: transpose_pallas(a, b, b), x
                )
                rows.append(
                    {"strategy": "pallas", "rows": r, "cols": c, "block": b, "ms": ms}
                )
            except Exception as e:  # noqa: BLE001 -- strategy may not compile
                log(f"pallas {r}x{c} block {b}: {str(e)[:120]}")

    # Pass 2: clocks have stopped; verify (first D2H happens here) and emit.
    wants: dict[tuple[int, int], np.ndarray] = {}
    for row in rows:
        r, c = row["rows"], row["cols"]
        x = inputs[(r, c)]
        if (r, c) not in wants:
            wants[(r, c)] = np.asarray(x).T
        if row["strategy"] == "xla":
            out = jax.jit(transpose_xla)(x)
        else:
            out = transpose_pallas(x, row["block"], row["block"])
        ok = bool((np.asarray(out) == wants[(r, c)]).all())
        ms = row.pop("ms")
        gbps = r * c * 4 * 2 / (ms / 1e3) / 1e9
        emit({**row, "ms": round(ms, 4), "gbps": round(gbps, 1), "verified": ok})


if __name__ == "__main__":
    main()
