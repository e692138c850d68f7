"""Transpose strategy benchmark grid with built-in verification.

The analogue of the reference's bench-transpose autotuning corpus
(reference tests/bench-transpose.cpp:105-499: every strategy x block size x
shape, verified by inverse-transpose after timing).  Results feed the
strategy choice in ops/transpose.py.

ALL timing happens before the first device-to-host readback: the first
D2H permanently degrades the tunnel dispatch path to ~1.5 ms/call for the
rest of the process (PERF_NOTES.md round 2), so verification is a second
pass after every clock has stopped -- same discipline as bench.py.

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


def _alt_chain_ms(make_step, x, iters: int = 20) -> float:
    """Alternate two separately-jitted transposes (r,c)->(c,r)->(r,c).

    A single jitted T(T(x)+1) is fused to identity+elementwise by XLA and
    measures nothing; two distinct compiled programs per direction defeat
    that (the +1 between them keeps each transpose materialized).
    """
    import time

    f1, f2 = make_step(), make_step()
    s = jax.block_until_ready(f2(f1(x)))
    t0 = time.perf_counter()
    s = x
    for _ in range(iters):
        s = f2(f1(s))
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / iters / 2 * 1e3


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

        ms = _alt_chain_ms(
            lambda: jax.jit(lambda a: transpose_xla(a) + jnp.uint32(1)), x
        )
        rows.append({"strategy": "xla", "rows": r, "cols": c, "block": None, "ms": ms})

        for b in BLOCKS:
            if r % b or c % b:
                continue
            try:
                ms = _alt_chain_ms(
                    lambda b=b: jax.jit(
                        lambda a: transpose_pallas(a, b, b) + jnp.uint32(1)
                    ),
                    x,
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
