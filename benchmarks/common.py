"""Shared benchmark utilities.

All timings use ``sventt_tpu.utils.truetime``: one jitted fori_loop chain
per measurement, completion forced by a one-element device-to-host
readback, flat tunnel RTT subtracted.  ``jax.block_until_ready`` through
the axon tunnel acknowledges DISPATCH, not completion (round-3 ground
truth, PERF_NOTES.md), so block-based chains measure dispatch rate --
kept available as ``dispatch_rate_ms`` for the dispatch-path benchmark
only.
"""

from __future__ import annotations

import json
import sys
import time

import jax


def chain_time_ms(
    step,
    state,
    tables=(),
    seconds: float = 2.0,
    reps: int = 2,
) -> float:
    """Truthful per-step milliseconds (median of ``reps`` chains).

    ``step(state, *tables) -> state``.  Pass twiddle tables and other large
    operands via ``tables`` -- the chain program traces ``step``, so
    anything closed over is baked into its HLO (hundreds of MB for 2^24
    tables -> HTTP 413 through the remote-compile tunnel).
    """
    from sventt_tpu.utils.truetime import time_chained

    return time_chained(
        step, state, tables, seconds=seconds, reps=reps
    ).ms


def dispatch_rate_ms(step, state, iters: int = 20, reps: int = 2) -> float:
    """Per-call DISPATCH time of ``step`` (NOT device time).

    The pre-round-3 chain timer: k dependent dispatches inside one
    block_until_ready, which through the tunnel returns at dispatch-ack.
    Only meaningful for characterizing the dispatch path itself
    (benchmarks/bench_dispatch.py); never report it as kernel time.
    """
    state = jax.block_until_ready(step(state))  # warm-up / compile

    def chain(k: int) -> float:
        s = state
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        jax.block_until_ready(s)
        return (time.perf_counter() - t0) / k * 1e3

    samples = sorted(chain(iters) for _ in range(1 + reps))
    return samples[len(samples) // 2]


def emit(row: dict) -> None:
    print(json.dumps(row), flush=True)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)
