"""Shared benchmark utilities.

All timings use chained dependent executions inside one block_until_ready:
single-call timings through the axon tunnel carry a flat ~27 ms completion
poll regardless of device time (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import sys
import time

import jax


#: Minimum wall time of one timed chain (the autotuner's MIN_CHAIN_S):
#: below this, tunnel jitter is comparable to the measurement itself.
MIN_CHAIN_MS = 50.0

#: Chain-length cap during adaptive lengthening.
MAX_CHAIN_ITERS = 512


def chain_time_ms(step, state, iters: int = 20, reps: int = 2) -> float:
    """Amortized timing: dependent steps chained inside one block_until_ready.

    The chain is lengthened adaptively until one chain takes >= MIN_CHAIN_MS
    of wall time (fast configs would otherwise be judged on tunnel noise),
    then the MEDIAN over 1+``reps`` full-length chains is returned (the
    tunnel occasionally returns an impossibly fast chain; min latches it).
    """
    state = jax.block_until_ready(step(state))  # warm-up / compile

    def chain(k: int) -> float:
        s = state
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        jax.block_until_ready(s)
        return (time.perf_counter() - t0) / k * 1e3

    ms = chain(iters)
    while iters < MAX_CHAIN_ITERS and ms * iters < MIN_CHAIN_MS:
        iters = min(MAX_CHAIN_ITERS, iters * 2)
        ms = chain(iters)
    samples = sorted([ms] + [chain(iters) for _ in range(reps)])
    return samples[len(samples) // 2]


def emit(row: dict) -> None:
    print(json.dumps(row), flush=True)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)
