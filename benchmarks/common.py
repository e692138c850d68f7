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


def chain_time_ms(step, state, iters: int = 20) -> float:
    """Median-free amortized timing: iters dependent steps in one block."""
    state = jax.block_until_ready(step(state))  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters * 1e3


def emit(row: dict) -> None:
    print(json.dumps(row), flush=True)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)
