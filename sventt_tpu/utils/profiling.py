"""Profiling hooks: jax.profiler traces around transform workloads.

The reference's observability is Google Benchmark counters
(reference tests/bench-ntt.cpp:57-58); the TPU-native equivalents are the
benchmark harnesses' JSON rows (benchmarks/) plus this trace context for
inspecting kernel timelines in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace of the enclosed block.

    Usage::

        with trace("/tmp/ntt-trace"):
            jax.block_until_ready(ntt.compute_forward(x))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
