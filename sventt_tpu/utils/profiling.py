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


def phase_breakdown(ntt, iters: int = 20, seed: int = 0) -> dict[str, float]:
    """Per-level timing budget of a forward transform (chained calls).

    Walks the plan tree and times, as STANDALONE jit programs at the
    plan's own intermediate shapes: each split level's row step (the
    fused mid-axis chunk program, inter-step twiddle included, for jnp
    rows; the bare twiddle multiply otherwise) and the final column
    transform -- plus the whole transform for comparison.  Standalone
    phases can sum to more than the whole (XLA fuses across levels in the
    real program; the gap is the fusion win).  This packages the
    methodology of PERF_NOTES.md's "2^24 phase split"; on the tunneled
    TPU run it in a fresh process BEFORE any readback.  Returns
    {phase label: ms}.
    """
    import time

    import numpy as np

    from ..field.limb import u64_from_numpy
    from ..plan import planner

    cfg = ntt.config
    tabs = ntt._fwd_tables
    fc = ntt.fc
    rng = np.random.default_rng(seed)

    def dev(shape):
        flat = rng.integers(
            0, cfg.modulus, int(np.prod(shape)), dtype=np.uint64
        )
        return jax.device_put(u64_from_numpy(flat.reshape(shape)))

    def chain(f, x, *tables):
        """Tables are jit ARGUMENTS (closing over them would bake hundreds
        of MB of twiddles into the serialized HLO -- HTTP 413 through the
        remote-compile tunnel)."""
        jax.block_until_ready(f(x, *tables))  # compile + warm
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = f(y, *tables)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / iters * 1e3

    out: dict[str, float] = {}
    out["total"] = chain(lambda v: ntt.compute_forward(v), dev((cfg.n,)))

    node, batch, level = ntt.plan, (), 0
    while isinstance(node, planner.Split):
        m0, m1 = node.m0, node.m1
        shape = (m0, m1) + batch
        tw = tabs.split_tw[(m0, m1)]
        if planner._jnp_row(node):
            f = jax.jit(
                lambda v, t, tw: planner._jnp_mid_chunked(
                    v, t, fc, tw, inverse=False, chunk_elems=tabs.knobs[3]
                )
            )
            out[f"level{level}.rows m1={m1} (+tw, fused chunks)"] = chain(
                f, dev(shape), tabs.leaf[m1], tw
            )
        else:
            # pallas lane/mid rows or the transposed fallback: time the
            # inter-step twiddle multiply alone (the row engines have
            # their own benchmarks in benchmarks/bench_ntt.py)
            f = jax.jit(
                lambda v, tw, nb=len(batch): planner._mont_mul_bcast(
                    fc, v, tw, nb
                )
            )
            out[f"level{level}.inter-step tw {m0}x{m1}"] = chain(
                f, dev(shape), tw
            )
        node, batch, level = node.col, (m1,) + batch, level + 1

    f = jax.jit(lambda v, t: planner.run_forward(v, node, t))
    out[f"level{level}.col leaf m={node.m}"] = chain(
        f, dev((node.m,) + batch), tabs
    )
    return out
