"""Truthful device timing through the axon tunnel.

Round-3 ground truth (experimental/r3_truth.py): through the tunneled TPU,
``jax.block_until_ready`` returns ~24 ms after DISPATCH, not completion --
a K=512 chain of 2^24 transforms "completed" in 0.4 ms of block time and
then took 37.5 s to produce a byte.  Every timing that ends in
block_until_ready is a dispatch-rate measurement.  The only truthful clock
is wall time from dispatch to a device-to-host readback of (an element of)
the final result, minus the flat per-chain overhead, divided by the chain
length.

This module is the one timing methodology for every harness in the repo:

* the chain is ONE jitted ``lax.fori_loop`` program with a DYNAMIC trip
  count -- one dispatch regardless of k (so the ~1.5 ms/dispatch post-D2H
  degraded path cannot pollute per-op time), one compile regardless of k;
* completion is forced by a jitted one-element extraction of the result
  followed by a 4-byte readback (works for sharded arrays too);
* the fixed overhead (dispatch + extract + readback round trip) is
  measured with a ZERO-iteration run of the same chain program and
  subtracted -- the calibration path is byte-for-byte the measurement
  path;
* the chain length is sized from a short probe chain so one full chain
  takes ``seconds`` of device time, and the reported value is the MEDIAN
  of ``reps`` full chains.

On non-tunneled backends (CPU tests) the same method is simply a correct,
low-overhead timer.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

_extract_fn = None


def _read_one(y) -> None:
    """Force completion: jitted scalar reduction of the first array leaf of
    ``y`` (sharding-agnostic -- reductions over sharded axes lower to
    collectives where element slicing does not), then a 4-8 B readback.
    The reduction costs one pass over the final value, but the same pass
    is paid by the zero-iteration calibration run, so it cancels out of
    the per-op time."""
    global _extract_fn
    import jax
    import jax.numpy as jnp

    if _extract_fn is None:
        _extract_fn = jax.jit(lambda a: jnp.min(a))
    leaf = jax.tree_util.tree_leaves(y)[0]
    np.asarray(_extract_fn(leaf))


def measure_rtt(reps: int = 3) -> float:
    """Flat dispatch+readback round trip (seconds) of a trivial warm program.

    Also flips the tunnel into its post-first-D2H state, so every
    subsequent chain runs under the same (degraded, but amortized-away)
    dispatch path instead of straddling the transition.
    """
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + jnp.uint32(1))
    z = jax.device_put(jnp.zeros((8,), jnp.uint32))
    np.asarray(f(z))  # warm + D2H-state flip
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(z))
        best = min(best, time.perf_counter() - t0)
    return best


@dataclass
class ChainResult:
    ms: float  # median per-op milliseconds
    rtt_ms: float  # measured fixed per-chain overhead
    k: int  # chain length of the full chains
    samples: list  # per-chain per-op ms, sorted
    #: The compiled chain program ``chain_fn(x, np.int32(k), *tables)``.
    #: ``chain_fn(x, 1, *tables)`` is one application of ``step`` through the
    #: ALREADY-COMPILED program -- callers verifying the timed computation
    #: should use it instead of jitting ``step`` separately (a second
    #: multi-minute remote compile for 2^24-scale programs).
    chain_fn: object = None


def time_chained(
    step,
    x,
    tables=(),
    *,
    seconds: float = 2.0,
    reps: int = 3,
    max_k: int = 4096,
    probe_k: int = 4,
) -> ChainResult:
    """Truthful per-op time of ``step`` (ms).

    ``step(v, *tables) -> v`` must preserve the pytree structure of ``x``
    (transforms whose output feeds the next call).  ``tables`` are passed
    as jit arguments -- closing over hundreds of MB of twiddles would bake
    them into the serialized HLO (HTTP 413 through the remote-compile
    tunnel).  The chain is one jitted fori_loop with a dynamic trip count:
    one compile, one dispatch, any k.
    """
    import jax

    @jax.jit
    def chain_k(v, k, *ts):
        return jax.lax.fori_loop(0, k, lambda i, w: step(w, *ts), v)

    def run(k: int) -> float:
        t0 = time.perf_counter()
        y = chain_k(x, np.int32(k), *tables)
        _read_one(y)
        return time.perf_counter() - t0

    # Warm-up: compile both programs + one completed run.
    run(1)
    # Fixed overhead: the SAME dispatch+extract+readback path with zero
    # chain iterations.
    rtt = min(run(0) for _ in range(3))
    # Size k from the MIN of 3 probe chains: a single transient tunnel
    # stall during one probe would otherwise mis-size every measurement
    # chain (k collapses toward probe_k and the result drowns in RTT
    # noise).  min is the robust choice -- stalls only ever inflate.
    per = max(min(run(probe_k) for _ in range(3)) - rtt, 1e-7) / probe_k
    k = max(probe_k, min(max_k, int(seconds / per)))
    samples = sorted(max(run(k) - rtt, 0.0) / k * 1e3 for _ in range(reps))
    return ChainResult(
        ms=_median_sorted(samples),
        rtt_ms=rtt * 1e3,
        k=k,
        samples=samples,
        chain_fn=chain_k,
    )


def _median_sorted(samples: list) -> float:
    """True median of an already-sorted list (averages the middle pair for
    even counts -- ``samples[len//2]`` would return the MAX of a 2-sample
    list, high-biasing every reps=2 harness)."""
    n = len(samples)
    mid = n // 2
    if n % 2:
        return samples[mid]
    return (samples[mid - 1] + samples[mid]) / 2.0


def stream_gbps(log2elems: int = 26, seconds: float = 2.0) -> float:
    """Truthful streaming bandwidth (GB/s): chained u32 adds, read+write."""
    import jax
    import jax.numpy as jnp

    n = 1 << log2elems
    x = jax.device_put(jnp.ones((n,), jnp.uint32))
    r = time_chained(
        lambda a: a + jnp.uint32(1), x, seconds=seconds
    )
    return n * 4 * 2 / (r.ms / 1e3) / 1e9
