"""Ground-truth timing probe (round 3).

Round-3 discovery: through the axon tunnel, ``jax.block_until_ready``
returns ~24 ms after DISPATCH, not after completion -- a K=512 fori_loop
chain of 2^24 transforms "completed" in 0.4 ms of block time and then took
37.5 s to actually produce a byte (verified by forced D2H readback).  Every
round-2 sub-0.1 ms chained timing was a dispatch-rate measurement, not a
device time.  The only truthful clock is wall time from dispatch to a
device-to-host readback of (a slice of) the final result, minus the flat
tunnel RTT, divided by the chain length.

Usage: python experimental/r3_truth.py <spec-json>
  spec: {"kind": "ntt", "n": ..., "N": ..., "g": ..., "engine": ...,
         "modmul": ..., "knobs": {...}, "seconds": 2.0}
        {"kind": "stream", "log2elems": 26}
Prints one JSON line {"ms": per-op ms, "rtt_ms": ..., "k": chain length}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/sventt_tpu/xla-cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def measure_rtt() -> float:
    """Flat dispatch+readback round-trip of a trivial warm program."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + jnp.uint32(1))
    z = jax.device_put(jnp.zeros((8,), jnp.uint32))
    _ = np.asarray(f(z))  # warm (also flips the tunnel to post-D2H state)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(z))
        best = min(best, time.perf_counter() - t0)
    return best


def true_ms(step, x, readback, seconds: float, probe_ms: float | None = None):
    """Per-op ms of ``step`` chained to >= ``seconds`` of wall time.

    Chains k dependent applications, forces completion with ``readback``
    on the final value, subtracts the measured RTT.  The first probe chain
    (k=4) estimates per-op cost to size the full chain.
    """
    rtt = measure_rtt()

    def chain(k):
        t0 = time.perf_counter()
        y = x
        for _ in range(k):
            y = step(y)
        readback(y)
        return (time.perf_counter() - t0 - rtt) / k

    # warm-up: compile + one completed run
    y = step(x)
    readback(y)
    per = chain(4) if probe_ms is None else probe_ms / 1e3
    k = max(4, min(4096, int(seconds / max(per, 1e-7))))
    samples = sorted(chain(k) for _ in range(3))
    return samples[1] * 1e3, rtt * 1e3, k


def run_ntt(spec: dict) -> None:
    import jax

    from sventt_tpu.field.limb import u64_from_numpy
    from sventt_tpu.plan import NTT, NttConfig

    cfg = NttConfig(
        spec["N"], spec["g"], spec["n"],
        engine=spec.get("engine", "auto"),
        modmul=spec.get("modmul", "auto"),
        **spec.get("knobs", {}),
    )
    ntt = NTT(cfg, enable_inverse=False)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        u64_from_numpy(rng.integers(0, cfg.modulus, cfg.n, dtype=np.uint64))
    )
    ms, rtt, k = true_ms(
        ntt.compute_forward,
        x,
        lambda y: np.asarray(y.lo[0]),
        spec.get("seconds", 2.0),
    )
    print(json.dumps({"ms": round(ms, 4), "rtt_ms": round(rtt, 2), "k": k}))


def run_stream(spec: dict) -> None:
    import jax
    import jax.numpy as jnp

    n = 1 << spec.get("log2elems", 26)
    x = jax.device_put(jnp.ones((n,), jnp.uint32))
    f = jax.jit(lambda a: a + jnp.uint32(1))
    ms, rtt, k = true_ms(
        f, x, lambda y: np.asarray(y[0]), spec.get("seconds", 2.0)
    )
    gbps = n * 4 * 2 / (ms / 1e3) / 1e9
    print(json.dumps({"ms": round(ms, 4), "gbps": round(gbps, 1),
                      "rtt_ms": round(rtt, 2), "k": k}))


def main() -> None:
    spec = json.loads(sys.argv[1])
    if spec["kind"] == "stream":
        run_stream(spec)
    else:
        run_ntt(spec)


if __name__ == "__main__":
    main()
