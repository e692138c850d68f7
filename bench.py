"""Headline benchmark: 2^24-point forward NTT on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference's bench-ntt harness (reference tests/bench-ntt.cpp:20-65:
fill input, golden-check, time the transform) at BASELINE.md config 4 scale
(n = 2^24 blocked six-step).  The reference publishes no absolute numbers
(BASELINE.md), so ``vs_baseline`` reports distance from the chip's own
speed of light instead: roofline_ms / measured_ms, where the roofline charges
the six-step's minimal HBM traffic (4 read+write passes over the 16-byte/point
limb data) at the chip's peak HBM bandwidth.  1.0 = at roofline; higher is
better.

Env overrides: BENCH_N (log2 points, default 24), BENCH_ITERS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _wait_for_device(max_wait_s: int = 2700, probe_timeout_s: int = 150) -> None:
    """Block until the TPU answers a trivial dispatch, probing in subprocesses.

    The tunneled device can wedge for tens of minutes (e.g. after a killed
    large host-to-device transfer, PERF_NOTES.md round 2) and a hung jax
    runtime in-process is unrecoverable — so each probe runs ``jax.devices()``
    plus one tiny jit dispatch in a fresh subprocess under a timeout, and the
    main process only initializes jax once a probe succeeds.  Gives up (and
    proceeds, so the failure mode is visible downstream) after ``max_wait_s``.
    If the device never answers, EXITS non-zero: proceeding would hang
    forever inside jax initialization (outages of many hours observed),
    and a hung benchmark is worse for the calling harness than a clean
    failure.  Disable with BENCH_PROBE=0; lengthen with
    BENCH_MAX_WAIT_S.
    """
    import subprocess

    if os.environ.get("BENCH_PROBE", "1") == "0":
        return
    max_wait_s = int(os.environ.get("BENCH_MAX_WAIT_S", max_wait_s))
    code = (
        "import jax, jax.numpy as jnp;"
        "jax.block_until_ready(jax.jit(lambda a: a + 1)"
        "(jnp.zeros((8, 128), jnp.uint32)))"
    )
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(
                        f"bench: device responsive after {attempt} probes",
                        file=sys.stderr,
                    )
                return
            detail = r.stderr.decode(errors="replace").strip()[-200:]
        except subprocess.TimeoutExpired:
            detail = f"probe hung {probe_timeout_s}s"
        if time.time() >= deadline:
            print(
                f"bench: device still unresponsive after {attempt} probes "
                f"over {max_wait_s} s ({detail}); aborting -- initializing "
                "jax now would hang indefinitely",
                file=sys.stderr,
            )
            sys.exit(2)
        wait = max(0.0, 120 - (time.time() - t0))
        print(
            f"bench: device probe {attempt} failed ({detail}); "
            f"retrying in {wait:.0f} s",
            file=sys.stderr,
        )
        time.sleep(wait)


def _hbm_gbps() -> float:
    """Measured streaming bandwidth of the local chip.

    Calibrated at runtime with a chained elementwise pass over 256 MB (spec
    tables are useless here: the tunneled device sustains far more than v5e
    datasheet bandwidth, so the roofline must be empirical).
    """
    import jax
    import jax.numpy as jnp

    n = 1 << 26
    x = jax.device_put(jnp.ones((n,), jnp.uint32))
    f = jax.jit(lambda a: a + jnp.uint32(1))
    jax.block_until_ready(f(x))
    iters = 40
    t0 = time.perf_counter()
    s = x
    for _ in range(iters):
        s = f(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters
    return n * 4 * 2 / dt / 1e9


def main() -> None:
    # Persistent XLA compilation cache: the 2^24 program compiles in ~8 s
    # instead of ~35-70 s on repeat runs (measured round 3).  Must be set
    # before the first jax import reads its config.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/sventt_tpu/xla-cache"),
    )
    _wait_for_device()

    import jax

    from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS
    from sventt_tpu.field.limb import u64_from_numpy
    from sventt_tpu.plan import NTT, NttConfig

    log2n = int(os.environ.get("BENCH_N", "24"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    n = 1 << log2n

    cfg = NttConfig(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, n)
    # Apply autotuned knobs when this (config, device) was tuned before
    # (autotune_cache.json ships with the repo); never tune inside a bench.
    from sventt_tpu.plan.autotune import tune

    cfg = tune(cfg, on_miss="skip")
    ntt = NTT(cfg, enable_inverse=False)
    print(
        f"bench: n=2^{log2n} plan={ntt.plan} platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    x = u64_from_numpy(rng.integers(0, cfg.modulus, n, dtype=np.uint64))
    x = jax.device_put(x)

    # Warm-up (compile).  NOTE ORDER: all timing happens BEFORE any
    # device-to-host readback -- the first D2H permanently degrades the
    # axon tunnel's dispatch path by ~1.5 ms/call (measured, PERF_NOTES.md
    # round 2), so verification runs after the clocks stop.
    t0 = time.perf_counter()
    out = ntt.compute_forward(x)
    jax.block_until_ready(out)
    print(f"bench: compile+first run {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Roofline calibration (chained adds, no D2H) in the same clean state.
    hbm_gbps = _hbm_gbps()

    # Chained dependent calls inside one block: single-call timings through
    # the axon tunnel carry a flat ~27 ms completion-poll latency.  The
    # chain is lengthened adaptively until one chain takes >= 50 ms of wall
    # time (the autotuner's MIN_CHAIN_S methodology, plan/autotune.py) --
    # at the 0.1 ms/call scale a 10-call chain is dominated by tunnel
    # jitter.  MEDIAN of three full-length chains: the tunnel occasionally
    # returns an impossibly fast chain (block_until_ready returning early,
    # observed round 3), and a min would latch exactly those.
    def chain_ms(k: int) -> float:
        y = x
        t0 = time.perf_counter()
        for _ in range(k):
            y = ntt.compute_forward(y)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / k * 1e3

    chain = max(iters, 10)
    ms = chain_ms(chain)
    while chain < 512 and ms * chain < 50.0:
        chain = min(512, chain * 2)
        ms = chain_ms(chain)
    samples = sorted([ms] + [chain_ms(chain) for _ in range(2)])
    ms = samples[len(samples) // 2]

    from sventt_tpu import native
    from sventt_tpu.field.limb import u64_to_numpy

    outv = u64_to_numpy(ntt.fc.normalize(out))
    xv = u64_to_numpy(x)
    if native.available():
        # Full bit-exact check against the independent C++ oracle
        # (O(m log m); a few seconds at 2^24).
        want = native.golden_forward(xv, cfg.modulus, cfg.generator)
        assert (outv == want).all(), "bit-exact check vs native oracle FAILED"
        print("bench: bit-exact vs native golden oracle", file=sys.stderr)
    else:
        # X[0] = sum of inputs mod N (DFT definition).
        want0 = int(xv.astype(object).sum() % cfg.modulus)
        assert int(outv[0]) == want0, "correctness check failed"
        print("bench: X[0] matches DFT definition", file=sys.stderr)

    bytes_per_pass = 2 * 16 * n  # read + write, 16 B/point (2x u32 limb pairs)
    roofline_ms = 4 * bytes_per_pass / (hbm_gbps * 1e9) * 1e3
    print(
        json.dumps(
            {
                "metric": f"ntt_2p{log2n}_forward_ms",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(roofline_ms / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
