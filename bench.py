"""Headline benchmark: 2^24-point forward NTT on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference's bench-ntt harness (reference tests/bench-ntt.cpp:20-65:
fill input, golden-check, time the transform) at BASELINE.md config 4 scale
(n = 2^24 blocked six-step).  The reference publishes no absolute numbers
(BASELINE.md), so ``vs_baseline`` reports distance from the chip's own
speed of light instead: roofline_ms / measured_ms, where the roofline charges
the canonical six-step's minimal HBM traffic -- 4 read+write passes over the
8-byte/point limb data (U64 = 2 x uint32), i.e. 64 B/point -- at the chip's
measured streaming bandwidth.  1.0 = at roofline; higher is better.

TIMING METHODOLOGY (round 3, sventt_tpu/utils/truetime.py): through the
axon tunnel ``jax.block_until_ready`` acknowledges DISPATCH, not
completion, so every timing here is a single-dispatch jitted fori_loop
chain whose completion is forced by a device-to-host readback of one
element, minus the measured flat RTT.  Rounds 1-2 of this file used
block_until_ready chains; every sub-millisecond round-2 number (including
BENCH_r02's 0.093 ms) was a dispatch-rate artifact, and round 2's roofline
calibration was inflated the same way (4-29 TB/s for a chip whose true
stream bandwidth is ~657 GB/s).  vs_baseline is therefore NOT comparable
across rounds 2 -> 3; the round-3 figures are the truthful ones.  Round 2
also double-counted bytes/point (16 instead of 8); fixed here.

Env overrides: BENCH_N (log2 points, default 24), BENCH_SECONDS (target
device seconds per timed chain, default 3).
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
    main process only initializes jax once a probe succeeds.  If the device
    never answers, EXITS non-zero: proceeding would hang forever inside jax
    initialization (outages of many hours observed), and a hung benchmark is
    worse for the calling harness than a clean failure.  Disable with
    BENCH_PROBE=0; lengthen with BENCH_MAX_WAIT_S.
    """
    import subprocess

    if os.environ.get("BENCH_PROBE", "1") == "0":
        return
    max_wait_s = int(os.environ.get("BENCH_MAX_WAIT_S", max_wait_s))
    code = (
        "import jax, jax.numpy as jnp;"
        "import numpy as np;"
        "np.asarray(jax.jit(lambda a: a + 1)"
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


def main() -> None:
    # Persistent XLA compilation cache: the 2^24 program compiles in ~8 s
    # instead of ~35-70 s on repeat runs.  Must be set before the first jax
    # import reads its config.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/sventt_tpu/xla-cache"),
    )
    _wait_for_device()

    import jax

    from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS
    from sventt_tpu.field.limb import u64_from_numpy
    from sventt_tpu.plan import NTT, NttConfig, planner
    from sventt_tpu.utils.truetime import stream_gbps, time_chained

    log2n = int(os.environ.get("BENCH_N", "24"))
    seconds = float(os.environ.get("BENCH_SECONDS", "3"))
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

    # Truthful timing: single-dispatch fori_loop chain, completion forced
    # by readback, flat RTT subtracted (see module docstring).  The step
    # re-jits inside the chain program with tables as ARGUMENTS.
    plan = ntt.plan
    t0 = time.perf_counter()
    res = time_chained(
        lambda v, t: planner.run_forward(v, plan, t),
        x,
        (ntt._fwd_tables,),
        seconds=seconds,
    )
    print(
        f"bench: compile+measure {time.perf_counter() - t0:.1f}s "
        f"(rtt {res.rtt_ms:.1f} ms, k={res.k}, samples {res.samples})",
        file=sys.stderr,
    )
    ms = res.ms

    # Truthful streaming-bandwidth calibration for the roofline.
    hbm_gbps = stream_gbps(26, seconds=min(seconds, 2.0))
    print(f"bench: stream {hbm_gbps:.0f} GB/s", file=sys.stderr)

    from sventt_tpu import native
    from sventt_tpu.field.limb import u64_to_numpy

    out = ntt.compute_forward(x)
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

    bytes_per_pass = 2 * 8 * n  # read + write, 8 B/point (u64 = 2 x u32)
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
