"""Headline benchmark: 2^24-point forward NTT on one TPU chip.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"}
IMMEDIATELY after the timed measurement, then verifies bit-exactness via an
8-byte device checksum and prints a second {"verified": ...} JSON line.

Mirrors the reference's bench-ntt harness (reference tests/bench-ntt.cpp:20-65:
fill input with iota, golden-check, time the transform) at BASELINE.md
config 4 scale (n = 2^24 blocked six-step).  The reference publishes no
absolute numbers (BASELINE.md), so ``vs_baseline`` reports distance from the
chip's own speed of light instead: roofline_ms / measured_ms, where the
roofline charges the canonical six-step's minimal HBM traffic -- 4 read+write
passes over the 8-byte/point limb data (U64 = 2 x uint32) -- at the chip's
measured streaming bandwidth.  1.0 = at roofline; higher is better.

TIMING METHODOLOGY (round 3, sventt_tpu/utils/truetime.py): through the
axon tunnel ``jax.block_until_ready`` acknowledges DISPATCH, not
completion, so every timing here is a single-dispatch jitted fori_loop
chain whose completion is forced by a device-to-host readback of one
element, minus the measured flat RTT.  Rounds 1-2 of this file used
block_until_ready chains; every sub-millisecond round-2 number (including
BENCH_r02's 0.093 ms) was a dispatch-rate artifact.  vs_baseline is
therefore NOT comparable across rounds 2 -> 3+.

ROUND-4 BUDGET DISCIPLINE (BENCH_r03 timed out at rc=124 with no number):
no large host<->device transfers anywhere -- input is generated ON DEVICE
(a full-range splitmix64 fill, utils/fill.py), verification reads back an
8-byte checksum (sum of normalized output limbs mod 2^32) compared against
the same checksum of the host oracle, and the streaming-bandwidth
calibration is cached per device kind (measured once, then a constant).
The headline line is printed before any verification work, so a timeout in
the tail loses the verdict, not the measurement.

Env overrides: BENCH_N (log2 points, default 24), BENCH_SECONDS (target
device seconds per timed chain, default 2), BENCH_VERIFY=0 (skip the
verification tail), BENCH_STREAM_GBPS (override calibration).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_STREAM_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "stream_calibration.json")


def _wait_for_device(max_wait_s: int = 2700, probe_timeout_s: int = 180) -> None:
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

    probe_timeout_s must tolerate a SLOW-but-healthy tunnel: a trivial
    dispatch has been measured taking 2m48s during congestion and then
    succeeding, so 60s probes would spuriously fail a usable device.
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
        wait = max(0.0, 60 - (time.time() - t0))
        print(
            f"bench: device probe {attempt} failed ({detail}); "
            f"retrying in {wait:.0f} s",
            file=sys.stderr,
        )
        time.sleep(wait)


def _stream_gbps_cached(seconds: float) -> float:
    """Streaming bandwidth for the roofline: cached per device kind.

    Measuring stream bandwidth truthfully costs a second compile plus timed
    chains every run; the quantity is a property of the chip, not of this
    benchmark (measured size-independent, PERF_NOTES.md).  So: env override
    > committed/user cache keyed by ``device_kind`` > one truthful
    measurement on a device-created buffer (no H2D), persisted to the cache.
    """
    import jax

    env = os.environ.get("BENCH_STREAM_GBPS")
    if env:
        return float(env)
    kind = jax.devices()[0].device_kind
    cache: dict = {}
    try:
        with open(_STREAM_CACHE) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        pass
    if kind in cache:
        print(f"bench: stream {cache[kind]:.0f} GB/s (cached for {kind!r})",
              file=sys.stderr)
        return float(cache[kind])
    from sventt_tpu.utils.truetime import stream_gbps

    # 2^26 elements = 256 MB: must EXCEED VMEM so this is HBM bandwidth --
    # a 64 MB buffer stays VMEM-resident and reads ~5.6 TB/s (the VMEM
    # stream number, PERF_NOTES.md), inflating the roofline ~8.5x.
    gbps = stream_gbps(26, seconds=min(seconds, 1.0))
    print(f"bench: stream {gbps:.0f} GB/s (measured, {kind!r})", file=sys.stderr)
    cache[kind] = round(gbps, 1)
    try:
        with open(_STREAM_CACHE, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass
    return gbps


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
    import jax.numpy as jnp

    from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS
    from sventt_tpu.field.limb import U64
    from sventt_tpu.plan import NTT, NttConfig
    from sventt_tpu.utils.truetime import time_chained

    log2n = int(os.environ.get("BENCH_N", "24"))
    seconds = float(os.environ.get("BENCH_SECONDS", "2"))
    n = 1 << log2n
    assert n < (1 << 32), "on-device iota input uses one u32 limb"

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

    # Input generated ON DEVICE: a splitmix64 mix of iota masked below N
    # (utils/fill.py) -- the role of the reference harness's iota fill
    # (reference tests/bench-ntt.cpp:28-33 iota_parallel) but FULL-RANGE,
    # so the verification exercises the kernels' high-limb input paths on
    # real hardware (round-4 advisor finding: iota's high u32 limb is
    # identically zero).  Reduced-input precondition holds; no H2D.
    from sventt_tpu.utils.fill import device_fill, host_fill

    x = device_fill(n, cfg.modulus)

    # Truthful timing: single-dispatch fori_loop chain, completion forced
    # by readback, flat RTT subtracted (see module docstring).  The step
    # re-jits inside the chain program with tables as ARGUMENTS.
    step, tables = ntt.forward_step()
    t0 = time.perf_counter()
    res = time_chained(step, x, tables, seconds=seconds, reps=2)
    print(
        f"bench: compile+measure {time.perf_counter() - t0:.1f}s "
        f"(rtt {res.rtt_ms:.1f} ms, k={res.k}, samples {res.samples})",
        file=sys.stderr,
    )
    ms = res.ms

    hbm_gbps = _stream_gbps_cached(seconds)
    bytes_per_pass = 2 * 8 * n  # read + write, 8 B/point (u64 = 2 x u32)
    roofline_ms = 4 * bytes_per_pass / (hbm_gbps * 1e9) * 1e3

    # THE headline line -- printed before any verification work so a timeout
    # in the tail cannot lose the measurement (round-3 failure mode).
    print(
        json.dumps(
            {
                "metric": f"ntt_2p{log2n}_forward_ms",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(roofline_ms / ms, 4),
            }
        ),
        flush=True,
    )

    if os.environ.get("BENCH_VERIFY", "1") == "0":
        return

    # Verification via 8-byte checksum: sum of the normalized output's u32
    # limbs mod 2^32, computed on device and compared against the same
    # checksum of the host golden oracle on the same iota input.  No 128 MB
    # D2H readback (round-3 failure mode), and the forward runs through the
    # ALREADY-COMPILED chain program (k=1) -- jitting the forward separately
    # would be a second multi-minute remote compile at 2^24.
    fc = ntt.fc
    y = res.chain_fn(x, np.int32(1), *tables)

    def _ck(v):
        z = fc.normalize(v)
        return (jnp.sum(z.hi, dtype=jnp.uint32), jnp.sum(z.lo, dtype=jnp.uint32))

    dev_hi, dev_lo = (int(np.asarray(v)) for v in jax.jit(_ck)(y))

    from sventt_tpu import native

    xv = host_fill(n, cfg.modulus)  # bit-identical to the device input
    if native.available():
        want = native.golden_forward(xv, cfg.modulus, cfg.generator)
        ref_hi = int(np.sum((want >> np.uint64(32)).astype(np.uint32),
                            dtype=np.uint32))
        ref_lo = int(np.sum(want.astype(np.uint32), dtype=np.uint32))
        ok = (dev_hi, dev_lo) == (ref_hi, ref_lo)
        method = "limb-sum checksum vs native golden oracle"
    else:
        # X[0] = sum of inputs mod N (DFT definition) is subsumed by the
        # full checksum only when the oracle exists; without it, fall back
        # to checking the device checksum is at least self-consistent and
        # nonzero (weak, but the native oracle is present in CI).
        ok = (dev_hi, dev_lo) != (0, 0)
        method = "no native oracle: nonzero-checksum smoke check"
    print(
        json.dumps(
            {
                "verified": bool(ok),
                "method": method,
                "checksum_device": [dev_hi, dev_lo],
                "samples_ms": [round(s, 4) for s in res.samples],
                "rtt_ms": round(res.rtt_ms, 2),
                "chain_k": res.k,
                "stream_gbps": round(hbm_gbps, 1),
            }
        ),
        flush=True,
    )
    if not ok:
        print("bench: VERIFICATION FAILED", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
