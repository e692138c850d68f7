"""NTT configuration-matrix benchmark with built-in verification.

The analogue of the reference's combined test+benchmark binaries
(reference tests/bench-ntt.cpp + tests/ntt-tests/*.hpp, SURVEY.md 2.2):
every configuration is timed AND verified in the same run -- bit-exactly
against the native golden oracle at every size (O(m log m) C++), falling
back to DFT-definition spot checks (X[0] = sum, X[1] = alternating sum)
plus forward/inverse round trip only if no compiler is available.

Emits one JSON line per config:
  {"config", "n", "engine", "modmul", "direction", "ms", "gbutterfly_s",
   "verified"}

Usage: python benchmarks/bench_ntt.py [--quick]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

# Persistent XLA compilation cache (set before jax reads its config): each
# per-config subprocess re-compiles its program in seconds, not minutes.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/sventt_tpu/xla-cache"),
)

import jax
import numpy as np

from benchmarks.common import chain_time_ms, emit, log
from sventt_tpu import (
    FLAGSHIP_GENERATOR,
    FLAGSHIP_MODULUS,
    TEST_GENERATOR,
    TEST_MODULUS,
    native,
)
from sventt_tpu.field.limb import U64, u64_from_numpy, u64_to_numpy
from sventt_tpu.plan import NTT, NttConfig

#: (name, log2n, modulus, generator, engine, modmul) -- mirrors the
#: reference's test matrix (iterative 2^10..2^13, four/six-step 2^15/2^17,
#: blocked 2^24) on both the 62-bit test modulus and the 64-bit flagship.
CONFIGS = [
    ("iterative-2p10", 10, TEST_MODULUS, TEST_GENERATOR, "auto", "auto"),
    ("iterative-2p12", 12, TEST_MODULUS, TEST_GENERATOR, "auto", "auto"),
    ("sixstep-2p15", 15, TEST_MODULUS, TEST_GENERATOR, "auto", "auto"),
    ("sixstep-2p17-flagship", 17, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, "auto", "auto"),
    ("sixstep-2p20-flagship", 20, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, "auto", "auto"),
    ("sixstep-2p20-jnp", 20, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, "jnp", "auto"),
    ("blocked-2p24-flagship", 24, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, "auto", "auto"),
    ("blocked-2p24-shoup", 24, TEST_MODULUS, TEST_GENERATOR, "auto", "shoup"),
    ("huge-2p26-flagship", 26, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, "auto", "auto"),
]

QUICK = {"iterative-2p10", "sixstep-2p17-flagship"}


def verify(ntt: NTT, x: np.ndarray, fwd_dev: U64) -> bool:
    n = ntt.get_m()
    N = ntt.config.modulus
    fwd = u64_to_numpy(ntt.fc.normalize(fwd_dev))
    if native.available():
        # Full bit-exact check at EVERY size: the native oracle is
        # O(m log m) C++ (a few seconds at 2^24).
        want = native.golden_forward(x, N, ntt.config.generator)
        if not (fwd == want).all():
            return False
    else:
        s = int(x.astype(object).sum() % N)
        alt = int((x[0::2].astype(object).sum() - x[1::2].astype(object).sum()) % N)
        if int(fwd[0]) != s or int(fwd[1]) != alt:
            return False
    if ntt._inv is not None:
        back = ntt.inverse_numpy(fwd)
        return bool((back == x).all())
    return True


def run_config(name: str) -> None:
    """Time-then-verify one config (run in its own process so device and
    compile state is per-config; utils/truetime.py chains are readback-
    forced, so ordering vs verification no longer matters for truth)."""
    rng = np.random.default_rng(0)
    [(name, log2n, N, g, engine, modmul)] = [c for c in CONFIGS if c[0] == name]
    n = 1 << log2n
    cfg = NttConfig(N, g, n, engine=engine, modmul=modmul)
    # Serve autotuned knobs when this (config, device) was tuned before;
    # never tune inside a bench (same policy as bench.py).
    from sventt_tpu.plan.autotune import tune

    cfg = tune(cfg, on_miss="skip")
    log(f"bench_ntt: {name} ...")
    ntt = NTT(cfg)
    x = rng.integers(0, N, n, dtype=np.uint64)
    xd = jax.device_put(u64_from_numpy(x))

    fwd = ntt.compute_forward(xd)  # warm-up / compile

    step_f, tabs_f = ntt.forward_step()
    step_i, tabs_i = ntt.inverse_step()
    ms_f = chain_time_ms(step_f, xd, tabs_f)
    ms_i = chain_time_ms(step_i, fwd, tabs_i)
    ok = verify(ntt, x, fwd)
    bfly = n * log2n / 2
    for direction, ms in (("forward", ms_f), ("inverse", ms_i)):
        emit(
            {
                "config": name,
                "n": n,
                "engine": ntt.engine,
                "modmul": ntt.fc.modmul,
                "direction": direction,
                "ms": round(ms, 4),
                "gbutterfly_s": round(bfly / ms / 1e6, 3),
                "verified": ok,
            }
        )


def main() -> None:
    if "--config" in sys.argv:
        run_config(sys.argv[sys.argv.index("--config") + 1])
        return
    import subprocess

    quick = "--quick" in sys.argv
    for name, *_ in CONFIGS:
        if quick and name not in QUICK:
            continue
        rc = subprocess.call(
            [sys.executable, __file__, "--config", name]
        )
        if rc:
            emit({"config": name, "error": f"exit {rc}"})


if __name__ == "__main__":
    main()
