"""Autotuner benchmark: tuned vs static-default configs on the bench matrix.

Runs the measure-and-cache tuner (plan/autotune.py) for each matrix config,
then times tuned vs default side by side and emits one JSON row per config:
  {"config", "n", "default_ms", "tuned_ms", "speedup", "knobs"}

The tuner's winners persist in autotune_cache.json (repo root), so later
runs -- including NttConfig(tune=True) users and bench.py -- get them for
free.  This is the TPU analogue of the reference generating its parameter
headers from the Fugaku tuning corpus (reference
tests/bench-transpose.cpp:105-499, README.md:26-27).

Usage: python benchmarks/bench_autotune.py [--quick] [--force]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from benchmarks.common import chain_time_ms, emit, log
from sventt_tpu import (
    FLAGSHIP_GENERATOR,
    FLAGSHIP_MODULUS,
    TEST_GENERATOR,
    TEST_MODULUS,
)
from sventt_tpu.field.limb import u64_from_numpy
from sventt_tpu.plan import NTT, NttConfig
from sventt_tpu.plan.autotune import KNOB_FIELDS, tune

#: (name, log2n, modulus, generator, engine, modmul) -- the FULL
#: bench_ntt.py matrix (same names, same constraint pins, so the cache
#: keys written here are exactly the keys bench_ntt.py and bench.py look
#: up).  Constrained entries (pinned engine/modmul) search the reduced
#: candidate set under the same pin.
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
    ("huge-2p28-flagship", 28, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, "auto", "auto"),
]

QUICK = {"sixstep-2p17-flagship"}


def run_config(name: str, force: bool) -> None:
    """Tune one config, then A/B it in a FRESH child process: the tuner's
    winner-verification readback degrades this process's dispatch path
    (PERF_NOTES.md round 2), so the comparison re-execs with --ab (cache
    hit, clean state)."""
    rng = np.random.default_rng(0)
    [(name, log2n, N, g, engine, modmul)] = [c for c in CONFIGS if c[0] == name]
    n = 1 << log2n
    base = NttConfig(N, g, n, engine=engine, modmul=modmul)
    if "--ab" not in sys.argv:
        import os
        import subprocess
        import tempfile

        from sventt_tpu.plan import autotune

        if autotune._backend() != "tpu" and autotune.CACHE_ENV not in os.environ:
            # tune() refuses to persist non-tpu timings into the
            # repo-shipped cache; give the parent/child A/B pair its own
            # cache file so the child still gets a cache HIT (a re-search
            # in the child would re-run winner verification's D2H readback
            # -- the contaminated state the re-exec exists to avoid)
            fd, tmp = tempfile.mkstemp(prefix="sventt_tune_", suffix=".json")
            os.close(fd)
            os.environ[autotune.CACHE_ENV] = tmp
        log(f"bench_autotune: tuning {name} ...")
        tune(base, force=force)  # populate the cache (clean-state search)
        sys.exit(
            subprocess.call(
                [sys.executable, __file__, "--config", name, "--ab"]
            )
        )
    tuned_cfg = tune(base)  # cache hit

    x = jax.device_put(u64_from_numpy(rng.integers(0, N, n, dtype=np.uint64)))
    ntt_d = NTT(base, enable_inverse=False)
    step_d, tabs_d = ntt_d.forward_step()
    ms_d = chain_time_ms(step_d, x, tabs_d)
    del ntt_d
    ntt_t = NTT(tuned_cfg, enable_inverse=False)
    step_t, tabs_t = ntt_t.forward_step()
    ms_t = chain_time_ms(step_t, x, tabs_t)
    del ntt_t
    emit(
        {
            "config": name,
            "n": n,
            "default_ms": round(ms_d, 4),
            "tuned_ms": round(ms_t, 4),
            "speedup": round(ms_d / ms_t, 4),
            "knobs": {k: getattr(tuned_cfg, k) for k in KNOB_FIELDS},
        }
    )


def main() -> None:
    force = "--force" in sys.argv
    if "--config" in sys.argv:
        run_config(sys.argv[sys.argv.index("--config") + 1], force)
        return
    import subprocess

    quick = "--quick" in sys.argv
    for name, *_ in CONFIGS:
        if quick and name not in QUICK:
            continue
        args = [sys.executable, __file__, "--config", name]
        if force:
            args.append("--force")
        rc = subprocess.call(args)
        if rc:
            emit({"config": name, "error": f"exit {rc}"})


if __name__ == "__main__":
    main()
