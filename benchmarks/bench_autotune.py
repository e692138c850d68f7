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

CONFIGS = [
    ("iterative-2p12", 12, TEST_MODULUS, TEST_GENERATOR),
    ("sixstep-2p17-flagship", 17, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR),
    ("sixstep-2p20-flagship", 20, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR),
    ("blocked-2p24-flagship", 24, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR),
    ("blocked-2p24-shoup", 24, TEST_MODULUS, TEST_GENERATOR),
]

QUICK = {"sixstep-2p17-flagship"}


def main() -> None:
    quick = "--quick" in sys.argv
    force = "--force" in sys.argv
    rng = np.random.default_rng(0)
    for name, log2n, N, g in CONFIGS:
        if quick and name not in QUICK:
            continue
        n = 1 << log2n
        base = NttConfig(N, g, n)
        log(f"bench_autotune: tuning {name} ...")
        tuned_cfg = tune(base, force=force)

        x = jax.device_put(
            u64_from_numpy(rng.integers(0, N, n, dtype=np.uint64))
        )
        iters = 20 if log2n <= 20 else 8
        ntt_d = NTT(base, enable_inverse=False)
        ms_d = chain_time_ms(lambda s: ntt_d.compute_forward(s), x, iters)
        del ntt_d
        ntt_t = NTT(tuned_cfg, enable_inverse=False)
        ms_t = chain_time_ms(lambda s: ntt_t.compute_forward(s), x, iters)
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


if __name__ == "__main__":
    main()
