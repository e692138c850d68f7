"""Distributed six-step benchmark: scaling harness for real pod slices.

Times DistributedNTT forward/inverse over the available mesh, for all
three schedules (XLA collective, Pallas remote-DMA ring, and the chunked
comm/compute-overlap pipeline), against the single-device transform of
the same length -- the
measurement SURVEY.md section 2.5.5 asks for (">= 80% scaling
efficiency"), runnable as-is on a real pod slice.  On this tunnel (one
chip) and on the CPU mesh it reports correctness-grade numbers only; the
harness exists so a pod run is one command.

Emits one JSON row per (n, comm):
  {"n", "devices", "comm", "fwd_ms", "inv_ms", "single_ms",
   "scaling_efficiency"}

Usage: python benchmarks/bench_distributed.py [--n LOG2N] [--comm xla|ring|overlap]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from benchmarks.common import chain_time_ms, emit, log
from sventt_tpu import TEST_GENERATOR, TEST_MODULUS
from sventt_tpu.field.limb import u64_from_numpy
from sventt_tpu.parallel import DistributedNTT, make_ntt_mesh
from sventt_tpu.plan import NTT, NttConfig


def main() -> None:
    argv = sys.argv
    log2n = int(argv[argv.index("--n") + 1]) if "--n" in argv else 18
    comms = [argv[argv.index("--comm") + 1]] if "--comm" in argv else ["xla", "ring", "overlap"]
    n = 1 << log2n
    mesh = make_ntt_mesh()
    D = mesh.devices.size
    cfg = NttConfig(TEST_MODULUS, TEST_GENERATOR, n, strategy="six_step")
    rng = np.random.default_rng(0)
    x = rng.integers(0, cfg.modulus, n, dtype=np.uint64)

    sntt = NTT(cfg)
    xs = jax.device_put(u64_from_numpy(x))
    step_s, tabs_s = sntt.forward_step()
    single_ms = chain_time_ms(step_s, xs, tabs_s)
    del sntt

    for comm in comms:
        if comm == "ring" and D == 1:
            log("bench_distributed: ring needs D > 1, skipping")
            continue
        dntt = DistributedNTT(cfg, mesh, comm=comm)
        xd = jax.device_put(u64_from_numpy(x), dntt.sharding())
        step_f, tabs_f = dntt.forward_step()
        step_i, tabs_i = dntt.inverse_step()
        fwd_ms = chain_time_ms(step_f, xd, tabs_f)
        fwd = dntt.compute_forward(xd)
        inv_ms = chain_time_ms(step_i, fwd, tabs_i)
        emit(
            {
                "n": n,
                "devices": D,
                "comm": comm,
                "fwd_ms": round(fwd_ms, 4),
                "inv_ms": round(inv_ms, 4),
                "single_ms": round(single_ms, 4),
                # ideal: fwd_ms == single_ms / D (perfect strong scaling)
                "scaling_efficiency": round(single_ms / (fwd_ms * D), 4),
            }
        )
        del dntt


if __name__ == "__main__":
    main()
