"""Round-3 A/B harness: knob candidates raced interleaved on the real TPU.

Times a handful of NttConfig variants of the flagship transform with the
autotuner's interleaved-playoff methodology (all candidates built and warm,
round-robin chained timing so tunnel drift hits every candidate equally).
All timing happens BEFORE any device-to-host readback (PERF_NOTES.md: the
first D2H permanently degrades the tunnel dispatch path).

Env: N (log2 points, default 24), PHASES=1 to also print the per-level
phase breakdown of the tuned config.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _wait_for_device  # noqa: E402

_wait_for_device()

import jax  # noqa: E402

from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS  # noqa: E402
from sventt_tpu.field.limb import u64_from_numpy  # noqa: E402
from sventt_tpu.plan import NTT, NttConfig  # noqa: E402
from sventt_tpu.plan.autotune import tune  # noqa: E402

log2n = int(os.environ.get("N", "24"))
n = 1 << log2n
base = tune(NttConfig(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, n), on_miss="skip")
print(f"base (tuned cache): {base}", flush=True)

cands: dict[str, NttConfig] = {
    "tuned": base,
    "w_only": base.with_(split_w_only=True),
    "chunk20": base.with_(chunk_elems=1 << 20),
    "chunk22": base.with_(chunk_elems=1 << 22),
    "chunk22+w_only": base.with_(chunk_elems=1 << 22, split_w_only=True),
}

rng = np.random.default_rng(0)
x = jax.device_put(
    u64_from_numpy(rng.integers(0, FLAGSHIP_MODULUS, n, dtype=np.uint64))
)

ntts: dict[str, NTT] = {}
for tag, cfg in cands.items():
    t0 = time.perf_counter()
    ntt = NTT(cfg, enable_inverse=False)
    jax.block_until_ready(ntt.compute_forward(x))
    print(f"{tag}: built+compiled {time.perf_counter() - t0:.1f}s", flush=True)
    ntts[tag] = ntt


def chain_ms(ntt: NTT, k: int) -> float:
    y = x
    t0 = time.perf_counter()
    for _ in range(k):
        y = ntt.compute_forward(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / k * 1e3


k = 16
ms = chain_ms(ntts["tuned"], k)
while k < 512 and ms * k < 50.0:
    k = min(512, k * 2)
    ms = chain_ms(ntts["tuned"], k)
print(f"chain length {k}", flush=True)

best = {t: float("inf") for t in ntts}
for _ in range(3):
    for tag, ntt in ntts.items():
        best[tag] = min(best[tag], chain_ms(ntt, k))
for tag, v in sorted(best.items(), key=lambda kv: kv[1]):
    print(f"{tag}: {v:.4f} ms", flush=True)

if os.environ.get("PHASES") == "1":
    from sventt_tpu.utils import phase_breakdown

    for tag in ("tuned", "chunk22+w_only"):
        print(f"--- phase breakdown: {tag}", flush=True)
        for phase, v in phase_breakdown(ntts[tag], iters=max(16, k // 4)).items():
            print(f"  {phase}: {v:.4f} ms", flush=True)
