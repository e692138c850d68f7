"""Round-3 follow-up A/B: split shape x chunk size x w_only at 2^24.

The truthful autotune found chunk_elems=2^20 beats the 2^21 default by
~15% at 2^24 (18.0 vs 21.4 ms).  This probes the neighborhood the staged
grid did not cover: smaller chunks, asymmetric (n0, n1) splits, and the
companion-free inter-step tables, each timed in an isolated subprocess
with the truthful chain methodology (plan/autotune._time_candidate).

Usage: python experimental/r3_shape_ab.py [log2n]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/sventt_tpu/xla-cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _wait_for_device  # noqa: E402

_wait_for_device()

from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS  # noqa: E402
from sventt_tpu.plan import NttConfig  # noqa: E402
from sventt_tpu.plan.autotune import _time_candidate, tune  # noqa: E402

log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
n = 1 << log2n
base = tune(
    NttConfig(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, n), on_miss="skip"
)
print(f"base (tuned): {base}", flush=True)

cands = {
    "tuned": base,
    "chunk19": base.with_(chunk_elems=1 << 19),
    "chunk18": base.with_(chunk_elems=1 << 18),
    "w_only": base.with_(split_w_only=True),
    "split-2p11x2p13": base.with_(
        strategy="six_step", n0=1 << 11, n1=1 << 13
    ),
    "split-2p13x2p11": base.with_(
        strategy="six_step", n0=1 << 13, n1=1 << 11
    ),
}

results = {}
for tag, cfg in cands.items():
    try:
        ms = _time_candidate(cfg, seconds=2.0)
    except Exception as e:
        print(f"{tag}: FAILED ({type(e).__name__}: {e})", flush=True)
        continue
    results[tag] = ms
    print(f"{tag}: {ms:.3f} ms", flush=True)

best = min(results, key=results.get)
print(f"best: {best} {results[best]:.3f} ms", flush=True)
