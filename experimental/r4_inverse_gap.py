"""Probe the forward/inverse asymmetry (round 4: inverse is 1.2-2.2x
slower at 2^20+, BENCH_RESULTS.md).

Hypotheses, each timed truthfully at 2^20 flagship (tuned knobs):
  h0  forward (reference point)
  h1  inverse as shipped
  h2  inverse with the scaled final stage replaced by a plain stage + a
      separate whole-array scale multiply (is butterfly_inverse_scaled's
      double-twiddle the cost?)
  h3  inverse with chunk_elems raced (is the tuned-for-forward chunk wrong
      for the mirror schedule?)

Usage: python experimental/r4_inverse_gap.py [log2n]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/sventt_tpu/xla-cache"),
)

from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS
from sventt_tpu.plan import NTT, NttConfig
from sventt_tpu.plan.autotune import tune, _make_input
from sventt_tpu.utils.truetime import time_chained


def main() -> None:
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log2n
    cfg = tune(
        NttConfig(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, n), on_miss="skip"
    )
    x = _make_input(cfg)

    def t(tag, step, tables):
        r = time_chained(step, x, tables, seconds=1.5, reps=2)
        print(json.dumps({"probe": tag, "ms": round(r.ms, 4)}), flush=True)
        return r.ms

    ntt = NTT(cfg)
    sf, tf = ntt.forward_step()
    t("h0-forward", sf, tf)
    si, ti = ntt.inverse_step()
    t("h1-inverse", si, ti)
    del ntt

    for chunk in (1 << 18, 1 << 20, 1 << 21):
        if chunk == cfg.chunk_elems:
            continue
        ntt_c = NTT(cfg.with_(chunk_elems=chunk), enable_forward=False)
        si, ti = ntt_c.inverse_step()
        t(f"h3-inverse-chunk={chunk}", si, ti)
        del ntt_c


if __name__ == "__main__":
    main()
