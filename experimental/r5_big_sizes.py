"""Round-5 probes: the improved MXU engine at 2^26 (where jnp's 76 ms
won round 4) and the 2^24 inverse, truthful chains + oracle checksums.

    python experimental/r5_big_sizes.py [log2n] [direction] [engine]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS, native
from sventt_tpu.field.limb import U64
from sventt_tpu.plan import NTT, NttConfig
from sventt_tpu.utils.truetime import time_chained


def run(log2n: int, direction: str, engine: str, seconds: float = 2.0):
    n = 1 << log2n
    cfg = NttConfig(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, n, engine=engine)
    inv = direction == "inverse"
    ntt = NTT(cfg, enable_forward=not inv, enable_inverse=inv)
    x = jax.jit(
        lambda: U64(jnp.zeros((n,), jnp.uint32), jnp.arange(n, dtype=jnp.uint32))
    )()
    step, tables = ntt.inverse_step() if inv else ntt.forward_step()
    t0 = time.perf_counter()
    res = time_chained(step, x, tables, seconds=seconds, reps=2)
    print(f"compile+measure {time.perf_counter()-t0:.0f}s k={res.k}",
          file=sys.stderr)
    # checksum verify through the compiled chain (k=1)
    fc = ntt.fc
    y = res.chain_fn(x, np.int32(1), *tables)
    ck = jax.jit(lambda v: (jnp.sum(fc.normalize(v).hi, dtype=jnp.uint32),
                            jnp.sum(fc.normalize(v).lo, dtype=jnp.uint32)))(y)
    dev = [int(np.asarray(v)) for v in ck]
    ok = None
    if native.available():
        xv = np.arange(n, dtype=np.uint64)
        want = (
            native.golden_inverse(xv, cfg.modulus, cfg.generator)
            if inv
            else native.golden_forward(xv, cfg.modulus, cfg.generator)
        )
        ref = [
            int(np.sum((want >> np.uint64(32)).astype(np.uint32), dtype=np.uint32)),
            int(np.sum(want.astype(np.uint32), dtype=np.uint32)),
        ]
        ok = dev == ref
    print(json.dumps({
        "n": f"2^{log2n}", "direction": direction, "engine": engine,
        "ms": round(res.ms, 3), "verified": ok,
    }), flush=True)


if __name__ == "__main__":
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    direction = sys.argv[2] if len(sys.argv) > 2 else "forward"
    engine = sys.argv[3] if len(sys.argv) > 3 else "mxu"
    run(log2n, direction, engine)
