"""Round-4 truthful op-cost model: what does one u32 VPU op really cost?

Round 1's decisive microbenchmarks (const-mult 140x faster than data-mult,
18-24 T op/s register chains) were measured with block_until_ready chains
-- dispatch-rate artifacts through the tunnel (PERF_NOTES.md round 3).
This re-derives the op-cost model with utils/truetime single-dispatch
chains, on VMEM-RESIDENT working sets so the numbers are compute, not HBM:

  stream      u32 add at 2^26 (256 MB)        -> HBM bandwidth anchor
  vmem-add    chained x+1 at 2^22 (16 MB)     -> VMEM-resident add cost
  vmem-mul-c  chained x*2654435761u           -> u32 data*const multiply
  vmem-mul-d  chained x*w (w a table arg)     -> u32 data*data multiply
  mul32wide   chained full 32x32->64 (4 mults + carries)
  mont        chained mont_mul(x, w, wp)      -> full twiddle multiply
  mont_full   chained mont_mul_full(x, w)     -> companion-free twiddle mul
  bfly        chained butterfly_forward       -> the whole hot op

Each step keeps the pytree structure (output feeds input), tables as jit
args.  Emits one JSON line per measurement with derived G op/s.

Usage: python experimental/r4_opcost.py [log2elems]  (default 22)
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

import jax
import jax.numpy as jnp
import numpy as np

from sventt_tpu import FLAGSHIP_GENERATOR, FLAGSHIP_MODULUS
from sventt_tpu.field.limb import (
    U64,
    FieldConsts,
    mul32_wide,
    u64_from_numpy,
)
from sventt_tpu.field.modulus import Modulus
from sventt_tpu.utils.truetime import time_chained


def emit(name: str, ms: float, n: int, ops_per_elem: float | None) -> None:
    row = {"bench": name, "ms": round(ms, 5), "log2n": n.bit_length() - 1}
    if ops_per_elem:
        row["g_ops_s"] = round(n * ops_per_elem / (ms / 1e3) / 1e9, 1)
    print(json.dumps(row), flush=True)


def main() -> None:
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log2n
    seconds = float(os.environ.get("BENCH_SECONDS", "1.5"))
    mod = Modulus(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR)
    fc = FieldConsts.from_modulus(mod)  # canonical, sparse-high
    rng = np.random.default_rng(7)

    shape = (n // 512, 512)
    xv = rng.integers(0, 1 << 32, shape, dtype=np.uint64).astype(np.uint32)
    wv = rng.integers(0, FLAGSHIP_MODULUS, n, dtype=np.uint64)
    x32 = jax.device_put(jnp.asarray(xv))
    w64 = U64(
        jax.device_put(jnp.asarray((wv >> 32).astype(np.uint32).reshape(shape))),
        jax.device_put(jnp.asarray(wv.astype(np.uint32).reshape(shape))),
    )
    x64v = rng.integers(0, FLAGSHIP_MODULUS, n, dtype=np.uint64)
    x64 = U64(
        jax.device_put(jnp.asarray((x64v >> 32).astype(np.uint32).reshape(shape))),
        jax.device_put(jnp.asarray(x64v.astype(np.uint32).reshape(shape))),
    )

    # 1. VMEM-resident u32 add
    r = time_chained(lambda a: a + jnp.uint32(1), x32, seconds=seconds)
    emit("vmem-add", r.ms, n, 1)

    # 2. data * const u32 multiply (odd constant -> not strength-reduced)
    r = time_chained(lambda a: a * jnp.uint32(2654435761), x32, seconds=seconds)
    emit("vmem-mul-const", r.ms, n, 1)

    # 3. data * data u32 multiply (w as a table ARG; +1 keeps chain nontrivial)
    r = time_chained(
        lambda a, w: a * w + jnp.uint32(1), x32, (w64.lo,), seconds=seconds
    )
    emit("vmem-mul-data", r.ms, n, 1)

    # 4. full 32x32->64 (4 mults + carry assembly); fold to keep u32 pytree
    def wide(a, w):
        p = mul32_wide(a, w)
        return p.hi ^ p.lo ^ jnp.uint32(1)

    r = time_chained(wide, x32, (w64.lo,), seconds=seconds)
    emit("mul32-wide", r.ms, n, 4)

    # 5. full Montgomery twiddle multiply with companion (w, wp table args)
    wp = fc  # companion computed host-side
    wpv = (wv.astype(object) * mod.montgomery_inverse % (1 << 64))
    wp64 = U64(
        jax.device_put(jnp.asarray(
            np.array([int(v) >> 32 for v in wpv], dtype=np.uint32).reshape(shape))),
        jax.device_put(jnp.asarray(
            np.array([int(v) & 0xFFFFFFFF for v in wpv], dtype=np.uint32).reshape(shape))),
    )
    r = time_chained(
        lambda v, w, p: fc.mont_mul(v, w, p), x64, (w64, wp64), seconds=seconds
    )
    emit("mont-mul", r.ms, n, 30)

    # 6. companion-free Montgomery multiply (q computed in flight)
    r = time_chained(
        lambda v, w: fc.mont_mul_full(v, w), x64, (w64,), seconds=seconds
    )
    emit("mont-mul-full", r.ms, n, 30)

    # 6b. solinas direct fold multiply (companion-free, plain twiddles)
    r = time_chained(
        lambda v, w: fc.solinas_mul(v, w), x64, (w64,), seconds=seconds
    )
    emit("solinas-mul", r.ms, n, 26)

    # 7. the whole butterfly (canonical 64-bit path): fold pair back to one.
    # The second operand must be INDEPENDENT data (x0 == x1 lets XLA fold
    # x0 - x1 = 0 and collapse the twiddle multiply -- observed 6x too fast).
    y64 = U64(
        jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 32, shape, dtype=np.uint64).astype(np.uint32))),
        jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 32, shape, dtype=np.uint64).astype(np.uint32))),
    )

    def bfly(v, c, w, p):
        y0, y1 = fc.butterfly_forward(v, c, w, p)
        return U64(y0.hi ^ y1.hi, y0.lo ^ y1.lo)

    r = time_chained(bfly, x64, (y64, w64, wp64), seconds=seconds)
    emit("butterfly-fwd", r.ms, n, 95)

    # 8. same butterfly through the solinas engine (no companion operand)
    fc_sol = FieldConsts.from_modulus(mod, modmul="solinas")

    def bfly_sol(v, c, w):
        y0, y1 = fc_sol.butterfly_forward(v, c, w, None)
        return U64(y0.hi ^ y1.hi, y0.lo ^ y1.lo)

    r = time_chained(bfly_sol, x64, (y64, w64), seconds=seconds)
    emit("butterfly-fwd-solinas", r.ms, n, 95)


if __name__ == "__main__":
    main()
