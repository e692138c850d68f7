"""Small-transform dispatch-floor diagnosis (round-1 VERDICT task 7).

2^10-2^13 transforms bottom out at ~1.5 ms/call even chained, ~500x below
the 2^24 butterfly rate.  Hypotheses probed here, each as one JSON row:

1. operand-count cost: a trivial jitted op with K array arguments, K swept
   over the range the jnp engine actually uses (12 stages x 8 limb planes
   at 2^12 = ~100 operands);
2. packed tables: the same NTT compute with all stage twiddles packed into
   ONE device buffer (static offsets) vs per-stage operands;
3. baked tables: twiddles closed over by jit (HLO constants).

Usage: python benchmarks/bench_dispatch.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import dispatch_rate_ms, emit, log
from sventt_tpu import TEST_GENERATOR, TEST_MODULUS
from sventt_tpu.field.limb import FieldConsts, U64, u64_from_numpy
from sventt_tpu.field.modulus import Modulus
from sventt_tpu.ops.ntt_jnp import ntt_forward
from sventt_tpu.ops.twiddle import forward_tables


def probe_operand_count() -> None:
    """Cost of K extra array operands on a trivial chained dispatch."""
    x = jax.device_put(jnp.zeros((4096,), jnp.uint32))
    for k in (0, 8, 24, 48, 96):
        ops = [jax.device_put(jnp.full((16,), i, jnp.uint32)) for i in range(k)]

        @jax.jit
        def f(x, *ops):
            acc = x
            for o in ops:
                acc = acc + o[0]  # force each operand live
            return acc

        ms = dispatch_rate_ms(lambda s: f(s, *ops), x, iters=50)
        emit({"metric": "dispatch_k_operands", "k": k, "ms": round(ms, 4)})


def _pack_tables_host(mod, n):
    """Rebuild the stage planes with HOST math and pack them into one u32
    buffer + static offsets.

    Deliberately does NOT read back the prepared device tables: the first
    device-to-host transfer permanently degrades the tunnel dispatch path
    (PERF_NOTES.md round 2) -- the very effect this probe measures -- so
    the packed buffer is recomputed from the same host twiddle schedule as
    ops/twiddle.forward_tables (plane order w.hi, w.lo, wp.hi, wp.lo per
    DIF stage)."""
    from sventt_tpu.ops.twiddle import _powers

    N = mod.modulus
    omega = mod.get_root_forward(n)
    parts, offsets, off = [], [], 0
    for i in range(n.bit_length() - 2, -1, -1):
        vals = _powers(omega, 1 << i, N)
        wm = np.array([mod.to_montgomery(v) for v in vals], dtype=np.uint64)
        wp = np.array(
            [mod.montgomery_precompute(int(v)) for v in wm], dtype=np.uint64
        )
        for a64 in (wm, wp):
            for plane in (
                (a64 >> np.uint64(32)).astype(np.uint32),
                a64.astype(np.uint32),
            ):
                parts.append(plane)
                offsets.append((off, plane.shape[0]))
                off += plane.shape[0]
        omega = omega * omega % N
    return jnp.asarray(np.concatenate(parts)), tuple(offsets)


def probe_ntt_variants(log2n: int) -> None:
    n = 1 << log2n
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    fc = FieldConsts.from_modulus(mod)
    tabs = forward_tables(mod, n)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        u64_from_numpy(rng.integers(0, mod.modulus, n, dtype=np.uint64))
    )

    f_args = jax.jit(lambda v, t: ntt_forward(v, t, fc))
    ms = dispatch_rate_ms(lambda s: f_args(s, tabs), x, iters=50)
    emit({"metric": f"ntt_2p{log2n}_per_stage_operands", "ms": round(ms, 4)})

    packed, offsets = _pack_tables_host(mod, n)
    stage_ls = tuple(pair.w.lo.shape[0] for pair in tabs.stages)

    from sventt_tpu.ops.twiddle import MontPair

    def unpack(buf):
        planes = [
            jax.lax.dynamic_slice(buf, (o,), (ln,)) for o, ln in offsets
        ]
        pairs = []
        for s in range(len(stage_ls)):
            w = U64(planes[4 * s], planes[4 * s + 1])
            wp = U64(planes[4 * s + 2], planes[4 * s + 3])
            pairs.append(MontPair(w, wp))
        return pairs

    class PackedTables:
        def __init__(self, stages, m):
            self.stages = stages
            self.m = m

    f_packed = jax.jit(
        lambda v, buf: ntt_forward(v, PackedTables(unpack(buf), n), fc)
    )
    ms = dispatch_rate_ms(lambda s: f_packed(s, packed), x, iters=50)
    emit({"metric": f"ntt_2p{log2n}_packed_tables", "ms": round(ms, 4)})

    f_baked = jax.jit(lambda v: ntt_forward(v, tabs, fc))
    ms = dispatch_rate_ms(lambda s: f_baked(s), x, iters=50)
    emit({"metric": f"ntt_2p{log2n}_baked_tables", "ms": round(ms, 4)})

    # all clocks stopped: D2H is allowed now.  The host-rebuilt packed
    # tables must produce the identical transform.
    a, b = f_args(x, tabs), f_packed(x, packed)
    assert bool(
        np.array_equal(np.asarray(a.hi), np.asarray(b.hi))
        and np.array_equal(np.asarray(a.lo), np.asarray(b.lo))
    ), "packed-table reconstruction diverged from prepared tables"


def main() -> None:
    log("bench_dispatch: operand-count probe")
    probe_operand_count()
    for log2n in (10, 12, 15):
        log(f"bench_dispatch: ntt variants 2^{log2n}")
        probe_ntt_variants(log2n)


if __name__ == "__main__":
    main()
