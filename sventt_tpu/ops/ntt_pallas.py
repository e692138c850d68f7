"""Fused Pallas inner-NTT kernels: all butterfly stages in one VMEM residency.

The TPU-native replacement for the reference's SVE butterfly layers and their
IterativeNTT compositions (reference include/sventt/layer/sve/radix-*.hpp,
include/sventt/kernel/iterative.hpp): one `pl.pallas_call` reads an (m, BT)
tile of BT independent length-m transforms into VMEM, applies all log2(m)
DIF/DIT stages on the VPU ping-ponging between VMEM scratch buffers, and
writes the result once -- one HBM round trip where the pure-jnp engine pays
one per stage.

Layout contract (same as ops/ntt_jnp.py): transform axis = leading (sublane)
axis, batch = trailing (lane) axis.  Butterfly data movement is expressed as
**contiguous row-run slices on refs** (for stage half-width l, operand runs
are l rows long), never as reshape/stack of SSA values, and stage twiddles
are **pre-broadcast (m/2, BT) operands** rather than packed lane-1 tables.
Both choices are load-bearing: on TPU Mosaic, reshape/stack across sublanes
combined with data-operand multiplies, and lane-dim-1 twiddle operands,
each trigger pathological lowering (measured ~100x); ref slices + full-width
operands compile to clean VPU code.  This mirrors how the reference keeps
all strides inside explicit register shuffles rather than generic gathers
(reference transposition/sve/common.hpp).

Twiddle preparation mirrors the aux-stream roles (reference
include/sventt/wrapper.hpp:34-46): per stage the l twiddles are expanded to
butterfly layout W[b*l + j] = w_stage[j] host-side and broadcast across the
lane tile.  The inverse direction folds 1/m into the final double-twiddle
stage (reference ``inverse_factor``, layer/sve/radix-eight.hpp:445-478).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.limb import U64, FieldConsts
from ..field.modulus import Modulus
from .twiddle import forward_tables, inverse_tables

#: Largest transform length the fused kernel runs as a single VMEM-resident
#: call; longer transforms are decomposed by the planner (plan/planner.py),
#: the way the reference switches from iterative to four/six-step kernels
#: (reference README.md:7-8).  Capped at 256: the slice-based stage bodies
#: unroll m/(2l) chunks per stage, and m=512's tail stages (480 chunks)
#: blow up Mosaic compile time (observed hang at 2^26 planning).
MAX_FUSED = 256

#: Lane-tile width (batch columns per grid step).
BLOCK_B = 256

#: Max butterfly stages per pallas_call.  Large fused bodies occasionally
#: trip Mosaic scheduling cliffs; grouping bounds compile time and VMEM.
MAX_STAGES_PER_CALL = 5


@dataclass(frozen=True)
class FusedDirection:
    """Prepared device tables for one transform direction at one length.

    ``stage_ls``: DIF order l = m/2..1 (forward) or DIT order l = 1..m/2
    (inverse).  ``tw``: per stage, four uint32 arrays (w_hi, w_lo, wp_hi,
    wp_lo) in one of two layouts the kernels auto-detect by shape:
    **tiled** (m/2, block_b) butterfly layout W[b*l+j] = w_stage[j]
    (default), or **deduped** (l, block_b) distinct rows only.  MEASURED
    (round 2): tiled wins ~30% at the 2^24 leaf shape -- sub-8-sublane
    (l < 8) operand tiles read slowly on current Mosaic, outweighing the
    ~4x VMEM residency saved by deduplication.  Dedup stays selectable
    (``tiled_tw=False``) for future toolchains.  ``scale``: for the
    inverse, four (m/2, block_b) arrays of the broadcast (s, sp) pair
    used by the final double-twiddle stage; empty tuple for forward.
    ``block_b``/``spc`` are the lane-tile width and max stages per
    pallas_call the tables were prepared for (autotunable knobs).

    Registered as a pytree (arrays are data, the schedule is static) so
    prepared tables pass through jit as arguments, not baked-in constants.
    """

    m: int
    inverse: bool
    stage_ls: tuple[int, ...]
    tw: tuple[tuple[jnp.ndarray, ...], ...]
    scale: tuple[jnp.ndarray, ...]
    block_b: int = BLOCK_B
    spc: int = MAX_STAGES_PER_CALL
    #: uint32 arrays per stage: 4 = (w_hi, w_lo, wp_hi, wp_lo) for the
    #: companioned engines; 2 = (w_hi, w_lo) for the companion-free
    #: solinas engine (plain twiddles, half the table bytes).
    aps: int = 4


jax.tree_util.register_dataclass(
    FusedDirection,
    data_fields=["tw", "scale"],
    meta_fields=["m", "inverse", "stage_ls", "block_b", "spc", "aps"],
)


#: Stages with fewer distinct twiddles than this many sublanes use the
#: tiled layout even under ``tw_layout="hybrid"``: sub-8-sublane operand
#: tiles are below the (8, 128) register tile and read through a slow
#: Mosaic path (round-2 observation, re-adjudicated truthfully in round 4).
DEDUP_MIN_ROWS = 8


def _stage_tiled(l: int, m: int, tw_layout: str) -> bool:
    """Whether stage half-width ``l`` stores the full (m/2, b) butterfly
    layout (True) or only its ``l`` distinct rows (False).

    ``tiled``: always full -- 4x VMEM but every operand read is a plain
    aligned row run.  ``dedup``: always distinct rows -- minimal VMEM, the
    TPU's store_precomputation trade (reference layer/sve/radix-two.hpp:
    96-138 loads one twiddle vector instead of a stream).  ``hybrid``:
    dedup except the sub-8-row tail stages (DEDUP_MIN_ROWS).
    """
    if tw_layout == "tiled":
        return True
    if tw_layout == "dedup":
        return False
    if tw_layout == "hybrid":
        return l < DEDUP_MIN_ROWS
    raise ValueError(f"unknown tw_layout {tw_layout!r}")


def _expand_pair(
    pair, m: int, l: int, block_b: int, tiled: bool = False
) -> tuple[jnp.ndarray, ...]:
    arrs = (pair.w.hi, pair.w.lo)
    if pair.wp is not None:
        arrs += (pair.wp.hi, pair.wp.lo)
    out = []
    for a in arrs:
        e = np.asarray(a)
        rows = l
        if tiled:  # butterfly layout W[b*l + j] = w_stage[j]
            e = np.tile(e, m // (2 * l))
            rows = m // 2
        out.append(
            jnp.asarray(np.broadcast_to(e[:, None], (rows, block_b)).copy())
        )
    return tuple(out)


def make_fused_forward(
    mod: Modulus,
    m: int,
    modmul: str = "montgomery",
    block_b: int | None = None,
    spc: int | None = None,
    tw_layout: str = "tiled",
) -> FusedDirection:
    block_b = block_b or BLOCK_B
    tabs = forward_tables(mod, m, modmul)
    ls, tw = [], []
    for s, pair in enumerate(tabs.stages):  # l = m/2 ... 1
        l = m >> (s + 1)
        ls.append(l)
        tw.append(_expand_pair(pair, m, l, block_b, _stage_tiled(l, m, tw_layout)))
    return FusedDirection(
        m, False, tuple(ls), tuple(tw), (), block_b,
        spc or MAX_STAGES_PER_CALL, aps=2 if modmul == "solinas" else 4,
    )


def make_fused_inverse(
    mod: Modulus,
    m: int,
    scale_extra: int = 1,
    modmul: str = "montgomery",
    block_b: int | None = None,
    spc: int | None = None,
    tw_layout: str = "tiled",
) -> FusedDirection:
    block_b = block_b or BLOCK_B
    tabs = inverse_tables(mod, m, scale_extra, modmul)
    ls, tw = [], []
    for s, pair in enumerate(tabs.stages):  # l = 1 ... m/2
        l = 1 << s
        ls.append(l)
        tw.append(_expand_pair(pair, m, l, block_b, _stage_tiled(l, m, tw_layout)))
    sc_arrs = (tabs.scale.w.hi, tabs.scale.w.lo)
    if tabs.scale.wp is not None:
        sc_arrs += (tabs.scale.wp.hi, tabs.scale.wp.lo)
    sc = []
    for a in sc_arrs:
        v = np.full((m // 2, block_b), np.asarray(a)[0], dtype=np.uint32)
        sc.append(jnp.asarray(v))
    return FusedDirection(
        m, True, tuple(ls), tuple(tw), tuple(sc), block_b,
        spc or MAX_STAGES_PER_CALL, aps=2 if modmul == "solinas" else 4,
    )


class _Axis1View:
    """2D (m, lanes) view of a (1, m, lanes) block ref.

    Lets the sublane stage bodies run unchanged on middle-axis 3D blocks
    (grid over axis 0): Mosaic compiles leading-unit-dim blocks at full
    sublane-kernel speed (measured at parity, PERF_NOTES.md round 2).
    """

    def __init__(self, ref):
        self.ref = ref

    def __getitem__(self, sl):
        return self.ref[0, sl]

    def __setitem__(self, sl, value):
        self.ref[0, sl] = value


def _make_group_kernel(
    fc: FieldConsts, m: int, stage_ls, inverse: bool, with_scale: bool,
    mid: bool = False, aps: int = 4,
):
    """Kernel running a group of stages with ping-pong through scratch.

    Argument order: xh, xl, ``aps`` per stage [, ``aps`` scale], oh, ol,
    scratch_h, scratch_l (aps = 4 companioned / 2 solinas).  With
    ``mid=True`` the data refs are (1, m, lanes) blocks of a 3D array
    (transform along the middle axis) wrapped in _Axis1View.
    """
    n = len(stage_ls)

    def kernel(xh_ref, xl_ref, *rest):
        ntw = aps * n + (aps if with_scale else 0)
        tw_refs = rest[:ntw]
        oh, ol, ah, al = rest[ntw], rest[ntw + 1], rest[ntw + 2], rest[ntw + 3]
        if mid:
            xh_ref, xl_ref = _Axis1View(xh_ref), _Axis1View(xl_ref)
            oh, ol = _Axis1View(oh), _Axis1View(ol)
        for i, l in enumerate(stage_ls):
            if i == 0:
                src = (xh_ref, xl_ref)
            elif i % 2 == 1:
                src = (ah, al)
            else:
                src = (oh, ol)
            dst = (ah, al) if i % 2 == 0 else (oh, ol)
            if i == n - 1:
                dst = (oh, ol)
            tw = tw_refs[aps * i : aps * i + aps]
            scale = None
            if with_scale and i == n - 1:
                scale = tw_refs[aps * n : aps * n + aps]
            _stage_one(fc, m, l, src, tw, dst, inverse, scale)

    return kernel


def _stage_one(fc, m, l, src, tw, dst, inverse, scale):
    sh, sl = src
    dh, dl = dst
    if len(tw) == 4:
        wh, wl, ph, pll = tw
    else:  # companion-free solinas stage tables
        wh, wl = tw
        ph = pll = None
    # Table layout is read off the ref shape: l rows = deduplicated (every
    # block reads the same l distinct twiddles), m/2 rows = tiled butterfly
    # layout (block b reads rows [b*l, (b+1)*l)).  Both are supported so
    # the layouts can be A/B-measured and tuned per config.
    deduped = wh.shape[0] == l and l != m // 2
    for b in range(m // (2 * l)):
        r0 = 2 * b * l
        r1 = r0 + l
        t0, t1 = (0, l) if deduped else (b * l, (b + 1) * l)
        x0 = U64(sh[r0 : r0 + l], sl[r0 : r0 + l])
        x1 = U64(sh[r1 : r1 + l], sl[r1 : r1 + l])
        w = U64(wh[t0:t1], wl[t0:t1])
        wp = None if ph is None else U64(ph[t0:t1], pll[t0:t1])
        if scale is not None:
            s0, s1 = b * l, (b + 1) * l
            if len(scale) == 4:
                sch, scl, sph, spl = scale
                scp = U64(sph[s0:s1], spl[s0:s1])
            else:
                sch, scl = scale
                scp = None
            sc = U64(sch[s0:s1], scl[s0:s1])
            y0, y1 = fc.butterfly_inverse_scaled(x0, x1, sc, scp, w, wp)
        elif inverse:
            y0, y1 = fc.butterfly_inverse(x0, x1, w, wp)
        else:
            y0, y1 = fc.butterfly_forward(x0, x1, w, wp)
        dh[r0 : r0 + l], dl[r0 : r0 + l] = y0.hi, y0.lo
        dh[r1 : r1 + l], dl[r1 : r1 + l] = y1.hi, y1.lo


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Deferred-twiddle radix-2^R stage groups (round 2).
#
# Three consecutive DIF stages with half-widths l, l/2, l/4 factor into
# (a) the same butterfly cascade with **scalar-constant** twiddles -- powers
# of the order-8 root theta = omega_{2l}^{l/4} -- and (b) ONE combined
# table multiply W^{bitrev3(k)} per element, W = omega_{2l}^j (validated
# bit-exactly against the golden cascade; see docs/).  Scalar-constant
# multiplies keep their dataflow in vector registers (measured ~100x cheaper
# than operand x operand multiplies, PERF_NOTES.md), so this cuts the
# expensive table multiplies per element from 3 to 1 per 3 stages -- the TPU
# analogue of the reference's radix-8 layers
# (reference include/sventt/layer/sve/radix-eight.hpp:95-234), whose 7
# twiddle streams are exactly these combined tables.  The inverse mirrors:
# the combined table is a *pre*-multiply fused into the first DIT rank, and
# the final group folds the 1/m scaling into its table (reference
# ``inverse_factor``, layer/sve/radix-eight.hpp:445-478).
# ---------------------------------------------------------------------------

#: Default maximum radix exponent for grouped stage bodies.  MEASURED ROUND
#: 2 (PERF_NOTES.md): radix-8 grouping LOSES on this toolchain -- scalar-
#: constant multiplies do not stay register-resident inside large kernel
#: bodies, so trading table multiplies for const multiplies + selects adds
#: net VMEM traffic (sublane shoup 12.3 vs 7.3 ms, lane 9.0 vs 8.0 at the
#: 2^24 leaf shape).  Kept selectable for A/B and future toolchains; the
#: default stays per-stage radix-2.
DEFAULT_MAX_RADIX = 1


def _bitrev(k: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (k & 1)
        k >>= 1
    return out


def _choose_groups(num_stages: int, max_r: int) -> tuple[int, ...]:
    """Greedy grouping of the stage cascade into radix-2^R bodies.

    Prefers full radix-2^max_r groups; a 4-stage remainder becomes 2+2
    rather than 3+1 (a lone radix-2 stage pays a full table pass for one
    exchange level).
    """
    if max_r <= 1:
        return (1,) * num_stages
    out, n = [], num_stages
    while n > 0:
        if n == 4 and max_r >= 3:
            out += [2, 2]
            n = 0
        elif n >= max_r:
            out.append(max_r)
            n -= max_r
        else:
            out.append(n)
            n = 0
    return tuple(out)


def _const_pair(mod: Modulus, modmul: str, value: int) -> tuple[int, int]:
    """(w, wp) scalar ints in engine form for a constant twiddle."""
    if modmul == "montgomery":
        w = mod.to_montgomery(value % mod.modulus)
        return w, mod.montgomery_precompute(w)
    w = value % mod.modulus
    return w, mod.shoup_precompute(w)


@dataclass(frozen=True)
class GroupSpec:
    """Static structure of one radix-2^R stage group.

    ``ls``: rank half-widths (forward: descending l, l/2, ...; inverse:
    ascending l, 2l, ...).  ``L``: sub-slice row unit (forward ls[-1],
    inverse ls[0]).  ``span``: the row period of the combined table.
    ``consts``: per rank, per ``low`` sub-slice index, the scalar constant
    twiddle as an engine-form (w, wp) int pair, or None for exponent 0.
    """

    ls: tuple[int, ...]
    L: int
    span: int
    consts: tuple[tuple[object, ...], ...]
    #: inverse only: this group's table folds the 1/m scaling, so even the
    #: exponent-0 slice is non-identity.
    scaled: bool = False

    @property
    def R(self) -> int:
        return len(self.ls)


def _forward_group_values(mod: Modulus, m: int, modmul: str, max_r: int):
    """(specs, per-group combined-table plain values of length m)."""
    N = mod.modulus
    rs = _choose_groups(m.bit_length() - 1, max_r)
    specs, tables = [], []
    s0 = 0
    for R in rs:
        l = m >> (s0 + 1)
        L = l >> (R - 1)
        span = 2 * l
        omega_2l = mod.get_root_forward(2 * l)
        theta = pow(omega_2l, L, N)
        consts = []
        for s in range(R):
            h = l >> s
            row = []
            for low in range(h // L):
                e = ((1 << s) * low) % (1 << R)
                row.append(
                    None if e == 0 else _const_pair(mod, modmul, pow(theta, e, N))
                )
            consts.append(tuple(row))
        vals = [
            pow(omega_2l, (i % L) * _bitrev((i % span) // L, R), N)
            for i in range(m)
        ]
        specs.append(GroupSpec(tuple(l >> s for s in range(R)), L, span, tuple(consts)))
        tables.append(vals)
        s0 += R
    return tuple(specs), tables


def _inverse_group_values(
    mod: Modulus, m: int, modmul: str, scale_extra: int, max_r: int
):
    """(specs, tables) for the DIT inverse; 1/m (x scale_extra) folded into
    the last group's combined pre-multiply table."""
    N = mod.modulus
    rs = _choose_groups(m.bit_length() - 1, max_r)
    s_scale = mod.invert(m) * (scale_extra % N) % N
    specs, tables = [], []
    s0 = 0
    for gi, R in enumerate(rs):
        l = 1 << s0
        span = (1 << R) * l
        omega_span = mod.invert(mod.get_root_forward(span))
        theta = pow(omega_span, l, N)
        last = gi == len(rs) - 1
        consts = []
        for s in range(R):
            row = []
            for low in range(1 << s):
                e = ((1 << (R - 1 - s)) * low) % (1 << R)
                row.append(
                    None if e == 0 else _const_pair(mod, modmul, pow(theta, e, N))
                )
            consts.append(tuple(row))
        vals = []
        for i in range(m):
            v = pow(omega_span, (i % l) * _bitrev((i % span) // l, R), N)
            if last:
                v = v * s_scale % N
            vals.append(v)
        specs.append(
            GroupSpec(
                tuple((1 << s) * l for s in range(R)), l, span, tuple(consts),
                scaled=last,
            )
        )
        tables.append(vals)
        s0 += R
    return tuple(specs), tables


def _vals_to_pair(mod: Modulus, vals, modmul: str):
    """Host plain values -> engine-form (w_hi, w_lo, wp_hi, wp_lo) numpy."""
    from .twiddle import _twiddle_pair

    pair = _twiddle_pair(mod, vals, modmul)
    return (
        np.asarray(pair.w.hi),
        np.asarray(pair.w.lo),
        np.asarray(pair.wp.hi),
        np.asarray(pair.wp.lo),
    )


@dataclass(frozen=True)
class GroupedDirection:
    """Sublane (leading-axis) grouped tables for one direction.

    ``tw``: per group, four (m, BLOCK_B) uint32 arrays of the combined
    table in engine form, pre-broadcast over the lane tile.
    """

    m: int
    inverse: bool
    specs: tuple[GroupSpec, ...]
    tw: tuple[tuple[jnp.ndarray, ...], ...]


jax.tree_util.register_dataclass(
    GroupedDirection, data_fields=["tw"], meta_fields=["m", "inverse", "specs"]
)


def make_grouped_forward(
    mod: Modulus, m: int, modmul: str = "montgomery", max_r: int = DEFAULT_MAX_RADIX
) -> GroupedDirection:
    specs, tables = _forward_group_values(mod, m, modmul, max_r)
    tw = []
    for vals in tables:
        arrs = _vals_to_pair(mod, vals, modmul)
        tw.append(
            tuple(
                jnp.asarray(np.broadcast_to(a[:, None], (m, BLOCK_B)).copy())
                for a in arrs
            )
        )
    return GroupedDirection(m, False, specs, tuple(tw))


def make_grouped_inverse(
    mod: Modulus,
    m: int,
    scale_extra: int = 1,
    modmul: str = "montgomery",
    max_r: int = DEFAULT_MAX_RADIX,
) -> GroupedDirection:
    specs, tables = _inverse_group_values(mod, m, modmul, scale_extra, max_r)
    tw = []
    for vals in tables:
        arrs = _vals_to_pair(mod, vals, modmul)
        tw.append(
            tuple(
                jnp.asarray(np.broadcast_to(a[:, None], (m, BLOCK_B)).copy())
                for a in arrs
            )
        )
    return GroupedDirection(m, True, specs, tuple(tw))


def make_leaf_tables(
    mod: Modulus, m: int, *, inverse: bool, modmul: str = "montgomery",
    max_r: int | None = None, block_b: int | None = None, spc: int | None = None,
    tw_layout: str | None = None,
):
    """Sublane leaf tables: per-stage radix-2 by default (DEFAULT_MAX_RADIX),
    radix-grouped with max_r>1 (kept for A/B benchmarking).  ``block_b`` /
    ``spc`` / ``tw_layout`` are the autotunable lane-tile width,
    stages-per-call, and stage-twiddle storage layout."""
    if max_r is None:
        max_r = DEFAULT_MAX_RADIX
    tw_layout = tw_layout or "tiled"
    if modmul == "solinas":
        max_r = 1  # grouped bodies carry companioned const/table pairs
    if max_r > 1:
        if inverse:
            return make_grouped_inverse(mod, m, modmul=modmul, max_r=max_r)
        return make_grouped_forward(mod, m, modmul=modmul, max_r=max_r)
    if inverse:
        return make_fused_inverse(
            mod, m, modmul=modmul, block_b=block_b, spc=spc, tw_layout=tw_layout
        )
    return make_fused_forward(
        mod, m, modmul=modmul, block_b=block_b, spc=spc, tw_layout=tw_layout
    )


def make_lane_tables(
    mod: Modulus, m: int, *, inverse: bool, modmul: str = "montgomery",
    max_r: int | None = None, rows: int | None = None,
):
    """Lane-axis leaf tables (see make_leaf_tables); ``rows`` is the
    autotunable batch-rows block height."""
    if max_r is None:
        max_r = DEFAULT_MAX_RADIX
    if modmul == "solinas":
        max_r = 1  # grouped bodies carry companioned const/table pairs
    if max_r > 1:
        if inverse:
            return make_lane_grouped_inverse(mod, m, modmul=modmul, max_r=max_r)
        return make_lane_grouped_forward(mod, m, modmul=modmul, max_r=max_r)
    if inverse:
        return make_lane_inverse(mod, m, modmul=modmul, rows=rows)
    return make_lane_forward(mod, m, modmul=modmul, rows=rows)


def _rank_slices(src, i: int, count: int):
    sh, sl = src
    return U64(sh[i : i + count], sl[i : i + count])


def _make_grouped_kernel(fc: FieldConsts, m: int, spec: GroupSpec, inverse: bool):
    """One radix-2^R group as a single kernel pass set.

    Forward: R-1 const-twiddle ranks, then the final rank fused with the
    combined table multiply (both outputs table-multiplied).  Inverse: the
    first rank fused with the combined pre-multiply, then R-1 const ranks.
    """
    from ..field.limb import u64_add, u64_const_like, u64_sub

    R = spec.R
    L = spec.L

    def const_mul(val: U64, c) -> U64:
        w = u64_const_like(c[0], val)
        wp = u64_const_like(c[1], val)
        return fc.twiddle_mul(val, w, wp)

    def kernel(xh_ref, xl_ref, twh, twl, tph, tpl, oh, ol, ah, al):
        def tw_slice(i, count):
            return (
                U64(twh[i : i + count], twl[i : i + count]),
                U64(tph[i : i + count], tpl[i : i + count]),
            )

        def store(dst, i, count, val: U64):
            dh, dl = dst
            dh[i : i + count], dl[i : i + count] = val.hi, val.lo

        # ping-pong buffers: rank r reads src_r, writes dst_r; last -> out
        def buffers(r):
            src = (xh_ref, xl_ref) if r == 0 else (
                (ah, al) if r % 2 == 1 else (oh, ol)
            )
            dst = (oh, ol) if r == R - 1 else ((ah, al) if r % 2 == 0 else (oh, ol))
            return src, dst

        if not inverse:
            for s in range(R):
                h = spec.ls[s]
                src, dst = buffers(s)
                fused_table = s == R - 1
                for blk in range(m // (2 * h)):
                    base = 2 * h * blk
                    for low in range(h // L):
                        i = base + low * L
                        x0 = _rank_slices(src, i, L)
                        x1 = _rank_slices(src, i + h, L)
                        y0 = fc.add(x0, x1)
                        c = spec.consts[s][low]
                        if c is None:
                            d = fc.sub(x0, x1)
                        else:
                            biased = u64_add(
                                u64_sub(x0, x1),
                                u64_const_like(2 * fc.modulus, x0),
                            ) if fc.lazy else fc.sub(x0, x1)
                            d = const_mul(biased, c)
                        if fused_table:
                            e0 = _bitrev((i % spec.span) // L, R)
                            if e0:
                                w0, wp0 = tw_slice(i, L)
                                y0 = fc.twiddle_mul(y0, w0, wp0)
                            w1, wp1 = tw_slice(i + h, L)
                            d = fc.twiddle_mul(d, w1, wp1)
                        store(dst, i, L, y0)
                        store(dst, i + h, L, d)
        else:
            l = spec.ls[0]
            for s in range(R):
                h = spec.ls[s]
                src, dst = buffers(s)
                for blk in range(m // (2 * h)):
                    base = 2 * h * blk
                    for low in range(h // l):
                        i = base + low * l
                        x0 = _rank_slices(src, i, l)
                        x1 = _rank_slices(src, i + h, l)
                        if s == 0:
                            # fused combined pre-multiply on both inputs
                            e0 = _bitrev((i % spec.span) // l, R)
                            if e0 or spec.scaled:
                                w0, wp0 = tw_slice(i, l)
                                x0 = fc.twiddle_mul(x0, w0, wp0)
                            w1, wp1 = tw_slice(i + h, l)
                            t = fc.twiddle_mul(x1, w1, wp1)
                        else:
                            c = spec.consts[s][low]
                            t = x1 if c is None else const_mul(x1, c)
                        store(dst, i, l, fc.add(x0, t))
                        store(dst, i + h, l, fc.sub(x0, t))

    return kernel


@functools.lru_cache(maxsize=None)
def _grouped_call(fc: FieldConsts, m: int, spec: GroupSpec, inverse: bool):
    """Jitted pallas_call for one radix group (cached per config)."""
    kernel = _make_grouped_kernel(fc, m, spec, inverse)

    @jax.jit
    def call(xh, xl, twh, twl, tph, tpl):
        b = xh.shape[1]
        x_spec = pl.BlockSpec((m, BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((m, BLOCK_B), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((m, b), jnp.uint32)] * 2,
            grid=(b // BLOCK_B,),
            in_specs=[x_spec, x_spec] + [w_spec] * 4,
            out_specs=[x_spec] * 2,
            scratch_shapes=[pltpu.VMEM((m, BLOCK_B), jnp.uint32)] * 2,
            interpret=_use_interpret(),
        )(xh, xl, twh, twl, tph, tpl)

    return call


def fused_ntt_grouped(x: U64, tables: GroupedDirection, fc: FieldConsts) -> U64:
    """Grouped-kernel chain on (m, batch...) data; one pallas_call per
    radix group.  Bit-compatible (mod N) with ops.ntt_jnp and the golden
    model."""
    m = tables.m
    if x.lo.shape[0] != m:
        raise ValueError(f"leading axis {x.lo.shape[0]} != transform length {m}")
    batch_shape = x.lo.shape[1:]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    bp = _round_up(b, BLOCK_B)
    xh = x.hi.reshape(m, b)
    xl = x.lo.reshape(m, b)
    if bp != b:
        xh = jnp.pad(xh, ((0, 0), (0, bp - b)))
        xl = jnp.pad(xl, ((0, 0), (0, bp - b)))
    for spec, tw in zip(tables.specs, tables.tw):
        call = _grouped_call(fc, m, spec, tables.inverse)
        xh, xl = call(xh, xl, *tw)
    if bp != b:
        xh, xl = xh[:, :b], xl[:, :b]
    return U64(xh.reshape((m,) + batch_shape), xl.reshape((m,) + batch_shape))


# ---------------------------------------------------------------------------
# Lane-axis variant: transform along the LAST axis (lanes), batch on rows.
#
# Consumes the six-step "transposed" layout directly: a Split node whose row
# child is a lane-axis leaf needs NO transposes at all (the two XLA layout
# materializations per level are the reference's six-step transposes;
# eliminating them is the TPU analogue of the reference fusing transposition
# into its blocked layers, layer/sve/blocked-generic.hpp).  Butterfly
# exchange is a pair of lane rolls + select; stage twiddles are lane-vector
# tables broadcast over the batch rows.
# ---------------------------------------------------------------------------

#: Batch rows per lane-kernel block.
LANE_BLOCK_ROWS = 64


class LaneDirection:
    """Prepared tables for a lane-axis fused transform (one direction).

    ``tw``: (num_stages, 4, rows, m) uint32 — per stage the four
    lane-vectors (w_hi, w_lo, wp_hi, wp_lo) with w_vec[i] = w_stage[i mod l]
    replicated across the block rows.  ``scale``: same four rows for the
    final double-twiddle inverse stage (s*w), plus the scalar pair (s, sp)
    baked as Python ints; None for forward.  ``rows`` is the batch-rows
    block height (autotunable knob, default LANE_BLOCK_ROWS).
    """

    def __init__(self, m, inverse, stage_ls, tw, scale_scalar, rows=LANE_BLOCK_ROWS):
        self.m = m
        self.inverse = inverse
        self.stage_ls = stage_ls
        self.tw = tw
        self.scale_scalar = scale_scalar  # (s, sp) ints or None
        self.rows = rows


jax.tree_util.register_pytree_node(
    LaneDirection,
    lambda t: ((t.tw,), (t.m, t.inverse, t.stage_ls, t.scale_scalar, t.rows)),
    lambda aux, ch: LaneDirection(aux[0], aux[1], aux[2], ch[0], aux[3], aux[4]),
)


def _lane_vec(pair, m: int, l: int, rows: int) -> np.ndarray:
    """(4 or 2, rows, m) lane-vector table for one stage (2 channels for
    companion-free solinas tables)."""
    idx = np.arange(m) % l
    arrs = (pair.w.hi, pair.w.lo)
    if pair.wp is not None:
        arrs += (pair.wp.hi, pair.wp.lo)
    out = np.zeros((len(arrs), rows, m), dtype=np.uint32)
    for c, arr in enumerate(arrs):
        out[c, :, :] = np.asarray(arr)[idx][None, :]
    return out


def make_lane_forward(
    mod: Modulus, m: int, modmul: str = "montgomery", rows: int | None = None
) -> LaneDirection:
    rows = rows or LANE_BLOCK_ROWS
    tabs = forward_tables(mod, m, modmul)
    ls, tw = [], []
    for s, pair in enumerate(tabs.stages):
        l = m >> (s + 1)
        ls.append(l)
        tw.append(_lane_vec(pair, m, l, rows))
    return LaneDirection(m, False, tuple(ls), jnp.asarray(np.stack(tw)), None, rows)


def make_lane_inverse(
    mod: Modulus,
    m: int,
    scale_extra: int = 1,
    modmul: str = "montgomery",
    rows: int | None = None,
) -> LaneDirection:
    rows = rows or LANE_BLOCK_ROWS
    tabs = inverse_tables(mod, m, scale_extra, modmul)
    ls, tw = [], []
    for s, pair in enumerate(tabs.stages):
        l = 1 << s
        ls.append(l)
        tw.append(_lane_vec(pair, m, l, rows))
    s_hi = int(np.asarray(tabs.scale.w.hi)[0])
    s_lo = int(np.asarray(tabs.scale.w.lo)[0])
    if tabs.scale.wp is None:  # companion-free solinas scale
        sp = None
    else:
        sp_hi = int(np.asarray(tabs.scale.wp.hi)[0])
        sp_lo = int(np.asarray(tabs.scale.wp.lo)[0])
        sp = (sp_hi << 32) | sp_lo
    scale = ((s_hi << 32) | s_lo, sp)
    return LaneDirection(m, True, tuple(ls), jnp.asarray(np.stack(tw)), scale, rows)


def _lane_kernel(
    fc: FieldConsts, m: int, stage_ls, inverse: bool, scale_scalar, pre_tw: int,
    rows: int = LANE_BLOCK_ROWS,
):
    """pre_tw: 0 = no fused inter-step twiddle; 2 = (w_hi, w_lo) operands
    with on-the-fly companions; 4 = (w_hi, w_lo, wp_hi, wp_lo) operands.
    Applied BEFORE the stages on the forward (the six-step twiddle pass
    between column and row transforms, fused as a kernel prologue) and
    AFTER them on the inverse (mirror epilogue)."""
    from ..field.limb import u64_const_like, u64_select

    n = len(stage_ls)

    def kernel(xh_ref, xl_ref, *refs):
        tw_ref = refs[pre_tw]
        oh_ref, ol_ref = refs[pre_tw + 1], refs[pre_tw + 2]
        companioned = tw_ref.shape[1] == 4  # vs 2-channel solinas tables

        def apply_pre(v):
            w = U64(refs[0][:], refs[1][:])
            if fc.modmul == "solinas":
                return fc.solinas_mul(v, w)  # plain companion-free tables
            if pre_tw == 4:
                return fc.mont_mul(v, w, U64(refs[2][:], refs[3][:]))
            return fc.mont_mul_full(v, w)

        v = U64(xh_ref[:], xl_ref[:])  # (rows, m)
        if pre_tw and not inverse:
            v = apply_pre(v)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (rows, m), 1)
        for s, l in enumerate(stage_ls):
            bit = (lane & jnp.uint32(l)) != 0

            def partner(a, bit=bit, l=l):
                return jnp.where(
                    bit,
                    pltpu.roll(a, shift=l, axis=1),
                    pltpu.roll(a, shift=m - l, axis=1),
                )

            w = U64(tw_ref[s, 0], tw_ref[s, 1])
            wp = U64(tw_ref[s, 2], tw_ref[s, 3]) if companioned else None
            if not inverse:
                p = U64(partner(v.hi), partner(v.lo))
                ssum = fc.add(v, p)
                d = fc.sub(p, v)  # bit-set lanes: x[k] - x[k+l]
                dm = fc.twiddle_mul(d, w, wp)
                v = u64_select(bit, dm, ssum)
            elif scale_scalar is not None and s == n - 1:
                sc = u64_const_like(scale_scalar[0], v)
                scp = (
                    None
                    if scale_scalar[1] is None
                    else u64_const_like(scale_scalar[1], v)
                )
                a = fc.twiddle_mul(v, sc, scp)  # s * x everywhere
                b = fc.twiddle_mul(v, w, wp)  # (s*w_j) * x everywhere
                pa = U64(partner(a.hi), partner(a.lo))
                pb = U64(partner(b.hi), partner(b.lo))
                v = u64_select(bit, fc.sub(pa, b), fc.add(a, pb))
            else:
                t = fc.twiddle_mul(v, w, wp)  # w_j * x everywhere
                px = U64(partner(v.hi), partner(v.lo))
                pt = U64(partner(t.hi), partner(t.lo))
                v = u64_select(bit, fc.sub(px, t), fc.add(v, pt))
        if pre_tw and inverse:
            v = apply_pre(v)
        oh_ref[:], ol_ref[:] = v.hi, v.lo

    return kernel


@functools.lru_cache(maxsize=None)
def _lane_call(
    fc: FieldConsts, m: int, stage_ls: tuple, inverse: bool, scale_scalar,
    pre_tw: int, rows: int = LANE_BLOCK_ROWS,
):
    kernel = _lane_kernel(fc, m, stage_ls, inverse, scale_scalar, pre_tw, rows)
    n_stages = len(stage_ls)

    @jax.jit
    def call(xh, xl, *rest):
        b = xh.shape[0]
        ch = rest[-1].shape[1]  # 4 companioned / 2 solinas channels
        x_spec = pl.BlockSpec(
            (rows, m), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        tw_spec = pl.BlockSpec(
            (n_stages, ch, rows, m),
            lambda i: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((b, m), jnp.uint32)] * 2,
            grid=(b // rows,),
            in_specs=[x_spec, x_spec] + [x_spec] * pre_tw + [tw_spec],
            out_specs=[x_spec] * 2,
            interpret=_use_interpret(),
        )(xh, xl, *rest)

    return call


def fused_ntt_lane(
    x: U64, tables: LaneDirection, fc: FieldConsts, pre_tw=None
) -> U64:
    """Lane-axis fused transform: length-m NTT along the LAST axis.

    ``x``: (batch..., m).  Bit-compatible (mod N) with the leading-axis
    engines applied to the transposed data.  ``pre_tw``: optional MontPair
    of the six-step inter-step twiddle matrix (batch..., m) fused into the
    kernel (prologue on forward, epilogue on inverse); companion may be
    None (recomputed on the fly).
    """
    m = tables.m
    if x.lo.shape[-1] != m:
        raise ValueError(f"trailing axis {x.lo.shape[-1]} != transform length {m}")
    batch_shape = x.lo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    rows = getattr(tables, "rows", LANE_BLOCK_ROWS)
    bp = _round_up(b, rows)

    def flat_pad(a):
        a = a.reshape(b, m)
        return jnp.pad(a, ((0, bp - b), (0, 0))) if bp != b else a

    args = [flat_pad(x.hi), flat_pad(x.lo)]
    n_tw = 0
    if pre_tw is not None:
        args += [flat_pad(pre_tw.w.hi), flat_pad(pre_tw.w.lo)]
        n_tw = 2
        if pre_tw.wp is not None:
            args += [flat_pad(pre_tw.wp.hi), flat_pad(pre_tw.wp.lo)]
            n_tw = 4
    if isinstance(tables, GroupedLaneDirection):
        call = _lane_grouped_call(fc, m, tables.specs, tables.inverse, n_tw)
    else:
        call = _lane_call(
            fc, m, tables.stage_ls, tables.inverse, tables.scale_scalar, n_tw,
            rows,
        )
    oh, ol = call(*args, tables.tw)
    if bp != b:
        oh, ol = oh[:b], ol[:b]
    return U64(oh.reshape(batch_shape + (m,)), ol.reshape(batch_shape + (m,)))


# -- lane-axis grouped variant ------------------------------------------------


class GroupedLaneDirection:
    """Grouped tables for a lane-axis fused transform (one direction).

    ``tw``: (num_groups, 4, LANE_BLOCK_ROWS, m) uint32 -- per group the four
    lane-vectors of the combined table in engine form, replicated across the
    block rows.  The 1/m inverse scaling is folded into the final group's
    table, so no separate scale machinery is needed.
    """

    def __init__(self, m, inverse, specs, tw):
        self.m = m
        self.inverse = inverse
        self.specs = specs
        self.tw = tw


jax.tree_util.register_pytree_node(
    GroupedLaneDirection,
    lambda t: ((t.tw,), (t.m, t.inverse, t.specs)),
    lambda aux, ch: GroupedLaneDirection(aux[0], aux[1], aux[2], ch[0]),
)


def _lane_group_tables(mod: Modulus, m: int, tables, modmul: str) -> jnp.ndarray:
    out = np.zeros((len(tables), 4, LANE_BLOCK_ROWS, m), dtype=np.uint32)
    for g, vals in enumerate(tables):
        for c, a in enumerate(_vals_to_pair(mod, vals, modmul)):
            out[g, c, :, :] = a[None, :]
    return jnp.asarray(out)


def make_lane_grouped_forward(
    mod: Modulus, m: int, modmul: str = "montgomery", max_r: int = DEFAULT_MAX_RADIX
) -> GroupedLaneDirection:
    specs, tables = _forward_group_values(mod, m, modmul, max_r)
    return GroupedLaneDirection(m, False, specs, _lane_group_tables(mod, m, tables, modmul))


def make_lane_grouped_inverse(
    mod: Modulus,
    m: int,
    scale_extra: int = 1,
    modmul: str = "montgomery",
    max_r: int = DEFAULT_MAX_RADIX,
) -> GroupedLaneDirection:
    specs, tables = _inverse_group_values(mod, m, modmul, scale_extra, max_r)
    return GroupedLaneDirection(m, True, specs, _lane_group_tables(mod, m, tables, modmul))


def _apply_lane_consts(fc: FieldConsts, val: U64, consts, lane, unit: int) -> U64:
    """Multiply by the rank's scalar constant selected per lane.

    ``consts``: per ``low`` index the (w, wp) int pair or None; ``low`` is
    read from the lane id as (lane >> log2(unit)) & (len-1).  Non-None
    entries cost one scalar-constant multiply each (register-resident fast
    path); the select tree recombines them by lane bits.
    """
    from ..field.limb import u64_const_like, u64_select

    n = len(consts)
    if n == 1:
        return val
    cands = [
        val
        if c is None
        else fc.twiddle_mul(
            val, u64_const_like(c[0], val), u64_const_like(c[1], val)
        )
        for c in consts
    ]
    bitpos = unit.bit_length() - 1
    while len(cands) > 1:
        selbit = (lane & jnp.uint32(1 << bitpos)) != 0
        cands = [
            u64_select(selbit, cands[2 * i + 1], cands[2 * i])
            for i in range(len(cands) // 2)
        ]
        bitpos += 1
    return cands[0]


def _lane_grouped_kernel(fc: FieldConsts, m: int, specs, inverse: bool, pre_tw: int):
    """Grouped lane kernel: one combined table multiply per radix group
    (epilogue on forward ranks, prologue on inverse ranks), scalar-constant
    twiddles inside the group.  ``pre_tw`` as in _lane_kernel."""
    from ..field.limb import u64_select

    def kernel(xh_ref, xl_ref, *refs):
        tw_ref = refs[pre_tw]
        oh_ref, ol_ref = refs[pre_tw + 1], refs[pre_tw + 2]

        def apply_pre(v):
            w = U64(refs[0][:], refs[1][:])
            if pre_tw == 4:
                return fc.mont_mul(v, w, U64(refs[2][:], refs[3][:]))
            return fc.mont_mul_full(v, w)

        v = U64(xh_ref[:], xl_ref[:])  # (LANE_BLOCK_ROWS, m)
        if pre_tw and not inverse:
            v = apply_pre(v)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (LANE_BLOCK_ROWS, m), 1)
        for gi, spec in enumerate(specs):
            tg = U64(tw_ref[gi, 0], tw_ref[gi, 1])
            tgp = U64(tw_ref[gi, 2], tw_ref[gi, 3])
            if inverse:
                v = fc.twiddle_mul(v, tg, tgp)  # combined pre-multiply
            for s, h in enumerate(spec.ls):
                bit = (lane & jnp.uint32(h)) != 0

                def partner(a, bit=bit, h=h):
                    return jnp.where(
                        bit,
                        pltpu.roll(a, shift=h, axis=1),
                        pltpu.roll(a, shift=m - h, axis=1),
                    )

                if not inverse:
                    p = U64(partner(v.hi), partner(v.lo))
                    ssum = fc.add(v, p)
                    d = fc.sub(p, v)  # bit-set lanes: x0 - x1
                    d = _apply_lane_consts(fc, d, spec.consts[s], lane, spec.L)
                    v = u64_select(bit, d, ssum)
                else:
                    t = _apply_lane_consts(fc, v, spec.consts[s], lane, spec.ls[0])
                    px = U64(partner(v.hi), partner(v.lo))
                    pt = U64(partner(t.hi), partner(t.lo))
                    v = u64_select(bit, fc.sub(px, t), fc.add(v, pt))
            if not inverse:
                v = fc.twiddle_mul(v, tg, tgp)  # combined epilogue
        if pre_tw and inverse:
            v = apply_pre(v)
        oh_ref[:], ol_ref[:] = v.hi, v.lo

    return kernel


@functools.lru_cache(maxsize=None)
def _lane_grouped_call(
    fc: FieldConsts, m: int, specs: tuple, inverse: bool, pre_tw: int
):
    kernel = _lane_grouped_kernel(fc, m, specs, inverse, pre_tw)
    n_groups = len(specs)

    @jax.jit
    def call(xh, xl, *rest):
        b = xh.shape[0]
        x_spec = pl.BlockSpec(
            (LANE_BLOCK_ROWS, m), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        tw_spec = pl.BlockSpec(
            (n_groups, 4, LANE_BLOCK_ROWS, m),
            lambda i: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((b, m), jnp.uint32)] * 2,
            grid=(b // LANE_BLOCK_ROWS,),
            in_specs=[x_spec, x_spec] + [x_spec] * pre_tw + [tw_spec],
            out_specs=[x_spec] * 2,
            interpret=_use_interpret(),
        )(xh, xl, *rest)

    return call


@functools.lru_cache(maxsize=None)
def _group_call(
    fc: FieldConsts, m: int, stage_ls: tuple, inverse: bool, with_scale: bool,
    block_b: int = BLOCK_B, aps: int = 4,
):
    """Build the jitted pallas_call for one stage group (cached per config)."""
    kernel = _make_group_kernel(fc, m, stage_ls, inverse, with_scale, aps=aps)

    @jax.jit
    def call(xh, xl, *tw_flat):
        b = xh.shape[1]
        x_spec = pl.BlockSpec((m, block_b), lambda i: (0, i), memory_space=pltpu.VMEM)
        # operand shapes carry the layout: (l, block_b) deduped or
        # (m/2, block_b) tiled (kernel branches on ref shape)
        w_specs = [
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in tw_flat
        ]
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((m, b), jnp.uint32)] * 2,
            grid=(b // block_b,),
            in_specs=[x_spec, x_spec] + w_specs,
            out_specs=[x_spec] * 2,
            scratch_shapes=[pltpu.VMEM((m, block_b), jnp.uint32)] * 2,
            interpret=_use_interpret(),
        )(xh, xl, *tw_flat)

    return call


@functools.lru_cache(maxsize=None)
def _mid_call(
    fc: FieldConsts, m: int, stage_ls: tuple, inverse: bool, with_scale: bool,
    block_b: int = BLOCK_B, aps: int = 4,
):
    """Jitted pallas_call for one stage group along the MIDDLE axis of a
    (A, m, B) array, gridded over (A, B / block_b)."""
    kernel = _make_group_kernel(
        fc, m, stage_ls, inverse, with_scale, mid=True, aps=aps
    )

    @jax.jit
    def call(xh, xl, *tw_flat):
        a, _, b = xh.shape
        x_spec = pl.BlockSpec(
            (1, m, block_b), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        w_specs = [
            pl.BlockSpec(t.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            for t in tw_flat
        ]
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((a, m, b), jnp.uint32)] * 2,
            grid=(a, b // block_b),
            in_specs=[x_spec, x_spec] + w_specs,
            out_specs=[x_spec] * 2,
            scratch_shapes=[pltpu.VMEM((m, block_b), jnp.uint32)] * 2,
            interpret=_use_interpret(),
        )(xh, xl, *tw_flat)

    return call


def fused_ntt_mid(x: U64, tables: FusedDirection, fc: FieldConsts) -> U64:
    """Length-m NTT along AXIS 1 of (A, m, batch...) data.

    The six-step row step applied directly on the (columns, rows, batch)
    layout: a Split node with a non-empty batch runs its row leaf here
    instead of the transpose / leading-axis leaf / transpose sandwich
    (the reference's blocked six-step fuses transposition into its row
    layers the same way, reference layer/sve/blocked-generic.hpp:138-154).
    Bit-compatible (mod N) with fused_ntt applied to the transposed data.
    """
    m = tables.m
    if x.lo.shape[1] != m:
        raise ValueError(f"axis-1 length {x.lo.shape[1]} != transform length {m}")
    a = x.lo.shape[0]
    batch_shape = x.lo.shape[2:]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    bp = _round_up(b, tables.block_b)
    xh = x.hi.reshape(a, m, b)
    xl = x.lo.reshape(a, m, b)
    if bp != b:
        pad = ((0, 0), (0, 0), (0, bp - b))
        xh = jnp.pad(xh, pad)
        xl = jnp.pad(xl, pad)

    n = len(tables.stage_ls)
    groups = [
        list(range(i, min(i + tables.spc, n))) for i in range(0, n, tables.spc)
    ]
    for g in groups:
        stage_ls = tuple(tables.stage_ls[s] for s in g)
        with_scale = tables.inverse and (n - 1 in g)
        tw_flat = [arr for s in g for arr in tables.tw[s]]
        if with_scale:
            tw_flat += list(tables.scale)
        call = _mid_call(
            fc, m, stage_ls, tables.inverse, with_scale, tables.block_b,
            tables.aps,
        )
        xh, xl = call(xh, xl, *tw_flat)

    if bp != b:
        xh, xl = xh[:, :, :b], xl[:, :, :b]
    return U64(
        xh.reshape((a, m) + batch_shape), xl.reshape((a, m) + batch_shape)
    )


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def fused_ntt(x: U64, tables, fc: FieldConsts) -> U64:
    """Run the fused kernel chain on (m, batch...) data.

    Bit-compatible (mod N) with ops.ntt_jnp.ntt_forward / ntt_inverse (and
    hence the golden model).  Batch is flattened and padded to BLOCK_B.
    Accepts either per-stage (FusedDirection) or radix-grouped
    (GroupedDirection) tables.
    """
    if isinstance(tables, GroupedDirection):
        return fused_ntt_grouped(x, tables, fc)
    m = tables.m
    if x.lo.shape[0] != m:
        raise ValueError(f"leading axis {x.lo.shape[0]} != transform length {m}")
    batch_shape = x.lo.shape[1:]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    bp = _round_up(b, tables.block_b)
    xh = x.hi.reshape(m, b)
    xl = x.lo.reshape(m, b)
    if bp != b:
        xh = jnp.pad(xh, ((0, 0), (0, bp - b)))
        xl = jnp.pad(xl, ((0, 0), (0, bp - b)))

    n = len(tables.stage_ls)
    groups = [
        list(range(i, min(i + tables.spc, n))) for i in range(0, n, tables.spc)
    ]
    for g in groups:
        stage_ls = tuple(tables.stage_ls[s] for s in g)
        with_scale = tables.inverse and (n - 1 in g)
        tw_flat = [a for s in g for a in tables.tw[s]]
        if with_scale:
            tw_flat += list(tables.scale)
        call = _group_call(
            fc, m, stage_ls, tables.inverse, with_scale, tables.block_b,
            tables.aps,
        )
        xh, xl = call(xh, xl, *tw_flat)

    if bp != b:
        xh, xl = xh[:, :b], xl[:, :b]
    return U64(xh.reshape((m,) + batch_shape), xl.reshape((m,) + batch_shape))
