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
    (inverse).  ``tw``: per stage, four (m/2, BLOCK_B) uint32 arrays
    (w_hi, w_lo, wp_hi, wp_lo) in butterfly layout.  ``scale``: for the
    inverse, four (m/2, BLOCK_B) arrays of the broadcast (s, sp) pair used
    by the final double-twiddle stage; empty tuple for forward.

    Registered as a pytree (arrays are data, the schedule is static) so
    prepared tables pass through jit as arguments, not baked-in constants.
    """

    m: int
    inverse: bool
    stage_ls: tuple[int, ...]
    tw: tuple[tuple[jnp.ndarray, ...], ...]
    scale: tuple[jnp.ndarray, ...]


jax.tree_util.register_dataclass(
    FusedDirection,
    data_fields=["tw", "scale"],
    meta_fields=["m", "inverse", "stage_ls"],
)


def _expand_pair(pair, m: int, l: int) -> tuple[jnp.ndarray, ...]:
    out = []
    for a in (pair.w.hi, pair.w.lo, pair.wp.hi, pair.wp.lo):
        e = np.tile(np.asarray(a), m // (2 * l))[:, None]
        out.append(jnp.asarray(np.broadcast_to(e, (m // 2, BLOCK_B)).copy()))
    return tuple(out)


def make_fused_forward(
    mod: Modulus, m: int, modmul: str = "montgomery"
) -> FusedDirection:
    tabs = forward_tables(mod, m, modmul)
    ls, tw = [], []
    for s, pair in enumerate(tabs.stages):  # l = m/2 ... 1
        l = m >> (s + 1)
        ls.append(l)
        tw.append(_expand_pair(pair, m, l))
    return FusedDirection(m, False, tuple(ls), tuple(tw), ())


def make_fused_inverse(
    mod: Modulus, m: int, scale_extra: int = 1, modmul: str = "montgomery"
) -> FusedDirection:
    tabs = inverse_tables(mod, m, scale_extra, modmul)
    ls, tw = [], []
    for s, pair in enumerate(tabs.stages):  # l = 1 ... m/2
        l = 1 << s
        ls.append(l)
        tw.append(_expand_pair(pair, m, l))
    sc = []
    for a in (
        tabs.scale.w.hi,
        tabs.scale.w.lo,
        tabs.scale.wp.hi,
        tabs.scale.wp.lo,
    ):
        v = np.full((m // 2, BLOCK_B), np.asarray(a)[0], dtype=np.uint32)
        sc.append(jnp.asarray(v))
    return FusedDirection(m, True, tuple(ls), tuple(tw), tuple(sc))


def _make_group_kernel(fc: FieldConsts, m: int, stage_ls, inverse: bool, with_scale: bool):
    """Kernel running a group of stages with ping-pong through scratch.

    Argument order: xh, xl, 4 per stage [, 4 scale], oh, ol, scratch_h,
    scratch_l.
    """
    n = len(stage_ls)

    def kernel(xh_ref, xl_ref, *rest):
        ntw = 4 * n + (4 if with_scale else 0)
        tw_refs = rest[:ntw]
        oh, ol, ah, al = rest[ntw], rest[ntw + 1], rest[ntw + 2], rest[ntw + 3]
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
            tw = tw_refs[4 * i : 4 * i + 4]
            scale = None
            if with_scale and i == n - 1:
                scale = tw_refs[4 * n : 4 * n + 4]
            _stage_one(fc, m, l, src, tw, dst, inverse, scale)

    return kernel


def _stage_one(fc, m, l, src, tw, dst, inverse, scale):
    sh, sl = src
    dh, dl = dst
    wh, wl, ph, pll = tw
    for b in range(m // (2 * l)):
        r0 = 2 * b * l
        r1 = r0 + l
        t0, t1 = b * l, (b + 1) * l
        x0 = U64(sh[r0 : r0 + l], sl[r0 : r0 + l])
        x1 = U64(sh[r1 : r1 + l], sl[r1 : r1 + l])
        w = U64(wh[t0:t1], wl[t0:t1])
        wp = U64(ph[t0:t1], pll[t0:t1])
        if scale is not None:
            sch, scl, sph, spl = scale
            sc = U64(sch[t0:t1], scl[t0:t1])
            scp = U64(sph[t0:t1], spl[t0:t1])
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

    ``tw``: (num_stages, 4, LANE_BLOCK_ROWS, m) uint32 — per stage the four
    lane-vectors (w_hi, w_lo, wp_hi, wp_lo) with w_vec[i] = w_stage[i mod l]
    replicated across the block rows.  ``scale``: same four rows for the
    final double-twiddle inverse stage (s*w), plus the scalar pair (s, sp)
    baked as Python ints; None for forward.
    """

    def __init__(self, m, inverse, stage_ls, tw, scale_scalar):
        self.m = m
        self.inverse = inverse
        self.stage_ls = stage_ls
        self.tw = tw
        self.scale_scalar = scale_scalar  # (s, sp) ints or None


jax.tree_util.register_pytree_node(
    LaneDirection,
    lambda t: ((t.tw,), (t.m, t.inverse, t.stage_ls, t.scale_scalar)),
    lambda aux, ch: LaneDirection(aux[0], aux[1], aux[2], ch[0], aux[3]),
)


def _lane_vec(pair, m: int, l: int) -> np.ndarray:
    """(4, LANE_BLOCK_ROWS, m) lane-vector table for one stage."""
    idx = np.arange(m) % l
    out = np.zeros((4, LANE_BLOCK_ROWS, m), dtype=np.uint32)
    for c, arr in enumerate((pair.w.hi, pair.w.lo, pair.wp.hi, pair.wp.lo)):
        out[c, :, :] = np.asarray(arr)[idx][None, :]
    return out


def make_lane_forward(mod: Modulus, m: int, modmul: str = "montgomery") -> LaneDirection:
    tabs = forward_tables(mod, m, modmul)
    ls, tw = [], []
    for s, pair in enumerate(tabs.stages):
        l = m >> (s + 1)
        ls.append(l)
        tw.append(_lane_vec(pair, m, l))
    return LaneDirection(m, False, tuple(ls), jnp.asarray(np.stack(tw)), None)


def make_lane_inverse(
    mod: Modulus, m: int, scale_extra: int = 1, modmul: str = "montgomery"
) -> LaneDirection:
    tabs = inverse_tables(mod, m, scale_extra, modmul)
    ls, tw = [], []
    for s, pair in enumerate(tabs.stages):
        l = 1 << s
        ls.append(l)
        tw.append(_lane_vec(pair, m, l))
    s_hi = int(np.asarray(tabs.scale.w.hi)[0])
    s_lo = int(np.asarray(tabs.scale.w.lo)[0])
    sp_hi = int(np.asarray(tabs.scale.wp.hi)[0])
    sp_lo = int(np.asarray(tabs.scale.wp.lo)[0])
    scale = ((s_hi << 32) | s_lo, (sp_hi << 32) | sp_lo)
    return LaneDirection(m, True, tuple(ls), jnp.asarray(np.stack(tw)), scale)


def _lane_kernel(
    fc: FieldConsts, m: int, stage_ls, inverse: bool, scale_scalar, pre_tw: int
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

        def apply_pre(v):
            w = U64(refs[0][:], refs[1][:])
            if pre_tw == 4:
                return fc.mont_mul(v, w, U64(refs[2][:], refs[3][:]))
            return fc.mont_mul_full(v, w)

        v = U64(xh_ref[:], xl_ref[:])  # (LANE_BLOCK_ROWS, m)
        if pre_tw and not inverse:
            v = apply_pre(v)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (LANE_BLOCK_ROWS, m), 1)
        for s, l in enumerate(stage_ls):
            bit = (lane & jnp.uint32(l)) != 0

            def partner(a, bit=bit, l=l):
                return jnp.where(
                    bit,
                    pltpu.roll(a, shift=l, axis=1),
                    pltpu.roll(a, shift=m - l, axis=1),
                )

            w = U64(tw_ref[s, 0], tw_ref[s, 1])
            wp = U64(tw_ref[s, 2], tw_ref[s, 3])
            if not inverse:
                p = U64(partner(v.hi), partner(v.lo))
                ssum = fc.add(v, p)
                d = fc.sub(p, v)  # bit-set lanes: x[k] - x[k+l]
                dm = fc.twiddle_mul(d, w, wp)
                v = u64_select(bit, dm, ssum)
            elif scale_scalar is not None and s == n - 1:
                sc = u64_const_like(scale_scalar[0], v)
                scp = u64_const_like(scale_scalar[1], v)
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
    fc: FieldConsts, m: int, stage_ls: tuple, inverse: bool, scale_scalar, pre_tw: int
):
    kernel = _lane_kernel(fc, m, stage_ls, inverse, scale_scalar, pre_tw)
    n_stages = len(stage_ls)

    @jax.jit
    def call(xh, xl, *rest):
        b = xh.shape[0]
        x_spec = pl.BlockSpec(
            (LANE_BLOCK_ROWS, m), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        tw_spec = pl.BlockSpec(
            (n_stages, 4, LANE_BLOCK_ROWS, m),
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
    bp = _round_up(b, LANE_BLOCK_ROWS)

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
    call = _lane_call(
        fc, m, tables.stage_ls, tables.inverse, tables.scale_scalar, n_tw
    )
    oh, ol = call(*args, tables.tw)
    if bp != b:
        oh, ol = oh[:b], ol[:b]
    return U64(oh.reshape(batch_shape + (m,)), ol.reshape(batch_shape + (m,)))


@functools.lru_cache(maxsize=None)
def _group_call(fc: FieldConsts, m: int, stage_ls: tuple, inverse: bool, with_scale: bool):
    """Build the jitted pallas_call for one stage group (cached per config)."""
    kernel = _make_group_kernel(fc, m, stage_ls, inverse, with_scale)
    n_tw = 4 * len(stage_ls) + (4 if with_scale else 0)

    @jax.jit
    def call(xh, xl, *tw_flat):
        b = xh.shape[1]
        x_spec = pl.BlockSpec((m, BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec(
            (m // 2, BLOCK_B), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((m, b), jnp.uint32)] * 2,
            grid=(b // BLOCK_B,),
            in_specs=[x_spec, x_spec] + [w_spec] * n_tw,
            out_specs=[x_spec] * 2,
            scratch_shapes=[pltpu.VMEM((m, BLOCK_B), jnp.uint32)] * 2,
            interpret=_use_interpret(),
        )(xh, xl, *tw_flat)

    return call


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def fused_ntt(x: U64, tables: FusedDirection, fc: FieldConsts) -> U64:
    """Run the fused kernel chain on (m, batch...) data.

    Bit-compatible (mod N) with ops.ntt_jnp.ntt_forward / ntt_inverse (and
    hence the golden model).  Batch is flattened and padded to BLOCK_B.
    """
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

    n = len(tables.stage_ls)
    groups = [
        list(range(i, min(i + MAX_STAGES_PER_CALL, n)))
        for i in range(0, n, MAX_STAGES_PER_CALL)
    ]
    for g in groups:
        stage_ls = tuple(tables.stage_ls[s] for s in g)
        with_scale = tables.inverse and (n - 1 in g)
        tw_flat = [a for s in g for a in tables.tw[s]]
        if with_scale:
            tw_flat += list(tables.scale)
        call = _group_call(fc, m, stage_ls, tables.inverse, with_scale)
        xh, xl = call(xh, xl, *tw_flat)

    if bp != b:
        xh, xl = xh[:, :b], xl[:, :b]
    return U64(xh.reshape((m,) + batch_shape), xl.reshape((m,) + batch_shape))
