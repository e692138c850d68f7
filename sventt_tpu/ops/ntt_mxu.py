"""MXU matrix-NTT engine: small-m NTTs as int8 limb-plane matmuls.

The third leaf engine (next to jnp and pallas): a length-m NTT (m <= MAX_MXU)
is evaluated as the dense matrix product

  forward:  X[p] = sum_j  M[p, j] * x[j],   M[p, j] = R64 * omega^(bitrev(p)*j)
  inverse:  x[k] = sum_p  Mi[k, p] * y[p],  Mi[k, p] = R64 * s * omega^(-k*bitrev(p))

(s = m^-1 * scale_extra; R64 = 2^64 mod N -- the Montgomery factor that
cancels the final REDC), which matches the golden DIF output order /
DIT input order exactly, so MXU leaves compose freely with every other
engine in the plan tree.

Mechanics: each u64 element splits into NL = 10 seven-bit planes, the
matrix into the same planes host-side; the m-contraction runs on the MXU
as int8 x int8 -> int32 ``dot_general`` (one per input plane, all NL
output plane groups at once via the (NL*m, m) stacked matrix).  The
2*NL-1 int32 product planes recombine on the VPU into a 6-limb 192-bit
value, the top 64 bits fold via 2^128 mod N, and one subtractive
Montgomery REDC (companion computed from the low 64 bits) lands in
canonical [0, N).

Exactness bounds: plane products <= 127^2; each output plane sums
m * NL terms <= 512 * 10 * 16129 < 2^27 -- int32-safe.  Recombination
is exact 192-bit integer arithmetic; sum_j M[p,j]*x[j] < m * N^2 <
2^(8+128) = 2^136... the 6-limb accumulator holds 192 bits, and the
fold + REDC reduce any value < 2^192 correctly (fold handles the top
limb pair exactly; REDC needs T_hi < N after the fold corrections --
see the two conditional subtracts).

MEASURED (round 4, truthful chains): one 128-point level over 2^22
points = 0.653 ms all-inclusive (decompose + matmuls + recombine +
canonicalize), ~1.8x the per-butterfly rate of the tuned jnp engine --
the first MXU win after rounds 1-2's invalid-timing dismissals.

Reference role: the radix-R throughput kernel
(reference include/sventt/layer/sve/radix-eight.hpp:95-234) realized on
the TPU's systolic array instead of vector registers.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.limb import (
    U64,
    FieldConsts,
    u64_add,
    u64_add_carry,
    u64_const_like,
    u64_lt,
    u64_mulhi,
    u64_mullo,
    u64_select,
    u64_sub,
)
from ..field.modulus import Modulus

#: 7-bit limb planes per u64 (10 * 7 = 70 >= 64 bits).
NL = 10

#: Largest matrix-NTT length: the int32 accumulator bound
#: (m * NL * 127^2 < 2^31) allows up to m = 1024; 512 is the largest
#: whose kernel fits Mosaic's scoped-VMEM stack at the default block
#: sizes ((NL*m, m) int8 matrix = 2.6 MB, int32 product planes scale
#: with m * block_b).  512-point levels let 2^26-2^27 run as 3-level
#: plans (the 4-level 128-leaf alternative measured slower than jnp).
MAX_MXU = 512

#: Lane-tile width (batch columns per grid step).
MXU_BLOCK_B = 128


@dataclass(frozen=True)
class MxuDirection:
    """Prepared tables for one direction at one length.

    ``planes``: (NL*m, m) int8 -- the stacked 7-bit planes of the DFT
    matrix in Montgomery-lifted form.  ``c128`` / ``nprime`` / ``modulus``:
    per-modulus Python-int constants baked into the kernel as literals.
    """

    m: int
    inverse: bool
    planes: jnp.ndarray
    #: (m, NL*m) pre-transposed copy for the lane orientation: the lane
    #: dot contracts the last axis of both operands otherwise, which
    #: Mosaic executes ~9x slower than a plain matmul (measured 6.3 vs
    #: 0.69 ms at 2^22).
    planes_t: jnp.ndarray
    modulus: int
    c128: int  # 2^128 mod N
    nprime: int  # N^-1 mod 2^64
    block_b: int = MXU_BLOCK_B


jax.tree_util.register_dataclass(
    MxuDirection,
    data_fields=["planes", "planes_t"],
    meta_fields=["m", "inverse", "modulus", "c128", "nprime", "block_b"],
)


def make_mxu_tables(
    mod: Modulus, m: int, *, inverse: bool, scale_extra: int = 1,
    block_b: int | None = None,
) -> MxuDirection:
    """Host-build the limb-plane matrix for one direction."""
    from ..field.golden import bitreverse_permutation

    if m < 2 or m & (m - 1) or m > MAX_MXU:
        raise ValueError(f"mxu engine supports power-of-two m in [2, {MAX_MXU}]")
    N = mod.modulus
    perm = bitreverse_permutation(m)
    r64 = (1 << 64) % N
    M = np.zeros((m, m), dtype=object)
    if not inverse:
        omega = mod.get_root_forward(m)
        for p in range(m):
            base = pow(omega, perm[p], N)
            v = r64
            for j in range(m):
                M[p, j] = v
                v = v * base % N
    else:
        omegainv = mod.invert(mod.get_root_forward(m))
        s = mod.invert(m) * (scale_extra % N) % N
        for k in range(m):
            base = pow(omegainv, k, N)
            for p in range(m):
                M[k, p] = pow(base, perm[p], N) * s % N * r64 % N
    planes = np.concatenate(
        [((M >> (7 * i)) & 0x7F).astype(np.int8) for i in range(NL)], axis=0
    )
    return MxuDirection(
        m, inverse, jnp.asarray(planes), jnp.asarray(planes.T.copy()),
        N, pow(2, 128, N), pow(N, -1, 1 << 64), block_b or MXU_BLOCK_B,
    )


def _mxu_body(t: MxuDirection, xhv, xlv, mm, lane: bool = False):
    """u32 limb pair + (NL*m, m) i8 matrix -> canonical U64.

    ``lane=False``: transform along the LEADING axis of (m, BT) tiles
    (contraction mm @ Xi).  ``lane=True``: transform along the LAST axis
    of (rows, m) tiles (contraction Xi @ mm^T -- same matrix operand).
    The per-point recombination/reduction is the VPU tail measured to
    dominate the level cost; it is elementwise and orientation-agnostic.
    """
    m = t.m
    planes = [None] * (2 * NL - 1)
    for i in range(NL):
        lo_bit = 7 * i
        if lo_bit + 7 <= 32:
            v = (xlv >> np.uint32(lo_bit)) & np.uint32(0x7F)
        elif lo_bit >= 32:
            v = (xhv >> np.uint32(lo_bit - 32)) & np.uint32(0x7F)
        else:
            v = ((xlv >> np.uint32(lo_bit)) | (xhv << np.uint32(32 - lo_bit))) & np.uint32(0x7F)
        Xi = v.astype(jnp.int8)
        if lane:
            # mm here is planes_t (m, NL*m): a plain matmul
            Ci = jax.lax.dot_general(
                Xi, mm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (rows, NL*m)
            Cir = Ci.reshape(xhv.shape[0], NL, m)
        else:
            Ci = jax.lax.dot_general(
                mm, Xi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (NL*m, BT)
            Cir = Ci.reshape(NL, m, xhv.shape[-1])
        for k in range(NL):
            blk = Cir[:, k, :] if lane else Cir[k]
            tt = i + k
            planes[tt] = blk if planes[tt] is None else planes[tt] + blk
    z = jnp.zeros_like(xhv)
    A = [U64(z, z) for _ in range(6)]
    for tt in range(2 * NL - 1):
        P = planes[tt].astype(jnp.uint32)
        pos = 7 * tt
        w, sh = pos // 32, pos % 32
        lo = (P << np.uint32(sh)) if sh else P
        A[w] = u64_add(A[w], U64(z, lo))
        if sh:
            A[w + 1] = u64_add(A[w + 1], U64(z, P >> np.uint32(32 - sh)))
    L = []
    carry = U64(z, z)
    for w in range(6):
        s = u64_add(A[w], carry)
        L.append(s.lo)
        carry = U64(z, s.hi)
    T_lo = U64(L[1], L[0])
    T_hi = U64(L[3], L[2])
    top = U64(L[5], L[4])
    # fold the top 64 bits: value === top*2^128 + T_hi*2^64 + T_lo (mod N).
    # A carry out of the T_hi limb is weight 2^128 === c128 (mod N) and is
    # folded back at weight 1 (cannot re-carry: after an overflow the
    # wrapped T_hi is tiny, and c128 < N keeps the weight-1 add bounded).
    c128 = u64_const_like(t.c128, top)
    ext = u64_mullo(top, c128)
    ext_hi = u64_mulhi(top, c128)
    T_lo2, c0 = u64_add_carry(T_lo, ext)
    s1, c1 = u64_add_carry(T_hi, ext_hi)
    s2, c2 = u64_add_carry(s1, U64(z, c0))
    over = c1 | c2
    mask = jnp.zeros_like(over) - over
    add128 = U64(
        mask & jnp.uint32(t.c128 >> 32),
        mask & jnp.uint32(t.c128 & 0xFFFFFFFF),
    )
    T_lo2, c3 = u64_add_carry(T_lo2, add128)
    T_hi = u64_add(s2, U64(z, c3))
    # reduce T_hi below N.  Small counts ((2^64-1)//N <= 3, i.e. 62-bit+
    # moduli) unroll conditional subtracts; anything smaller takes ONE
    # Barrett step (q = hi64(T_hi * floor(2^64/N)) satisfies
    # floor(T_hi/N) - 1 <= q <= floor(T_hi/N), so T_hi - q*N < 2N) plus a
    # single conditional subtract -- bounded trace size for ANY modulus
    # (the old unrolled (2^64-1)//N loop attempted ~2.8e14 select ops for
    # the F4 prime 2^16+1: an effective trace-time hang).
    nn = u64_const_like(t.modulus, T_hi)
    nsub = max(1, ((1 << 64) - 1) // t.modulus)
    if nsub > 3:
        mu = u64_const_like((1 << 64) // t.modulus, T_hi)
        qq = u64_mulhi(T_hi, mu)
        T_hi = u64_sub(T_hi, u64_mullo(qq, nn))
        nsub = 1
    for _ in range(nsub):
        cand = u64_sub(T_hi, nn)
        T_hi = u64_select(u64_lt(T_hi, nn), T_hi, cand)
    # subtractive Montgomery REDC of T_hi*2^64 + T_lo2 (R64 baked in M
    # cancels the R^-1): q = T_lo2 * N' mod 2^64; result = T_hi - hi(q*N)
    q = u64_mullo(T_lo2, u64_const_like(t.nprime, T_lo2))
    qn1 = u64_mulhi(q, nn)
    d = u64_sub(T_hi, qn1)
    res = u64_select(u64_lt(T_hi, qn1), u64_add(d, nn), d)
    cand = u64_sub(res, nn)
    return u64_select(u64_lt(res, nn), res, cand)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


#: Batch rows per lane-variant block.  32 keeps the kernel's scoped-VMEM
#: temporaries (int32 product planes etc.) under Mosaic's 16 MB stack
#: limit at m=256 (128 rows OOM'd: 26.8 MB scoped).
MXU_LANE_ROWS = 32


@functools.lru_cache(maxsize=None)
def _mxu_lane_call(meta: tuple):
    """Jitted pallas_call for the lane orientation (transform along the
    LAST axis of (B, m) data, gridded over row blocks)."""
    m, inverse, modulus, c128, nprime, block_b = meta
    t = MxuDirection(m, inverse, None, None, modulus, c128, nprime, block_b)
    rows = MXU_LANE_ROWS

    def kernel(xh_ref, xl_ref, m_ref, oh_ref, ol_ref):
        res = _mxu_body(t, xh_ref[:], xl_ref[:], m_ref[:], lane=True)
        oh_ref[:], ol_ref[:] = res.hi, res.lo

    @jax.jit
    def call(xh, xl, planes_t):
        b = xh.shape[0]
        x_spec = pl.BlockSpec(
            (rows, m), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        m_spec = pl.BlockSpec(
            (m, NL * m), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((b, m), jnp.uint32)] * 2,
            grid=(b // rows,),
            in_specs=[x_spec, x_spec, m_spec],
            out_specs=[x_spec] * 2,
            interpret=_use_interpret(),
        )(xh, xl, planes_t)

    return call


def mxu_ntt_lane(x: U64, tables: MxuDirection, fc: FieldConsts) -> U64:
    """Length-m matrix NTT along the LAST axis of (batch..., m): the
    six-step row step on the natural layout, no transposes."""
    m = tables.m
    if x.lo.shape[-1] != m:
        raise ValueError(f"trailing axis {x.lo.shape[-1]} != transform length {m}")
    batch_shape = x.lo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    bp = _round_up(b, MXU_LANE_ROWS)
    xh = x.hi.reshape(b, m)
    xl = x.lo.reshape(b, m)
    if bp != b:
        xh = jnp.pad(xh, ((0, bp - b), (0, 0)))
        xl = jnp.pad(xl, ((0, bp - b), (0, 0)))
    oh, ol = _mxu_lane_call(_meta(tables))(xh, xl, tables.planes_t)
    if bp != b:
        oh, ol = oh[:b], ol[:b]
    return U64(oh.reshape(batch_shape + (m,)), ol.reshape(batch_shape + (m,)))


@functools.lru_cache(maxsize=None)
def _mxu_call(meta: tuple, mid: bool):
    """Jitted pallas_call for one direction (cached per table meta)."""
    m, inverse, modulus, c128, nprime, block_b = meta
    t = MxuDirection(m, inverse, None, None, modulus, c128, nprime, block_b)

    if not mid:

        def kernel(xh_ref, xl_ref, m_ref, oh_ref, ol_ref):
            res = _mxu_body(t, xh_ref[:], xl_ref[:], m_ref[:])
            oh_ref[:], ol_ref[:] = res.hi, res.lo

        @jax.jit
        def call(xh, xl, planes):
            b = xh.shape[1]
            x_spec = pl.BlockSpec(
                (m, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            )
            m_spec = pl.BlockSpec(
                (NL * m, m), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            return pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((m, b), jnp.uint32)] * 2,
                grid=(b // block_b,),
                in_specs=[x_spec, x_spec, m_spec],
                out_specs=[x_spec] * 2,
                interpret=_use_interpret(),
            )(xh, xl, planes)

    else:

        def kernel(xh_ref, xl_ref, m_ref, oh_ref, ol_ref):
            res = _mxu_body(t, xh_ref[0], xl_ref[0], m_ref[:])
            oh_ref[0], ol_ref[0] = res.hi, res.lo

        @jax.jit
        def call(xh, xl, planes):
            a, _, b = xh.shape
            x_spec = pl.BlockSpec(
                (1, m, block_b), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            )
            m_spec = pl.BlockSpec(
                (NL * m, m), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            )
            return pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((a, m, b), jnp.uint32)] * 2,
                grid=(a, b // block_b),
                in_specs=[x_spec, x_spec, m_spec],
                out_specs=[x_spec] * 2,
                interpret=_use_interpret(),
            )(xh, xl, planes)

    return call


def _meta(t: MxuDirection) -> tuple:
    return (t.m, t.inverse, t.modulus, t.c128, t.nprime, t.block_b)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def mxu_ntt(x: U64, tables: MxuDirection, fc: FieldConsts) -> U64:
    """Length-m matrix NTT along the leading axis of (m, batch...).

    Bit-compatible (mod N) with the other engines; output canonical.
    """
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
    oh, ol = _mxu_call(_meta(tables), mid=False)(xh, xl, tables.planes)
    if bp != b:
        oh, ol = oh[:, :b], ol[:, :b]
    return U64(oh.reshape((m,) + batch_shape), ol.reshape((m,) + batch_shape))


def mxu_ntt_mid(x: U64, tables: MxuDirection, fc: FieldConsts) -> U64:
    """Length-m matrix NTT along AXIS 1 of (A, m, batch...): the six-step
    row step without transposes (the MXU analogue of fused_ntt_mid)."""
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
    oh, ol = _mxu_call(_meta(tables), mid=True)(xh, xl, tables.planes)
    if bp != b:
        oh, ol = oh[:, :, :b], ol[:, :, :b]
    return U64(
        oh.reshape((a, m) + batch_shape), ol.reshape((a, m) + batch_shape)
    )
