"""Pallas remote-DMA all-to-all: the optimized six-step transpose path.

SURVEY.md section 2.5.5 names this a first-class component: the reference's
shared-memory six-step transpose generalizes to an inter-chip all-to-all,
and the optimized path issues the shard exchanges as explicit ICI RDMA
(``pltpu.make_async_remote_copy``) from a Pallas kernel instead of relying
on the XLA collective.  That puts the schedule under our control -- every
message can later be interleaved with butterfly compute (send shard s while
transforming shard s-1), which `lax.all_to_all` cannot express.

Schedule: rotation ring.  With D devices, step s in 1..D-1 exchanges with
the neighbors at ring distance s: device d sends slab (d+s) mod D and
receives slab (d-s) mod D, every step using its own semaphore slot.  All
D-1 RDMAs are started back to back and drained afterwards, so the ICI links
run concurrently; on a physical 1-D torus a distance-s message travels
min(s, D-s) hops (the fabric routes it).  The own-shard slab moves with a
local async copy.  Each slab is written exactly once into its final slot,
so no double buffering or neighbor barrier is needed (unlike multi-round
ring collectives that reuse communication buffers).

Layout contract (canonical): local input (D, R, C) where slab x[j] is
destined for device j; local output (D, R, C) where out[o] is the slab
received from device o.  ``ring_all_to_all`` wraps the kernel with the
reshapes/transposes that map `jax.lax.all_to_all(tiled=True)` semantics
onto this canonical layout, so it is a drop-in replacement inside
shard_map -- bit-identical output, verified against the XLA collective in
tests/test_ring.py on the 8-device CPU mesh (interpret mode) and by
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.limb import U64


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _combined_index(axes: tuple[str, ...]):
    """Device index over the collective mesh axis.

    The ring is restricted to 1-D meshes: the DMA machinery only supports
    LOGICAL device ids over a single named mesh dimension (and a flat
    rotation ring is the wrong schedule across a DCN tier anyway --
    hierarchical meshes keep the XLA collective, which routes per tier).
    """
    if len(axes) != 1:
        raise ValueError("ring all-to-all supports a single mesh axis")
    return jax.lax.axis_index(axes[0])


def _ring_kernel(D: int, axes: tuple[str, ...]):
    """Canonical (D, R, C) all-to-all kernel body, BOTH limb planes in one
    kernel (round-4 review: per-plane kernels doubled launches and needed
    the fragile even/odd collective_id convention; one kernel interleaves
    the hi/lo RDMAs on the same links under one barrier)."""

    def kernel(xh_ref, xl_ref, oh_ref, ol_ref, local_sem, send_sems, recv_sems):
        me = _combined_index(axes)
        pairs = ((0, xh_ref, oh_ref), (1, xl_ref, ol_ref))
        # own slab: plain local DMA into its output slot
        locals_ = []
        for p, x_ref, o_ref in pairs:
            local = pltpu.make_async_copy(
                x_ref.at[me], o_ref.at[me], local_sem.at[p]
            )
            local.start()
            locals_.append(local)
        # rotation ring: step s exchanges with neighbors at distance s.
        # The schedule is symmetric, so waiting my own (send, recv) slot-
        # (p, s) semaphores drains both my outgoing DMA and the incoming
        # one from device (me - s) mod D, which used the same slot.
        rdmas = []
        for s in range(1, D):
            dst = jax.lax.rem(me + s, D)
            for p, x_ref, o_ref in pairs:
                rdma = pltpu.make_async_remote_copy(
                    src_ref=x_ref.at[dst],
                    dst_ref=o_ref.at[me],
                    send_sem=send_sems.at[p, s],
                    recv_sem=recv_sems.at[p, s],
                    device_id=dst,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
                rdma.start()
                rdmas.append(rdma)
        for local in locals_:
            local.wait()
        for rdma in rdmas:
            rdma.wait()

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _canonical_all_to_all(
    xh: jnp.ndarray, xl: jnp.ndarray, D: int, axes: tuple[str, ...],
    collective_id: int,
):
    """(D, R, C) slab exchange of the limb PAIR: out[o] = slab x[me] as
    held on device o, hi and lo moved by one kernel."""
    # NOTE: the enclosing shard_map must pass check_vma=False -- vma
    # tracking cannot type a pallas_call whose inputs already vary over the
    # mesh axes (jax 0.9 interpret path pvaries them a second time).
    return pl.pallas_call(
        _ring_kernel(D, axes),
        out_shape=[jax.ShapeDtypeStruct(xh.shape, xh.dtype)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, D)),
            pltpu.SemaphoreType.DMA((2, D)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=_use_interpret(),
    )(xh, xl)


def ring_all_to_all(
    x: U64, axes: str | tuple[str, ...], split_axis: int, concat_axis: int,
    collective_id: int = 0,
) -> U64:
    """`jax.lax.all_to_all(..., tiled=True)` semantics on a U64 limb pair,
    computed by the remote-DMA ring kernel -- the drop-in alternative to
    parallel.sixstep's XLA `_all_to_all` (DistributedNTT(comm="ring")).
    2-D local arrays only (the six-step schedule's case); call inside
    shard_map over ``axes``.

    Both limb planes move in ONE collective kernel (one collective_id,
    one barrier, interleaved RDMAs) -- the round-4 review flagged the
    previous per-plane kernels' even/odd collective_id convention as
    doubled launches and semaphore bookkeeping.  A call site issuing
    several logical all-to-alls in one program still passes distinct
    ``collective_id`` values, now one per LOGICAL exchange.
    """
    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    D = 1
    for a in axes:
        D *= jax.lax.axis_size(a)
    if x.lo.ndim != 2:
        raise ValueError(
            f"ring all-to-all supports 2-D local arrays, got {x.lo.ndim}-D"
        )
    r, c = x.lo.shape
    if split_axis == 1 and concat_axis == 0:
        # (r, c) -> (D*r, c/D): chunk j of columns goes to device j
        w = c // D

        def to_slabs(a):
            return a.reshape(r, D, w).transpose(1, 0, 2)  # (D, r, w)

        oh, ol = _canonical_all_to_all(
            to_slabs(x.hi), to_slabs(x.lo), D, axes, collective_id
        )
        return U64(oh.reshape(D * r, w), ol.reshape(D * r, w))
    if split_axis == 0 and concat_axis == 1:
        # (r, c) -> (r/D, D*c): chunk j of rows goes to device j
        h = r // D
        oh, ol = _canonical_all_to_all(
            x.hi.reshape(D, h, c), x.lo.reshape(D, h, c), D, axes,
            collective_id,
        )
        return U64(
            oh.transpose(1, 0, 2).reshape(h, D * c),
            ol.transpose(1, 0, 2).reshape(h, D * c),
        )
    raise ValueError(
        f"unsupported (split_axis={split_axis}, concat_axis={concat_axis})"
    )
