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
    """Canonical (D, R, C) all-to-all kernel body."""

    def kernel(x_ref, o_ref, local_sem, send_sems, recv_sems):
        me = _combined_index(axes)
        # own slab: plain local DMA into its output slot
        local = pltpu.make_async_copy(
            x_ref.at[me], o_ref.at[me], local_sem
        )
        local.start()
        # rotation ring: step s exchanges with neighbors at distance s.
        # The schedule is symmetric, so waiting my own (send, recv) slot-s
        # semaphores drains both my outgoing DMA and the incoming one from
        # device (me - s) mod D, which used the same slot.
        rdmas = []
        for s in range(1, D):
            dst = jax.lax.rem(me + s, D)
            rdma = pltpu.make_async_remote_copy(
                src_ref=x_ref.at[dst],
                dst_ref=o_ref.at[me],
                send_sem=send_sems.at[s],
                recv_sem=recv_sems.at[s],
                device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdmas.append(rdma)
        local.wait()
        for rdma in rdmas:
            rdma.wait()

    return kernel


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _canonical_all_to_all(
    x: jnp.ndarray, D: int, axes: tuple[str, ...], collective_id: int
):
    """(D, R, C) slab exchange: out[o] = slab x[me] as held on device o."""
    # NOTE: the enclosing shard_map must pass check_vma=False -- vma
    # tracking cannot type a pallas_call whose inputs already vary over the
    # mesh axes (jax 0.9 interpret path pvaries them a second time).
    return pl.pallas_call(
        _ring_kernel(D, axes),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((D,)),
            pltpu.SemaphoreType.DMA((D,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=_use_interpret(),
    )(x)


def ring_all_to_all_array(
    a: jnp.ndarray, axes: tuple[str, ...], split_axis: int, concat_axis: int,
    D: int, collective_id: int = 0,
) -> jnp.ndarray:
    """`jax.lax.all_to_all(a, axes, split_axis, concat_axis, tiled=True)`
    computed by the remote-DMA ring kernel.  2-D local arrays only (the
    six-step schedule's case); call inside shard_map over ``axes``.
    """
    if a.ndim != 2:
        raise ValueError(f"ring all-to-all supports 2-D local arrays, got {a.ndim}-D")
    r, c = a.shape
    if split_axis == 1 and concat_axis == 0:
        # (r, c) -> (D*r, c/D): chunk j of columns goes to device j
        w = c // D
        slabs = a.reshape(r, D, w).transpose(1, 0, 2)  # (D, r, w)
        out = _canonical_all_to_all(slabs, D, axes, collective_id)
        return out.reshape(D * r, w)
    if split_axis == 0 and concat_axis == 1:
        # (r, c) -> (r/D, D*c): chunk j of rows goes to device j
        h = r // D
        slabs = a.reshape(D, h, c)
        out = _canonical_all_to_all(slabs, D, axes, collective_id)
        return out.transpose(1, 0, 2).reshape(h, D * c)
    raise ValueError(f"unsupported (split_axis={split_axis}, concat_axis={concat_axis})")


def ring_all_to_all(
    x: U64, axes: str | tuple[str, ...], split_axis: int, concat_axis: int,
    collective_id: int = 0,
) -> U64:
    """U64 wrapper with the same signature shape as parallel.sixstep's
    XLA `_all_to_all` (drop-in selectable via DistributedNTT(comm=...)).

    The hi and lo limb exchanges are independent back-to-back collective
    kernels; each pallas_call in flight needs its OWN collective_id (a
    fast device could otherwise start the lo kernel while a laggard still
    waits inside hi, and slot-s RDMA signals from the two kernels could
    cross-match on the shared semaphore namespace).  A call site that
    issues several logical all-to-alls in one program must likewise pass
    distinct even ``collective_id`` values (this function uses id and
    id+1).
    """
    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    D = 1
    for a in axes:
        D *= jax.lax.axis_size(a)
    return U64(
        ring_all_to_all_array(x.hi, axes, split_axis, concat_axis, D,
                              collective_id),
        ring_all_to_all_array(x.lo, axes, split_axis, concat_axis, D,
                              collective_id + 1),
    )
