"""The public NTT wrapper: owns device twiddle tables, runs transforms.

TPU-native analogue of ``NTT<kernel_type>`` (reference
include/sventt/wrapper.hpp:13-83).  Where the reference dry-runs a
FakeByteVector to size a byte arena and then streams twiddles through an aux
cursor, here preparation simply materializes named device arrays (pytrees)
once per config and closes jitted functions over them -- XLA keeps them
device-resident, and there is no cursor bookkeeping to verify because the
arrays are structured, not a byte stream (SURVEY.md section 4.6).

Numerical contract (SURVEY.md section 4):

* ``compute_forward`` output is in bit-reversed order, residues mod N equal
  to GoldenNTT.forward;
* ``compute_inverse`` consumes bit-reversed order, returns natural order;
* values may be lazy representatives in [0, 2N) -- compare mod N (use
  ``normalize`` for canonical outputs);
* **input precondition**: values must already be reduced -- [0, N) always
  works, lazy mode also accepts [0, 2N).  Arbitrary u64 inputs are NOT
  reduced first (same contract as the reference, whose bench harness feeds
  iota values and compares ``dst[i] % N``, tests/bench-ntt.cpp:28-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field.limb import U64, FieldConsts, u64_from_numpy, u64_to_numpy
from ..ops.ntt_jnp import ntt_forward, ntt_inverse, twiddle_rows
from ..ops.twiddle import (
    forward_tables,
    inverse_tables,
    sixstep_row_twiddles,
    sixstep_row_twiddles_device,
    sixstep_row_twiddles_inverse,
)
from .config import NttConfig

#: Above this element count the inter-step twiddle matrix is generated on
#: device (lax.scan Montgomery recurrence) instead of host Python ints.
_DEVICE_TWIDDLE_THRESHOLD = 1 << 20


def _row_twiddles(mod, n0: int, n1: int, *, inverse: bool):
    if n0 * n1 > _DEVICE_TWIDDLE_THRESHOLD:
        return sixstep_row_twiddles_device(mod, n0, n1, inverse=inverse)
    if inverse:
        return sixstep_row_twiddles_inverse(mod, n0, n1)
    return sixstep_row_twiddles(mod, n0, n1)


def _transpose01(x: U64) -> U64:
    """Swap the two leading (matrix) axes, keeping batch axes in place.

    The six-step transpose.  Single-chip this lowers to an XLA transpose
    (fast on TPU for 32-bit data); the multi-chip path replaces it with an
    ICI all-to-all (sventt_tpu/parallel/sixstep.py).
    """
    perm = (1, 0) + tuple(range(2, x.lo.ndim))
    return U64(jnp.transpose(x.hi, perm), jnp.transpose(x.lo, perm))


class NTT:
    """Forward/inverse NTT for one NttConfig (reference wrapper.hpp:13-83).

    Data format: U64 limb pairs of shape ``(n,)`` or ``(n, batch...)``.
    Convenience numpy entry points handle uint64 <-> limb conversion.
    """

    def __init__(
        self,
        config: NttConfig,
        enable_forward: bool = True,
        enable_inverse: bool = True,
    ):
        self.config = config
        self.mod = config.mod
        self.fc = FieldConsts.from_modulus(self.mod, lazy=config.lazy)
        self.strategy = config.resolved_strategy
        self._fwd = None
        self._inv = None

        if self.strategy == "iterative":
            if enable_forward:
                self._fwd_tables = forward_tables(self.mod, config.n)
            if enable_inverse:
                self._inv_tables = inverse_tables(self.mod, config.n)
        else:  # six_step
            n0, n1 = config.split
            self.n0, self.n1 = n0, n1
            if enable_forward:
                self._fwd_col = forward_tables(self.mod, n0)
                self._fwd_row = forward_tables(self.mod, n1)
                self._fwd_tw = _row_twiddles(self.mod, n0, n1, inverse=False)
            if enable_inverse:
                self._inv_col = inverse_tables(self.mod, n0)
                self._inv_row = inverse_tables(self.mod, n1)
                self._inv_tw = _row_twiddles(self.mod, n0, n1, inverse=True)

        if enable_forward:
            self._fwd = jax.jit(self._forward_impl)
        if enable_inverse:
            self._inv = jax.jit(self._inverse_impl)

    # -- public API -----------------------------------------------------------

    def get_m(self) -> int:
        """Transform length (reference wrapper.hpp get_m)."""
        return self.config.n

    def compute_forward(self, x: U64) -> U64:
        if self._fwd is None:
            raise RuntimeError("forward transform was not enabled")
        return self._fwd(x)

    def compute_inverse(self, x: U64) -> U64:
        if self._inv is None:
            raise RuntimeError("inverse transform was not enabled")
        return self._inv(x)

    def normalize(self, x: U64) -> U64:
        return self.fc.normalize(x)

    # numpy convenience (host <-> device)
    def forward_numpy(self, x: np.ndarray) -> np.ndarray:
        out = self.compute_forward(u64_from_numpy(x))
        return u64_to_numpy(self.fc.normalize(out))

    def inverse_numpy(self, x: np.ndarray) -> np.ndarray:
        out = self.compute_inverse(u64_from_numpy(x))
        return u64_to_numpy(self.fc.normalize(out))

    # -- implementations --------------------------------------------------------

    def _forward_impl(self, x: U64) -> U64:
        if self.strategy == "iterative":
            return ntt_forward(x, self._fwd_tables, self.fc)
        return self._forward_sixstep(x)

    def _inverse_impl(self, x: U64) -> U64:
        if self.strategy == "iterative":
            return ntt_inverse(x, self._inv_tables, self.fc)
        return self._inverse_sixstep(x)

    def _forward_sixstep(self, x: U64) -> U64:
        """n = n0*n1 decomposition with bit-reversed output.

        Derivation (writing j = j0*n1 + j1, output index p = p0*n1 + p1,
        sub-NTTs golden/bit-reversed): out[p0, p1] = X[bitrev(p)] where
        step 1 column-NTTs over j0, step 2 twiddles by
        omega_n^(j1 * bitrev(p0)), step 3 row-NTTs over j1.  Matches the
        reference's six-step schedule (kernel/recursive.hpp:61-75 with
        layer/sve/generic.hpp twiddle indexing) but with the transposes
        placed so every sub-NTT runs along the leading axis.
        """
        n0, n1 = self.n0, self.n1
        flat_batch = x.lo.shape[1:]
        mat = U64(
            x.hi.reshape((n0, n1) + flat_batch), x.lo.reshape((n0, n1) + flat_batch)
        )
        # 1) column NTTs: leading axis n0, batch (n1, ...)
        mat = ntt_forward(mat, self._fwd_col, self.fc)
        # 2) inter-step twiddles W[p0, j1] = omega_n^(bitrev(p0) * j1)
        tw_shape = (n0, n1) + (1,) * len(flat_batch)
        w = U64(
            self._fwd_tw.w.hi.reshape(tw_shape), self._fwd_tw.w.lo.reshape(tw_shape)
        )
        wp = U64(
            self._fwd_tw.wp.hi.reshape(tw_shape), self._fwd_tw.wp.lo.reshape(tw_shape)
        )
        mat = self.fc.mont_mul(mat, w, wp)
        # 3) transpose so rows become the leading axis
        mat = _transpose01(mat)
        # 4) row NTTs: leading axis n1, batch (n0, ...)
        mat = ntt_forward(mat, self._fwd_row, self.fc)
        # 5) transpose back and flatten: out[p0*n1 + p1]
        mat = _transpose01(mat)
        return U64(
            mat.hi.reshape((n0 * n1,) + flat_batch),
            mat.lo.reshape((n0 * n1,) + flat_batch),
        )

    def _inverse_sixstep(self, x: U64) -> U64:
        """Mirror of _forward_sixstep (reference recursive.hpp:116-139):
        row inverse NTTs, conjugate twiddles, column inverse NTTs; the 1/n0
        and 1/n1 scalings folded per sub-transform multiply to 1/n."""
        n0, n1 = self.n0, self.n1
        flat_batch = x.lo.shape[1:]
        mat = U64(
            x.hi.reshape((n0, n1) + flat_batch), x.lo.reshape((n0, n1) + flat_batch)
        )
        mat = _transpose01(mat)
        mat = ntt_inverse(mat, self._inv_row, self.fc)  # undo row NTTs
        mat = _transpose01(mat)
        tw_shape = (n0, n1) + (1,) * len(flat_batch)
        w = U64(
            self._inv_tw.w.hi.reshape(tw_shape), self._inv_tw.w.lo.reshape(tw_shape)
        )
        wp = U64(
            self._inv_tw.wp.hi.reshape(tw_shape), self._inv_tw.wp.lo.reshape(tw_shape)
        )
        mat = self.fc.mont_mul(mat, w, wp)  # undo twiddles
        mat = ntt_inverse(mat, self._inv_col, self.fc)  # undo column NTTs
        return U64(
            mat.hi.reshape((n0 * n1,) + flat_batch),
            mat.lo.reshape((n0 * n1,) + flat_batch),
        )
