"""Benchmark-driven per-config autotuner: measure-and-cache knob selection.

The reference has no heuristics: every template parameter -- transpose
class, shuffle stages, padding, block_rows, store_precomputation -- is
chosen from a measured tuning corpus (reference
tests/bench-transpose.cpp:105-499; README.md:26-27 "parameters below were
obtained by benchmarking on Fugaku").  This module is the TPU-native
equivalent for this framework's knobs:

* ``engine``            -- jnp (pure XLA) vs pallas (fused VMEM kernels)
* ``modmul``            -- montgomery vs shoup butterfly multiply
* ``max_fused``         -- plan-tree shape (largest fused leaf)
* ``block_b``           -- sublane/mid kernel lane-tile width
* ``stages_per_call``   -- butterfly stages fused per pallas_call
* ``lane_rows``         -- lane-kernel batch-rows block height
* ``chunk_elems``       -- jnp engine VMEM-resident chunk size
* ``split_w_only``      -- companion-free inter-step twiddle tables

all of which showed 20-40% measured spreads in round 1 (PERF_NOTES.md).

``tune(config)`` runs a staged greedy search (engine x modmul first, then
plan shape, then coordinate descent over the kernel knobs), timing each
candidate with chained dependent calls on the real backend, and persists
the winner keyed by (modulus, generator, n, backend, device kind) so later
processes -- including ``NttConfig(..., tune=True)`` construction -- get
the tuned knobs for free.  The cache file lives at the repo root
(``autotune_cache.json``) so tuned parameters ship with the repo, the way
the reference ships its Fugaku-derived constants in configuration headers.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

from .config import NttConfig

#: Environment override for the persistent cache location.
CACHE_ENV = "SVENTT_TUNE_CACHE"

_DEFAULT_CACHE = Path(__file__).resolve().parents[2] / "autotune_cache.json"

#: Tunable fields copied from a search winner into the returned config.
KNOB_FIELDS = (
    "engine", "modmul", "max_fused", "block_b", "stages_per_call",
    "lane_rows", "chunk_elems", "split_w_only",
)


def _cache_path(explicit: str | os.PathLike | None = None) -> Path:
    if explicit is not None:
        return Path(explicit)
    return Path(os.environ.get(CACHE_ENV, _DEFAULT_CACHE))


def _load_cache(path: Path) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_cache(path: Path, data: dict) -> None:
    tmp = path.with_suffix(".tmp")
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _backend() -> str:
    import jax

    return jax.default_backend()


def _device_kind() -> str:
    import jax

    return jax.devices()[0].device_kind.replace(" ", "_")


#: Config fields that constrain the search space.  They are part of the
#: cache key: a search run under a pinned engine/modmul/knob explores a
#: different candidate set, so its winner must not be served to (or
#: clobbered by) an unconstrained tune of the same (N, g, n, device).
CONSTRAINT_FIELDS = (
    "strategy", "engine", "modmul", "n0", "n1", "lazy",
    "block_b", "stages_per_call", "lane_rows", "max_fused", "chunk_elems",
    "split_w_only",
)


def cache_key(config: NttConfig) -> str:
    base = (
        f"{config.modulus}:{config.generator}:{config.n}"
        f":{_backend()}:{_device_kind()}"
    )
    pins = []
    for name in CONSTRAINT_FIELDS:
        v = getattr(config, name)
        if v is None or v == "auto":
            continue
        pins.append(f"{name}={v}")
    # Unconstrained configs keep the bare key (backward compatible with
    # the shipped cache entries).
    return base if not pins else f"{base}:{','.join(pins)}"


def _log(msg: str) -> None:
    print(f"autotune: {msg}", file=sys.stderr, flush=True)


#: Minimum wall time of one timed chain, seconds.  At the 0.1 ms/call scale
#: run-to-run variance is comparable to the measurement itself (round-2
#: finding); chains are lengthened adaptively until one chain takes at least
#: this long, bounding relative timer/tunnel noise to ~1-2%.
MIN_CHAIN_S = 0.05

#: Chain-length growth cap during adaptive lengthening.
MAX_CHAIN_ITERS = 512


def _chain_once(ntt, x, iters: int) -> float:
    """One timed chain of ``iters`` dependent forward calls; returns ms/call."""
    import jax

    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = ntt.compute_forward(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters * 1e3


def _adaptive_iters(ntt, x, iters: int) -> tuple[int, float]:
    """Grow the chain length until one chain takes >= MIN_CHAIN_S.

    Returns (final iters, ms/call of the last probe chain).  The probe
    chains double in length, so total probing costs < 2 final chains.
    """
    ms = _chain_once(ntt, x, iters)
    while iters < MAX_CHAIN_ITERS and ms * iters < MIN_CHAIN_S * 1e3:
        iters = min(MAX_CHAIN_ITERS, iters * 2)
        ms = _chain_once(ntt, x, iters)
    return iters, ms


def _make_input(config: NttConfig):
    import jax

    from ..field.limb import u64_from_numpy

    rng = np.random.default_rng(0)
    return jax.device_put(
        u64_from_numpy(
            rng.integers(0, config.modulus, config.n, dtype=np.uint64)
        )
    )


def _time_candidate(config: NttConfig, iters: int, reps: int = 2) -> float:
    """Chained-dependent-call timing of one candidate's forward transform.

    Single-call timings through the axon tunnel carry a flat ~27 ms
    completion poll (PERF_NOTES.md); ``iters`` dependent transforms inside
    one block_until_ready amortize it away.  The chain is lengthened
    adaptively (MIN_CHAIN_S) so fast configs are not judged on noise.
    Returns best-of-``reps`` ms.
    """
    import jax

    from .wrapper import NTT

    ntt = NTT(config, enable_inverse=False)
    x = _make_input(config)
    out = ntt.compute_forward(x)  # compile + warm-up
    jax.block_until_ready(out)
    iters, best = _adaptive_iters(ntt, x, iters)
    for _ in range(reps):
        best = min(best, _chain_once(ntt, x, iters))
    del ntt, x, out
    gc.collect()
    return best


#: Finalists within this factor of the greedy winner enter the playoff.
PLAYOFF_MARGIN = 1.2

#: Playoff round-robin rounds (each candidate is timed this many times,
#: interleaved, so slow drift -- tunnel state, thermal -- hits every
#: candidate equally instead of biasing whichever ran last).
PLAYOFF_ROUNDS = 3


def _playoff(
    finalists: list[tuple[str, NttConfig]], iters: int,
    timings: dict[str, float],
) -> tuple[NttConfig, float]:
    """Interleaved re-measurement of near-tied candidates.

    The staged greedy search times candidates SEQUENTIALLY, so any slow
    drift in device/tunnel state biases the comparison.  The playoff keeps
    all finalist executables alive and alternates timed chains between
    them round-robin, taking each candidate's min across rounds.
    """
    import jax

    from .wrapper import NTT

    x = _make_input(finalists[0][1])
    ntts = []
    for tag, cfg in finalists:
        ntt = NTT(cfg, enable_inverse=False)
        jax.block_until_ready(ntt.compute_forward(x))  # compile + warm
        ntts.append((tag, cfg, ntt))
    iters, _ = _adaptive_iters(ntts[0][2], x, iters)
    best: dict[str, float] = {tag: float("inf") for tag, _ in finalists}
    for _ in range(PLAYOFF_ROUNDS):
        for tag, _, ntt in ntts:
            best[tag] = min(best[tag], _chain_once(ntt, x, iters))
    for tag, ms in best.items():
        _log(f"playoff {tag}: {ms:.3f} ms")
        timings[f"playoff:{tag}"] = ms
    tag, cfg, _ = min(ntts, key=lambda t: best[t[0]])
    ms = best[tag]
    del ntts, x
    gc.collect()
    return cfg, ms


def _lazy_capable(config: NttConfig) -> bool:
    if config.lazy is False:
        return False
    return config.mod.bit_width <= 62


def _engine_candidates(config: NttConfig) -> list[str]:
    if config.engine != "auto":
        return [config.engine]
    if _backend() != "tpu":
        # interpret-mode pallas timings are meaningless; XLA only
        return ["jnp"]
    return ["jnp", "pallas"]


def _modmul_candidates(config: NttConfig) -> list[str]:
    if config.modmul != "auto":
        return [config.modmul]
    out = ["montgomery"]
    if _lazy_capable(config):
        out.append("shoup")
    return out


#: Per-knob candidate grids for the pallas kernel knobs (coordinate
#: descent order).  512-wide fused leaves are excluded: Mosaic compile
#: time blows up on the tail-stage unroll (ops/ntt_pallas.py MAX_FUSED).
PLAN_GRID = (128, 256)
KNOB_GRID = (
    ("block_b", (128, 256, 512)),
    ("stages_per_call", (3, 5, 8)),
    ("lane_rows", (32, 64, 128)),
)

#: jnp-engine knob grid (coordinate descent when the jnp engine wins).
JNP_KNOB_GRID = (
    ("chunk_elems", (1 << 20, 1 << 21, 1 << 22)),
)


def search(
    config: NttConfig, iters: int | None = None
) -> tuple[NttConfig, dict[str, float]]:
    """Staged greedy search; returns (winner, timings per candidate tag)."""
    if iters is None:
        # keep each measurement around a second of device time
        iters = max(4, min(20, (1 << 27) // config.n))
    base = config.with_(tune=False)
    timings: dict[str, float] = {}
    candidates: dict[str, NttConfig] = {}

    def timed(cfg: NttConfig, tag: str) -> float:
        try:
            ms = _time_candidate(cfg, iters)
        except Exception as e:  # candidate failed to build/compile
            _log(f"{tag}: FAILED ({type(e).__name__}: {e})")
            ms = float("inf")
        else:
            _log(f"{tag}: {ms:.3f} ms")
        timings[tag] = ms
        candidates[tag] = cfg
        return ms

    def finish(best: NttConfig, best_ms: float) -> tuple[NttConfig, dict]:
        """Interleaved playoff between near-tied measured candidates."""
        if _backend() != "tpu":
            return best, timings
        finalists: list[tuple[str, NttConfig]] = []
        seen: list[NttConfig] = []
        for tag, ms in sorted(timings.items(), key=lambda kv: kv[1]):
            cfg = candidates[tag]
            if ms > best_ms * PLAYOFF_MARGIN or cfg in seen:
                continue
            finalists.append((tag, cfg))
            seen.append(cfg)
        # memory guard: each finalist keeps its tables + executables alive
        limit = 2 if config.n >= (1 << 26) else 3
        finalists = finalists[:limit]
        if len(finalists) < 2:
            return best, timings
        winner, _ = _playoff(finalists, iters, timings)
        return winner, timings

    # Stage A: engine x modmul on default knobs.
    best, best_ms = None, float("inf")
    for eng in _engine_candidates(base):
        for mm in _modmul_candidates(base):
            cand = base.with_(engine=eng, modmul=mm)
            ms = timed(cand, f"{eng}/{mm}")
            if ms < best_ms:
                best, best_ms = cand, ms
    if best is None:
        raise RuntimeError("autotune: every candidate failed")

    if best.engine != "pallas":
        # jnp winner: tune the VMEM-resident chunk size (only bites when
        # the transform exceeds one chunk)
        from .planner import JNP_RESIDENT_ELEMS, W_ONLY_THRESHOLD

        for name, grid in JNP_KNOB_GRID:
            if config.n <= min(grid):
                break
            current = getattr(best, name) or JNP_RESIDENT_ELEMS
            for val in grid:
                if val == current:
                    continue
                cand = best.with_(**{name: val})
                ms = timed(cand, f"{name}={val}")
                if ms < best_ms:
                    best, best_ms = cand, ms
        # Companion-free inter-step tables: trades the wp table read of
        # every Split level for an in-flight u64 low-product.  Only bites
        # when the plan decomposes; skip where the size heuristic already
        # drops the companion.
        if best.split_w_only is None and config.n > config.ITERATIVE_MAX:
            default_w_only = config.n >= W_ONLY_THRESHOLD
            cand = best.with_(split_w_only=not default_w_only)
            ms = timed(cand, f"split_w_only={not default_w_only}")
            if ms < best_ms:
                best, best_ms = cand, ms
        return finish(best, best_ms)

    # Stage B: plan shape (largest fused leaf).  Only meaningful when the
    # transform decomposes (n above the leaf size).
    from ..ops.ntt_pallas import MAX_FUSED

    for mf in PLAN_GRID:
        if mf == (best.max_fused or MAX_FUSED) or config.n <= mf:
            continue
        cand = best.with_(max_fused=mf)
        ms = timed(cand, f"max_fused={mf}")
        if ms < best_ms:
            best, best_ms = cand, ms

    # Stage C: coordinate descent over the kernel knobs.
    from ..ops.ntt_pallas import BLOCK_B, LANE_BLOCK_ROWS, MAX_STAGES_PER_CALL

    defaults = {
        "block_b": BLOCK_B,
        "stages_per_call": MAX_STAGES_PER_CALL,
        "lane_rows": LANE_BLOCK_ROWS,
    }
    for name, grid in KNOB_GRID:
        current = getattr(best, name) or defaults[name]
        for val in grid:
            if val == current:
                continue
            cand = best.with_(**{name: val})
            ms = timed(cand, f"{name}={val}")
            if ms < best_ms:
                best, best_ms = cand, ms

    return finish(best, best_ms)


def tune(
    config: NttConfig,
    *,
    force: bool = False,
    iters: int | None = None,
    cache_path: str | os.PathLike | None = None,
    on_miss: str = "search",
) -> NttConfig:
    """Resolve ``config``'s knobs via the persistent measure-and-cache tuner.

    Cache hit: returns immediately with the stored knobs.  Miss (or
    ``force=True``): runs the staged search on the current backend, stores
    the winner, returns it -- unless ``on_miss="skip"``, which returns the
    config untuned (for benchmark harnesses that must not spend minutes
    tuning on an unseen device).  The returned config has ``tune=False``
    so NTT construction does not recurse.
    """
    path = _cache_path(cache_path)
    key = cache_key(config)
    data = _load_cache(path)
    if not force and key in data:
        knobs = data[key]["knobs"]
        return config.with_(tune=False, **{k: knobs.get(k) for k in KNOB_FIELDS})
    if on_miss == "skip":
        return config.with_(tune=False)

    _log(f"tuning {key} (no cache entry)")
    t0 = time.perf_counter()
    best, timings = search(config, iters)
    _verify_winner(config, best)
    _log(f"winner {_tag(best)} in {time.perf_counter() - t0:.0f}s")
    data[key] = {
        "knobs": {k: getattr(best, k) for k in KNOB_FIELDS},
        "timings": {
            k: (None if v == float("inf") else round(v, 4))
            for k, v in timings.items()
        },
        "best_ms": round(min(timings.values()), 4),
    }
    if path == _DEFAULT_CACHE and _backend() != "tpu":
        # The repo-shipped cache is a tuned-parameter corpus for the real
        # device (the reference ships Fugaku-derived constants the same
        # way); host-CPU timings are machine-local noise and would dirty
        # the checked-in file on every developer/CI run.
        _log("non-tpu backend: not persisting to the repo-shipped cache")
        return best
    try:
        _save_cache(path, data)
    except OSError as e:
        _log(f"cache write failed ({e}); continuing untuned-cache")
    return best


def _verify_winner(config: NttConfig, best: NttConfig) -> None:
    """A tuned config must be bit-identical (mod N) to the untuned one.

    Device-side residue comparison; the single scalar readback happens
    after all timing, so the tunnel's D2H dispatch degradation
    (PERF_NOTES.md round 2) cannot contaminate the measurements.
    """
    import jax
    import jax.numpy as jnp

    from ..field.limb import u64_from_numpy
    from .wrapper import NTT

    base = config.with_(tune=False)
    if best == base:
        return
    rng = np.random.default_rng(1)
    x = jax.device_put(
        u64_from_numpy(rng.integers(0, config.modulus, config.n, dtype=np.uint64))
    )
    ntt_b = NTT(base, enable_inverse=False)
    ntt_w = NTT(best, enable_inverse=False)
    ref = ntt_b.fc.normalize(ntt_b.compute_forward(x))
    got = ntt_w.fc.normalize(ntt_w.compute_forward(x))
    same = jnp.array_equal(ref.hi, got.hi) & jnp.array_equal(ref.lo, got.lo)
    if not bool(same):
        raise AssertionError(
            f"autotune winner {_tag(best)} is not bit-identical to the "
            "untuned config -- refusing to cache it"
        )
    del ntt_b, ntt_w, ref, got
    gc.collect()


def _tag(cfg: NttConfig) -> str:
    return (
        f"{cfg.engine}/{cfg.modmul}"
        f" max_fused={cfg.max_fused} block_b={cfg.block_b}"
        f" spc={cfg.stages_per_call} rows={cfg.lane_rows}"
    )
